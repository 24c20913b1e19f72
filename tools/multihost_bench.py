"""Multi-host cost characterization at scaling-sweep scale.

Runs the 500k-read stress fixture through the sharded phases two ways
on virtual CPU devices and records per-phase wall times:

  - single-process ``filter --sharded`` over D devices (in-process
    collectives);
  - N jax.distributed processes x D/N local devices (the
    parallel/multihost.py path: the SAME global program, with the
    verdict all-gather and table psum crossing process boundaries over
    the Gloo DCN analog).

The per-phase delta between the two rows isolates what crossing a
process boundary costs this pipeline (SURVEY §2.9 P8: DCN collectives
replace the reference's gob-file reductions). Emits one JSON line for
the SCALING artifact. Run on a quiet host.

Usage: timeout 1800 python tools/multihost_bench.py [--reads 500000]
           [--devices 2] [--processes 2] [--hc]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import socket
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

_PHASES = {
    "Reading SAM into memory and applying filters.": "read_sort_dedup_s",
    "Marking optical duplicates.": "optical_s",
    "Base recalibration.": "recal_s",
    "Apply BQSR.": "apply_s",
    "Write to file.": "write_s",
    "Calling variants.": "hc_s",
}


def _parse_timed(text: str) -> dict:
    out = {}
    current = None
    for line in text.splitlines():
        line = line.strip()
        if line in _PHASES:
            current = _PHASES[line]
        elif current and (m := re.match(r"done in ([0-9.]+)s", line)):
            out[current] = float(m.group(1))
            current = None
    return out


def _filter_args(cache: str, out_dir: str, hc: bool):
    args = ["filter", os.path.join(cache, "in.sam"),
            os.path.join(out_dir, "out.bam"),
            "--mark-duplicates", "--sorting-order", "coordinate",
            "--bqsr", os.path.join(out_dir, "out.recal"),
            "--known-sites", os.path.join(cache, "sites.elsites"),
            "--reference", os.path.join(cache, "ref.elfasta"),
            "--timed", "--sharded"]
    if hc:
        args += ["--haplotypecaller", os.path.join(out_dir, "out.vcf.gz"),
                 "--reference-confidence", "GVCF"]
    return args


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=500_000)
    ap.add_argument("--devices", type=int, default=2)
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--hc", action="store_true")
    args = ap.parse_args()

    from stress import build_fixture

    cache = build_fixture(args.reads)
    row = {"reads": args.reads, "devices": args.devices,
           "processes": args.processes, "hc": bool(args.hc)}

    with tempfile.TemporaryDirectory(prefix="mh_bench_") as wd:
        # single-process, D virtual devices
        env = dict(os.environ)
        env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["ELPREP_TPU_PLATFORM"] = "cpu"
        env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=%d "
                            % args.devices) + env.get("XLA_FLAGS", "")
        sp_dir = os.path.join(wd, "sp")
        os.makedirs(sp_dir)
        t0 = time.perf_counter()
        p = subprocess.run(
            [sys.executable, "-m", "elprep_tpu"]
            + _filter_args(cache, sp_dir, args.hc),
            capture_output=True, text=True, timeout=1500, env=env, cwd=_REPO)
        row["single_total_s"] = round(time.perf_counter() - t0, 2)
        if p.returncode != 0:
            print("single-process failed:\n" + p.stderr[-2000:], file=sys.stderr)
            raise SystemExit(1)
        row["single_phases"] = _parse_timed(p.stdout + p.stderr)

        # N processes x D/N local devices
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        local = max(1, args.devices // args.processes)
        shard_dir = os.path.join(wd, "shards")
        os.makedirs(shard_dir)
        env_mh = dict(os.environ)
        env_mh["PYTHONPATH"] = _REPO + os.pathsep + env_mh.get("PYTHONPATH", "")
        env_mh["ELPREP_TPU_HC_SHARD_DIR"] = shard_dir
        if args.hc:
            # partition-balance + shard-gather trace lines (cli.py)
            env_mh["ELPREP_TPU_HC_TRACE"] = "1"
        procs = []
        t0 = time.perf_counter()
        for pid in range(args.processes):
            out = os.path.join(wd, "mh%d" % pid)
            os.makedirs(out)
            cmd = [sys.executable, "-m", "elprep_tpu.parallel.multihost",
                   "--coordinator", "127.0.0.1:%d" % port,
                   "--num-processes", str(args.processes),
                   "--process-id", str(pid),
                   "--local-devices", str(local), "--"] \
                + _filter_args(cache, out, args.hc)
            procs.append(subprocess.Popen(cmd, env=env_mh, cwd=_REPO,
                                          stdout=subprocess.PIPE,
                                          stderr=subprocess.STDOUT, text=True))
        outs = []
        for pid, pr in enumerate(procs):
            try:
                text, _ = pr.communicate(timeout=1500)
            except subprocess.TimeoutExpired:
                for p2 in procs:
                    p2.kill()
                raise SystemExit("multihost worker %d timed out" % pid)
            outs.append(text)
            if pr.returncode != 0:
                for p2 in procs:
                    if p2.poll() is None:
                        p2.kill()
                print(text[-2000:], file=sys.stderr)
                raise SystemExit("multihost worker %d failed" % pid)
        row["multi_total_s"] = round(time.perf_counter() - t0, 2)
        row["multi_phases"] = _parse_timed(outs[0])
        if args.hc:
            # partition balance (reads per contig slice) and the
            # shard-VCF gather cost, from the worker trace
            m = re.search(r"contig partition reads per process: (\[[^\]]*\])",
                          outs[0])
            if m:
                row["hc_partition_reads"] = json.loads(m.group(1))
            gathers = []
            for text in outs:
                g = re.search(r"shard gather: barrier ([0-9.]+)s "
                              r"combine ([0-9.]+)s total ([0-9.]+)s", text)
                if g:
                    gathers.append({"barrier_s": float(g.group(1)),
                                    "combine_s": float(g.group(2)),
                                    "total_s": float(g.group(3))})
            if gathers:
                row["hc_gather"] = gathers
        for k, v in row["single_phases"].items():
            if k in row["multi_phases"]:
                row.setdefault("phase_delta_s", {})[k] = round(
                    row["multi_phases"][k] - v, 2)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
