"""Instrumented 1-vs-2-device phase split of sharded_recalibrate.

The round-4 verdict flagged recal's 1->2 efficiency as noise-dominated
(0.48-1.37 across captures) with no isolation of prep vs shard_mapped
compute vs collective. This tool runs PAIRED captures — one 1-device and
one 2-device child back to back per pair, so both sides share one
host-oscillation window — and reports the per-stage wall
(prep / stack / put / device+psum, from the ``timings`` hook in
parallel/sharded.sharded_recalibrate) plus per-pair efficiencies and
their spread.

Like tools/scaling.py's equalized mode, cores are pinned per device
budget by default (1 device on 2 cores vs 2 devices on 4 cores): the
4-core host otherwise lets the 1-device XLA:CPU program use all cores
intra-op, putting the baseline at the host ceiling no 2-device run can
beat — real chips have a fixed per-chip core budget.

Usage: timeout 1800 python tools/recal_profile.py [--reads 500000]
         [--pairs 3] [--no-pin]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def child(n_devices: int, n_reads: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from stress import build_fixture

    cache = build_fixture(n_reads)

    from elprep_tpu.core.pipeline import SamData, SortingOrder, run_pipeline
    from elprep_tpu.filters import bqsr as fbqsr
    from elprep_tpu.filters import simple as fsimple
    from elprep_tpu.io import sam as samio
    from elprep_tpu.io.fasta import MappedFasta, RefIndex
    from elprep_tpu.parallel.mesh import make_mesh
    from elprep_tpu.parallel.sharded import sharded_recalibrate

    assert len(jax.devices()) >= n_devices, jax.devices()
    hdr, batch = samio.read_sam_file(os.path.join(cache, "in.sam"))
    data = run_pipeline(SamData(hdr, batch), [fsimple.add_refid],
                        SortingOrder.KEEP)
    ref_index = RefIndex(MappedFasta(os.path.join(cache, "ref.elfasta")))
    recal = fbqsr.BaseRecalibrator(
        [os.path.join(cache, "sites.elsites")], ref_index)
    mesh = make_mesh(n_devices)

    sharded_recalibrate(recal, data.header, data.batch, 500, mesh)  # warm
    best = None
    for _ in range(2):
        tm: dict = {}
        t0 = time.perf_counter()
        sharded_recalibrate(recal, data.header, data.batch, 500, mesh,
                            timings=tm)
        tm["total_s"] = time.perf_counter() - t0
        if best is None or tm["total_s"] < best["total_s"]:
            best = tm
    row = {"devices": n_devices, "reads": len(data.batch),
           "reads_per_sec": round(len(data.batch) / best["total_s"], 1)}
    row.update({k: round(v, 4) for k, v in best.items()})
    print(json.dumps(row), flush=True)


def _run_child(n: int, reads: int, cores: str = "") -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=%d " % n
                        ) + env.get("XLA_FLAGS", "")
    env["ELPREP_TPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = _REPO + ":" + env.get("PYTHONPATH", "")
    cmd = [sys.executable, os.path.abspath(__file__),
           "--child", str(n), "--reads", str(reads)]
    if cores:
        cmd = ["taskset", "-c", cores] + cmd
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                       env=env, cwd=_REPO)
    if p.returncode != 0:
        print("child %d failed:\n%s" % (n, p.stderr[-2000:]), file=sys.stderr)
        return {}
    return json.loads(p.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=500_000)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--child", type=int, default=0)
    ap.add_argument("--no-pin", action="store_true",
                    help="no taskset pinning (raw host sweep)")
    args = ap.parse_args()
    if args.child:
        child(args.child, args.reads)
        return

    c1, c2 = ("", "") if args.no_pin else ("0-1", "0-3")
    pairs = []
    for k in range(args.pairs):
        r1 = _run_child(1, args.reads, cores=c1)
        r2 = _run_child(2, args.reads, cores=c2)
        if not (r1 and r2):
            continue
        pair = {"pair": k, "r1": r1, "r2": r2,
                "eff_1to2": round(
                    r2["reads_per_sec"] / r1["reads_per_sec"] / 2, 3)}
        for ph in ("prep_s", "stack_s", "put_s", "device_s"):
            if ph in r1 and ph in r2 and r2[ph] > 0:
                # >1.0 means the stage sped up at 2 devices; /2 = the
                # per-device efficiency of that stage alone
                pair[ph.replace("_s", "_eff")] = round(
                    r1[ph] / r2[ph] / 2, 3)
        pairs.append(pair)
        print(json.dumps(pair), flush=True)
    if pairs:
        effs = [p["eff_1to2"] for p in pairs]
        print(json.dumps({
            "mode": "no-pin" if args.no_pin else
                    "equalized_2cores_per_device",
            "reads": args.reads,
            "pairs": len(pairs),
            "eff_min": min(effs), "eff_max": max(effs),
            "eff_spread": round(max(effs) - min(effs), 3),
            "effs": effs}), flush=True)


if __name__ == "__main__":
    main()
