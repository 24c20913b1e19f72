"""Sharded-phase scaling sweep: throughput vs virtual device count.

Measures the two mesh-sharded phases (sort+dedup shard_map program and
the psum-reduced BQSR table build) on the SAME parsed ReadBatch at
1/2/4/8 virtual CPU devices, reporting reads/sec and efficiency vs the
1-device run — the measurable proxy in this environment for BASELINE's
">=80% scaling efficiency 1->2 hosts" target (the real axis is chips,
but the shard_map program and the host prepass are identical).

Each device count runs in a FRESH subprocess because
--xla_force_host_platform_device_count is fixed at jax import.

Usage:  timeout 900 python tools/scaling.py [--reads 500000] [--devices 1,2,4,8]
        python tools/scaling.py --child N --reads M    (internal)
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
    # the axon TPU plugin ignores JAX_PLATFORMS from the environment; the
    # platform must be forced via jax.config before any backend initializes
    # (same trick as tests/conftest.py)
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
    from elprep_tpu.parallel.sharded import (run_sharded_sort_dedup,
                                             sharded_recalibrate)

    assert len(jax.devices()) >= n_devices, jax.devices()

    hdr, batch = samio.read_sam_file(os.path.join(cache, "in.sam"))
    data = run_pipeline(SamData(hdr, batch), [fsimple.add_refid],
                        SortingOrder.KEEP)
    ref_index = RefIndex(MappedFasta(os.path.join(cache, "ref.elfasta")))
    recal = fbqsr.BaseRecalibrator(
        [os.path.join(cache, "sites.elsites")], ref_index)
    mesh = make_mesh(n_devices)

    row = {"devices": n_devices, "reads": len(data.batch)}
    # warm (compile) + 2 timed iterations, report the best
    for phase, fn in (
        ("sort_dedup", lambda: run_sharded_sort_dedup(
            data.batch, data.header, mesh)),
        ("recal", lambda: sharded_recalibrate(
            recal, data.header, data.batch, 500, mesh)),
    ):
        fn()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        row[f"{phase}_s"] = round(best, 3)
        row[f"{phase}_reads_per_sec"] = round(len(data.batch) / best, 1)
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
        print("child %d failed:\n%s" % (n, p.stderr[-2000:]),
              file=sys.stderr)
        return {}
    return json.loads(p.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=500_000)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--child", type=int, default=0)
    ap.add_argument("--no-equalized", action="store_true")
    args = ap.parse_args()
    if args.child:
        child(args.child, args.reads)
        return

    rows = []
    for n in [int(s) for s in args.devices.split(",") if s]:
        row = _run_child(n, args.reads)
        if not row:
            continue
        rows.append(row)
        print(json.dumps(row), flush=True)
    if rows and rows[0]["devices"] == 1:
        base = rows[0]
        for row in rows[1:]:
            n = row["devices"]
            for phase in ("sort_dedup", "recal"):
                speedup = row[f"{phase}_reads_per_sec"] / \
                    base[f"{phase}_reads_per_sec"]
                row[f"{phase}_eff"] = round(speedup / n, 3)
        print(json.dumps({
            "scaling": [{k: r[k] for k in r if k.endswith("_eff") or
                         k == "devices"} for r in rows[1:]]}))

    if not args.no_equalized:
        # 1->2-host analog with the per-host core budget held constant:
        # 1 device on 2 cores vs 2 devices on 4 cores. The plain sweep
        # above under-reads efficiency on this 4-core host because the
        # 1-device XLA:CPU program already runs ~4x intra-op parallel
        # (taskset to 1 core slows its recal exec 2.2s -> 9.5s), so its
        # baseline sits at the host ceiling the 2-device run cannot
        # exceed. Real chips have a fixed per-chip core budget, which
        # this mode models.
        r1 = _run_child(1, args.reads, cores="0-1")
        r2 = _run_child(2, args.reads, cores="0-3")
        if r1 and r2:
            eq = {"mode": "equalized_2cores_per_device",
                  "r1": r1, "r2": r2}
            for phase in ("sort_dedup", "recal"):
                sp = r2[f"{phase}_reads_per_sec"] / \
                    r1[f"{phase}_reads_per_sec"]
                eq[f"{phase}_eff_1to2"] = round(sp / 2, 3)
            print(json.dumps(eq), flush=True)


if __name__ == "__main__":
    main()
