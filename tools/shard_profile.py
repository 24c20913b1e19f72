"""Phase-level timing of run_sharded_sort_dedup at N virtual devices.

Breaks the sharded step into: plan (helper planning), stack (column
stacking into the padded per-shard layout), device (shard_mapped
program + fetch), apply (verdict writeback + global select).  Run via
fresh subprocess per device count (device count fixes at jax import).

Usage: timeout 900 python tools/shard_profile.py [--reads 500000] [--devices 1,2]
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

    import numpy as np

    from elprep_tpu.core.pipeline import SamData, SortingOrder, run_pipeline
    from elprep_tpu.filters import simple as fsimple
    from elprep_tpu.io import sam as samio
    from elprep_tpu.parallel.mesh import make_mesh
    from elprep_tpu.parallel import sharded as sh

    hdr, batch = samio.read_sam_file(os.path.join(cache, "in.sam"))
    data = run_pipeline(SamData(hdr, batch), [fsimple.add_refid],
                        SortingOrder.KEEP)
    mesh = make_mesh(n_devices)
    flat = sh._flat_mesh(mesh)
    n_shards = int(np.prod(mesh.devices.shape))
    header, b = data.header, data.batch

    from jax.sharding import PartitionSpec as P

    def run_once(times):
        t0 = time.perf_counter()
        shard_rows, n_home, aux = sh.plan_shards(b, header, n_shards)
        t1 = time.perf_counter()
        n_pad = sh._round_pow2(max(1, max(len(r) for r in shard_rows)))
        refid = np.asarray(b.temps["REFID"])
        nrefid = np.asarray(b.temps["NextREFID"])
        qrank = aux["qrank"]

        def stacked(col, fill):
            col = np.asarray(col)
            out = np.full(n_shards * n_pad, fill, np.int32)
            for s, rows in enumerate(shard_rows):
                out[s * n_pad: s * n_pad + len(rows)] = col[rows]
            return out

        from elprep_tpu.hostpool import shared_pool as _pool

        specs = (
            (b.flag, 0x4), (refid, sh.INT32_MAX), (b.pos, sh.INT32_MAX),
            (b.mapq, 0), (nrefid, sh.INT32_MAX), (b.pnext, sh.INT32_MAX),
            (b.tlen, 0), (qrank, sh.INT32_MAX), (aux["libid"], -1),
            (aux["upos"], 0), ((np.asarray(b.flag) >> 4) & 1, 0),
            (aux["score"], 0),
        )
        cols = tuple(_pool().map(lambda cf: stacked(*cf), specs))
        t2 = time.perf_counter()
        dargs = [sh._put(c, flat, P("dp")) for c in cols]
        t2b = time.perf_counter()
        dup, perm = step(*dargs)
        import jax as _jax
        _jax.block_until_ready((dup, perm))
        t2c = time.perf_counter()
        dup = sh._fetch(dup).reshape(n_shards, n_pad)
        perm = sh._fetch(perm).reshape(n_shards, n_pad)
        t3 = time.perf_counter()
        flag = np.asarray(b.flag).copy()
        for s, rows in enumerate(shard_rows):
            h = n_home[s]
            home = rows[:h]
            flag[home] = np.where(dup[s, :h], flag[home] | sh.DUPLICATE,
                                  flag[home])
        order_parts = []
        for s, rows in enumerate(shard_rows):
            p = perm[s]
            p = p[p < len(rows)]
            p = p[p < n_home[s]]
            order_parts.append(rows[p])
        order = np.concatenate(order_parts)
        sb = b.select(order)
        t4 = time.perf_counter()
        times.append({"plan": t1 - t0, "stack": t2 - t1, "put": t2b - t2,
                      "exec": t2c - t2b, "fetch": t3 - t2c,
                      "apply": t4 - t3, "total": t4 - t0})
        return sb

    step = sh.sharded_sort_dedup_step(flat)
    times = []
    run_once(times)  # warm/compile
    times.clear()
    for _ in range(3):
        run_once(times)
    best = min(times, key=lambda r: r["total"])
    best = {k: round(v, 3) for k, v in best.items()}
    best["devices"] = n_devices
    best["reads"] = len(b)
    print(json.dumps(best), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=500_000)
    ap.add_argument("--devices", default="1,2")
    ap.add_argument("--child", type=int, default=0)
    args = ap.parse_args()
    if args.child:
        child(args.child, args.reads)
        return
    for n in [int(s) for s in args.devices.split(",") if s]:
        env = dict(os.environ)
        env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=%d " % n
                            ) + env.get("XLA_FLAGS", "")
        env["ELPREP_TPU_PLATFORM"] = "cpu"
        env["PYTHONPATH"] = _REPO + ":" + env.get("PYTHONPATH", "")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(n), "--reads", str(args.reads)],
            capture_output=True, text=True, timeout=900, env=env, cwd=_REPO)
        if p.returncode != 0:
            print("child %d failed:\n%s" % (n, p.stderr[-2000:]),
                  file=sys.stderr)
            continue
        print(p.stdout.strip().splitlines()[-1], flush=True)


if __name__ == "__main__":
    main()
