"""Measure the host-vs-accelerator dispatch crossover on REAL hardware.

Times the fused columnar device step (coordinate-sort perm + mark-duplicates
+ BQSR table build + ApplyBQSR — the same program bench.py times) at a
sweep of batch sizes on BOTH backends:

  - the accelerator (TPU behind the axon tunnel), timed two ways:
      resident  — inputs already on device (kernel throughput ceiling)
      +transfer — includes the host->device transfer of all columns,
                  which is what the real pipeline pays per batch
  - the host CPU backend (what ops/dispatch.py routes small batches to)

Prints a per-size table plus the measured crossover (smallest size where
the accelerator INCLUDING transfers beats the host), which is the number
that justifies (or indicts) ELPREP_TPU_DEVICE_MIN_READS.

Usage:  timeout 580 python tools/crossover.py [--sizes 15,17,19,21] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _sync(out) -> float:
    from __graft_entry__ import sync_scalar

    return sync_scalar(out)


def _build_step(n_rg: int, max_cycle: int, n_reads: int):
    # the SAME jitted program bench.py times — one definition so the
    # published crossover always measures the benchmarked step
    from __graft_entry__ import fused_device_step

    return fused_device_step(n_rg=n_rg, max_cycle=max_cycle)


def _columns(n_reads: int):
    from __graft_entry__ import fused_step_columns

    return fused_step_columns(n_reads)


def bench_size(n_reads: int, iters: int) -> dict:
    import jax

    step = _build_step(n_rg=1, max_cycle=512, n_reads=n_reads)
    cols = _columns(n_reads)
    row = {"n_reads": n_reads}
    nbytes = sum(a.nbytes for a in cols)
    row["input_mb"] = round(nbytes / 1e6, 1)

    cpu = jax.devices("cpu")[0]
    backends = [("host", cpu)]
    if jax.default_backend() != "cpu":
        backends.append(("accel", jax.devices()[0]))

    for name, dev in backends:
        with jax.default_device(dev):
            # resident: transfer once, time the step alone
            args = [jax.device_put(a, dev) for a in cols]
            _sync(step(*args))  # compile + warm
            t0 = time.perf_counter()
            for _ in range(iters):
                out = step(*args)
            _sync(out)
            dt = (time.perf_counter() - t0) / iters
            row[f"{name}_resident_s"] = round(dt, 4)
            # +transfer: device_put inside the timed loop
            t0 = time.perf_counter()
            for _ in range(iters):
                args = [jax.device_put(a, dev) for a in cols]
                out = step(*args)
            _sync(out)
            dt = (time.perf_counter() - t0) / iters
            row[f"{name}_transfer_s"] = round(dt, 4)
            del args, out
            if name == "accel":
                # packed transfer: 4-bit-dict bases + bit-packed skip,
                # device-side unpack (ops/packed) — the transfer-volume
                # lever for link-bound dispatch
                from __graft_entry__ import (fused_device_step_packed,
                                             pack_step_columns)

                pcols = pack_step_columns(cols)
                if pcols is not None:
                    pstep = fused_device_step_packed(
                        n_rg=1, max_cycle=512, width=cols[0].shape[1])
                    row["packed_mb"] = round(
                        sum(np.asarray(a).nbytes for a in pcols) / 1e6, 1)
                    pargs = [jax.device_put(a, dev) for a in pcols]
                    _sync(pstep(*pargs))  # compile + warm
                    t0 = time.perf_counter()
                    for _ in range(iters):
                        pargs = [jax.device_put(a, dev) for a in pcols]
                        out = pstep(*pargs)
                    _sync(out)
                    dt = (time.perf_counter() - t0) / iters
                    row["accel_packed_transfer_s"] = round(dt, 4)
                    del pargs, out
    return row


def bench_pairhmm(B: int, iters: int) -> dict:
    """PairHMM crossover: host lax.scan vs TPU Pallas, both timed from
    the SAME host-side (reads, haps, pair) inputs — i.e. including all
    per-dispatch packing and transfer, exactly what the HC pool pays."""
    import jax

    from elprep_tpu.ops import pairhmm as ph

    rng = np.random.RandomState(2)
    lr, lh = 152, 400
    n_reads, n_haps = max(1, B // 4), max(1, B // 64)
    # every read must RESEMBLE every haplotype, like a real assembly
    # region (haps = same locus +- a few SNPs, reads = its substrings):
    # unrelated pairs underflow into the per-pair f64 host rescue,
    # which is not what the HC pool dispatches
    acgt = np.frombuffer(b"ACGT", np.uint8)
    locus = acgt[rng.randint(0, 4, lh)]
    haps = []
    for i in range(n_haps):
        h = locus.copy()
        for _ in range(2):  # ~2 SNPs per haplotype
            h[rng.randint(0, lh)] = acgt[rng.randint(0, 4)]
        haps.append(h.tobytes())
    reads = []
    for i in range(n_reads):
        off = rng.randint(0, lh - lr)
        seq = locus[off : off + lr].copy()
        for _ in range(3):  # ~3 mismatches per read
            seq[rng.randint(0, lr)] = acgt[rng.randint(0, 4)]
        qual = rng.randint(20, 40, lr).astype(np.uint8)
        reads.append((seq.tobytes(), qual, 45))
    pair_r = rng.randint(0, n_reads, B).astype(np.int32)
    pair_h = rng.randint(0, n_haps, B).astype(np.int32)

    row = {"pairs": B}
    # host scan path
    with jax.default_device(jax.devices("cpu")[0]):
        ph._pairhmm_logl_pairs_scan(reads, haps, pair_r, pair_h)  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            out_h = ph._pairhmm_logl_pairs_scan(reads, haps, pair_r, pair_h)
        row["host_s"] = round((time.perf_counter() - t0) / iters, 4)
    if jax.default_backend() == "tpu":
        from elprep_tpu.ops.pairhmm_pallas import pairhmm_pallas_pairs

        pairhmm_pallas_pairs(reads, haps, pair_r, pair_h)  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            out_d = pairhmm_pallas_pairs(reads, haps, pair_r, pair_h)
        row["accel_s"] = round((time.perf_counter() - t0) / iters, 4)
        row["max_abs_diff"] = round(float(np.max(np.abs(out_d - out_h))), 6)
    row["gcups_host"] = round(B * lr * lh / row["host_s"] / 1e9, 3)
    if "accel_s" in row:
        row["gcups_accel"] = round(B * lr * lh / row["accel_s"] / 1e9, 3)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="15,17,19,21")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--pairhmm", default="")
    args = ap.parse_args()
    import jax

    print("backend:", jax.default_backend(), flush=True)
    rows = []
    for p in [int(s) for s in args.sizes.split(",") if s]:
        row = bench_size(1 << p, args.iters)
        rows.append(row)
        print(json.dumps(row), flush=True)
    # crossover: smallest size where accel including transfer beats host
    if rows:
        cross = None
        for row in rows:
            if "accel_transfer_s" in row and row["accel_transfer_s"] < row["host_resident_s"]:
                cross = row["n_reads"]
                break
        print(json.dumps({"crossover_reads_incl_transfer": cross}))
    for p in [int(s) for s in args.pairhmm.split(",") if s]:
        print(json.dumps(bench_pairhmm(p, args.iters)), flush=True)


if __name__ == "__main__":
    main()
