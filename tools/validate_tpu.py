"""On-chip validation + microbench for the Pallas PairHMM kernel.

The pytest suite deliberately never touches the TPU (tests/conftest.py
forces the CPU backend; the Pallas kernel runs there in interpret
mode). This tool is the real-chip leg of SURVEY §4's "CPU-jax vs TPU
equivalence" requirement: it drives the production kernel on the
configured accelerator over mixed-shape (read, haplotype) pairs —
including 'N'-base sentinel paths — and checks every likelihood
against the f64 oracle, then reports GCUPS at the WES benchmark shape.

Usage: PYTHONPATH=. python tools/validate_tpu.py
"""

import time

import numpy as np


def validate(tolerance: float = 5e-4) -> float:
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    from elprep_tpu.ops import pairhmm as ph
    from elprep_tpu.ops import pairhmm_pallas as pp

    rng = np.random.RandomState(9)
    bases = ["A", "C", "G", "T"]
    reads, haps = [], []
    for lr in (17, 33, 48, 101, 152):
        seq = "".join(rng.choice(bases, lr)).encode()
        qual = rng.randint(2, 42, lr).astype(np.uint8)
        reads.append((seq, qual, 60))
    for lh in (40, 67, 129, 300, 400):
        haps.append("".join(rng.choice(bases, lh)).encode())
    reads[1] = (reads[1][0][:5] + b"N" + reads[1][0][6:], reads[1][1], 60)
    haps[0] = haps[0][:10] + b"NN" + haps[0][12:]
    pair_r = np.repeat(np.arange(len(reads)), len(haps))
    pair_h = np.tile(np.arange(len(haps)), len(reads))
    got = pp.pairhmm_pallas_pairs(reads, haps, pair_r, pair_h)
    worst = 0.0
    for b in range(len(pair_r)):
        seq, qual, _ = reads[pair_r[b]]
        exact = ph.pairhmm_f64_diag(seq, qual, 60, haps[pair_h[b]])
        dev = abs(got[b] - exact)
        worst = max(worst, dev)
        assert dev < tolerance, (b, got[b], exact)
    print(f"kernel matches the f64 oracle on {len(pair_r)} mixed pairs "
          f"(worst |dev| {worst:.2e}) on backend "
          f"{__import__('jax').default_backend()}")
    return worst


def gcups(iters: int = 3) -> float:
    import jax.numpy as jnp

    from elprep_tpu.ops.pairhmm import F32_INITIAL_POW
    from elprep_tpu.ops.pairhmm_pallas import pairhmm_pallas_u8

    rng = np.random.RandomState(1)
    lr, lh, n_pad, B = 152, 400, 160, 16384
    pad_off = n_pad + 1
    x = np.zeros((n_pad, B), np.uint8)
    x[1:lr + 1] = rng.randint(65, 69, (lr, B))
    hb_rows = ((pad_off + lh + pad_off + 7) // 8) * 8
    hbp = np.zeros((hb_rows, B), np.uint8)
    hbp[pad_off: pad_off + lh] = rng.randint(65, 69, (lh, B))
    mq = np.zeros((n_pad, B), np.uint8)
    mq[1:lr + 1] = 35
    rrl = np.zeros((n_pad, B), np.uint8)
    rrl[1:lr + 1] = 1
    rl = np.full((1, B), lr, np.int32)
    hl = np.full((1, B), lh, np.int32)
    init = np.full((1, B), np.float32(2.0 ** F32_INITIAL_POW / lh),
                   np.float32)
    args = [jnp.asarray(a) for a in (x, hbp, mq, rrl, rl, hl, init)]

    def run():
        return pairhmm_pallas_u8(*args, n_pad=n_pad, lh_pad=lh,
                                 pad_off=pad_off)

    float(np.asarray(run()).ravel()[0])  # compile + warm (syncs via fetch)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = run()
        float(np.asarray(out).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    g = B * lr * lh / best / 1e9
    print(f"PairHMM {g:.1f} GCUPS at {lr}x{lh}, {B} pairs")
    return g


if __name__ == "__main__":
    validate()
    gcups()
