"""Deep fuzz sweep of the session-2 native/jit twin families, beyond
the CI seeds (the round-3 end-of-round sweep is the model):

- padded_to_ragged (ApplyBQSR writeback path) vs the boolean-mask
  numpy formulation
- bqsr_apply_quals_ragged (in-place) vs the padded native engine
- dedup_score_upos vs the jitted unclipped_position/phred_score
- packed transfer (pack_nibble_dict/pack_bits + device unpack) vs
  identity, and recalibrate_tables_packed vs recalibrate_tables

Prints one line per family: seeds swept, cases, divergences (must be 0).
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("ELPREP_TPU_PLATFORM", "cpu")

import numpy as np  # noqa: E402


def sweep_padded_to_ragged(seeds=40):
    from elprep_tpu import native

    cases = div = 0
    for seed in range(seeds):
        rng = np.random.RandomState(1000 + seed)
        for _ in range(8):
            n = int(rng.randint(1, 3000))
            lens = rng.randint(0, 200, n).astype(np.int64)
            lens[rng.rand(n) < 0.25] = 0
            off = np.zeros(n + 1, np.int64)
            np.cumsum(lens, out=off[1:])
            width = int(lens.max(initial=0)) + int(rng.randint(0, 12))
            width = max(width, 1)
            dt = [np.uint8, np.int32, np.int64][int(rng.randint(3))]
            padded = rng.randint(0, 200, (n, width)).astype(dt)
            got = np.full(int(off[-1]), 99, dt)
            assert native.padded_to_ragged(padded, off, got)
            mask = np.arange(width)[None, :] < lens[:, None]
            cases += 1
            if not np.array_equal(got, padded[mask]):
                div += 1
    return cases, div


def sweep_apply_ragged(seeds=30):
    from elprep_tpu import native

    cases = div = 0
    for seed in range(seeds):
        rng = np.random.RandomState(2000 + seed)
        m = int(rng.randint(1, 400))
        n_rg = int(rng.randint(1, 5))
        max_cycle = int(rng.randint(8, 400))
        ncyc = 2 * max_cycle + 1
        lens = rng.randint(0, 160, m).astype(np.int64)
        lens[rng.rand(m) < 0.1] = 0
        off = np.zeros(m + 1, np.int64)
        np.cumsum(lens, out=off[1:])
        total = int(off[-1])
        base_flat = rng.choice(np.frombuffer(b"ACGTNacgt*=", np.uint8),
                               total).astype(np.uint8)
        qual_flat = rng.randint(0, 120, total).astype(np.uint8)
        flag = rng.randint(0, 4096, m).astype(np.int32)
        rg = (rng.randint(0, n_rg + 1, m) - 1).astype(np.int32)
        rg_present = (rng.rand(n_rg) < 0.8).astype(np.uint8)
        cond_prior = rng.randint(1, 90, (n_rg, 94)).astype(np.int32)
        d_cyc = rng.randint(-30, 30, (n_rg, 94, ncyc)).astype(np.int32)
        d_ctx = rng.randint(-30, 30, (n_rg, 94, 17)).astype(np.int32)
        quant = rng.randint(0, 94, 94).astype(np.uint8)
        sqq = rng.randint(0, 94, 255).astype(np.uint8)
        width = int(lens.max(initial=0)) + 2
        padded = np.zeros((m, width), np.uint8)
        qpadded = np.zeros((m, width), np.uint8)
        mask = np.arange(width)[None, :] < lens[:, None]
        padded[mask] = base_flat
        qpadded[mask] = qual_flat
        newq_p, mac_p = native.bqsr_apply_quals(
            padded, qpadded, lens.astype(np.int32), flag, rg, rg_present,
            cond_prior, d_cyc, d_ctx, quant, sqq, max_cycle)
        got = qual_flat.copy()
        mac_r = native.bqsr_apply_quals_ragged(
            base_flat, got, off, flag, rg, rg_present, cond_prior, d_cyc,
            d_ctx, quant, sqq, max_cycle)
        cases += 1
        if mac_r != mac_p or not np.array_equal(got, newq_p[mask]):
            div += 1
    return cases, div


def sweep_dedup_score_upos(seeds=40):
    from elprep_tpu import native
    from elprep_tpu.core.batch import Ragged
    from elprep_tpu.ops import readstats

    cases = div = 0
    ops_pool = np.frombuffer(b"MIDNSHP=X", np.uint8)
    for seed in range(seeds):
        rng = np.random.RandomState(3000 + seed)
        n = int(rng.randint(1, 2000))
        n_ops_row = rng.randint(0, 9, n)
        cig_off = np.zeros(n + 1, np.int64)
        np.cumsum(n_ops_row, out=cig_off[1:])
        total_ops = int(cig_off[-1])
        cig_op = rng.choice(ops_pool, total_ops).astype(np.uint8)
        for i in range(n):
            if n_ops_row[i] >= 2 and rng.rand() < 0.6:
                cig_op[cig_off[i]] = ord("SH"[int(rng.randint(2))])
                cig_op[cig_off[i + 1] - 1] = ord("SH"[int(rng.randint(2))])
        cig_len = rng.randint(1, 80, total_ops).astype(np.int32)
        qlens = rng.randint(0, 180, n)
        qual_off = np.zeros(n + 1, np.int64)
        np.cumsum(qlens, out=qual_off[1:])
        qual = rng.randint(0, 120, int(qual_off[-1])).astype(np.uint8)
        pos = rng.randint(1, 1 << 28, n).astype(np.int32)
        flag = (rng.randint(0, 2, n) * 0x10).astype(np.int32)
        upos_n, score_n = native.dedup_score_upos(
            qual, qual_off, cig_len, cig_op, cig_off, pos, flag)
        op_class, op_len, n_ops = readstats.pad_cigars(
            Ragged(cig_len, cig_off), Ragged(cig_op, cig_off))
        qp, ql = readstats.pad_quals(Ragged(qual, qual_off))
        upos_j = np.asarray(readstats.unclipped_position(
            pos, flag, op_class, op_len, n_ops))
        score_j = np.asarray(readstats.phred_score(qp, ql))
        cases += 1
        if (not np.array_equal(upos_n, upos_j)
                or not np.array_equal(score_n, score_j)):
            div += 1
    return cases, div


def _np_unpack_nibble(bp, lut, L):
    hi = (bp >> 4).astype(np.uint8)
    lo = (bp & 0xF).astype(np.uint8)
    idx = np.stack([hi, lo], axis=2).reshape(bp.shape[0], -1)[:, :L]
    return lut[idx]


def sweep_packed(seeds=60):
    """Volume sweep of the HOST pack side against an exact numpy mirror
    of the device unpack (the jnp unpack itself is pinned to these same
    semantics on fixed shapes in tests/test_packed.py; eager per-shape
    jnp here would recompile hundreds of tiny programs)."""
    from elprep_tpu.ops import packed

    cases = div = 0
    for seed in range(seeds):
        rng = np.random.RandomState(4000 + seed)
        for _ in range(8):
            n = int(rng.randint(1, 1500))
            L = int(rng.randint(1, 260))
            nsym = int(rng.randint(1, 17))
            alphabet = rng.choice(256, nsym, replace=False).astype(np.uint8)
            arr = rng.choice(alphabet, (n, L)).astype(np.uint8)
            bp, lut = packed.pack_nibble_dict(arr)
            out = _np_unpack_nibble(bp, lut, L)
            mask = rng.rand(n, L) < rng.rand()
            mout = np.unpackbits(packed.pack_bits(mask), axis=1)[:, :L].astype(bool)
            cases += 1
            if not (np.array_equal(out, arr) and np.array_equal(mout, mask)):
                div += 1
    return cases, div


def main():
    for name, fn in (("padded_to_ragged", sweep_padded_to_ragged),
                     ("apply_ragged", sweep_apply_ragged),
                     ("dedup_score_upos", sweep_dedup_score_upos),
                     ("packed_transfer", sweep_packed)):
        cases, div = fn()
        print(f"{name}: {cases} cases, {div} divergences")
        assert div == 0, name


if __name__ == "__main__":
    main()
