"""BQSR device kernels: per-base covariates + dense-table accumulation.

elPrep builds three hash tables keyed by {Qual, Covariate, ReadGroup}
via fork-join map merges (reference: filters/bqsr.go:180-223, 467-551).
Here the tables are *dense* device arrays

    QualityScores: [nRG, 94]            (qual 0..93)
    Cycles:        [nRG, 94, 2*maxCycle+1]
    Contexts:      [nRG, 94, 16]        (2-mer b1*4+b2)

accumulated with scatter-adds over per-base index/error vectors — and
mergeable across chips with one psum. Covariates are computed on device:

- cycle: strand/mate-signed base cycle (bqsr.go:376-386);
- context: rolling 2-mer key over the qual-tail-masked, strand-oriented
  sequence (bqsr.go:64-146, 301-362). For contextSize=2 the rolling
  machinery reduces to: forward reads key[i] = f(b[i-1], b[i]), reversed
  reads key[i] = f(comp(b[i+1]), comp(b[i])), key invalid (-1) when
  either base is outside the qual window or not ACGT;
- SNP events: per-base reference position from the CIGAR (cumulative
  read/ref-consumed lengths + searchsorted), then one gather from the
  flattened reference class codes (bqsr.go:254-285).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .readstats import CIGAR_OPS, OP_CLASS

MIN_INTERESTING_QUAL = 6  # (reference: bqsr.go:698)
LOW_QUALITY_TAIL = 2  # (reference: bqsr.go:301)
NQUAL = 94  # qual 0..93 (maxQualityScore, bqsr.go:555)
NCTX = 16

# seq char -> simple base index (A0 C1 G2 T3, else -1)
# (reference: bqsr.go:55-62; '*'/lowercase can't occur in normalized SEQ)
_BASE_IDX = np.full(256, -1, np.int32)
for _i, _c in enumerate(b"ACGT"):
    _BASE_IDX[_c] = _i
_BASE_IDX[ord("a")] = 0
_BASE_IDX[ord("c")] = 1
_BASE_IDX[ord("g")] = 2
_BASE_IDX[ord("t")] = 3
_BASE_IDX[ord("*")] = 0

# seq char -> baseToIntMap class (reference: bqsr.go:247-252)
_BASE_INT = np.zeros(256, np.int32)
for _b, _v in ((b"aA*", 1), (b"cC", 2), (b"gG", 3), (b"tT", 4)):
    for _c in _b:
        _BASE_INT[_c] = _v

_READ_CONS = np.zeros(len(CIGAR_OPS), np.int32)
for _c in b"MIS=X":
    _READ_CONS[OP_CLASS[_c]] = 1
_REF_CONS = np.zeros(len(CIGAR_OPS), np.int32)
for _c in b"MDN=X":
    _REF_CONS[OP_CLASS[_c]] = 1
_IS_MX = np.zeros(len(CIGAR_OPS), np.int32)
for _c in b"M=X":
    _IS_MX[OP_CLASS[_c]] = 1

REVERSED = 0x10
LAST = 0x80


def _cycle_covariates(flag, seq_len, L):
    """Per-base signed cycle (reference: bqsr.go:376-386). Returns [N, L]."""
    reversed_ = (flag & REVERSED) >> 4
    last = (flag & LAST) >> 7
    read_order_factor = 1 - 2 * last
    cycle_factor = read_order_factor + reversed_ * (seq_len - 1) * read_order_factor
    increment = (1 - 2 * reversed_) * read_order_factor
    idx = jax.lax.broadcasted_iota(jnp.int32, (flag.shape[0], L), 1)
    return cycle_factor[:, None] + idx * increment[:, None]


def _context_keys16(base, qual, seq_len, flag, L):
    """Per-base 2-mer context as b1*4+b2 in 0..15, or -1 if invalid.

    Encodes computeStrandedClippedSeq + contextWith for contextSize=2
    (reference: bqsr.go:87-146, 312-362). Returns [N, L] int32.
    """
    n = flag.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, L), 1)
    valid = cols < seq_len[:, None]
    bidx = jnp.asarray(_BASE_IDX)[base.astype(jnp.int32)]

    hq = valid & (qual.astype(jnp.int32) > LOW_QUALITY_TAIL)
    # leftPos = first hq index (or seq_len if none); rightPos = last hq index
    big = jnp.where(hq, cols, jnp.int32(2**30))
    left_pos = jnp.min(big, axis=1)
    neg = jnp.where(hq, cols, -1)
    right_pos = jnp.max(neg, axis=1)
    in_window = (cols >= left_pos[:, None]) & (cols <= right_pos[:, None])
    # base value as seen by contextWith ('N' outside window)
    b = jnp.where(in_window & (bidx >= 0), bidx, -1)

    is_rev = ((flag & REVERSED) != 0)[:, None]
    comp = jnp.where(b >= 0, 3 - b, -1)

    # forward: (b[i-1], b[i]); reversed: (comp(b[i+1]), comp(b[i]))
    b_prev = jnp.concatenate([jnp.full((n, 1), -1, b.dtype), b[:, :-1]], axis=1)
    c_next = jnp.concatenate([comp[:, 1:], jnp.full((n, 1), -1, b.dtype)], axis=1)
    # reversed reads: position L'-1 must be invalid (key_rc[0] = -1)
    last_col = cols == (seq_len - 1)[:, None]

    b1 = jnp.where(is_rev, c_next, b_prev)
    b2 = jnp.where(is_rev, comp, b)
    bad = (b1 < 0) | (b2 < 0) | ~valid
    bad = bad | jnp.where(is_rev, last_col, cols == 0)
    key = b1 * 4 + b2
    return jnp.where(bad, -1, key)


def _per_base_refpos_and_mx(pos, op_class, op_len, L):
    """For each read base i: (global-less) reference position pos-1+offset,
    and whether the covering op is M/=/X. Returns (refpos [N,L] int32,
    is_mx [N,L] bool, covered [N,L] bool)."""
    rc = jnp.asarray(_READ_CONS)[op_class.astype(jnp.int32)] * op_len
    fc = jnp.asarray(_REF_CONS)[op_class.astype(jnp.int32)] * op_len
    read_incl = jnp.cumsum(rc, axis=1)
    ref_excl = jnp.cumsum(fc, axis=1) - fc
    read_excl = read_incl - rc

    cols = jax.lax.broadcasted_iota(jnp.int32, (pos.shape[0], L), 1)

    # op index covering base i: first k with read_incl[k] > i
    def find(row_incl, idxs):
        return jnp.searchsorted(row_incl, idxs, side="right")

    k = jax.vmap(find)(read_incl, cols)
    k = jnp.minimum(k, op_class.shape[1] - 1)
    covered = cols < read_incl[:, -1][:, None]
    off_in_op = cols - jnp.take_along_axis(read_excl, k, axis=1)
    refpos = (pos - 1)[:, None] + jnp.take_along_axis(ref_excl, k, axis=1) + off_in_op
    opk = jnp.take_along_axis(op_class.astype(jnp.int32), k, axis=1)
    is_mx = jnp.asarray(_IS_MX)[opk] > 0
    return refpos, is_mx & covered, covered


def _covariate_codes(base, qual, seq_len, flag, pos, rg, refoff, skip,
                     op_class, op_len, ref_classes, max_cycle: int,
                     n_rg: int):
    """Shared elementwise prelude of the table build: per-base flat table
    indices (sentinel = table size for masked elements), the mismatch
    indicator, and the cycle-range check value. Traced inside both the
    device-scatter kernel and the host-bincount code path."""
    N, L = base.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (N, L), 1)
    valid = cols < seq_len[:, None]

    bidx = jnp.asarray(_BASE_IDX)[base.astype(jnp.int32)]
    q = qual.astype(jnp.int32)

    cycles = _cycle_covariates(flag, seq_len, L)
    ctx16 = _context_keys16(base, q, seq_len, flag, L)

    refpos, is_mx, covered = _per_base_refpos_and_mx(pos, op_class, op_len, L)
    gpos = refoff[:, None] + refpos
    gpos = jnp.clip(gpos, 0, ref_classes.shape[0] - 1)
    refc = ref_classes[gpos].astype(jnp.int32)
    readc = jnp.asarray(_BASE_INT)[base.astype(jnp.int32)]
    err = jnp.where(is_mx & (readc != refc), 1, 0)

    mask = valid & ~skip & (bidx >= 0) & (q >= MIN_INTERESTING_QUAL)
    max_abs_cycle = jnp.max(jnp.where(valid, jnp.abs(cycles), 0))

    rgq = rg[:, None] * NQUAL + q  # [N, L]
    ncyc = 2 * max_cycle + 1
    qs_size = n_rg * NQUAL
    cyc_size = qs_size * ncyc
    ctx_size = qs_size * NCTX

    qs_idx = jnp.where(mask, rgq, qs_size).reshape(-1)
    cyc_idx = jnp.where(mask, rgq * ncyc + (cycles + max_cycle),
                        cyc_size).reshape(-1)
    cmask = mask & (ctx16 >= 0)
    ctx_idx = jnp.where(cmask, rgq * NCTX + ctx16, ctx_size).reshape(-1)
    return (qs_idx, cyc_idx, ctx_idx, err.reshape(-1), max_abs_cycle,
            qs_size, cyc_size, ctx_size)


@functools.partial(jax.jit, static_argnames=("max_cycle", "n_rg"))
def recalibrate_codes(
    base, qual, seq_len, flag, pos, rg, refoff, skip, op_class, op_len,
    ref_classes, max_cycle: int, n_rg: int,
):
    """Elementwise covariate codes only — the caller accumulates with
    np.bincount on the host. On CPU backends this replaces the XLA
    scatter-add (scalarized there, ~780 ns/base measured at WGS scale)
    with a vectorized histogram at ~5 ns/base; tables are identical
    integer counts either way."""
    (qs_idx, cyc_idx, ctx_idx, err, max_abs_cycle,
     _, _, _) = _covariate_codes(base, qual, seq_len, flag, pos, rg, refoff,
                                 skip, op_class, op_len, ref_classes,
                                 max_cycle, n_rg)
    return qs_idx, cyc_idx, ctx_idx, err, max_abs_cycle


@functools.partial(jax.jit, static_argnames=("max_cycle", "n_rg"))
def recalibrate_tables(
    base, qual, seq_len, flag, pos, rg, refoff, skip, op_class, op_len, ref_classes,
    max_cycle: int, n_rg: int,
):
    """Accumulate the three BQSR tables for one batch of clipped reads.

    Returns (qs_obs, qs_mism, cyc_obs, cyc_mism, ctx_obs, ctx_mism,
    max_abs_cycle) — int32 dense tables (flattened) + the cycle-range
    check value (reference panics when |cycle| > maxCycle, bqsr.go:364-369).
    """
    (qs_idx, cyc_idx, ctx_idx, err, max_abs_cycle,
     qs_size, cyc_size, ctx_size) = _covariate_codes(
        base, qual, seq_len, flag, pos, rg, refoff, skip, op_class, op_len,
        ref_classes, max_cycle, n_rg)

    ones = jnp.ones_like(err)
    qs_obs = jnp.zeros(qs_size, jnp.int32).at[qs_idx].add(ones, mode="drop")
    qs_mism = jnp.zeros(qs_size, jnp.int32).at[qs_idx].add(err, mode="drop")

    cyc_obs = jnp.zeros(cyc_size, jnp.int32).at[cyc_idx].add(ones, mode="drop")
    cyc_mism = jnp.zeros(cyc_size, jnp.int32).at[cyc_idx].add(err, mode="drop")

    ctx_obs = jnp.zeros(ctx_size, jnp.int32).at[ctx_idx].add(ones, mode="drop")
    ctx_mism = jnp.zeros(ctx_size, jnp.int32).at[ctx_idx].add(err, mode="drop")

    return qs_obs, qs_mism, cyc_obs, cyc_mism, ctx_obs, ctx_mism, max_abs_cycle


@functools.partial(jax.jit, static_argnames=("max_cycle", "n_rg", "width"))
def recalibrate_tables_packed(
    base_packed, base_lut, qual, seq_len, flag, pos, rg, refoff, skip_packed,
    op_class, op_len, ref_classes, max_cycle: int, n_rg: int, width: int,
):
    """recalibrate_tables over PACKED base/skip columns (ops/packed):
    the 4-bit-dictionary base matrix and bit-packed skip mask unpack
    on-device, so the dense [n, width] forms never cross the
    host->device link (~60% of the fused step's per-read transfer).
    Bit-identical to recalibrate_tables on the unpacked columns
    (tests/test_packed.py)."""
    from .packed import unpack_bits, unpack_nibble_dict

    base = unpack_nibble_dict(base_packed, base_lut, width)
    skip = unpack_bits(skip_packed, width)
    return recalibrate_tables(
        base, qual, seq_len, flag, pos, rg, refoff, skip, op_class, op_len,
        ref_classes, max_cycle=max_cycle, n_rg=n_rg)


@functools.partial(jax.jit, static_argnames=("max_cycle",))
def apply_bqsr(
    base, qual, seq_len, flag, rg, rg_present,
    cond_prior, d_cyc, d_ctx, quant_lut, sqq_lut,
    max_cycle: int,
):
    """Recalibrate QUAL scores (reference: bqsr.go:936-1006).

    All delta tables are integer-valued (the hierarchical estimate
    condPrior + Δcycle + Δcontext is a sum of integer empirical
    qualities, see filters/bqsr.py), so this is pure int gather+add:

    - cond_prior [nRG, 94] int32 (EQ of the {rg,qual} entry, or the RG
      fallback when absent)
    - d_cyc [nRG, 94, 2*maxCycle+1] int32 (EQ - condPrior, 0 if absent)
    - d_ctx [nRG, 94, 17] int32 (slot 16 = invalid context -> 0)
    - quant_lut [94] uint8, sqq_lut [255] uint8
    """
    N, L = base.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (N, L), 1)
    valid = cols < seq_len[:, None]
    q = qual.astype(jnp.int32)

    cycles = _cycle_covariates(flag, seq_len, L)
    ctx16 = _context_keys16(base, q, seq_len, flag, L)
    ctx_idx = jnp.where(ctx16 >= 0, ctx16, 16)
    cyc_idx = jnp.clip(cycles + max_cycle, 0, 2 * max_cycle)

    rgc = jnp.clip(rg, 0, cond_prior.shape[0] - 1)
    qc = jnp.clip(q, 0, NQUAL - 1)
    est = (
        cond_prior[rgc[:, None], qc]
        + d_cyc[rgc[:, None], qc, cyc_idx]
        + d_ctx[rgc[:, None], qc, ctx_idx]
    )
    idx = jnp.clip(est, 1, 93)
    newq = sqq_lut[quant_lut[idx].astype(jnp.int32)].astype(jnp.int32)

    recal_mask = valid & (q >= MIN_INTERESTING_QUAL) & rg_present[rgc][:, None] & (rg >= 0)[:, None]
    out = jnp.where(recal_mask, newq, q)
    max_abs_cycle = jnp.max(jnp.where(valid, jnp.abs(cycles), 0))
    return out.astype(jnp.uint8), max_abs_cycle
