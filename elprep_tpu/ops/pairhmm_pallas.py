"""Pallas TPU kernel for the PairHMM wavefront.

The jnp version (ops/pairhmm.py) runs the anti-diagonal scan as ~500
XLA ops with state round-tripping through HBM between steps. This
kernel keeps the six diagonal state vectors resident in VMEM for the
whole scan: one `pallas_call` per 128-pair tile, a `fori_loop` over
diagonals inside, VPU ops of shape [n_pad, 128] per step.

Layout: pairs on lanes (last dim, 128), diagonal index i on sublanes.
The per-pair final-row accumulation uses a masked reduction over
sublanes instead of a per-lane gather (TPUs hate cross-lane gathers).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hc import tables

LANE = 128
# host-side encoding for 'N' bases: any sum of two base codes stays far
# below this unless one of them is the sentinel, making the kernel's
# "match or either-is-N" test one add + one compare
N_SENTINEL = np.float32(1000.0)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _kernel(x_ref, hbp_ref, mp_ref, nmp_ref, m2m_ref, m2i_ref,
            rl_ref, hl_ref, init_ref, acc_ref,
            md1, md2, id1, id2, dd1, dd2, hbs, acc2d,
            *, n_pad: int, lh_pad: int, pad_off: int, n_steps: int):
    i2m = jnp.float32(tables.INDEL_TO_MATCH)
    i2i = jnp.float32(tables.INDEL_TO_INDEL)

    iota_i = jax.lax.broadcasted_iota(jnp.int32, (n_pad, LANE), 0)
    x = x_ref[:]            # [n_pad, LANE] f32 (read bases as floats)
    mp = mp_ref[:]
    nmp = nmp_ref[:]
    m2m = m2m_ref[:]
    m2i = m2i_ref[:]
    rl = rl_ref[:]          # [1, LANE] int32
    hl = hl_ref[:]
    init = init_ref[:]      # [1, LANE] f32

    md1[:] = jnp.zeros((n_pad, LANE), jnp.float32)
    md2[:] = jnp.zeros((n_pad, LANE), jnp.float32)
    id1[:] = jnp.zeros((n_pad, LANE), jnp.float32)
    id2[:] = jnp.zeros((n_pad, LANE), jnp.float32)
    dd2[:] = jnp.zeros((n_pad, LANE), jnp.float32)
    # diagonal d=0: D[0,0] = initial
    dd1[:] = jnp.where(iota_i == 0, init, 0.0)
    acc2d[:] = jnp.zeros((n_pad, LANE), jnp.float32)

    # destination-row coefficients pre-shifted up once so each recurrence
    # rolls ONE combined operand: roll(A * c_up)[i] == A[i-1] * c[i]
    m2m_up = pltpu.roll(m2m, n_pad - 1, axis=0)  # roll by -1 (cyclic)
    m2i_up = pltpu.roll(m2i, n_pad - 1, axis=0)
    # The probability arrays carry structural zeros at row 0 and the pad
    # rows past each pair's read length (sentinel table rows, see
    # pairhmm_pallas_u8), and i2iv pins its last row to zero and row 0 to
    # one. Together these make every roll wraparound land as an exact
    # zero and fold the D[0][j] = init boundary into the recurrence
    # itself, so the per-diagonal row-0/row-boundary selects of the
    # earlier kernel revision disappear:
    #   M[0] = prior[0] * wrap = 0        (prior row 0 is 0)
    #   I[0] = 0*m2i[0->wrap] + Id1[-1]*i2iv[-1] = 0
    #   D[0] = Md1[0]*m2i[0] + Dd1[0]*1.0 = init   (M row 0 is always 0)
    i2iv = jnp.where(iota_i == 0, 1.0,
                     jnp.where(iota_i == n_pad - 1, 0.0, i2i))
    # diagonal-invariant mask pieces hoisted out of the step loop
    fin_row = iota_i == rl          # [n_pad, LANE]
    # haplotype diagonal window: instead of re-slicing [n_pad, LANE] at a
    # dynamic row offset every step, keep the window in scratch and shift
    # it down one row per diagonal, loading only the single new top row
    hbs[:] = hbp_ref[pl.ds(pad_off + lh_pad, n_pad), :]

    def inner(d, p1m, p1i, p1d, p2m, p2i, p2d):
        """One diagonal: reads d-1 states from p1*, d-2 states from p2*,
        and writes the new diagonal IN PLACE into p2* (whose values are
        dead after their single use) — the caller swaps buffer roles, so
        no state copies are needed."""
        new_row = hbp_ref[pl.ds(pad_off + lh_pad - d, 1), :]   # [1, LANE]
        hb = jnp.where(iota_i == 0, new_row,
                       pltpu.roll(hbs[:], 1, axis=0))
        hbs[:] = hb
        # 'N' bases are encoded as N_SENTINEL (1000.0) by the host, so
        # "equal or either is N" is one add + one compare
        is_match = (x == hb) | ((x + hb) >= N_SENTINEL)
        prior = jnp.where(is_match, mp, nmp)
        Md1 = p1m[:]
        Id1 = p1i[:]
        Dd1 = p1d[:]
        M_cur = prior * pltpu.roll(
            p2m[:] * m2m_up + (p2i[:] + p2d[:]) * i2m, 1, axis=0)
        I_cur = pltpu.roll(Md1 * m2i_up + Id1 * i2iv, 1, axis=0)
        D_cur = Md1 * m2i + Dd1 * i2iv
        # final-row accumulation: masked add into a 2D accumulator (one
        # sublane reduction AFTER the loop instead of one per diagonal)
        j_final = d - rl  # [1, LANE]
        fin_mask = fin_row & (j_final >= 1) & (j_final <= hl)
        acc2d[:] = acc2d[:] + jnp.where(fin_mask, M_cur + I_cur, 0.0)
        p2m[:] = M_cur
        p2i[:] = I_cur
        p2d[:] = D_cur

    def step4(k, _):
        # four diagonals per loop iteration (Mosaic's fori_loop does not
        # support unroll>1; the manual unroll both halves per-iteration
        # bookkeeping and makes the ping-pong swap static). Diagonals
        # beyond n_steps contribute nothing to acc (their fin_mask is
        # empty), so the padding to a multiple of four is safe.
        d = 4 * k + 1
        inner(d, md1, id1, dd1, md2, id2, dd2)
        inner(d + 1, md2, id2, dd2, md1, id1, dd1)
        inner(d + 2, md1, id1, dd1, md2, id2, dd2)
        inner(d + 3, md2, id2, dd2, md1, id1, dd1)
        return 0

    # diagonals past this tile's max(rl + hl) cannot contribute (every
    # pair's fin_mask is empty there), so the loop stops at the tile's
    # own wavefront extent instead of the padded shape bound
    lim = jnp.max(rl + hl)
    jax.lax.fori_loop(0, jnp.minimum((lim + 3) // 4, (n_steps + 3) // 4),
                      step4, 0)
    acc_ref[:] = jnp.sum(acc2d[:], axis=0, keepdims=True)


# f64 arithmetic then ONE f32 cast — bit-identical to the former
# host-side fills of the f32 kernel inputs. Each table carries one extra
# SENTINEL row of exact zeros: pad rows (row 0 and rows past the read
# length) index it, giving the kernel structural zeros that replace its
# per-diagonal boundary selects.
_MP_TABLE = np.append(1.0 - tables.QUAL_TO_ERROR_PROB, 0.0).astype(np.float32)
_NMP_TABLE = np.append(tables.QUAL_TO_ERROR_PROB / 3.0, 0.0).astype(np.float32)
_M2M_TABLE = np.append(tables.MATCH_TO_MATCH, 0.0).astype(np.float32)
_M2I_TABLE = np.append(tables.MATCH_TO_INDEL, 0.0).astype(np.float32)
_Q_SENT = np.uint8(len(_MP_TABLE) - 1)
_R_SENT = np.uint8(len(_M2M_TABLE) - 1)


@functools.partial(jax.jit, static_argnames=("n_pad", "lh_pad", "pad_off"))
def pairhmm_pallas_u8(x_u8, hbp_u8, mq_u8, rrl_u8, rl, hl, init,
                      n_pad: int, lh_pad: int, pad_off: int):
    """pairhmm_pallas fed with uint8 inputs: bases (raw ASCII), modified
    quals, and per-base tandem-repeat lengths. The f32 probability
    arrays derive ON DEVICE by table lookup — host→device transfer drops
    ~5x, which dominates dispatch cost on high-latency links."""
    x = jnp.where(x_u8 == np.uint8(ord("N")), N_SENTINEL,
                  x_u8.astype(jnp.float32))
    hbp = jnp.where(hbp_u8 == np.uint8(ord("N")), N_SENTINEL,
                    hbp_u8.astype(jnp.float32))
    # pad rows (row 0 and rows past each pair's read length) take the
    # sentinel table index so their probabilities are exact zeros — the
    # kernel's select-free boundary handling relies on this
    row = jax.lax.broadcasted_iota(jnp.int32, mq_u8.shape, 0)
    pad_row = (row == 0) | (row > rl)
    mq_u8 = jnp.where(pad_row, _Q_SENT, mq_u8)
    rrl_u8 = jnp.where(pad_row, _R_SENT, rrl_u8)
    # tables precomputed in f64 then cast once, so every gathered value
    # is bit-identical to the host-filled f32 arrays (qual-0 pad rows:
    # error prob 1.0 -> mp exactly 0, like the zero-padded f32 form;
    # nmp/m2m/m2i pad values differ from the old zeros but only feed
    # rows past the read length, which never reach the accumulated row).
    # Lookups run as one-hot matmuls — exact (one product by 1.0 per
    # row, the rest exact zeros) and MXU-friendly, where plain gathers
    # lower poorly on TPU.
    oh_q = jax.nn.one_hot(mq_u8, len(_MP_TABLE), dtype=jnp.float32, axis=-1)
    mp = oh_q @ jnp.asarray(_MP_TABLE)
    nmp = oh_q @ jnp.asarray(_NMP_TABLE)
    oh_r = jax.nn.one_hot(rrl_u8, len(_M2M_TABLE), dtype=jnp.float32, axis=-1)
    m2m = oh_r @ jnp.asarray(_M2M_TABLE)
    m2i = oh_r @ jnp.asarray(_M2I_TABLE)
    return pairhmm_pallas(x, hbp, mp, nmp, m2m, m2i, rl, hl, init,
                          n_pad=n_pad, lh_pad=lh_pad, pad_off=pad_off)


@functools.partial(jax.jit, static_argnames=("n_pad", "lh_pad", "pad_off"))
def pairhmm_pallas(x, hbp, mp, nmp, m2m, m2i, rl, hl, init,
                   n_pad: int, lh_pad: int, pad_off: int):
    """Batched PairHMM forward accumulation.

    Shapes (B_pad a multiple of 128): x/mp/nmp/m2m/m2i [n_pad, B_pad] f32;
    hbp [pad_off+lh_pad+pad_off, B_pad] f32; rl/hl [1, B_pad] i32;
    init [1, B_pad] f32. Returns acc [1, B_pad] f32."""
    B_pad = x.shape[1]
    n_steps = (n_pad - 1) + lh_pad
    grid = (B_pad // LANE,)

    def tile(i):
        return (0, i)

    kern = functools.partial(_kernel, n_pad=n_pad, lh_pad=lh_pad,
                             pad_off=pad_off, n_steps=n_steps)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_pad, LANE), tile, memory_space=pltpu.VMEM),      # x
            pl.BlockSpec((hbp.shape[0], LANE), tile, memory_space=pltpu.VMEM),  # hbp
            pl.BlockSpec((n_pad, LANE), tile, memory_space=pltpu.VMEM),      # mp
            pl.BlockSpec((n_pad, LANE), tile, memory_space=pltpu.VMEM),      # nmp
            pl.BlockSpec((n_pad, LANE), tile, memory_space=pltpu.VMEM),      # m2m
            pl.BlockSpec((n_pad, LANE), tile, memory_space=pltpu.VMEM),      # m2i
            pl.BlockSpec((1, LANE), tile, memory_space=pltpu.VMEM),          # rl
            pl.BlockSpec((1, LANE), tile, memory_space=pltpu.VMEM),          # hl
            pl.BlockSpec((1, LANE), tile, memory_space=pltpu.VMEM),          # init
        ],
        out_specs=pl.BlockSpec((1, LANE), tile, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_pad, LANE), jnp.float32) for _ in range(8)],
        interpret=interpret,
    )(x, hbp, mp, nmp, m2m, m2i, rl, hl, init)


def pairhmm_pallas_pairs(reads: Sequence[Tuple[bytes, np.ndarray, int]],
                         haps: Sequence[bytes],
                         pair_r: np.ndarray,
                         pair_h: np.ndarray) -> np.ndarray:
    """log10 likelihood per explicit (read, hap) pair via the Pallas
    kernel — pairs from many assembly regions share one dispatch."""
    from . import pairhmm as ph

    B = len(pair_r)
    if B == 0:
        return np.zeros(0, np.float64)
    # bucket padded shapes so groups share compiled programs: coarse
    # buckets keep the number of distinct kernels tiny across a run
    lr_pad = _round_up(max(len(reads[r][1]) for r in pair_r), 32)
    lh_pad = _round_up(max(len(haps[h]) for h in pair_h), 128)
    n_pad = _round_up(lr_pad + 1, 8)
    pad_off = n_pad + 1
    B_pad = LANE
    while B_pad < B:
        B_pad *= 2

    # uint8 inputs only — bases (raw ASCII), modified quals, repeat
    # lengths; the device derives the f32 probability arrays by table
    # lookup (pairhmm_pallas_u8), cutting host→device transfer ~5x
    x = np.zeros((n_pad, B_pad), np.uint8)
    mq2 = np.zeros((n_pad, B_pad), np.uint8)
    rrl = np.zeros((n_pad, B_pad), np.uint8)
    hb_rows = _round_up(pad_off + lh_pad + pad_off, 8)
    hbp = np.zeros((hb_rows, B_pad), np.uint8)
    rl = np.ones((1, B_pad), np.int32)
    hl = np.ones((1, B_pad), np.int32)
    init = np.ones((1, B_pad), np.float32)

    per_read: dict = {}
    for r in set(int(v) for v in pair_r):
        seq, qual, mapq = reads[r]
        per_read[r] = (np.frombuffer(seq, np.uint8),
                       ph.modified_qualities(qual, mapq).astype(np.uint8),
                       ph.repeat_lengths_for_read(seq))
    hap_u8 = [np.frombuffer(h, np.uint8) for h in haps]
    for b in range(B):
        r, h = int(pair_r[b]), int(pair_h[b])
        seq_u8, mq_a, rl_a = per_read[r]
        lr = len(seq_u8)
        hap = hap_u8[h]
        lh = len(hap)
        x[1 : lr + 1, b] = seq_u8
        mq2[1 : lr + 1, b] = mq_a
        rrl[1 : lr + 1, b] = rl_a
        hbp[pad_off + (lh_pad - lh) : pad_off + lh_pad, b] = hap[::-1]
        rl[0, b] = lr
        hl[0, b] = lh
        init[0, b] = np.float32(2.0 ** ph.F32_INITIAL_POW / lh)

    acc = np.asarray(pairhmm_pallas_u8(
        jnp.asarray(x), jnp.asarray(hbp), jnp.asarray(mq2), jnp.asarray(rrl),
        jnp.asarray(rl), jnp.asarray(hl), jnp.asarray(init),
        n_pad=n_pad, lh_pad=lh_pad, pad_off=pad_off,
    ))[0]
    log10_init = ph.F32_INITIAL_POW * np.log10(2.0)
    with np.errstate(divide="ignore"):
        out = np.log10(acc[:B].astype(np.float64)) - log10_init
    bad = ~np.isfinite(out) | (out < ph.F32_RESCUE_LOG10)
    for b in np.flatnonzero(bad):
        seq, qual, mapq = reads[int(pair_r[b])]
        out[b] = ph.pairhmm_f64_diag(seq, qual, mapq, haps[int(pair_h[b])])
    return out


def pairhmm_pallas_batch(reads: Sequence[Tuple[bytes, np.ndarray, int]],
                         haps: Sequence[bytes]) -> np.ndarray:
    """Drop-in equivalent of ops.pairhmm.pairhmm_f32_batch using the
    Pallas kernel (log10 likelihoods [n_reads, n_haps], f64 rescue)."""
    n_reads, n_haps = len(reads), len(haps)
    if n_reads == 0 or n_haps == 0:
        return np.zeros((n_reads, n_haps), np.float64)
    pair_r = np.repeat(np.arange(n_reads), n_haps)
    pair_h = np.tile(np.arange(n_haps), n_reads)
    return pairhmm_pallas_pairs(reads, haps, pair_r, pair_h
                                ).reshape(n_reads, n_haps)
