"""PairHMM read-vs-haplotype likelihoods.

Reference: filters/pairhmm.go — a float64 forward algorithm over three
matrices (match/insertion/deletion) with row-view inner loops
(:180-320). This module provides three implementations:

1. ``pairhmm_exact`` — scalar float64 with the reference's exact
   operation order (oracle + pedantic path);
2. ``pairhmm_f64_diag`` — numpy float64 anti-diagonal wavefront,
   vectorized along the diagonal (host production / rescue path);
3. ``pairhmm_f32_batch`` — jax float32 wavefront batched over
   (read, haplotype) pairs for the TPU (the GCUPS kernel). Pairs whose
   f32 result underflows are re-run through the f64 path, mirroring
   GATK's float-with-double-rescue strategy.

The anti-diagonal formulation: every cell (i, j) with i+j = d depends
only on diagonals d-1 and d-2, so each step is one vector op along the
diagonal — the natural mapping onto the TPU's VPU, replacing the
reference's per-cell scalar loop.

Transition coefficients are indexed by the *destination* row's read
base: matchToMatch/matchToIndel from tandem-repeat length
(pairhmm.go:104-162), indelToIndel = 0.1. Priors use
modifiedQuality = min(QUAL, MAPQ) with <18 -> 6 (pairhmm.go:77-86).
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence, Tuple

import numpy as np

from ..hc import tables

F32_INITIAL_POW = 100  # 2^100 fits float32 with headroom
F32_RESCUE_LOG10 = -25.0  # below this, recompute in f64 (underflow risk)


# ---------------------------------------------------------------------------
# Tandem repeats & per-base transition probabilities (pairhmm.go:88-162)
# ---------------------------------------------------------------------------


def _n_forward_reps(unit: bytes, s: bytes) -> int:
    n = 0
    ul = len(unit)
    while len(s) >= ul and s.startswith(unit):
        n += 1
        s = s[ul:]
    return n


def _n_backward_reps(unit: bytes, s: bytes) -> int:
    n = 0
    ul = len(unit)
    while len(s) >= ul and s.endswith(unit):
        n += 1
        s = s[: len(s) - ul]
    return n


def find_tandem_repeat_units(bases: bytes, offset: int) -> Tuple[bytes, int]:
    """(reference: pairhmm.go:104-153)"""
    offset1 = offset + 1
    max_bw = 0
    best_bw_unit = bases[offset:offset1]
    bw_test = bases[:offset1]
    for strlen in range(1, 9):
        repeat_offset = offset1 - strlen
        if repeat_offset < 0:
            break
        unit = bases[repeat_offset:offset1]
        max_bw = _n_backward_reps(unit, bw_test)
        if max_bw > 1:
            best_bw_unit = unit
            break
    best_unit = best_bw_unit
    max_rl = max_bw

    if offset1 < len(bases):
        max_fw = 0
        best_fw_unit = bases[offset1 : offset1 + 1]
        fw_test = bases[offset1:]
        for strlen in range(1, 9):
            repeat_offset = offset1 + strlen
            if repeat_offset > len(bases):
                break
            unit = bases[offset1:repeat_offset]
            max_fw = _n_forward_reps(unit, fw_test)
            if max_fw > 1:
                best_fw_unit = unit
                break
        if best_fw_unit != best_bw_unit:
            max_bw = _n_backward_reps(best_fw_unit, bases[:offset1])
        max_rl = max_fw + max_bw
        best_unit = best_fw_unit

    if max_rl > 20:
        max_rl = 20
    return best_unit, max_rl


def repeat_lengths_for_read(bases: bytes) -> np.ndarray:
    """Per-base tandem-repeat length, 21 sentinel on the last base
    (reference: pairhmm.go:155-162) — the uint8 form shipped to the
    device, which derives the transition probabilities by table lookup.
    Native fast path (C++ pairhmm_repeat_lengths; the loop below is its
    fuzzed oracle)."""
    from .. import native

    got = native.pairhmm_repeat_lengths(bases)
    if got is not None:
        return got
    return _repeat_lengths_for_read_py(bases)


def _repeat_lengths_for_read_py(bases: bytes) -> np.ndarray:
    n = len(bases)
    rl = np.empty(n, np.uint8)
    for i in range(n - 1):
        _, r = find_tandem_repeat_units(bases, i)
        rl[i] = r
    if n:
        rl[n - 1] = 21
    return rl


def match_probs_for_read(bases: bytes) -> Tuple[np.ndarray, np.ndarray]:
    """Per-base (matchToMatch, matchToIndel) (reference: pairhmm.go:155-162)."""
    rl = repeat_lengths_for_read(bases)
    return tables.MATCH_TO_MATCH[rl], tables.MATCH_TO_INDEL[rl]


def modified_qualities(qual: np.ndarray, mapq: int) -> np.ndarray:
    """(reference: pairhmm.go:77-86)"""
    q = np.minimum(qual.astype(np.int64), mapq)
    return np.where(q < 18, 6, q)


# ---------------------------------------------------------------------------
# 1. Exact scalar oracle (reference operation order)
# ---------------------------------------------------------------------------


def pairhmm_exact(seq: bytes, qual: np.ndarray, mapq: int, hap: bytes) -> float:
    """Bit-exact float64 forward pass in the reference's evaluation order
    (pairhmm.go:225-295). O(len(seq)*len(hap)) scalar — oracle use only."""
    lr, lh = len(qual), len(hap)
    m2m_arr, m2i_arr = match_probs_for_read(seq)
    mq = modified_qualities(qual, mapq)
    match = np.zeros((lr + 1, lh + 1), np.float64)
    ins = np.zeros((lr + 1, lh + 1), np.float64)
    dele = np.zeros((lr + 1, lh + 1), np.float64)
    initial = tables.INITIAL_CONDITION / float(lh)
    dele[0, :] = initial
    i2m = tables.INDEL_TO_MATCH
    i2i = tables.INDEL_TO_INDEL
    for i in range(lr):
        x = seq[i]
        ep = tables.QUAL_TO_ERROR_PROB[mq[i]]
        match_prior = 1.0 - ep
        non_match_prior = ep / 3.0
        m2m = m2m_arr[i]
        m2i = m2i_arr[i]
        for j in range(lh):
            y = hap[j]
            prior = match_prior if (x == y or x == ord("N") or y == ord("N")) else non_match_prior
            match[i + 1, j + 1] = prior * (
                match[i, j] * m2m + ins[i, j] * i2m + dele[i, j] * i2m
            )
            ins[i + 1, j + 1] = match[i, j + 1] * m2i + ins[i, j + 1] * i2i
            dele[i + 1, j + 1] = match[i + 1, j] * m2i + dele[i + 1, j] * i2i
    s = 0.0
    for j in range(1, lh + 1):
        s += match[lr, j] + ins[lr, j]
    return float(np.log10(s) - tables.INITIAL_CONDITION_LOG10)


# ---------------------------------------------------------------------------
# 2. Vectorized f64 wavefront (numpy, host)
# ---------------------------------------------------------------------------


def pairhmm_f64_diag(seq: bytes, qual: np.ndarray, mapq: int, hap: bytes) -> float:
    """Same result as pairhmm_exact up to f64 addition reordering along
    the diagonal (the per-cell products/sums keep the reference order;
    only the independent cells run as vector ops)."""
    lr, lh = len(qual), len(hap)
    m2m_a, m2i_a = match_probs_for_read(seq)
    mq = modified_qualities(qual, mapq)
    ep = tables.QUAL_TO_ERROR_PROB[mq]
    match_prior = 1.0 - ep
    non_match_prior = ep / 3.0
    # row-aligned (index i = matrix row, read base i-1); row 0 unused
    m2m = np.concatenate([[0.0], m2m_a])
    m2i = np.concatenate([[0.0], m2i_a])
    mp = np.concatenate([[0.0], match_prior])
    nmp = np.concatenate([[0.0], non_match_prior])
    x = np.concatenate([[0], np.frombuffer(seq, np.uint8)]).astype(np.int16)
    i2m = tables.INDEL_TO_MATCH
    i2i = tables.INDEL_TO_INDEL
    initial = tables.INITIAL_CONDITION / float(lh)

    hap_arr = np.frombuffer(hap, np.uint8).astype(np.int16)
    P = lr + 2
    rev_pad = np.zeros(P + lh + P, np.int16)
    rev_pad[P : P + lh] = hap_arr[::-1]

    n = lr + 1
    idx = np.arange(n)
    Md1 = np.zeros(n); Md2 = np.zeros(n)
    Id1 = np.zeros(n); Id2 = np.zeros(n)
    Dd1 = np.zeros(n); Dd2 = np.zeros(n)
    Dd1[0] = initial  # diagonal d=0: cell (0,0)
    acc = 0.0
    for d in range(1, lr + lh + 1):
        hb = rev_pad[P + lh - d : P + lh - d + n]
        is_match = (x == hb) | (x == ord("N")) | (hb == ord("N"))
        prior = np.where(is_match, mp, nmp)
        Ms2 = np.concatenate([[0.0], Md2[:-1]])
        Is2 = np.concatenate([[0.0], Id2[:-1]])
        Ds2 = np.concatenate([[0.0], Dd2[:-1]])
        Ms1 = np.concatenate([[0.0], Md1[:-1]])
        Is1 = np.concatenate([[0.0], Id1[:-1]])
        M_cur = prior * (Ms2 * m2m + Is2 * i2m + Ds2 * i2m)
        I_cur = Ms1 * m2i + Is1 * i2i
        D_cur = Md1 * m2i + Dd1 * i2i
        valid = idx <= d - 1  # j = d - i >= 1
        M_cur = np.where(valid, M_cur, 0.0)
        I_cur = np.where(valid, I_cur, 0.0)
        D_cur = np.where(valid, D_cur, 0.0)
        M_cur[0] = 0.0
        I_cur[0] = 0.0
        D_cur[0] = initial
        j_final = d - lr
        if 1 <= j_final <= lh:
            acc += M_cur[lr] + I_cur[lr]
        Md2, Id2, Dd2 = Md1, Id1, Dd1
        Md1, Id1, Dd1 = M_cur, I_cur, D_cur
    return float(np.log10(acc) - tables.INITIAL_CONDITION_LOG10)


# ---------------------------------------------------------------------------
# 3. Batched f32 wavefront (jax, TPU)
# ---------------------------------------------------------------------------


@functools.partial(__import__("jax").jit, static_argnames=("lr_pad", "lh_pad"))
def _pairhmm_f32_scan(
    x, hb_rev_pad, mp, nmp, m2m, m2i, read_len, hap_len, initial,
    lr_pad: int, lh_pad: int,
):
    """One scan over diagonals for a batch of (read, hap) pairs.

    Shapes: x [B, lr_pad+1] int16 (row-aligned read bases, row 0 = 0);
    hb_rev_pad [B, P+lh_pad+P]; mp/nmp/m2m/m2i [B, lr_pad+1] f32;
    read_len/hap_len [B] int32; initial [B] f32 (2^100/hap_len).
    Returns acc [B] f32 (sum of final-row match+insertion).
    """
    import jax
    import jax.numpy as jnp

    B = x.shape[0]
    n = lr_pad + 1
    P = lr_pad + 2
    idx = jnp.arange(n, dtype=jnp.int32)
    i2m = jnp.float32(tables.INDEL_TO_MATCH)
    i2i = jnp.float32(tables.INDEL_TO_INDEL)
    ord_n = jnp.int16(ord("N"))

    def shift1(a):
        return jnp.concatenate([jnp.zeros((B, 1), a.dtype), a[:, :-1]], axis=1)

    def step(carry, d):
        Md1, Md2, Id1, Id2, Dd1, Dd2, acc = carry
        start = P + lh_pad - d
        hb = jax.lax.dynamic_slice(hb_rev_pad, (0, start), (B, n))
        # per-pair alignment: hb was built so that index maps to each
        # pair's own hap_len (see host packing)
        is_match = (x == hb) | (x == ord_n) | (hb == ord_n)
        prior = jnp.where(is_match, mp, nmp)
        M_cur = prior * (shift1(Md2) * m2m + shift1(Id2) * i2m + shift1(Dd2) * i2m)
        I_cur = shift1(Md1) * m2i + shift1(Id1) * i2i
        D_cur = Md1 * m2i + Dd1 * i2i
        valid = (idx[None, :] <= d - 1)
        M_cur = jnp.where(valid, M_cur, 0.0)
        I_cur = jnp.where(valid, I_cur, 0.0)
        D_cur = jnp.where(valid, D_cur, 0.0)
        row0 = idx[None, :] == 0
        M_cur = jnp.where(row0, 0.0, M_cur)
        I_cur = jnp.where(row0, 0.0, I_cur)
        D_cur = jnp.where(row0, initial[:, None], D_cur)
        j_final = d - read_len
        fin_m = jnp.take_along_axis(M_cur, read_len[:, None], axis=1)[:, 0]
        fin_i = jnp.take_along_axis(I_cur, read_len[:, None], axis=1)[:, 0]
        add = jnp.where((j_final >= 1) & (j_final <= hap_len), fin_m + fin_i, 0.0)
        return (M_cur, Md1, I_cur, Id1, D_cur, Dd1, acc + add), None

    zeros = jnp.zeros((B, n), jnp.float32)
    D0 = zeros.at[:, 0].set(initial)
    carry = (zeros, zeros, zeros, zeros, D0, zeros,
             jnp.zeros(B, jnp.float32))
    steps = jnp.arange(1, lr_pad + lh_pad + 1, dtype=jnp.int32)
    (Md1, Md2, Id1, Id2, Dd1, Dd2, acc), _ = jax.lax.scan(step, carry, steps)
    return acc


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


# PairHMM mesh: when set (multi-chip mode), the batched pair dispatch
# shards its B axis over the mesh instead of running single-device.
_MESH: list = [None]


def set_pairhmm_mesh(mesh) -> None:
    _MESH[0] = mesh
    # the mesh shape feeds the session backend commitment — re-decide
    _SESSION_BACKEND[0] = None


def pairhmm_logl_pairs(
    reads: Sequence[Tuple[bytes, np.ndarray, int]],
    haps: Sequence[bytes],
    pair_r: np.ndarray,
    pair_h: np.ndarray,
) -> np.ndarray:
    """log10 likelihood per explicit (read, hap) pair — the cross-region
    batch entry (pairs from many assembly regions share ONE device
    dispatch). f32 wavefront with f64 host rescue. On a real TPU the
    Pallas kernel runs; elsewhere the lax.scan formulation."""
    import jax
    import jax.numpy as jnp

    B = len(pair_r)
    if B == 0:
        return np.zeros(0, np.float64)

    backend = pairhmm_session_backend()
    if backend == "pallas":
        from .pairhmm_pallas import pairhmm_pallas_pairs

        return pairhmm_pallas_pairs(reads, haps, pair_r, pair_h)
    if backend == "host":
        # accelerator session committed to the host scan: pin the jitted
        # program to the CPU backend so no dispatch crosses the link
        cpu0 = jax.devices("cpu")[0]
        with jax.default_device(cpu0):
            return _pairhmm_logl_pairs_scan(reads, haps, pair_r, pair_h)
    return _pairhmm_logl_pairs_scan(reads, haps, pair_r, pair_h)


# Session PairHMM backend commitment ('pallas' | 'host' | 'scan'; None =
# undecided). See pairhmm_session_backend.
_SESSION_BACKEND: list = [None]

# A link is PairHMM-healthy when a dispatch round trip costs less than
# this. Real PCIe/ICI attachments measure ~1-5 ms; the shared relay
# tunnel has measured 30 ms-2 s across rounds — and BENCH_r04's paired
# scale curve showed the relay's round-trip stalls costing the default
# session +21 s at 2M reads even at the relay's healthiest (~30 ms), so
# the cut sits between the two hardware classes, not inside the relay's
# oscillation range.
_PAIRHMM_HEALTHY_LATENCY_S = 0.02
# ... and the bulk link must be PCIe-class: the batched dispatch moves
# ~1.3 KB/pair, which a >=500 MB/s attachment amortizes to noise while
# the relay (15-135 MB/s, day-dependent) turns into a second stall
# source on the serialized HC main thread.
_PAIRHMM_HEALTHY_MBPS = 500.0


def pairhmm_session_backend() -> str:
    """Commit the PairHMM backend ONCE per session.

    Backend choice must be a SESSION property, never a per-dispatch one:
    serial HC dispatches small per-region-group batches while the pooled
    path batches ~8192 pairs, so any batch-size crossover would give the
    same (read, hap) pair ulp-different f32 likelihoods across run modes
    — violating the serial==parallel (and sfm==whole-file) byte-equality
    contract. The session-level choice preserves that contract while
    letting the decision see the hardware: on a TPU session with a
    healthy (PCIe/ICI-class) link the Pallas kernel runs for every
    dispatch (16x at pooled batch sizes, CROSSOVER_r03.json); behind a
    relay-class link (high round-trip latency or tunnel-class bandwidth)
    the session commits to the HOST scan instead — the round-trip stalls
    the relay drags into the serialized HC main thread were measured
    costing more than the kernel win at every scale >=2M reads
    (BENCH_r04 scale_curve; the round-4 verdict's #1 ask).

    Returns 'pallas' (TPU kernel), 'host' (jitted lax.scan pinned to the
    CPU backend), or 'scan' (lax.scan on the session default device —
    CPU sessions and multi-chip meshes, where the scan shards over the
    mesh). ELPREP_TPU_PAIRHMM_BACKEND={pallas,host,scan} overrides."""
    if _SESSION_BACKEND[0] is not None:
        return _SESSION_BACKEND[0]
    import jax

    v = os.environ.get("ELPREP_TPU_PAIRHMM_BACKEND", "").strip().lower()
    if v in ("pallas", "host", "scan"):
        _SESSION_BACKEND[0] = v
        return v
    mesh = _MESH[0]
    if jax.default_backend() != "tpu" or (mesh is not None
                                          and mesh.devices.size > 1):
        _SESSION_BACKEND[0] = "scan"
        return "scan"
    from .dispatch import _probe_link_mbps, probe_link_latency_s

    healthy = (probe_link_latency_s() < _PAIRHMM_HEALTHY_LATENCY_S
               and _probe_link_mbps() >= _PAIRHMM_HEALTHY_MBPS)
    _SESSION_BACKEND[0] = "pallas" if healthy else "host"
    return _SESSION_BACKEND[0]


def _pairhmm_logl_pairs_scan(
    reads: Sequence[Tuple[bytes, np.ndarray, int]],
    haps: Sequence[bytes],
    pair_r: np.ndarray,
    pair_h: np.ndarray,
) -> np.ndarray:
    """lax.scan formulation of the batched pair dispatch (all non-Pallas
    backends; the Pallas TPU kernel lives in pairhmm_pallas.py)."""
    import jax
    import jax.numpy as jnp

    B = len(pair_r)
    mesh = _MESH[0]

    # bucket padded shapes so groups share compiled programs
    lr_pad = _round_up(max(len(reads[r][1]) for r in pair_r), 32)
    lh_pad = _round_up(max(len(haps[h]) for h in pair_h), 128)
    n = lr_pad + 1
    P = lr_pad + 2

    x = np.zeros((B, n), np.int16)
    mp = np.zeros((B, n), np.float32)
    nmp = np.zeros((B, n), np.float32)
    m2m = np.zeros((B, n), np.float32)
    m2i = np.zeros((B, n), np.float32)
    hbp = np.zeros((B, P + lh_pad + P), np.int16)
    read_len = np.zeros(B, np.int32)
    hap_len = np.zeros(B, np.int32)
    initial = np.zeros(B, np.float32)

    per_read: dict = {}
    for r in set(int(v) for v in pair_r):
        seq, qual, mapq = reads[r]
        m2m_a, m2i_a = match_probs_for_read(seq)
        mq = modified_qualities(qual, mapq)
        ep = tables.QUAL_TO_ERROR_PROB[mq]
        per_read[r] = (np.frombuffer(seq, np.uint8), 1.0 - ep, ep / 3.0, m2m_a, m2i_a)

    for b in range(B):
        r, h = int(pair_r[b]), int(pair_h[b])
        seq_u8, mpa, nmpa, m2m_a, m2i_a = per_read[r]
        lr = len(seq_u8)
        hap = np.frombuffer(haps[h], np.uint8)
        lh = len(hap)
        x[b, 1 : lr + 1] = seq_u8
        mp[b, 1 : lr + 1] = mpa
        nmp[b, 1 : lr + 1] = nmpa
        m2m[b, 1 : lr + 1] = m2m_a
        m2i[b, 1 : lr + 1] = m2i_a
        # pack so that dynamic_slice start P+lh_pad-d yields
        # hb[i] = hap[d-i-1] for THIS pair's length: shift by
        # (lh_pad - lh)
        hbp[b, P + (lh_pad - lh) : P + lh_pad] = hap[::-1]
        read_len[b] = lr
        hap_len[b] = lh
        initial[b] = np.float32(2.0 ** F32_INITIAL_POW / lh)

    if mesh is not None and mesh.devices.size > 1:
        # shard the pair batch over every chip: pairs are independent, so
        # the B axis partitions with no collectives (the multi-chip GCUPS
        # axis of BASELINE; elprep_tpu.parallel.pairhmm_sharded is the
        # standalone form of the same layout)
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pspec

        flatm = Mesh(np.asarray(mesh.devices).reshape(-1), ("b",))
        n_dev = flatm.devices.size
        B_pad = ((B + n_dev - 1) // n_dev) * n_dev

        def padB(a, fill):
            if len(a) == B_pad:
                return a
            out = np.full((B_pad,) + a.shape[1:], fill, a.dtype)
            out[:B] = a
            return out

        sh2 = NamedSharding(flatm, Pspec("b", None))
        sh1 = NamedSharding(flatm, Pspec("b"))
        args2 = [jax.device_put(padB(a, 0), sh2) for a in (x, hbp, mp, nmp, m2m, m2i)]
        args1 = [jax.device_put(padB(a, 1), sh1) for a in (read_len, hap_len, initial)]
        acc = np.asarray(_pairhmm_f32_scan(
            *args2, *args1, lr_pad=lr_pad, lh_pad=lh_pad))[:B]
    else:
        # bucket the batch axis to the next power of two (min 32): the
        # jitted scan's shapes are static, so raw B values would compile
        # one program per distinct dispatch size (profiled: 8 dispatch
        # sizes at 1M reads = 8 trace+lower passes on the HC pipeline).
        # Per-pair values are padding/batch-invariant (rows are
        # independent lanes), so the slice below is exact.
        B_pad = 32
        while B_pad < B:
            B_pad *= 2
        if B_pad != B:
            def padB1(a, fill):
                out = np.full((B_pad,) + a.shape[1:], fill, a.dtype)
                out[:B] = a
                return out

            x, hbp, mp, nmp, m2m, m2i = (
                padB1(a, 0) for a in (x, hbp, mp, nmp, m2m, m2i))
            read_len, hap_len, initial = (
                padB1(a, 1) for a in (read_len, hap_len, initial))
        acc = np.asarray(
            _pairhmm_f32_scan(
                jnp.asarray(x), jnp.asarray(hbp), jnp.asarray(mp), jnp.asarray(nmp),
                jnp.asarray(m2m), jnp.asarray(m2i), jnp.asarray(read_len),
                jnp.asarray(hap_len), jnp.asarray(initial), lr_pad=lr_pad, lh_pad=lh_pad,
            )
        )[:B]
    log10_init = F32_INITIAL_POW * np.log10(2.0)
    with np.errstate(divide="ignore"):
        out = np.log10(acc.astype(np.float64)) - log10_init
    # f64 rescue for underflow (GATK float->double strategy)
    bad = ~np.isfinite(out) | (out < F32_RESCUE_LOG10)
    for b in np.flatnonzero(bad):
        seq, qual, mapq = reads[int(pair_r[b])]
        out[b] = pairhmm_f64_diag(seq, qual, mapq, haps[int(pair_h[b])])
    return out


def pairhmm_f32_batch(
    reads: Sequence[Tuple[bytes, np.ndarray, int]],
    haps: Sequence[bytes],
) -> np.ndarray:
    """log10 likelihoods [n_reads, n_haps] — full cross product of one
    region (wrapper over :func:`pairhmm_logl_pairs`)."""
    n_reads, n_haps = len(reads), len(haps)
    if n_reads == 0 or n_haps == 0:
        return np.zeros((n_reads, n_haps), np.float64)
    pair_r = np.repeat(np.arange(n_reads), n_haps)
    pair_h = np.tile(np.arange(n_haps), n_reads)
    return pairhmm_logl_pairs(reads, haps, pair_r, pair_h).reshape(n_reads, n_haps)


# ---------------------------------------------------------------------------
# Driver-level likelihood computation (pairhmm.go:180-320)
# ---------------------------------------------------------------------------


def compute_read_likelihoods(
    reads: Sequence[Tuple[bytes, np.ndarray, int]],
    haps: Sequence[bytes],
    hap_is_ref: Sequence[bool],
    use_device: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (values [n_haps, n_reads], keep_mask [n_reads]) applying the
    best-likelihood cap (pairhmm.go:297-316) and poorly-modeled-read
    removal (pairhmm.go:318-334)."""
    n_reads, n_haps = len(reads), len(haps)
    if use_device:
        vals = pairhmm_f32_batch(reads, haps).T.copy()  # [H, N]
    else:
        vals = np.empty((n_haps, n_reads), np.float64)
        for h in range(n_haps):
            for r in range(n_reads):
                seq, qual, mapq = reads[r]
                vals[h, r] = pairhmm_f64_diag(seq, qual, mapq, haps[h])
    return _cap_and_filter(vals, reads, hap_is_ref)


def _cap_and_filter(vals: np.ndarray,
                    reads: Sequence[Tuple[bytes, np.ndarray, int]],
                    hap_is_ref: Sequence[bool]) -> Tuple[np.ndarray, np.ndarray]:
    """Best-likelihood cap (pairhmm.go:297-316) + poorly-modeled-read
    removal (pairhmm.go:318-334). vals is [n_haps, n_reads]."""
    n_haps, n_reads = vals.shape
    if n_haps > 1:
        nonref = ~np.asarray(hap_is_ref, bool)
        if nonref.any():
            best = np.max(vals[nonref, :], axis=0)
            cap = best + tables.GLOBAL_READ_MISMAPPING_RATE
            finite = np.isfinite(best)
            vals = np.where(finite[None, :], np.maximum(vals, cap[None, :]), vals)

    keep = np.ones(n_reads, bool)
    for r in range(n_reads):
        max_errors = min(2.0, np.ceil(len(reads[r][1]) * 0.02))
        threshold = max_errors * -4.0
        keep[r] = bool(np.any(vals[:, r] >= threshold))
    return vals[:, keep], keep


def compute_read_likelihoods_multi(
    workloads: Sequence[Tuple[Sequence[Tuple[bytes, np.ndarray, int]],
                              Sequence[bytes], Sequence[bool]]],
    use_device: bool = True,
) -> list:
    """Batched :func:`compute_read_likelihoods` over several assembly
    regions: all (read, hap) pairs share ONE device dispatch (per-region
    dispatch latency dominated HC wall time on high-latency links).
    Returns a list of (values, keep) in workload order. Results are
    identical to per-region calls — the wavefront kernel is
    padding-invariant, so group-level shape buckets do not change any
    pair's value."""
    if not use_device:
        return [compute_read_likelihoods(r, h, ref, use_device=False)
                for r, h, ref in workloads]
    all_reads: list = []
    all_haps: list = []
    pair_r: list = []
    pair_h: list = []
    spans = []
    p_off = 0
    for reads, haps, _ in workloads:
        nr, nh = len(reads), len(haps)
        r0, h0 = len(all_reads), len(all_haps)
        all_reads.extend(reads)
        all_haps.extend(haps)
        for r in range(nr):
            base = r0 + r
            for h in range(nh):
                pair_r.append(base)
                pair_h.append(h0 + h)
        spans.append((p_off, nr, nh))
        p_off += nr * nh
    logl = pairhmm_logl_pairs(all_reads, all_haps,
                              np.asarray(pair_r, np.int64),
                              np.asarray(pair_h, np.int64))
    out = []
    for (reads, haps, hap_is_ref), (off, nr, nh) in zip(workloads, spans):
        if nr == 0 or nh == 0:
            out.append((np.zeros((nh, 0), np.float64), np.zeros(nr, bool)))
            continue
        vals = logl[off : off + nr * nh].reshape(nr, nh).T.copy()
        out.append(_cap_and_filter(vals, reads, hap_is_ref))
    return out
