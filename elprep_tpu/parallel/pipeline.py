"""Sharded device pipeline steps (shard_map over the mesh).

Replaces the reference's process-per-shard + gob-file reductions
(cmd/sfm.go) with in-program collectives: the whole multi-chip 5-step
compute is ONE jitted program per batch.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def distributed_pipeline_step(mesh, max_cycle: int = 512, n_rg: int = 1):
    """Build the sharded sort+dedup+BQSR step over ``mesh``.

    Returns ``step(args...)`` operating on arrays sharded:
    reads over ``dp`` (replicated over ``gn``), reference classes over
    ``gn``. BQSR tables come back fully reduced (replicated)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..ops.bqsr_ops import apply_bqsr, recalibrate_tables
    from ..ops.dedup import mark_duplicates
    from ..ops import sortkeys

    def local_step(base, qual, seq_len, flag, pos, rg, refoff, skip,
                   op_class, op_len, ref_shard, libid, refid, qrank,
                   cond_prior, d_cyc, d_ctx, quant_lut, sqq_lut, rg_present):
        # genome all-gather over `gn` (sequence-parallel reference)
        ref_full = jax.lax.all_gather(ref_shard, "gn", tiled=True)
        # local coordinate sort permutation (contig-sharded: fully local)
        perm = sortkeys.coordinate_sort_perm(
            flag, refid, pos, jnp.full_like(pos, 60), refid, pos,
            jnp.zeros_like(pos), qrank)
        # local duplicate marking (mates live in the same shard)
        rev = (flag >> 4) & 1
        score = jnp.sum(jnp.where(qual >= 15, qual.astype(jnp.int32), 0), axis=1)
        dup = mark_duplicates(libid, refid, pos, rev, score, qrank, flag)
        # BQSR covariate tables, then the gob-file-equivalent reduction:
        # one psum over the read shards
        tabs = recalibrate_tables(
            base, qual, seq_len, flag, pos, rg, refoff, skip, op_class, op_len,
            ref_full, max_cycle=max_cycle, n_rg=n_rg)
        qs_obs, qs_mism, cyc_obs, cyc_mism, ctx_obs, ctx_mism, _ = tabs
        reduced = [jax.lax.psum(t, "dp")
                   for t in (qs_obs, qs_mism, cyc_obs, cyc_mism, ctx_obs, ctx_mism)]
        newq, _ = apply_bqsr(
            base, qual, seq_len, flag, rg, rg_present,
            cond_prior, d_cyc, d_ctx, quant_lut, sqq_lut, max_cycle=max_cycle)
        return perm, dup, newq, reduced

    rd = P("dp")
    rd2 = P("dp", None)
    gsh = P("gn")
    rep = P()
    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(rd2, rd2, rd, rd, rd, rd, rd, rd2, rd2, rd2, gsh, rd, rd, rd,
                  rep, rep, rep, rep, rep, rep),
        out_specs=(rd, rd, rd2, [rep] * 6),
        # the all-gathered genome is replicated over `gn` after the
        # collective, which the varying-axes checker cannot prove
        check_vma=False,
    )
    return jax.jit(step)


def pairhmm_sharded(mesh, reads: Sequence[Tuple[bytes, np.ndarray, int]],
                    haps: Sequence[bytes]) -> np.ndarray:
    """PairHMM likelihoods [n_reads, n_haps] sharded over the whole mesh.

    (read, hap) pairs are independent, so the B dimension shards over
    every mesh axis; each chip runs the same wavefront scan on its
    slice. Linear scaling in chips (the GCUPS axis of BASELINE)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops import pairhmm as ph

    n_reads, n_haps = len(reads), len(haps)
    if n_reads == 0 or n_haps == 0:
        return np.zeros((n_reads, n_haps), np.float64)
    lr_pad = _round_up(max(len(q) for _, q, _ in reads), 8)
    lh_pad = _round_up(max(len(h) for h in haps), 8)
    B = n_reads * n_haps
    n_dev = mesh.devices.size
    B_pad = _round_up(B, n_dev)
    n = lr_pad + 1
    P_off = lr_pad + 2

    x = np.zeros((B_pad, n), np.int16)
    mp = np.zeros((B_pad, n), np.float32)
    nmp = np.zeros((B_pad, n), np.float32)
    m2m = np.zeros((B_pad, n), np.float32)
    m2i = np.zeros((B_pad, n), np.float32)
    hbp = np.zeros((B_pad, P_off + lh_pad + P_off), np.int16)
    read_len = np.ones(B_pad, np.int32)
    hap_len = np.ones(B_pad, np.int32)
    initial = np.ones(B_pad, np.float32)

    per_read = []
    for seq, qual, mapq in reads:
        m2m_a, m2i_a = ph.match_probs_for_read(seq)
        mq = ph.modified_qualities(qual, mapq)
        ep = ph.tables.QUAL_TO_ERROR_PROB[mq]
        per_read.append((np.frombuffer(seq, np.uint8), 1.0 - ep, ep / 3.0,
                         m2m_a, m2i_a))
    for r in range(n_reads):
        seq_u8, mpa, nmpa, m2m_a, m2i_a = per_read[r]
        lr = len(seq_u8)
        for h in range(n_haps):
            b = r * n_haps + h
            hap = np.frombuffer(haps[h], np.uint8)
            lh = len(hap)
            x[b, 1 : lr + 1] = seq_u8
            mp[b, 1 : lr + 1] = mpa
            nmp[b, 1 : lr + 1] = nmpa
            m2m[b, 1 : lr + 1] = m2m_a
            m2i[b, 1 : lr + 1] = m2i_a
            hbp[b, P_off + (lh_pad - lh) : P_off + lh_pad] = hap[::-1]
            read_len[b] = lr
            hap_len[b] = lh
            initial[b] = np.float32(2.0 ** ph.F32_INITIAL_POW / lh)

    # flatten the 2D mesh into one data axis for B sharding
    flat = jax.sharding.Mesh(mesh.devices.reshape(-1), ("b",))
    spec2 = NamedSharding(flat, P("b", None))
    spec1 = NamedSharding(flat, P("b"))

    @jax.jit
    def run(x, hbp, mp, nmp, m2m, m2i, read_len, hap_len, initial):
        return ph._pairhmm_f32_scan(
            x, hbp, mp, nmp, m2m, m2i, read_len, hap_len, initial,
            lr_pad=lr_pad, lh_pad=lh_pad)

    with flat:
        args2 = [jax.device_put(a, spec2) for a in (x, hbp, mp, nmp, m2m, m2i)]
        args1 = [jax.device_put(a, spec1) for a in (read_len, hap_len, initial)]
        acc = np.asarray(run(*args2, *args1))

    log10_init = ph.F32_INITIAL_POW * np.log10(2.0)
    with np.errstate(divide="ignore"):
        out = np.log10(acc[:B].astype(np.float64)) - log10_init
    bad = ~np.isfinite(out) | (out < ph.F32_RESCUE_LOG10)
    for b in np.flatnonzero(bad):
        r, h = divmod(int(b), n_haps)
        seq, qual, mapq = reads[r]
        out[b] = ph.pairhmm_f64_diag(seq, qual, mapq, haps[h])
    return out.reshape(n_reads, n_haps)
