"""Multi-chip in-memory pipeline: a real ReadBatch sharded over a device
mesh by contiguous refid spans.

This is the TPU-native replacement for elPrep's sfm "distributed" mode
(reference: cmd/sfm.go:605-907): where the reference forks a subprocess
per contig-group split file and merges gob-file reductions, here the
batch shards onto the mesh, sort + duplicate marking run per shard as
ONE shard_mapped device program, and the BQSR covariate tables are
reduced with a psum over the read axis — the collective that replaces
the ``.elrecal`` gob merge (reference: print-bqsr.go:301-329).

Correctness structure:

- shards are *contiguous refid spans* (plus refid -1 / unmapped in the
  last shard), so concatenating per-shard coordinate-sorted outputs is
  globally sorted: the leading CoordinateLess key is the refid (with -1
  mapped after all valid ids, sam/sam-types.go:428-432);
- duplicate marking needs both mates of a pair in one shard. Like the
  reference's split files duplicate cross-group pairs with an ``sr:i:1``
  tag (split-merge.go:286-294), cross-shard pairs get *helper copies*:
  each mate's row is appended to the other mate's shard so both shards
  see the full duel participant set for cross-refid pair keys; helper
  verdicts are discarded (the home shard computes the same verdict on
  identical inputs);
- fragment duels key on the read's own refid, so helper rows (foreign
  refids) can never join a home fragment group;
- BQSR tables count home rows only (helpers would double-count); the
  integer scatter-add tables are order-independent, so psum over shards
  equals the whole-file tables exactly.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

from ..core.batch import ReadBatch
from ..core.header import Header

MULTIPLE = 0x1
NEXT_UNMAPPED = 0x8
DUPLICATE = 0x400
ELIGIBLE_EXCLUDE = 0x4 | 0x100 | 0x800
INT32_MAX = np.int32(2**31 - 1)


def shard_spans(header: Header, n_shards: int) -> np.ndarray:
    """Map refid -> shard as contiguous spans balanced by contig length.

    Returns int32 [n_refids + 1]; the last entry is the shard of refid -1
    (unmapped), which must sort after every valid refid and therefore
    lands in the last shard (same role as the reference's "unmapped"
    contig group, split-merge.go:178-213)."""
    lens = np.array([int(sq.get("LN", "0")) for sq in header.sq], np.int64)
    n_ref = len(lens)
    if n_ref == 0:
        return np.full(1, n_shards - 1, np.int32)
    cum = np.cumsum(lens) - lens  # length before each contig
    total = max(int(lens.sum()), 1)
    shard = np.minimum((cum * n_shards) // total, n_shards - 1).astype(np.int32)
    out = np.empty(n_ref + 1, np.int32)
    out[:n_ref] = shard
    out[n_ref] = n_shards - 1  # refid -1
    return out


def _cross_shard_pairs(flag, libid, qrank, shard_of_row):
    """Rows of true pairs whose mates live in another shard.

    Joins exactly like the device kernel (ops/dedup.py: {LIBID, QNAME}
    candidates in arrival order). Returns (rows_a, rows_b) index arrays
    of mated rows with shard_of[a] != shard_of[b]."""
    n = len(flag)
    cand = ((flag & ELIGIBLE_EXCLUDE) == 0) & \
        ((flag & (MULTIPLE | NEXT_UNMAPPED)) == MULTIPLE)
    rows = np.flatnonzero(cand)
    if len(rows) == 0:
        return rows, rows
    order = rows[np.lexsort((rows, qrank[rows], libid[rows]))]
    same = (libid[order[1:]] == libid[order[:-1]]) & \
        (qrank[order[1:]] == qrank[order[:-1]])
    # pair the first two of each {libid, qname} run (arrival order), like
    # DeleteOrStore joining (mark-duplicates.go:336-340)
    run_start = np.concatenate([[True], ~same])
    pos_in_run = np.arange(len(order)) - \
        np.maximum.accumulate(np.where(run_start, np.arange(len(order)), 0))
    second = pos_in_run % 2 == 1  # odd position pairs with its predecessor
    b_rows = order[second]
    a_rows = order[np.flatnonzero(second) - 1]
    cross = shard_of_row[a_rows] != shard_of_row[b_rows]
    return a_rows[cross], b_rows[cross]


def plan_shards(batch: ReadBatch, header: Header, n_shards: int):
    """Shard layout for a batch: per-shard row lists with helper copies.

    Returns (shard_rows, n_home) where shard_rows[s] is an int64 index
    array into the batch — home rows first (original order), then helper
    copies of cross-shard mates — and n_home[s] is the home count."""
    from ..ops import sortkeys

    refid = np.asarray(batch.temps["REFID"])
    spans = shard_spans(header, n_shards)
    shard_of = spans[np.where(refid >= 0, refid, len(spans) - 1)]

    libid, upos, score, rev = _dedup_cols(batch, header)
    qrank = sortkeys.qname_ranks(batch.qname)
    a_rows, b_rows = _cross_shard_pairs(np.asarray(batch.flag), libid, qrank,
                                        shard_of)

    # one stable counting argsort replaces n_shards flatnonzero scans
    order = np.argsort(shard_of, kind="stable")
    counts = np.bincount(shard_of, minlength=n_shards)
    bounds = np.concatenate([[0], np.cumsum(counts)])
    shard_rows: List[np.ndarray] = []
    n_home: List[int] = []
    for s in range(n_shards):
        home = order[bounds[s] : bounds[s + 1]]
        # helpers: mates of home rows that live elsewhere
        helpers = np.concatenate([
            b_rows[shard_of[a_rows] == s],
            a_rows[shard_of[b_rows] == s],
        ])
        shard_rows.append(np.concatenate([home, helpers]).astype(np.int64))
        n_home.append(len(home))
    aux = {"libid": libid, "upos": upos, "score": score, "qrank": qrank}
    return shard_rows, n_home, aux


def _dedup_cols(batch, header):
    from ..ops.dedup import dedup_columns

    return dedup_columns(batch, header)


def _round_pow2(v: int) -> int:
    n = 1
    while n < v:
        n *= 2
    return n


def _put(x, mesh, spec):
    """Device-put ``x`` with a NamedSharding, multi-process aware.

    Single-process: plain ``device_put``. Multi-process (multi-host): every
    process holds the full host array (each parses the same input), so each
    builds only the shards its local devices own — the TPU-native analog of
    the reference's per-node split files (cmd/sfm.go:605-907) without any
    cross-node file shipping."""
    import jax
    from jax.sharding import NamedSharding

    s = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, s)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])


@functools.lru_cache(maxsize=8)
def sharded_sort_dedup_step(mesh):
    """ONE shard_mapped device program: duplicate verdicts + the
    post-dedup coordinate sort permutation, per shard.

    Memoized per mesh: rebuilding the jit object per call would retrace
    the program every invocation (measured 0.5-0.9 s/call at 500k reads
    on 2 virtual devices — the round-3 1->2 scaling-efficiency gap)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..ops import sortkeys
    from ..ops.dedup import mark_duplicates

    def local(flag, refid, pos, mapq, nrefid, pnext, tlen, qrank,
              libid, upos, rev, score):
        dup = mark_duplicates(libid, refid, upos, rev, score, qrank, flag)
        flag2 = flag | dup.astype(jnp.int32) * DUPLICATE
        perm = sortkeys.coordinate_sort_perm(
            flag2, refid, pos, mapq, nrefid, pnext, tlen, qrank)
        return dup, perm

    rd = P("dp")
    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=(rd,) * 12,
        out_specs=(rd, rd),
    )
    return jax.jit(step)


def _fetch(x):
    """Read a P('dp')-sharded global array back to host, multi-process
    aware: cross-process all_gather when shards live on other hosts —
    the collective replacing the reference's merge of per-node output
    files (cmd/sfm.go:605-907)."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def run_sharded_sort_dedup(batch: ReadBatch, header: Header, mesh,
                           do_sort: bool = True) -> Tuple[ReadBatch, dict]:
    """Sort + mark duplicates for a real ReadBatch over the mesh.

    Returns (coordinate-sorted batch with FLAG 0x400 set on duplicates
    and aux columns riding along as temps, aux dict for the optical
    pass) — byte-equal to the single-chip mark_duplicates_batch +
    sort_batch composition. ``do_sort=False`` applies duplicate flags
    only (the sort was elided by effective_sorting_order)."""
    from jax.sharding import PartitionSpec as P

    n_shards = int(np.prod(mesh.devices.shape))
    flat = _flat_mesh(mesh)
    shard_rows, n_home, aux = plan_shards(batch, header, n_shards)
    n_pad = _round_pow2(max(1, max(len(r) for r in shard_rows)))

    refid = np.asarray(batch.temps["REFID"])
    nrefid = np.asarray(batch.temps["NextREFID"])
    qrank = aux["qrank"]

    def stacked(col, fill):
        col = np.asarray(col)
        out = np.full(n_shards * n_pad, fill, np.int32)
        for s, rows in enumerate(shard_rows):
            out[s * n_pad : s * n_pad + len(rows)] = col[rows]
        return out

    from ..hostpool import shared_pool as _pool

    specs = (
        (batch.flag, 0x4),                 # dummies: unmapped, sort last
        (refid, INT32_MAX),
        (batch.pos, INT32_MAX),
        (batch.mapq, 0),
        (nrefid, INT32_MAX),
        (batch.pnext, INT32_MAX),
        (batch.tlen, 0),
        (qrank, INT32_MAX),
        (aux["libid"], -1),
        (aux["upos"], 0),
        ((np.asarray(batch.flag) >> 4) & 1, 0),
        (aux["score"], 0),
    )
    cols = tuple(_pool().map(lambda cf: stacked(*cf), specs))
    step = sharded_sort_dedup_step(flat)
    dargs = [_put(c, flat, P("dp")) for c in cols]
    dup, perm = step(*dargs)
    dup = _fetch(dup).reshape(n_shards, n_pad)
    perm = _fetch(perm).reshape(n_shards, n_pad)

    # apply home-row verdicts
    flag = np.asarray(batch.flag).copy()
    for s, rows in enumerate(shard_rows):
        h = n_home[s]
        home = rows[:h]
        flag[home] = np.where(dup[s, :h], flag[home] | DUPLICATE, flag[home])
    batch.flag = flag
    # aux columns ride along as temps so the select permutes them with
    # the reads (same contract as filters.markdup.mark_duplicates_filter)
    batch.temps["LIBID"] = aux["libid"]
    batch.temps["UPOS"] = aux["upos"]
    batch.temps["DUPSCORE"] = aux["score"]
    batch.temps["QRANK"] = aux["qrank"]

    if not do_sort:
        return batch, aux

    # global sorted order: concatenate per-shard perms (home rows only)
    order_parts = []
    for s, rows in enumerate(shard_rows):
        p = perm[s]
        p = p[p < len(rows)]         # drop pad dummies
        p = p[p < n_home[s]]         # drop helper copies
        order_parts.append(rows[p])
    order = np.concatenate(order_parts) if order_parts else np.zeros(0, np.int64)
    sorted_batch = batch.select(order)
    aux_sorted = {k: v[order] for k, v in aux.items()}
    return sorted_batch, aux_sorted


def _flat_mesh(mesh):
    """Flatten any mesh into a 1D ('dp',) mesh over the same devices."""
    import jax

    devs = np.asarray(mesh.devices).reshape(-1)
    return jax.sharding.Mesh(devs, ("dp",))


def _accel_mesh(mesh) -> bool:
    """True when the mesh runs on accelerator devices (packed transfer
    pays for its host-side pack only when a real link exists)."""
    try:
        return np.asarray(mesh.devices).reshape(-1)[0].platform != "cpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=8)
def _sharded_recal_step(mesh, max_cycle: int, n_rg: int,
                        packed_width: "int | None" = None):
    """Memoized psum-reduced covariate-table program (see
    sharded_sort_dedup_step for why: per-call jit rebuilds retrace).

    With ``packed_width`` the program takes 4-bit-dictionary bases +
    bit-packed skip (ops/packed) and unpacks per shard on-device — the
    dense [rows, L] matrices never cross the host->device link (the
    transfer-volume lever; tables bit-identical)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ..ops import bqsr_ops

    def local(base, qual, seq_len, flag, pos, rg, refoff, skip, op_class,
              op_len, ref_classes, base_lut=None):
        if packed_width is not None:
            from ..ops.packed import unpack_bits, unpack_nibble_dict

            base = unpack_nibble_dict(base, base_lut, packed_width)
            skip = unpack_bits(skip, packed_width)
        out = bqsr_ops.recalibrate_tables(
            base, qual, seq_len, flag, pos, rg, refoff, skip, op_class,
            op_len, ref_classes, max_cycle=max_cycle, n_rg=n_rg)
        # the gob-merge replacement: sum per-shard tables over the mesh
        reduced = [jax.lax.psum(t, "dp") for t in out[:6]]
        max_abs_cycle = jax.lax.pmax(out[6], "dp")
        return reduced, max_abs_cycle

    rd = P("dp")
    rd2 = P("dp", None)
    rep = P()
    in_specs = (rd2, rd2, rd, rd, rd, rd, rd, rd2, rd2, rd2, rep)
    if packed_width is not None:
        in_specs = in_specs + (rep,)
    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=in_specs,
        out_specs=([rep] * 6, rep),
    ))


def sharded_recalibrate(recal, header: Header, batch: ReadBatch, max_cycle: int,
                        mesh, timings: "dict | None" = None):
    """BQSR table build over the mesh: per-shard dense covariate inputs,
    shard_mapped recalibrate_tables, and ONE psum over the read axis in
    place of the reference's gob-file table merge
    (reference: print-bqsr.go:310-329, bqsr.go:210-329).

    ``recal`` is a filters.bqsr.BaseRecalibrator. Returns the same
    BaseRecalibratorTables as the single-chip path, exactly.

    ``timings``, when a dict, receives wall seconds per internal stage
    (prep_s: threaded per-shard covariate prep; stack_s: padded column
    stacking; put_s: device placement; device_s: the shard_mapped
    program incl. its psum, to host-side fetch) — the 1-vs-2-device
    scaling instrumentation (tools/recal_profile.py)."""
    import time as _time

    import jax
    from jax.sharding import PartitionSpec as P

    from ..filters import bqsr as fbqsr
    from ..ops import bqsr_ops

    flat = _flat_mesh(mesh)
    n_shards = int(np.prod(flat.devices.shape))

    rgmap = fbqsr.rg_covariate_map(header)
    cov_names = sorted(set(rgmap.values()))
    tables = fbqsr.BaseRecalibratorTables.zeros(cov_names, max_cycle)
    n = len(batch)
    if n == 0:
        return tables

    # shard home rows by refid span (helpers never exist here: each read
    # contributes its own bases)
    refid = np.asarray(batch.temps["REFID"])
    spans = shard_spans(header, n_shards)
    shard_of = spans[np.where(refid >= 0, refid, len(spans) - 1)]

    from ..hostpool import shared_pool as _pool

    # per-shard host prep runs threaded: the clipping + covariate chain is
    # native C++ (releases the GIL), so shards prep concurrently
    _t0 = _time.perf_counter()
    prep = list(_pool().map(
        lambda s: fbqsr.prep_recalibrate_columns(
            recal, header, batch, np.flatnonzero(shard_of == s), max_cycle),
        range(n_shards)))
    if timings is not None:
        timings["prep_s"] = _time.perf_counter() - _t0
    if not any(p["m"] for p in prep):
        return tables  # no eligible reads anywhere (matches bqsr.py:388)
    m = max(p["m"] for p in prep)
    L = max(p["L"] for p in prep)
    C = max(p["C"] for p in prep)

    def stack(key, fill, dtype, width=None):
        if width is None:
            out = np.full(n_shards * m, fill, dtype)
            for s, p in enumerate(prep):
                v = p[key]
                out[s * m : s * m + len(v)] = v
        else:
            out = np.full((n_shards * m, width), fill, dtype)
            for s, p in enumerate(prep):
                v = p[key]
                out[s * m : s * m + len(v), : v.shape[1]] = v
        return out

    _t0 = _time.perf_counter()
    (base, qual, skip, seq_len, flag, pos, rg, refoff, op_class,
     op_len) = _pool().map(lambda a: stack(*a), [
        ("base", 0, np.uint8, L),
        ("qual", 0, np.uint8, L),
        ("skip", False, bool, L),
        ("seq_len", 0, np.int32),
        ("flag", 0, np.int32),
        ("pos", 0, np.int32),
        ("rg", 0, np.int32),
        ("refoff", 0, np.int64),
        ("op_class", bqsr_ops.OP_CLASS[ord("S")], np.int8, C),
        ("op_len", 0, np.int32, C),
    ])

    if timings is not None:
        timings["stack_s"] = _time.perf_counter() - _t0
    n_rg = len(cov_names)
    ref_classes = np.asarray(recal.ref.classes)

    rd = P("dp")
    rd2 = P("dp", None)
    rep = P()
    from ..ops.packed import pack_bits, pack_nibble_dict

    pk = pack_nibble_dict(base) if _accel_mesh(flat) else None
    if pk is not None:
        # accelerator mesh: ship packed bases/skip, unpack per shard
        # on-device (tables bit-identical, tests/test_packed.py)
        bp, lut = pk
        step = _sharded_recal_step(flat, max_cycle, n_rg, packed_width=L)
        args = (bp, qual, seq_len, flag, pos, rg, refoff, pack_bits(skip),
                op_class, op_len, ref_classes, lut)
        specs = (rd2, rd2, rd, rd, rd, rd, rd, rd2, rd2, rd2, rep, rep)
    else:
        step = _sharded_recal_step(flat, max_cycle, n_rg)
        args = (base, qual, seq_len, flag, pos, rg, refoff, skip, op_class,
                op_len, ref_classes)
        specs = (rd2, rd2, rd, rd, rd, rd, rd, rd2, rd2, rd2, rep)
    _t0 = _time.perf_counter()
    dargs = [_put(a, flat, sp) for a, sp in zip(args, specs)]
    if timings is not None:
        timings["put_s"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
    reduced, max_abs_cycle = step(*dargs)
    qs_obs, qs_mism, cyc_obs, cyc_mism, ctx_obs, ctx_mism = map(np.asarray, reduced)
    if timings is not None:
        timings["device_s"] = _time.perf_counter() - _t0
    if int(max_abs_cycle) > max_cycle:
        raise ValueError("cycle value exceeds maximum cycle value")
    ncyc = 2 * max_cycle + 1
    tables.qs_obs += qs_obs.reshape(n_rg, fbqsr.NQUAL)
    tables.qs_mism += qs_mism.reshape(n_rg, fbqsr.NQUAL)
    tables.cyc_obs += cyc_obs.reshape(n_rg, fbqsr.NQUAL, ncyc)
    tables.cyc_mism += cyc_mism.reshape(n_rg, fbqsr.NQUAL, ncyc)
    tables.ctx_obs += ctx_obs.reshape(n_rg, fbqsr.NQUAL, fbqsr.NCTX)
    tables.ctx_mism += ctx_mism.reshape(n_rg, fbqsr.NQUAL, fbqsr.NCTX)
    return tables
