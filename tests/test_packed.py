"""Packed host->device transfer (ops/packed): lossless round-trips and
bit-identical consumers.

The packed forms exist purely to cut H2D bytes (the measured
transfer-bound regime of the columnar phases); every test here pins
that packing is invisible to results.
"""

import numpy as np
import pytest

from elprep_tpu.ops import packed


def test_nibble_dict_roundtrip_fuzz():
    rng = np.random.RandomState(5)
    for trial in range(12):
        n = int(rng.randint(1, 200))
        L = int(rng.randint(1, 80))
        nsym = int(rng.randint(1, 17))
        alphabet = rng.choice(256, nsym, replace=False).astype(np.uint8)
        arr = rng.choice(alphabet, (n, L)).astype(np.uint8)
        got = packed.pack_nibble_dict(arr)
        assert got is not None
        bp, lut = got
        assert bp.shape == (n, (L + 1) // 2)
        out = np.asarray(packed.unpack_nibble_dict(bp, lut, L))
        assert out.dtype == np.uint8
        assert out.tolist() == arr.tolist(), trial


def test_nibble_dict_rejects_wide_alphabets():
    rng = np.random.RandomState(6)
    arr = rng.choice(np.arange(40, dtype=np.uint8), (10, 30))
    # ensure >16 distinct values actually present
    arr[0, :17] = np.arange(17, dtype=np.uint8)
    assert packed.pack_nibble_dict(arr) is None


def test_bits_roundtrip_fuzz():
    rng = np.random.RandomState(7)
    for trial in range(12):
        n = int(rng.randint(1, 200))
        L = int(rng.randint(1, 100))
        mask = rng.rand(n, L) < rng.rand()
        bp = packed.pack_bits(mask)
        assert bp.shape == (n, (L + 7) // 8)
        out = np.asarray(packed.unpack_bits(bp, L))
        assert out.dtype == bool
        assert out.tolist() == mask.tolist(), trial


def test_recalibrate_tables_packed_bit_identical():
    """The packed-transfer covariate program returns bit-identical
    tables to the dense program on the same inputs (the contract that
    makes packing a pure transport concern)."""
    import jax.numpy as jnp

    from elprep_tpu.ops import bqsr_ops
    from elprep_tpu.ops.readstats import OP_CLASS

    rng = np.random.RandomState(11)
    for trial in range(4):
        n = int(rng.randint(4, 80))
        L = int(rng.randint(8, 60))
        n_rg = int(rng.randint(1, 3))
        max_cycle = 100
        base = rng.choice(np.frombuffer(b"ACGTN", np.uint8), (n, L)).astype(np.uint8)
        qual = rng.randint(0, 60, (n, L)).astype(np.uint8)
        seq_len = rng.randint(1, L + 1, n).astype(np.int32)
        flag = np.where(rng.rand(n) < 0.5, 0x63, 0x93).astype(np.int32)
        ref_len = 500
        pos = rng.randint(1, ref_len - L - 2, n).astype(np.int32)
        rg = rng.randint(0, n_rg, n).astype(np.int32)
        refoff = np.zeros(n, np.int32)
        skip = rng.rand(n, L) < 0.2
        op_class = np.full((n, 1), OP_CLASS[ord("M")], np.int32)
        op_len = seq_len[:, None].astype(np.int32)
        ref_classes = rng.randint(1, 5, ref_len).astype(np.uint8)

        dense = bqsr_ops.recalibrate_tables(
            jnp.asarray(base), jnp.asarray(qual), jnp.asarray(seq_len),
            jnp.asarray(flag), jnp.asarray(pos), jnp.asarray(rg),
            jnp.asarray(refoff), jnp.asarray(skip), jnp.asarray(op_class),
            jnp.asarray(op_len), jnp.asarray(ref_classes),
            max_cycle=max_cycle, n_rg=n_rg)

        bp, lut = packed.pack_nibble_dict(base)
        packed_out = bqsr_ops.recalibrate_tables_packed(
            jnp.asarray(bp), jnp.asarray(lut), jnp.asarray(qual),
            jnp.asarray(seq_len), jnp.asarray(flag), jnp.asarray(pos),
            jnp.asarray(rg), jnp.asarray(refoff),
            jnp.asarray(packed.pack_bits(skip)), jnp.asarray(op_class),
            jnp.asarray(op_len), jnp.asarray(ref_classes),
            max_cycle=max_cycle, n_rg=n_rg, width=L)

        for a, b in zip(dense, packed_out):
            assert np.asarray(a).tolist() == np.asarray(b).tolist(), trial


def test_accumulate_partials_packed_path_matches(monkeypatch):
    """Force the accelerator (non-host-hist) branch of
    accumulate_table_partials on the CPU mesh and check the packed
    transfer produces the same accumulated tables as the host path."""
    from elprep_tpu.filters import bqsr as fb
    from elprep_tpu.ops.readstats import OP_CLASS

    rng = np.random.RandomState(13)
    n, L = 60, 40
    prep = dict(
        n_real=n, L=L, C=1,
        base=rng.choice(np.frombuffer(b"ACGT", np.uint8), (n, L)).astype(np.uint8),
        qual=rng.randint(0, 50, (n, L)).astype(np.uint8),
        seq_len=np.full(n, L, np.int32),
        flag=np.where(rng.rand(n) < 0.5, 0x63, 0x93).astype(np.int32),
        pos=rng.randint(1, 400, n).astype(np.int32),
        rg=np.zeros(n, np.int32),
        refoff=np.zeros(n, np.int32),
        skip=(rng.rand(n, L) < 0.1),
        op_class=np.full((n, 1), OP_CLASS[ord("M")], np.int32),
        op_len=np.full((n, 1), L, np.int32),
    )
    ref_classes = rng.randint(1, 5, 600).astype(np.uint8)

    host, mac_h = fb.accumulate_table_partials([dict(prep)], ref_classes,
                                               max_cycle=100, n_rg=1)
    monkeypatch.setattr(fb, "routes_to_host", lambda n: False, raising=False)
    from elprep_tpu.ops import dispatch

    monkeypatch.setattr(dispatch, "routes_to_host", lambda n: False)
    dev, mac_d = fb.accumulate_table_partials([dict(prep)], ref_classes,
                                              max_cycle=100, n_rg=1)
    assert mac_h == mac_d
    for a, b in zip(host, dev):
        assert np.asarray(a).tolist() == np.asarray(b).tolist()


def test_fused_device_step_packed_matches_dense():
    """The packed fused step (driver/crossover surface) equals the dense
    fused step bit-exactly on the synthetic columns."""
    import jax.numpy as jnp

    from __graft_entry__ import (fused_device_step, fused_device_step_packed,
                                 fused_step_columns, pack_step_columns)

    cols = fused_step_columns(256, read_len=96)
    dense = fused_device_step(n_rg=1, max_cycle=512)(
        *[jnp.asarray(c) for c in cols])
    pcols = pack_step_columns(cols)
    assert pcols is not None
    got = fused_device_step_packed(n_rg=1, max_cycle=512, width=96)(
        *[jnp.asarray(c) for c in pcols])
    for a, b in zip(dense, got):
        assert np.asarray(a).tolist() == np.asarray(b).tolist()


def test_sharded_recal_step_packed_matches_dense():
    """The packed sharded covariate program (mesh transfer lever) sums
    to the same psum-reduced tables as the dense program on the
    8-device virtual mesh."""
    import jax.numpy as jnp

    from elprep_tpu.ops import bqsr_ops
    from elprep_tpu.ops.readstats import OP_CLASS
    from elprep_tpu.parallel.mesh import make_mesh
    from elprep_tpu.parallel.sharded import _flat_mesh, _sharded_recal_step

    rng = np.random.RandomState(29)
    mesh = _flat_mesh(make_mesh(8))
    n, L, C = 64, 48, 2  # 8 rows/shard
    base = rng.choice(np.frombuffer(b"ACGTN", np.uint8), (n, L)).astype(np.uint8)
    qual = rng.randint(0, 50, (n, L)).astype(np.uint8)
    skip = rng.rand(n, L) < 0.15
    seq_len = rng.randint(1, L + 1, n).astype(np.int32)
    flag = np.where(rng.rand(n) < 0.5, 0x63, 0x93).astype(np.int32)
    pos = rng.randint(1, 300, n).astype(np.int32)
    rg = np.zeros(n, np.int32)
    refoff = np.zeros(n, np.int64)
    op_class = np.full((n, C), OP_CLASS[ord("S")], np.int8)
    op_class[:, 0] = OP_CLASS[ord("M")]
    op_len = np.zeros((n, C), np.int32)
    op_len[:, 0] = seq_len
    ref_classes = rng.randint(1, 5, 400).astype(np.uint8)

    dense_step = _sharded_recal_step(mesh, 100, 1)
    d_out, d_mac = dense_step(base, qual, seq_len, flag, pos, rg, refoff,
                              skip, op_class, op_len, ref_classes)

    bp, lut = packed.pack_nibble_dict(base)
    p_step = _sharded_recal_step(mesh, 100, 1, packed_width=L)
    p_out, p_mac = p_step(bp, qual, seq_len, flag, pos, rg, refoff,
                          packed.pack_bits(skip), op_class, op_len,
                          ref_classes, lut)
    assert int(d_mac) == int(p_mac)
    for a, b in zip(d_out, p_out):
        assert np.asarray(a).tolist() == np.asarray(b).tolist()
