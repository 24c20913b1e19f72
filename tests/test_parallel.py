"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(reference's distributed story: cmd/sfm.go → mesh collectives)."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from elprep_tpu.parallel import make_mesh

    return make_mesh(8)


def test_sharded_pipeline_matches_single_device(mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P

    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _synthetic_columns
    from elprep_tpu.parallel import distributed_pipeline_step, make_mesh
    from elprep_tpu.ops.bqsr_ops import recalibrate_tables

    mesh = mesh8
    dp, gn = mesh.devices.shape
    max_cycle, n_rg = 128, 1
    n_reads, read_len, ref_len = 16 * dp, 64, 512 * gn
    cols = _synthetic_columns(n_reads, read_len, ref_len, seed=5)
    (base, qual, seq_len, flag, pos, rg, refoff, skip, op_class, op_len,
     ref_classes) = cols
    libid = np.zeros(n_reads, np.int32)
    refid = np.zeros(n_reads, np.int32)
    qrank = np.arange(n_reads, dtype=np.int32)
    cond_prior = np.full((n_rg, 94), 30, np.int32)
    d_cyc = np.zeros((n_rg, 94, 2 * max_cycle + 1), np.int32)
    d_ctx = np.zeros((n_rg, 94, 17), np.int32)
    quant_lut = np.arange(94, dtype=np.uint8)
    sqq_lut = np.arange(255, dtype=np.uint8)
    rg_present = np.ones(n_rg, bool)

    step = distributed_pipeline_step(mesh, max_cycle=max_cycle, n_rg=n_rg)
    rd, rd2, gsh, rep = P("dp"), P("dp", None), P("gn"), P()
    args = (base, qual, seq_len, flag, pos, rg, refoff, skip, op_class, op_len,
            ref_classes, libid, refid, qrank,
            cond_prior, d_cyc, d_ctx, quant_lut, sqq_lut, rg_present)
    specs = (rd2, rd2, rd, rd, rd, rd, rd, rd2, rd2, rd2, gsh, rd, rd, rd,
             rep, rep, rep, rep, rep, rep)
    dargs = [jax.device_put(a, NamedSharding(mesh, s)) for a, s in zip(args, specs)]
    perm, dup, newq, tables = step(*dargs)

    # single-device reference: the reduced tables must equal the
    # unsharded accumulation over the full batch
    import jax.numpy as jnp

    tabs_full = recalibrate_tables(
        *(jnp.asarray(c) for c in cols), max_cycle=max_cycle, n_rg=n_rg)
    for got, want in zip(tables, tabs_full[:6]):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pairhmm_sharded_matches_host(mesh8):
    from elprep_tpu.parallel import pairhmm_sharded
    from elprep_tpu.ops import pairhmm

    rng = np.random.RandomState(8)
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = [(rng.choice(bases, rng.randint(12, 40)).tobytes(),
              rng.randint(5, 40, 30).astype(np.uint8)[: 30], 60) for _ in range(6)]
    reads = [(s, q[: len(s)], m) if len(q) >= len(s) else (s[: len(q)], q, m)
             for s, q, m in reads]
    haps = [rng.choice(bases, rng.randint(30, 70)).tobytes() for _ in range(3)]
    got = pairhmm_sharded(mesh8, reads, haps)
    for r in range(len(reads)):
        for h in range(len(haps)):
            want = pairhmm.pairhmm_f64_diag(reads[r][0], reads[r][1], 60, haps[h])
            assert got[r, h] == pytest.approx(want, abs=2e-3)


def test_mesh_shapes():
    from elprep_tpu.parallel import make_mesh

    if len(jax.devices()) >= 8:
        m = make_mesh(8)
        assert m.devices.shape == (4, 2)
        m1 = make_mesh(1)
        assert m1.devices.shape == (1, 1)
