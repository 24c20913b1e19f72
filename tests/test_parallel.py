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


def test_sharded_sort_dedup_step_matches_single_device(mesh8):
    """The SHIPPED shard_mapped program (parallel/sharded.py — the one
    `filter --sharded` jits) must give each shard the same verdicts and
    permutation the single-device kernels give that shard's rows."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from elprep_tpu.ops import sortkeys
    from elprep_tpu.ops.dedup import mark_duplicates
    from elprep_tpu.parallel.sharded import (DUPLICATE, _flat_mesh,
                                             sharded_sort_dedup_step)

    flat = _flat_mesh(mesh8)
    n_dev = flat.devices.size
    per = 16
    n = per * n_dev
    rng = np.random.RandomState(5)
    flag = np.where(rng.rand(n) < 0.5, 0x63, 0x93).astype(np.int32)
    refid = np.repeat(np.arange(n_dev, dtype=np.int32), per)
    pos = rng.randint(1, 500, n).astype(np.int32)  # small range: collisions
    mapq = np.full(n, 60, np.int32)
    qrank = rng.permutation(n).astype(np.int32)
    libid = np.zeros(n, np.int32)
    upos = pos.copy()
    rev = (flag >> 4) & 1
    score = rng.randint(0, 3000, n).astype(np.int32)
    cols = (flag, refid, pos, mapq, refid, pos, np.zeros(n, np.int32), qrank,
            libid, upos, rev, score)

    step = sharded_sort_dedup_step(flat)
    dargs = [jax.device_put(c, NamedSharding(flat, P("dp"))) for c in cols]
    dup, perm = step(*dargs)
    dup = np.asarray(dup).reshape(n_dev, per)
    perm = np.asarray(perm).reshape(n_dev, per)

    for s in range(n_dev):
        sl = slice(s * per, (s + 1) * per)
        want_dup = np.asarray(mark_duplicates(
            *(jnp.asarray(c[sl]) for c in (libid, refid, upos, rev, score,
                                           qrank, flag))))
        np.testing.assert_array_equal(dup[s], want_dup)
        flag2 = flag[sl] | want_dup.astype(np.int32) * DUPLICATE
        want_perm = np.asarray(sortkeys.coordinate_sort_perm(
            jnp.asarray(flag2), jnp.asarray(refid[sl]), jnp.asarray(pos[sl]),
            jnp.asarray(mapq[sl]), jnp.asarray(refid[sl]), jnp.asarray(pos[sl]),
            jnp.zeros(per, jnp.int32), jnp.asarray(qrank[sl])))
        np.testing.assert_array_equal(perm[s], want_perm)


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
