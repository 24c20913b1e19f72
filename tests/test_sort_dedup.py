"""Device sort + dedup vs the sequential reference-semantics oracle."""

import numpy as np
import pytest

from elprep_tpu.core.header import SortingOrder
from elprep_tpu.core.pipeline import SamData, run_pipeline, sort_batch
from elprep_tpu.filters import add_refid, mark_duplicates_filter
from elprep_tpu.io.sam import parse_sam
from elprep_tpu.ops import readstats, sortkeys
from elprep_tpu.ops.dedup import mark_duplicates_batch

import oracle
from samgen import make_sam


RGS = [{"ID": "grp1", "LB": "libA"}, {"ID": "grp2", "LB": "libB"}, {"ID": "grp3", "LB": "libA"}]
RG_IDS = ["grp1", "grp2", "grp3"]


def _parsed(n=2000, seed=11):
    data = make_sam(n, seed=seed, rgs=RGS, rg_ids=RG_IDS)
    hdr, batch = parse_sam(data)
    bf = add_refid(hdr)
    bf(batch)
    return hdr, batch


def test_readstats_match_oracle():
    hdr, batch = _parsed(500, seed=5)
    reads = oracle.reads_from_batch(batch, hdr)
    op_class, op_len, n_ops = readstats.pad_cigars(batch.cigar_len, batch.cigar_op)
    qual_padded, qual_len = readstats.pad_quals(batch.qual)
    upos = np.asarray(readstats.unclipped_position(batch.pos, batch.flag, op_class, op_len, n_ops))
    score = np.asarray(readstats.phred_score(qual_padded, qual_len))
    for i, r in enumerate(reads):
        assert upos[i] == r.upos, f"read {i}: upos {upos[i]} != {r.upos}"
        assert score[i] == r.score, f"read {i}: score {score[i]} != {r.score}"


def test_unclipped_position_edge_cases():
    # hand-built cases incl. hard clips, reverse strand, leading/trailing clips
    sam = (
        b"@SQ\tSN:c\tLN:10000\n"
        b"r1\t0\tc\t100\t30\t5S95M\t*\t0\t0\t" + b"A" * 100 + b"\t" + b"I" * 100 + b"\n"
        b"r2\t16\tc\t100\t30\t95M5S\t*\t0\t0\t" + b"A" * 100 + b"\t" + b"I" * 100 + b"\n"
        b"r3\t16\tc\t100\t30\t5H90M5S\t*\t0\t0\t" + b"A" * 95 + b"\t" + b"I" * 95 + b"\n"
        b"r4\t0\tc\t100\t30\t3H2S95M\t*\t0\t0\t" + b"A" * 97 + b"\t" + b"I" * 97 + b"\n"
        b"r5\t16\tc\t100\t30\t10M2D5M2I3N7M\t*\t0\t0\t" + b"A" * 24 + b"\t" + b"I" * 24 + b"\n"
    )
    hdr, batch = parse_sam(sam)
    reads = oracle.reads_from_batch(batch, hdr)
    op_class, op_len, n_ops = readstats.pad_cigars(batch.cigar_len, batch.cigar_op)
    upos = np.asarray(readstats.unclipped_position(batch.pos, batch.flag, op_class, op_len, n_ops))
    for i, r in enumerate(reads):
        assert upos[i] == r.upos, f"read {i}"
    # sanity of specific values
    assert upos[0] == 95  # forward: pos - leading clips
    assert upos[1] == 100 - 1 + 95 + 5  # reverse: end + trailing clips


def test_coordinate_sort_matches_oracle():
    hdr, batch = _parsed(2000, seed=11)
    reads = oracle.reads_from_batch(batch, hdr)
    expected = [r.index for r in oracle.coordinate_sort(reads)]
    sorted_batch = sort_batch(batch, SortingOrder.COORDINATE)
    # identity check via qname+flag+pos
    got_ids = [
        (sorted_batch.qname[i], int(sorted_batch.flag[i]), int(sorted_batch.pos[i]))
        for i in range(len(sorted_batch))
    ]
    want_ids = [(reads[j].qname, reads[j].flag, reads[j].pos) for j in expected]
    assert got_ids == want_ids


def test_mark_duplicates_matches_oracle():
    hdr, batch = _parsed(3000, seed=23)
    reads = oracle.reads_from_batch(batch, hdr)
    want = oracle.mark_duplicates_oracle(reads)
    dup, _ = mark_duplicates_batch(batch, hdr)
    mismatches = [i for i in range(len(reads)) if bool(dup[i]) != want[i]]
    assert not mismatches, f"{len(mismatches)} mismatches, first: {mismatches[:5]}"
    assert sum(want) > 0  # the generator must actually produce duplicates


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_mark_duplicates_randomized(seed):
    hdr, batch = _parsed(1200, seed=seed)
    reads = oracle.reads_from_batch(batch, hdr)
    want = oracle.mark_duplicates_oracle(reads)
    dup, _ = mark_duplicates_batch(batch, hdr)
    assert [bool(d) for d in dup] == want


def test_pipeline_sort_and_dedup_end_to_end():
    data = make_sam(1000, seed=77, rgs=RGS, rg_ids=RG_IDS)
    hdr, batch = parse_sam(data)
    out = run_pipeline(
        SamData(hdr, batch),
        [add_refid, mark_duplicates_filter()],
        SortingOrder.COORDINATE,
    )
    assert out.header.hd_so() == SortingOrder.COORDINATE
    # sorted by (refid, pos) for valid refids
    refid = out.batch.temps["REFID"]
    pos = out.batch.pos
    key = refid.astype(np.int64) * 2**33 + pos
    key = np.where(refid < 0, np.iinfo(np.int64).max, key)
    assert (np.diff(key) >= 0).all()
    assert (out.batch.flag & 0x400).sum() > 0


@pytest.mark.parametrize("n,seed", [(1, 1), (9, 2), (1000, 3), (4000, 29)])
def test_host_twins_match_jit_kernels(n, seed):
    """The numpy host twins (np.lexsort/reduceat) must produce the exact
    permutation and duplicate mask of the jitted XLA kernels — the
    dispatch cost model routes small batches through the twins, so both
    engines stay covered by a direct equality check."""
    import jax.numpy as jnp

    from elprep_tpu.ops.dedup import dedup_columns, mark_duplicates, mark_duplicates_host

    hdr, batch = _parsed(n, seed=seed)
    qrank = sortkeys.qname_ranks(batch.qname)
    refid = batch.temps["REFID"]
    nreal = len(batch)
    n_pad = 1
    while n_pad < nreal:
        n_pad *= 2

    def _pad(a, fill):
        out = np.full(n_pad, fill, np.asarray(a).dtype)
        out[:nreal] = a
        return jnp.asarray(out)

    # coordinate sort permutation
    perm_jit = np.asarray(sortkeys.coordinate_sort_perm(
        _pad(batch.flag, 0x4), _pad(refid, np.int32(2 ** 30)),
        _pad(batch.pos, np.int32(2 ** 30)), _pad(batch.mapq, 0),
        _pad(batch.temps["NextREFID"], np.int32(2 ** 30)),
        _pad(batch.pnext, np.int32(2 ** 30)), _pad(batch.tlen, 0),
        _pad(qrank, np.int32(2 ** 30))))
    perm_jit = perm_jit[perm_jit < nreal]
    perm_host = sortkeys.coordinate_sort_perm_host(
        batch.flag, refid, batch.pos, batch.mapq, batch.temps["NextREFID"],
        batch.pnext, batch.tlen, qrank)
    assert perm_jit.tolist() == perm_host.tolist()

    # duplicate mask
    libid, upos, score, rev = dedup_columns(batch, hdr)
    dup_jit = np.asarray(mark_duplicates(
        _pad(libid, -1), _pad(refid, np.int32(2 ** 30)), _pad(upos, 0),
        _pad(rev, 0), _pad(score, 0), _pad(qrank, np.int32(2 ** 30)),
        _pad(batch.flag, np.int32(0x4))))[:nreal]
    dup_host = mark_duplicates_host(libid, refid, upos, rev, score, qrank,
                                    batch.flag)
    assert dup_jit.tolist() == dup_host.tolist()


def test_host_twins_fallback_without_native_sort(monkeypatch):
    """The np.lexsort fallback (the packing oracle) must match the jit
    kernels too when the native stable sort is unavailable."""
    from elprep_tpu import native

    monkeypatch.setattr(native, "stable_sort_idx", lambda *a, **k: None)
    test_host_twins_match_jit_kernels(3000, 77)


def test_native_dedup_score_upos_matches_jit_oracles():
    """Fuzz the one-pass ragged (unclipped_position, phred_score) native
    twin against the jitted padded oracles: random ragged cigars (incl.
    '*' rows, clip runs on both ends, H clips), ragged quals incl.
    values outside [15,93], both strands."""
    import numpy as np

    from elprep_tpu import native
    from elprep_tpu.ops import readstats

    if native.get_lib() is None or not hasattr(native.get_lib(),
                                               "dedup_score_upos"):
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(41)
    ops_pool = np.frombuffer(b"MIDNSHP=X", np.uint8)
    for trial in range(10):
        n = int(rng.randint(1, 300))
        n_ops_row = rng.randint(0, 7, n)
        cig_off = np.zeros(n + 1, np.int64)
        np.cumsum(n_ops_row, out=cig_off[1:])
        total_ops = int(cig_off[-1])
        cig_op = rng.choice(ops_pool, total_ops).astype(np.uint8)
        # force some rows to start/end with clip runs
        for i in range(n):
            if n_ops_row[i] >= 2 and rng.rand() < 0.5:
                cig_op[cig_off[i]] = ord("S") if rng.rand() < 0.5 else ord("H")
                cig_op[cig_off[i + 1] - 1] = (
                    ord("S") if rng.rand() < 0.5 else ord("H"))
        cig_len = rng.randint(1, 40, total_ops).astype(np.int32)
        qlens = rng.randint(0, 60, n)
        qual_off = np.zeros(n + 1, np.int64)
        np.cumsum(qlens, out=qual_off[1:])
        qual = rng.randint(0, 100, int(qual_off[-1])).astype(np.uint8)
        pos = rng.randint(1, 10000, n).astype(np.int32)
        flag = (rng.randint(0, 2, n) * 0x10).astype(np.int32)

        got = native.dedup_score_upos(qual, qual_off, cig_len, cig_op,
                                      cig_off, pos, flag)
        assert got is not None
        upos_n, score_n = got

        from elprep_tpu.core.batch import Ragged

        op_class, op_len, n_ops = readstats.pad_cigars(
            Ragged(cig_len, cig_off), Ragged(cig_op, cig_off))
        qual_padded, qual_len = readstats.pad_quals(Ragged(qual, qual_off))
        upos_j = np.asarray(readstats.unclipped_position(
            pos, flag, op_class, op_len, n_ops))
        score_j = np.asarray(readstats.phred_score(qual_padded, qual_len))
        assert upos_n.tolist() == upos_j.tolist(), trial
        assert score_n.tolist() == score_j.tolist(), trial


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_qname_ranks_matches_numpy(seed):
    """Native parallel qname rank == np.unique inverse (the oracle),
    across duplicate-heavy, shared-prefix, and varying-width names."""
    import numpy as np

    from elprep_tpu import native
    from elprep_tpu.ops import sortkeys

    rng = np.random.RandomState(seed)
    names = []
    for i in range(5000):
        style = rng.randint(3)
        if style == 0:
            names.append(b"frag%06d" % rng.randint(2000))
        elif style == 1:
            names.append(b"M01:1:FC:1:2208:%d:%d"
                         % (rng.randint(100), rng.randint(100)))
        else:
            names.append(bytes(rng.randint(33, 127, rng.randint(1, 20))
                               .astype(np.uint8)))
    w = max(len(x) for x in names)
    arr = np.array(names, dtype="S%d" % w)
    oracle = np.unique(arr, return_inverse=True)[1].astype(np.int32)
    got = native.qname_ranks_fixed(arr)
    assert got is not None
    assert np.array_equal(got, oracle)
    # and the dispatching wrapper picks the same values
    assert np.array_equal(sortkeys.qname_ranks(arr), oracle)
