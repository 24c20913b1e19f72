"""Fuzz the native activity engine (native.activity_region_columnar)
against the Python oracle (hc/activity.py compute_activity). The native
kernel replicates the oracle's per-position accumulation order, so
is_active / hq_mean must match bit for bit."""

import random

import numpy as np
import pytest

from elprep_tpu import native
from elprep_tpu.core.batch import Ragged
from elprep_tpu.filters import clipping as C
from elprep_tpu.hc import activity
from elprep_tpu.hc.activity import make_hc_params
from elprep_tpu.hc.readblock import ContigReadBlock

pytestmark = pytest.mark.skipif(
    not (native.available()
         and hasattr(native.get_lib(), "activity_region_columnar")),
    reason="native activity engine unavailable")

_BASES = b"ACGT"


def _random_read(rng: random.Random, ref_len: int):
    n_ops = rng.randint(1, 8)
    cigar = []
    nbases = 0
    if rng.random() < 0.2:
        cigar.append((rng.randint(1, 5), "H"))
    for _ in range(n_ops):
        op = rng.choice("MMMMMIDSSN=X")
        ln = rng.randint(1, 30)
        cigar.append((ln, op))
        if op in "MIS=X":
            nbases += ln
    if not any(o in "MIS=X" for _, o in cigar):
        cigar.append((rng.randint(1, 20), "M"))
        nbases += cigar[-1][0]
    if rng.random() < 0.2:
        cigar.append((rng.randint(1, 5), "H"))
    seq = bytes(rng.choice(_BASES) for _ in range(nbases))
    qual = bytes(rng.randint(0, 45) for _ in range(nbases))
    flag = 0
    if rng.random() < 0.8:
        flag |= C.MULTIPLE
    if rng.random() < 0.5:
        flag |= C.REVERSED
    if rng.random() < 0.5:
        flag |= C.NEXT_REVERSED
    if rng.random() < 0.05:
        flag |= C.UNMAPPED
    if rng.random() < 0.05:
        flag |= C.NEXT_UNMAPPED
    pos = rng.randint(1, ref_len)
    # small tlens often, to exercise the adaptor keep rule
    tlen = rng.choice([0, rng.randint(-250, 250), rng.randint(-90, 90)])
    return C.ClipRead(
        flag=flag, pos=pos,
        pnext=0 if rng.random() < 0.1 else rng.randint(1, ref_len + 100),
        tlen=tlen, mapq=rng.randint(0, 60),
        cigar=cigar, seq=seq, qual=qual,
        rname=b"c1",
        rnext=b"*" if rng.random() < 0.1 else b"=",
        qname=b"q", row=0)


def _block_from_reads(reads):
    names = [b"=", b"*", b"c1"]
    name_id = {n: i for i, n in enumerate(names)}
    return ContigReadBlock(
        contig=b"c1",
        flag=np.array([r.flag for r in reads], np.int32),
        pos=np.array([r.pos for r in reads], np.int64),
        pnext=np.array([r.pnext for r in reads], np.int32),
        tlen=np.array([r.tlen for r in reads], np.int32),
        mapq=np.array([r.mapq for r in reads], np.int32),
        cigar_len=Ragged.from_rows(
            [np.array([l for l, _ in r.cigar], np.int32) for r in reads],
            np.int32),
        cigar_op=Ragged.from_rows(
            [np.frombuffer("".join(o for _, o in r.cigar).encode(), np.uint8)
             for r in reads], np.uint8),
        seq=Ragged.from_rows(
            [np.frombuffer(r.seq, np.uint8) for r in reads], np.uint8),
        qual=Ragged.from_rows(
            [np.frombuffer(r.qual, np.uint8) for r in reads], np.uint8),
        qname=np.array([r.qname for r in reads]),
        rnext_id=np.array([name_id[r.rnext] for r in reads], np.int32),
        names=names,
        row=np.arange(len(reads), dtype=np.int64),
    )


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
@pytest.mark.parametrize("mode", ["NONE", "GVCF"])
def test_native_activity_matches_oracle(seed, mode):
    rng = random.Random(seed * 31 + len(mode))
    ref_len = 400
    ref = bytes(rng.choice(_BASES) for _ in range(ref_len))
    params = make_hc_params(mode)
    reads = sorted((_random_read(rng, ref_len) for _ in range(300)),
                   key=lambda r: r.pos)
    block = _block_from_reads(reads)
    cols = activity.make_activity_cols(block)

    for low, high in [(1, ref_len + 1), (50, 180), (180, 181), (395, 420)]:
        rows = np.flatnonzero(
            np.array([r.pos < high for r in reads]))
        want_ia, want_hq = activity.compute_activity(
            [reads[i] for i in rows], ref, low, high, params)
        got = activity.native_compute_activity(cols, rows, ref, low, high,
                                               params)
        assert got is not None
        got_ia, got_hq = got
        assert np.array_equal(want_ia, got_ia), (
            f"is_active mismatch [{low},{high}) seed={seed}: "
            f"{np.flatnonzero(want_ia != got_ia)[:10]}")
        assert np.array_equal(want_hq, got_hq), (
            f"hq_mean mismatch [{low},{high}) seed={seed}")


def test_native_activity_row_subset():
    """Native must honor an arbitrary (ascending) row selection, as
    produced by the worker's _slice_rows."""
    rng = random.Random(99)
    ref_len = 300
    ref = bytes(rng.choice(_BASES) for _ in range(ref_len))
    params = make_hc_params("GVCF")
    reads = sorted((_random_read(rng, ref_len) for _ in range(200)),
                   key=lambda r: r.pos)
    block = _block_from_reads(reads)
    cols = activity.make_activity_cols(block)
    rows = np.flatnonzero(np.array([rng.random() < 0.5 for _ in reads]))
    low, high = 30, 250
    keep = [i for i in rows if reads[i].pos < high]
    want_ia, want_hq = activity.compute_activity(
        [reads[i] for i in keep], ref, low, high, params)
    got_ia, got_hq = activity.native_compute_activity(
        cols, rows, ref, low, high, params)
    assert np.array_equal(want_ia, got_ia)
    assert np.array_equal(want_hq, got_hq)


def test_native_activity_empty():
    params = make_hc_params("NONE")
    block = _block_from_reads([])
    cols = activity.make_activity_cols(block)
    got = activity.native_compute_activity(
        cols, np.zeros(0, np.int64), b"ACGT" * 50, 10, 40, params)
    assert got is not None
    ia, hq = got
    assert not ia.any() and not hq.any()
