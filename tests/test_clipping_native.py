"""Fuzz the native clipping engine against the Python oracle
(filters/clipping.py). Every mode combination the pipeline uses is
driven over randomized reads with adversarial cigars; outputs (pos,
flag, mapq, cigar, seq/qual windows) must match read for read."""

import random

import numpy as np
import pytest

from elprep_tpu import native
from elprep_tpu.filters import clipping as C

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def _random_read(rng: random.Random):
    n_ops = rng.randint(1, 8)
    cigar = []
    nbases = 0
    # leading/trailing H sometimes
    if rng.random() < 0.25:
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
    if rng.random() < 0.25:
        cigar.append((rng.randint(1, 5), "H"))
    seq = bytes(rng.choice(b"ACGT") for _ in range(nbases))
    qual = bytes(rng.randint(0, 45) for _ in range(nbases))
    flag = 0
    if rng.random() < 0.8:
        flag |= C.MULTIPLE
    if rng.random() < 0.5:
        flag |= C.REVERSED
    if rng.random() < 0.5:
        flag |= C.NEXT_REVERSED
    if rng.random() < 0.1:
        flag |= C.UNMAPPED
    if rng.random() < 0.1:
        flag |= C.NEXT_UNMAPPED
    pos = rng.randint(1, 300)
    return C.ClipRead(
        flag=flag, pos=pos,
        pnext=0 if rng.random() < 0.1 else rng.randint(1, 400),
        tlen=rng.choice([0, rng.randint(-250, 250), rng.randint(-90, 90)]),
        mapq=rng.randint(0, 60),
        cigar=cigar, seq=seq, qual=qual,
        rname=b"*" if rng.random() < 0.05 else b"c1",
        rnext=b"*" if rng.random() < 0.05 else b"=",
        qname=b"q", row=0)


def _oracle_chain(r: C.ClipRead, modes: int, lowq: int, rs: int, re_: int):
    """Apply the same chain the native engine runs, via clipping.py."""
    err = False
    try:
        if modes & native.CLIP_LOWQ_ENDS:
            C.hard_clip_low_qual_ends(r, lowq)
        if modes & native.CLIP_SOFT_OR_REVERT:
            well, _ = C.has_well_defined_fragment_size(r)
            if well:
                C.revert_soft_clipped_bases(r)
            else:
                C.hard_clip_soft_clipped_bases(r)
        if modes & native.CLIP_SOFTCLIP:
            C.hard_clip_soft_clipped_bases(r)
        if modes & native.CLIP_ADAPTOR:
            C.hard_clip_adaptor_sequence(r)
        if (modes & native.CLIP_ADAPTOR_IF_MAPPED) and not C.is_strict_unmapped(r):
            C.hard_clip_adaptor_sequence(r)
        if modes & native.CLIP_TO_REGION:
            C.hard_clip_to_region(r, rs, re_)
    except ValueError:
        err = True
    return r, err


def _run_native(reads, modes, lowq, rs, re_):
    n = len(reads)
    lens = np.concatenate([[l for l, _ in r.cigar] or [0] for r in reads]) \
        if n else np.zeros(0)
    # build ragged cigars properly (empty rows allowed)
    flat_lens, flat_ops, off = [], [], [0]
    qual_flat, qoff = [], [0]
    for r in reads:
        for l, o in r.cigar:
            flat_lens.append(l)
            flat_ops.append(ord(o))
        off.append(len(flat_lens))
        qual_flat.append(np.frombuffer(r.qual, np.uint8))
        qoff.append(qoff[-1] + len(r.qual))
    return native.clip_reads(
        np.array([r.flag for r in reads], np.int32),
        np.array([r.pos for r in reads], np.int64),
        np.array([r.pnext for r in reads], np.int64),
        np.array([r.tlen for r in reads], np.int64),
        np.array([r.mapq for r in reads], np.int32),
        (np.array(flat_lens, np.int32), np.array(flat_ops, np.uint8),
         np.array(off, np.int64)),
        np.concatenate(qual_flat) if qual_flat else np.zeros(0, np.uint8),
        np.array(qoff, np.int64),
        np.array([r.rname in (b"", b"*") for r in reads], np.uint8),
        np.array([r.rnext in (b"", b"*") for r in reads], np.uint8),
        modes, lowq, rs, re_)


MODE_SETS = [
    # HC finalize (use_soft_clipped_bases=True): lowq + soft-or-revert + adaptor-if-mapped
    native.CLIP_LOWQ_ENDS | native.CLIP_SOFT_OR_REVERT | native.CLIP_ADAPTOR_IF_MAPPED,
    # HC finalize (use_soft_clipped_bases=False)
    native.CLIP_LOWQ_ENDS | native.CLIP_SOFTCLIP | native.CLIP_ADAPTOR_IF_MAPPED,
    # BQSR prep: adaptor then soft-clip removal
    native.CLIP_ADAPTOR | native.CLIP_SOFTCLIP,
    # region clipping alone and combined
    native.CLIP_TO_REGION,
    native.CLIP_LOWQ_ENDS | native.CLIP_SOFT_OR_REVERT
    | native.CLIP_ADAPTOR_IF_MAPPED | native.CLIP_TO_REGION,
]


@pytest.mark.parametrize("modes", MODE_SETS)
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_native_clip_matches_oracle(modes, seed):
    rng = random.Random(seed * 1000 + modes)
    raw = [_random_read(rng) for _ in range(600)]
    lowq = 9
    rs, re_ = 120, 260

    # the oracle itself raises on some adversarial reads (coordinate
    # maps to no base); native must raise for those — compare on the
    # error-free subset and assert the raise separately
    reads, expected, n_err = [], [], 0
    for i, orig in enumerate(raw):
        r = C.ClipRead(flag=orig.flag, pos=orig.pos, pnext=orig.pnext,
                       tlen=orig.tlen, mapq=orig.mapq, cigar=list(orig.cigar),
                       seq=orig.seq, qual=orig.qual, rname=orig.rname,
                       rnext=orig.rnext, qname=orig.qname, row=i)
        r, err = _oracle_chain(r, modes, lowq, rs, re_)
        if err:
            n_err += 1
            with pytest.raises(ValueError):
                _run_native([orig], modes, lowq, rs, re_)
            continue
        reads.append(orig)
        expected.append(r)

    got = _run_native(reads, modes, lowq, rs, re_)
    assert got is not None
    for i, (orig, r) in enumerate(zip(reads, expected)):
        b = int(got["cig_base"][i])
        m = int(got["n_ops"][i])
        ncig = list(zip(got["lens"][b:b + m].tolist(),
                        [chr(c) for c in got["ops"][b:b + m]]))
        bs, bl = int(got["bstart"][i]), int(got["blen"][i])
        assert (int(got["flag"][i]), int(got["pos"][i]), int(got["mapq"][i])) \
            == (r.flag, r.pos, r.mapq), f"read {i} header mismatch"
        assert ncig == r.cigar, f"read {i} cigar {ncig} != {r.cigar}"
        assert orig.seq[bs:bs + bl] == r.seq, f"read {i} seq window"
        assert orig.qual[bs:bs + bl] == r.qual, f"read {i} qual window"


def test_native_clip_raises_like_oracle():
    """A read whose adaptor boundary maps to no base must raise the same
    ValueError as the oracle path."""
    # construct reads until one triggers the oracle ValueError under the
    # BQSR chain; then the native call over that read must raise too
    rng = random.Random(77)
    bad = None
    for _ in range(20000):
        r = _random_read(rng)
        probe = C.ClipRead(flag=r.flag, pos=r.pos, pnext=r.pnext, tlen=r.tlen,
                           mapq=r.mapq, cigar=list(r.cigar), seq=r.seq,
                           qual=r.qual, rname=r.rname, rnext=r.rnext,
                           qname=r.qname, row=0)
        _, err = _oracle_chain(probe, native.CLIP_ADAPTOR | native.CLIP_SOFTCLIP,
                               9, 0, 0)
        if err:
            bad = r
            break
    if bad is None:
        pytest.skip("no error-triggering read found")
    with pytest.raises(ValueError):
        _run_native([bad], native.CLIP_ADAPTOR | native.CLIP_SOFTCLIP, 9, 0, 0)
