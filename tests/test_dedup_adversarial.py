"""Adversarial duplicate-marking fixtures with HAND-COMPUTED expected
flags, keyed to each branch of the reference algorithm
(filters/mark-duplicates.go) — independent of tests/oracle.py.

Semantics being pinned (with reference lines):
- adapted Phred score: sum of quals >= 15 (:36-55)
- unclipped 5' position: POS minus leading soft/hard clips (forward),
  POS-1 plus ref-consuming + trailing-clip lengths (reverse) (:79-110)
- fragment phase: winner = highest score, then smallest QNAME, then
  LATEST arrival; a true pair beats every true fragment (:210-254)
- pair phase: key is the canonically ordered (refid, unclipped pos,
  strand) of both mates (:343-353); winner = highest score sum, then
  smallest QNAME (:354-396)
- only reads with none of Unmapped|Secondary|Supplementary participate
  (:427,436)
"""

import numpy as np

from elprep_tpu.core.header import SortingOrder
from elprep_tpu.core.pipeline import SamData, run_pipeline
from elprep_tpu.filters import add_refid, mark_duplicates_filter
from elprep_tpu.io import sam

HEADER = (
    b"@HD\tVN:1.6\tSO:unknown\n"
    b"@SQ\tSN:c1\tLN:100000\n"
    b"@SQ\tSN:c2\tLN:100000\n"
    b"@RG\tID:rg1\tLB:lib1\tSM:s1\n"
)


def _run(lines):
    data = HEADER + b"\n".join(lines) + b"\n"
    hdr, batch = sam.parse_sam(data)
    out = run_pipeline(SamData(hdr, batch),
                       [add_refid, mark_duplicates_filter()],
                       SortingOrder.KEEP)
    return {bytes(q): bool(f & 0x400)
            for q, f in zip(out.batch.qname, out.batch.flag)}


def _frag(qname, pos, cigar, qual, flag=0, rname=b"c1"):
    seq = b"A" * sum(int(x) for x in
                     __import__("re").findall(rb"(\d+)[MIS=X]", cigar))
    return b"%s\t%d\t%s\t%d\t60\t%s\t*\t0\t0\t%s\t%s\tRG:Z:rg1" % (
        qname, flag, rname, pos, cigar, seq, qual)


def test_fragment_score_winner():
    # same unclipped pos (leading soft clips shift POS back):
    # a at pos 110 with 10S -> unclipped 100; b at pos 100 plain -> 100.
    # quals: a = 'P'(47)x4 -> score 188; b = 'I'(40)x4 -> 160.
    # expected: a wins, b duplicate.
    flags = _run([
        _frag(b"a", 110, b"10S4M", b"PPPP" + b""),
        _frag(b"b", 100, b"4M", b"IIII"),
    ])
    assert flags == {b"a": False, b"b": True}


def test_fragment_sub15_quals_do_not_count():
    # '.'(13) < 15 contributes 0: a = 'II..' -> 40+40+0+0 = 80,
    # b = 'III.' -> 120. b wins despite equal base counts.
    flags = _run([
        _frag(b"a", 100, b"4M", b"II.."),
        _frag(b"b", 100, b"4M", b"III."),
    ])
    assert flags == {b"a": True, b"b": False}


def test_fragment_qname_tiebreak():
    # equal scores -> lexicographically smallest QNAME wins
    flags = _run([
        _frag(b"zzz", 100, b"4M", b"IIII"),
        _frag(b"aaa", 100, b"4M", b"IIII"),
    ])
    assert flags == {b"aaa": False, b"zzz": True}


def test_reverse_unclipped_position():
    # reverse read: unclipped pos = POS - 1 + ref-consuming + trailing
    # clips. r1: pos 100, 4M2S reversed -> 99 + 4 + 2 = 105.
    # r2: pos 102, 4M reversed -> 101 + 4 = 105. Same key, both reversed.
    # scores equal -> qname tiebreak: r1 < r2.
    flags = _run([
        _frag(b"r1", 100, b"4M2S", b"IIIIII", flag=0x10),
        _frag(b"r2", 102, b"4M", b"IIII", flag=0x10),
    ])
    # NB scores differ: r1 has 6 bases (240), r2 has 4 (160) -> r1 wins
    assert flags == {b"r1": False, b"r2": True}


def test_strand_separates_fragment_keys():
    # same unclipped pos but opposite strands -> different keys, no dups
    flags = _run([
        _frag(b"f", 100, b"4M", b"IIII"),
        _frag(b"r", 97, b"4M", b"IIII", flag=0x10),  # unclipped 96+4=100
    ])
    assert flags == {b"f": False, b"r": False}


def test_true_pair_beats_fragment():
    # a true fragment at the same (libid, refid, pos, strand) as a true
    # pair's end is ALWAYS a duplicate, even with a higher score
    pair = [
        b"p\t99\tc1\t100\t60\t4M\t=\t200\t104\tAAAA\tIIII\tRG:Z:rg1",
        b"p\t147\tc1\t200\t60\t4M\t=\t100\t-104\tAAAA\tIIII\tRG:Z:rg1",
    ]
    flags = _run(pair + [_frag(b"f", 100, b"4M", b"~~~~")])  # '~'=93 -> 372
    assert flags == {b"p": False, b"f": True}


def test_secondary_supplementary_unmapped_excluded():
    flags = _run([
        _frag(b"s1", 100, b"4M", b"IIII", flag=0x100),   # secondary
        _frag(b"s2", 100, b"4M", b"IIII", flag=0x800),   # supplementary
        _frag(b"u1", 100, b"4M", b"IIII", flag=0x4),     # unmapped
        _frag(b"ok", 100, b"4M", b"IIII"),
    ])
    # the one participant has no competition
    assert flags == {b"s1": False, b"s2": False, b"u1": False, b"ok": False}


def test_pair_canonical_ordering_cross_refid():
    # two pairs with mates on c1/c2 in OPPOSITE row orders must land in
    # the same canonical pair key (refid sort, mark-duplicates.go:343-353)
    def cross(q, p1, p2, qual):
        return [
            b"%s\t97\tc1\t%d\t60\t4M\tc2\t%d\t0\tAAAA\t%s\tRG:Z:rg1" % (q, p1, p2, qual),
            b"%s\t145\tc2\t%d\t60\t4M\tc1\t%d\t0\tAAAA\t%s\tRG:Z:rg1" % (q, p2, p1, qual),
        ]

    def cross_rev(q, p1, p2, qual):
        # same physical pair, rows arriving c2-first
        lines = cross(q, p1, p2, qual)
        return [lines[1], lines[0]]

    # qual 'I' (40*4=160 per read, 320 per pair) vs 'P' (47*4=188, 376)
    flags = _run(cross(b"hi", 500, 700, b"PPPP") + cross_rev(b"lo", 500, 700, b"IIII"))
    assert flags == {b"hi": False, b"lo": True}


def test_pair_score_is_sum_of_both_mates():
    # pair scores are the SUM over both mates:
    def pair(q, q1, q2):
        return [
            b"%s\t99\tc1\t100\t60\t4M\t=\t200\t104\tAAAA\t%s\tRG:Z:rg1" % (q, q1),
            b"%s\t147\tc1\t200\t60\t4M\t=\t100\t-104\tAAAA\t%s\tRG:Z:rg1" % (q, q2),
        ]

    flags = _run(pair(b"A", b"PPPP", b"QQ..")
                 + pair(b"B", b"IIII", b"PPPP"))
    # A: 'PPPP'(188) + 'QQ..'(48+48+0+0=96) = 284
    # B: 'IIII'(160) + 'PPPP'(188) = 348 -> B wins
    assert flags == {b"A": True, b"B": False}


def test_different_library_no_interaction():
    hdr2 = HEADER + b"@RG\tID:rg2\tLB:lib2\tSM:s1\n"
    lines = [
        _frag(b"x", 100, b"4M", b"IIII"),
        b"y\t0\tc1\t100\t60\t4M\t*\t0\t0\tAAAA\tIIII\tRG:Z:rg2",
    ]
    data = hdr2 + b"\n".join(lines) + b"\n"
    hdr, batch = sam.parse_sam(data)
    out = run_pipeline(SamData(hdr, batch),
                       [add_refid, mark_duplicates_filter()],
                       SortingOrder.KEEP)
    flags = {bytes(q): bool(f & 0x400)
             for q, f in zip(out.batch.qname, out.batch.flag)}
    assert flags == {b"x": False, b"y": False}
