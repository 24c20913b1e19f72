"""Unit tests for the fifteen simple filters
(reference: filters/simple-filters.go) plus queryname sorting e2e."""

import numpy as np
import pytest

from elprep_tpu.core.header import SortingOrder, parse_sam_header
from elprep_tpu.core.pipeline import SamData, run_pipeline
from elprep_tpu.filters import simple as F
from elprep_tpu.io import sam

HDR = (
    b"@HD\tVN:1.6\tSO:unknown\n"
    b"@SQ\tSN:c1\tLN:1000\n"
    b"@SQ\tSN:c2\tLN:500\n"
    b"@RG\tID:rg1\tLB:l1\tSM:s1\n"
)


def _parse(lines, hdr=HDR):
    return sam.parse_sam(hdr + b"\n".join(lines) + b"\n")


def _aln(q, flag=0, rname=b"c1", pos=100, mapq=30, cigar=b"4M", rnext=b"*",
         pnext=0, tags=b""):
    return b"%s\t%d\t%s\t%d\t%d\t%s\t%s\t%d\t0\tACGT\tIIII%s" % (
        q, flag, rname, pos, mapq, cigar, rnext, pnext, tags)


def _run(lines, filters, order=SortingOrder.KEEP, hdr=HDR):
    h, b = _parse(lines, hdr)
    return run_pipeline(SamData(h, b), filters, order)


def test_remove_unmapped_reads():
    out = _run([_aln(b"m"), _aln(b"u", flag=0x4)], [F.remove_unmapped_reads])
    assert list(out.batch.qname) == [b"m"]


def test_remove_unmapped_reads_strict():
    # strict also drops POS==0 and RNAME=='*' (simple-filters.go:79-83)
    out = _run([
        _aln(b"ok"),
        _aln(b"p0", pos=0),
        b"star\t0\t*\t100\t30\t4M\t*\t0\t0\tACGT\tIIII",
    ], [F.remove_unmapped_reads_strict])
    assert list(out.batch.qname) == [b"ok"]


def test_remove_non_exact_mapping_reads():
    # only M and S ops allowed
    out = _run([
        _aln(b"m", cigar=b"4M"),
        _aln(b"ms", cigar=b"2S2M"),
        _aln(b"ins", cigar=b"2M1I1M"),
        _aln(b"del", cigar=b"2M1D2M"),
        _aln(b"eq", cigar=b"4="),
    ], [F.remove_non_exact_mapping_reads])
    assert list(out.batch.qname) == [b"m", b"ms"]


def test_remove_non_exact_mapping_reads_strict():
    out = _run([
        _aln(b"good", tags=b"\tX0:i:1\tX1:i:0\tXM:i:0\tXO:i:0\tXG:i:0"),
        _aln(b"multi", tags=b"\tX0:i:2\tX1:i:0\tXM:i:0\tXO:i:0\tXG:i:0"),
        _aln(b"notags"),
    ], [F.remove_non_exact_mapping_reads_strict])
    assert list(out.batch.qname) == [b"good"]


def test_remove_duplicate_and_clear_flag():
    lines = [_aln(b"d", flag=0x400), _aln(b"k")]
    out = _run(lines, [F.remove_duplicate_reads])
    assert list(out.batch.qname) == [b"k"]
    out2 = _run(lines, [F.clear_duplicate_flag])
    assert (out2.batch.flag & 0x400 == 0).all()
    assert len(out2.batch) == 2


def test_remove_optional_reads_sr():
    hdr_sr = HDR + b"@sr\tss:1\n"
    out = _run([_aln(b"s", tags=b"\tsr:i:1"), _aln(b"k")],
               [F.remove_optional_reads], hdr=hdr_sr)
    assert list(out.batch.qname) == [b"k"]


def test_add_or_replace_read_group():
    out = _run([_aln(b"a", tags=b"\tRG:Z:old")],
               [F.add_or_replace_read_group({"ID": "new", "SM": "s2"})])
    assert out.header.rg == [{"ID": "new", "SM": "s2"}]
    assert b"RG:Z:new" in out.batch.tags.row(0)


def test_add_pg_line_chains():
    h, b = _parse([_aln(b"a")])
    h.pg = [{"ID": "prev", "PN": "x"}]
    out = run_pipeline(SamData(h, b),
                       [F.add_pg_line({"ID": "me", "PN": "me", "CL": "cmd"})],
                       SortingOrder.KEEP)
    me = next(p for p in out.header.pg if p["PN"] == "me")
    assert me["PP"] == "prev"  # chain link (simple-filters.go:166-184)


def test_rename_chromosomes():
    out = _run([_aln(b"a", rnext=b"c2", pnext=50)], [F.rename_chromosomes])
    assert out.header.sq[0]["SN"] == "chrc1"
    assert out.batch.rname_bytes()[0] == b"chrc1"
    assert out.batch.rnext_bytes()[0] == b"chrc2"


def test_add_refid():
    out = _run([
        _aln(b"a", rname=b"c2", rnext=b"=", pnext=1),
        b"u\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII",
    ], [F.add_refid])
    np.testing.assert_array_equal(out.batch.temps["REFID"], [1, -1])
    np.testing.assert_array_equal(out.batch.temps["NextREFID"], [1, -1])


def test_remove_and_keep_optional_fields():
    lines = [_aln(b"a", tags=b"\tNM:i:1\tMD:Z:4\tRG:Z:rg1")]
    out = _run(lines, [F.remove_optional_fields(["NM", "MD"])])
    t = out.batch.tags.row(0)
    assert b"NM" not in t and b"MD" not in t and b"RG:Z:rg1" in t
    out2 = _run(lines, [F.keep_optional_fields(["RG"])])
    t2 = out2.batch.tags.row(0)
    assert t2 == b"RG:Z:rg1"
    # "all" is a no-op elision at the filter level; the CLI maps it to
    # keep_optional_fields([]) (reference: cmd/filter.go:879-880)
    assert F.remove_optional_fields([]) is None
    out3 = _run(lines, [F.keep_optional_fields([])])
    assert out3.batch.tags.row(0) == b""


def test_clean_sam():
    # read running past the contig end is soft-clipped; unmapped MAPQ=0.
    # NB the S length replicates the reference's own arithmetic quirk:
    # clippedBases = readLength + (clipFrom-1) (filters/utils.go:112),
    # so 4M at pos 999 on LN=1000 becomes 1M5S, not Picard's 1M3S —
    # output equivalence with the reference is the contract.
    out = _run([
        _aln(b"over", pos=999, cigar=b"4M"),
        _aln(b"u", flag=0x4, mapq=37),
    ], [F.clean_sam])
    assert out.batch.cigar_op.row(0).tobytes() == b"MS"
    np.testing.assert_array_equal(out.batch.cigar_len.row(0), [1, 5])
    assert out.batch.mapq[1] == 0


def test_remove_mapping_quality_less_than():
    out = _run([_aln(b"lo", mapq=5), _aln(b"hi", mapq=50)],
               [F.remove_mapping_quality_less_than(10)])
    assert list(out.batch.qname) == [b"hi"]
    assert F.remove_mapping_quality_less_than(0) is None  # no-op elision


def test_remove_non_overlapping_reads():
    from elprep_tpu.io import bed as bedio

    b = bedio.parse_bed_data(b"c1\t90\t105\n") if hasattr(bedio, "parse_bed_data") else None
    if b is None:
        import tempfile, os

        with tempfile.NamedTemporaryFile("wb", suffix=".bed", delete=False) as f:
            f.write(b"c1\t90\t105\n")
        b = bedio.parse_bed(f.name)
        os.unlink(f.name)
    out = _run([
        _aln(b"in", pos=100),     # overlaps [91, 105]
        _aln(b"out", pos=300),
        _aln(b"c2r", rname=b"c2", pos=100),
    ], [F.remove_non_overlapping_reads(b)])
    assert list(out.batch.qname) == [b"in"]


def test_replace_reference_sequence_dictionary():
    # keep reads whose contig is in the new dictionary; header replaced
    out = _run([
        _aln(b"k"),
        _aln(b"drop", rname=b"c2"),
    ], [F.replace_reference_sequence_dictionary([{"SN": "c1", "LN": "1000"}])])
    assert [sq["SN"] for sq in out.header.sq] == ["c1"]
    assert list(out.batch.qname) == [b"k"]


def test_queryname_sort_end_to_end():
    lines = [_aln(b"zz", pos=10), _aln(b"aa", pos=50), _aln(b"mm", pos=5)]
    out = _run(lines, [F.add_refid], SortingOrder.QUERYNAME)
    assert list(out.batch.qname) == [b"aa", b"mm", b"zz"]
    assert out.header.hd_so() == SortingOrder.QUERYNAME
