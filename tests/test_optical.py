"""Optical duplicate marking + Picard metrics tests
(reference semantics: filters/mark-optical-duplicates.go)."""

import numpy as np

from elprep_tpu.core.pipeline import SamData, run_pipeline
from elprep_tpu.core.header import SortingOrder
from elprep_tpu.filters import add_refid, mark_duplicates_filter
from elprep_tpu.filters.markdup import MarkDuplicatesState
from elprep_tpu.filters.optical import (
    DuplicatesCtr,
    estimate_library_size,
    format_float,
    mark_optical_duplicates,
    parse_tile_info,
    print_duplicates_metrics,
)
from elprep_tpu.io import sam


HEADER = (
    b"@HD\tVN:1.6\tSO:unknown\n"
    b"@SQ\tSN:c1\tLN:100000\n"
    b"@RG\tID:rg1\tLB:lib1\tSM:s1\n"
)


def _pair(qname, pos1, pos2, qual="I" * 10, rg=b"rg1", mapq=60):
    """A proper pair of 10M reads."""
    q = qname.encode() if isinstance(qname, str) else qname
    l1 = b"%s\t99\tc1\t%d\t%d\t10M\t=\t%d\t%d\tACGTACGTAC\t%s\tRG:Z:%s" % (
        q, pos1, mapq, pos2, pos2 - pos1 + 10, qual.encode(), rg)
    l2 = b"%s\t147\tc1\t%d\t%d\t10M\t=\t%d\t%d\tACGTACGTAC\t%s\tRG:Z:%s" % (
        q, pos2, mapq, pos1, -(pos2 - pos1 + 10), qual.encode(), rg)
    return [l1, l2]


def _run(lines):
    data = HEADER + b"\n".join(lines) + b"\n"
    hdr, batch = sam.parse_sam(data)
    state = MarkDuplicatesState()
    out = run_pipeline(
        SamData(hdr, batch),
        [add_refid, mark_duplicates_filter(state=state)],
        SortingOrder.KEEP,
    )
    return out, state


def test_parse_tile_info():
    assert parse_tile_info(b"machine:run:flow:1:2203:11111:22222") == (2203, 11111, 22222)
    assert parse_tile_info(b"run:1:2203:11111:22222") == (2203, 11111, 22222)
    assert parse_tile_info(b"plainname") == (-1, -1, -1)
    assert parse_tile_info(b"a:b:c:d:e:f:g") == (-1, -1, -1)


def test_optical_duplicates_close_pixels():
    # two duplicate pairs on the same tile, pixel distance 10 -> optical
    lines = (
        _pair(b"M:R:F:1:2203:100:100", 1000, 1200, qual="I" * 10)
        + _pair(b"M:R:F:1:2203:105:108", 1000, 1200, qual="5" * 10)
    )
    out, state = _run(lines)
    ctrs = mark_optical_duplicates(out.batch, out.header, state.aux, pixel_distance=100)
    ctr = ctrs["lib1"]
    assert ctr.ReadPairsExamined == 2
    assert ctr.ReadPairDuplicates == 1
    assert ctr.ReadPairOpticalDuplicates == 1
    assert ctr.duplicatesCountHistogram == {2: 1}
    assert ctr.opticalDuplicatesCountHistogram == {2: 1}
    # non-optical: dup_count - optical = 1 -> {1: 1}
    assert ctr.nonOpticalDuplicatesCountHistogram == {1: 1}
    assert abs(ctr.percentDuplication - 0.5) < 1e-12


def test_optical_duplicates_far_pixels():
    lines = (
        _pair(b"M:R:F:1:2203:100:100", 1000, 1200, qual="I" * 10)
        + _pair(b"M:R:F:1:2203:100:99999", 1000, 1200, qual="5" * 10)
    )
    out, state = _run(lines)
    ctrs = mark_optical_duplicates(out.batch, out.header, state.aux, pixel_distance=100)
    ctr = ctrs["lib1"]
    assert ctr.ReadPairDuplicates == 1
    assert ctr.ReadPairOpticalDuplicates == 0


def test_optical_duplicates_different_tile():
    lines = (
        _pair(b"M:R:F:1:1101:100:100", 1000, 1200, qual="I" * 10)
        + _pair(b"M:R:F:1:2203:100:100", 1000, 1200, qual="5" * 10)
    )
    out, state = _run(lines)
    ctrs = mark_optical_duplicates(out.batch, out.header, state.aux, pixel_distance=100)
    assert ctrs["lib1"].ReadPairOpticalDuplicates == 0


def test_optical_duplicates_strand_split():
    # the reverse-strand representative of pair B lands in the other list
    # even at distance 0: forward/reverse are counted separately
    # (mark-optical-duplicates.go:280-300). Flip FIRST/LAST so the rep
    # read (FIRST) of pair B is the reversed mate at the same coords.
    a = _pair(b"M:R:F:1:2203:100:100", 1000, 1200, qual="I" * 10)
    b1 = b"M:R:F:1:2203:100:101\t163\tc1\t1000\t60\t10M\t=\t1200\t210\tACGTACGTAC\t5555555555\tRG:Z:rg1"
    b2 = b"M:R:F:1:2203:100:101\t83\tc1\t1200\t60\t10M\t=\t1000\t-210\tACGTACGTAC\t5555555555\tRG:Z:rg1"
    out, state = _run(a + [b1, b2])
    ctrs = mark_optical_duplicates(out.batch, out.header, state.aux, pixel_distance=100)
    ctr = ctrs["lib1"]
    assert ctr.ReadPairDuplicates == 1
    assert ctr.ReadPairOpticalDuplicates == 0


def test_three_way_cluster():
    # 3 dup pairs, all within distance: cluster of 3 -> 2 optical
    lines = (
        _pair(b"M:R:F:1:2203:100:100", 1000, 1200, qual="I" * 10)
        + _pair(b"M:R:F:1:2203:110:100", 1000, 1200, qual="5" * 10)
        + _pair(b"M:R:F:1:2203:120:100", 1000, 1200, qual="6" * 10)
    )
    out, state = _run(lines)
    ctrs = mark_optical_duplicates(out.batch, out.header, state.aux, pixel_distance=100)
    ctr = ctrs["lib1"]
    assert ctr.ReadPairDuplicates == 2
    assert ctr.ReadPairOpticalDuplicates == 2
    assert ctr.duplicatesCountHistogram == {3: 1}
    assert ctr.opticalDuplicatesCountHistogram == {3: 1}


def test_transitive_chain_cluster():
    # A-B close, B-C close, A-C far: one cluster of 3 -> 2
    # (union-find semantics == reference graph.cluster, graph.go:48-85)
    lines = (
        _pair(b"M:R:F:1:2203:0:0", 1000, 1200, qual="I" * 10)
        + _pair(b"M:R:F:1:2203:90:0", 1000, 1200, qual="5" * 10)
        + _pair(b"M:R:F:1:2203:180:0", 1000, 1200, qual="6" * 10)
    )
    out, state = _run(lines)
    ctrs = mark_optical_duplicates(out.batch, out.header, state.aux, pixel_distance=100)
    assert ctrs["lib1"].ReadPairOpticalDuplicates == 2


def test_fragments_counted():
    frag = b"M:R:F:1:2203:5:5\t0\tc1\t500\t60\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII\tRG:Z:rg1"
    frag_dup = b"M:R:F:1:2203:5:9\t0\tc1\t500\t60\t10M\t*\t0\t0\tACGTACGTAC\t5555555555\tRG:Z:rg1"
    unmapped = b"u\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII\tRG:Z:rg1"
    sec = b"s\t256\tc1\t700\t60\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII\tRG:Z:rg1"
    out, state = _run([frag, frag_dup, unmapped, sec])
    ctrs = mark_optical_duplicates(out.batch, out.header, state.aux)
    ctr = ctrs["lib1"]
    assert ctr.UnpairedReadsExamined == 2
    assert ctr.UnpairedReadDuplicates == 1
    assert ctr.UnmappedReads == 1
    assert ctr.SecondaryOrSupplementaryReads == 1
    assert ctr.ReadPairsExamined == 0


def test_format_float():
    assert format_float(0.5) == "0.5"
    assert format_float(0.1234) == "0.1234"
    assert format_float(2.0) == "2.000000"
    assert format_float(float("nan")) == "NaN"
    assert format_float(0.000001) == "0.000001"


def test_estimate_library_size():
    assert estimate_library_size(100, 100) == 0
    assert estimate_library_size(0, 0) == 0
    # more duplicates -> smaller library estimate
    a = estimate_library_size(1000, 900)
    b = estimate_library_size(1000, 500)
    assert a > b > 0


def test_metrics_file_format(tmp_path):
    lines = (
        _pair(b"M:R:F:1:2203:100:100", 1000, 1200, qual="I" * 10)
        + _pair(b"M:R:F:1:2203:105:108", 1000, 1200, qual="5" * 10)
    )
    out, state = _run(lines)
    ctrs = mark_optical_duplicates(out.batch, out.header, state.aux)
    path = str(tmp_path / "metrics.txt")
    print_duplicates_metrics(path, "elprep_tpu test", ctrs, now="Mon Jan 02 15:04:05 UTC 2006")
    text = open(path).read()
    assert text.startswith("## htsjdk.samtools.metrics.StringHeader\n# elprep_tpu test\n")
    assert "## METRICS CLASS\tpicard.sam.DuplicationMetrics" in text
    assert "lib1\t0\t2\t0\t0\t0\t1\t1\t0.5\t" in text
    assert "## HISTOGRAM\tjava.lang.Double" in text
    assert "BIN\tCoverageMult\tall_sets\toptical_sets\tnon_optical_sets" in text
    # bin 2 row carries the all_sets/optical_sets counts
    lines_out = text.splitlines()
    bin2 = [l for l in lines_out if l.startswith("2.0\t")][0]
    assert bin2.split("\t")[2:] == ["1", "1", "0"]


def test_pedantic_mode():
    """--pedantic behaviors (reference: filters/pedantic.go): Java-style
    formatf rounding, int16 tile wraparound, x87 log10."""
    import math

    from elprep_tpu import native, pedantic
    from elprep_tpu.hc.genotyping import formatf

    # Java rounds the shortest repr half-up; Go rounds the binary value
    assert formatf(0.285, 2) == "0.28"
    pedantic.set_pedantic(True)
    try:
        assert formatf(0.285, 2) == "0.29"
        assert formatf(-0.285, 2) == "-0.29"
        assert pedantic.pedantic_formatf(9.99, 1) == "10.0"
        assert pedantic.pedantic_formatf(0.5, 4) == "0.5000"
        assert pedantic.pedantic_formatf(12.0, 2) == "12.00"
        if native.available():
            for v in (2.0, 0.5, 3.14159, 1e-10):
                assert abs(pedantic.x86_log10(v) - math.log10(v)) < 1e-12
    finally:
        pedantic.set_pedantic(False)


def test_pedantic_tile_wraparound():
    """int16 truncation changes optical clustering across the 32768
    boundary (reference: pedantic.go:54-56 vs unpedantic.go:32-34)."""
    import numpy as np

    from elprep_tpu import pedantic
    from elprep_tpu.filters import optical

    rg = [b"rg1"] * 2
    tile = np.array([5, 5], np.int64)
    x = np.array([32767, 32769], np.int64)  # 2 apart, but int16-wraps
    y = np.array([100, 100], np.int64)
    n_unped = optical._union_find_count(rg, tile, x, y, 100)
    pedantic.set_pedantic(True)
    try:
        n_ped = optical._union_find_count(rg, tile, x, y, 100)
    finally:
        pedantic.set_pedantic(False)
    # return value is n - #clusters (merged relations)
    assert n_unped == 1  # clustered: |32767-32769| = 2
    assert n_ped == 0    # int16: 32767 vs -32767 -> 65534 apart, no merge


def test_library_attribution_two_libs_header_order():
    # First read in the file belongs to the SECOND header library; per-lib
    # metrics must still attach to the right LB names (libid ints are
    # canonically assigned in @RG header order on both sides).
    header = (
        b"@HD\tVN:1.6\tSO:unknown\n"
        b"@SQ\tSN:c1\tLN:100000\n"
        b"@RG\tID:rgA\tLB:libA\tSM:s1\n"
        b"@RG\tID:rgB\tLB:libB\tSM:s1\n"
    )
    lines = []
    # libB: one pair + one duplicate pair (4 reads, 1 dup pair)
    for q, p in ((b"b1:1:1:1000:2000", 100), (b"b2:1:1:1000:2010", 100)):
        lines += [
            b"%s\t99\tc1\t%d\t60\t10M\t=\t200\t110\tACGTACGTAC\tIIIIIIIIII\tRG:Z:rgB" % (q, p),
            b"%s\t147\tc1\t200\t60\t10M\t=\t%d\t-110\tACGTACGTAC\tIIIIIIIIII\tRG:Z:rgB" % (q, p),
        ]
    # libA: one unique pair
    lines += [
        b"a1:1:1:50:60\t99\tc1\t500\t60\t10M\t=\t600\t110\tACGTACGTAC\tIIIIIIIIII\tRG:Z:rgA",
        b"a1:1:1:50:60\t147\tc1\t600\t60\t10M\t=\t500\t-110\tACGTACGTAC\tIIIIIIIIII\tRG:Z:rgA",
    ]
    data = header + b"\n".join(lines) + b"\n"
    hdr, batch = sam.parse_sam(data)
    state = MarkDuplicatesState()
    out = run_pipeline(
        SamData(hdr, batch),
        [add_refid, mark_duplicates_filter(state=state)],
        SortingOrder.KEEP,
    )
    ctrs = mark_optical_duplicates(out.batch, out.header, state.aux, pixel_distance=100)
    assert ctrs["libA"].ReadPairsExamined == 1
    assert ctrs["libA"].ReadPairDuplicates == 0
    assert ctrs["libB"].ReadPairsExamined == 2
    assert ctrs["libB"].ReadPairDuplicates == 1
    assert ctrs["libB"].ReadPairOpticalDuplicates == 1
