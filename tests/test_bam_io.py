"""BAM/BGZF round-trip tests (reference semantics: sam/bam-files.go)."""

import numpy as np
import pytest

import samgen
from elprep_tpu.io import bam, bgzf, sam


def test_bgzf_roundtrip_small():
    data = b"hello bgzf world" * 10
    comp = bgzf.compress(data)
    assert comp.endswith(bgzf.BGZF_EOF)
    assert bgzf.decompress(comp) == data


def test_bgzf_roundtrip_multiblock():
    rng = np.random.RandomState(7)
    data = rng.randint(0, 256, size=300_000, dtype=np.uint8).tobytes()
    comp = bgzf.compress(data)
    assert bgzf.decompress(comp) == data
    # incompressible data must still respect the 64KB block limit
    spans = bgzf._frame_blocks(comp)
    assert all(len(s) <= bgzf.MAX_BLOCK_SIZE for s in spans)


def test_bgzf_empty():
    comp = bgzf.compress(b"")
    assert bgzf.decompress(comp) == b""


def _make_sam_bytes(n=300, tags=True):
    contigs = [("chr1", 100000), ("chr2", 50000)]
    lines = samgen.make_header_lines(contigs, rgs=[{"ID": "rg1", "LB": "lib1", "SM": "s"}])
    reads = samgen.random_reads(n, contigs, seed=11, rg_ids=["rg1"] if tags else None)
    return ("\n".join(lines) + "\n" + "\n".join(reads) + "\n").encode()


def test_bam_roundtrip_synthetic():
    data = _make_sam_bytes()
    hdr, batch = sam.parse_sam(data)
    blob = bam.format_bam(hdr, batch)
    hdr2, batch2 = bam.parse_bam(blob)
    assert sam.format_sam(hdr2, batch2) == sam.format_sam(hdr, batch)


def test_bam_roundtrip_tag_types():
    header = b"@HD\tVN:1.6\tSO:unknown\n@SQ\tSN:c1\tLN:9999\n"
    aln = (
        b"r1\t0\tc1\t100\t60\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII\t"
        b"XA:A:c\tXB:i:-300\tXC:i:70000\tXD:i:-5\tXE:f:3.25\tXZ:Z:hello world\t"
        b"XH:H:1aff00\tXS:B:s,-3,4,65535\tXF:B:f,1.5,-2\tXI:B:I,1,2,3\n"
    )
    hdr, batch = sam.parse_sam(header + aln)
    blob = bam.format_bam(hdr, batch)
    hdr2, batch2 = bam.parse_bam(blob)
    out = sam.format_sam(hdr2, batch2)
    # canonical text: B:s 65535 quirk -> -1 (sam-files.go:263-272)
    assert b"XS:B:s,-3,4,-1" in out
    assert b"XB:i:-300" in out and b"XC:i:70000" in out and b"XD:i:-5" in out
    assert b"XE:f:3.25" in out and b"XH:H:1aff00" in out
    assert out == sam.format_sam(hdr, batch)


def test_bam_unmapped_and_star_rnames():
    data = (
        b"@HD\tVN:1.6\tSO:unknown\n@SQ\tSN:c1\tLN:9999\n"
        b"u1\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII\n"
        b"m1\t0\tc1\t5\t60\t4M\t=\t5\t0\tACGT\tIIII\n"
    )
    hdr, batch = sam.parse_sam(data)
    blob = bam.format_bam(hdr, batch)
    hdr2, batch2 = bam.parse_bam(blob)
    assert sam.format_sam(hdr2, batch2) == sam.format_sam(hdr, batch)


def test_bam_long_cigar_cg_tag():
    # >65535 CIGAR ops forces the CG:B:I escape (bam-files.go:659-707)
    n_ops = 70000
    seq_len = n_ops  # alternating 1M1I starts/ends with M: use 1M x n_ops
    cigar = b"1M" * n_ops
    seq = b"A" * seq_len
    qual = b"I" * seq_len
    data = (
        b"@HD\tVN:1.6\tSO:unknown\n@SQ\tSN:c1\tLN:900000\n"
        b"r1\t0\tc1\t100\t60\t" + b"%dM" % n_ops + b"\t*\t0\t0\t" + seq + b"\t" + qual + b"\n"
    )
    # adjacent-equal ops merge on SAM parse, so build via BAM directly:
    hdr, batch = sam.parse_sam(data)
    # replace the merged 1-op CIGAR with alternating M/I ops (no merge)
    from elprep_tpu.core.batch import Ragged

    half = n_ops // 2
    ops = np.tile(np.frombuffer(b"MI", np.uint8), half)
    lens = np.ones(n_ops, np.int32)
    batch.cigar_len = Ragged(lens, np.array([0, n_ops], np.int64))
    batch.cigar_op = Ragged(ops, np.array([0, n_ops], np.int64))
    batch.seq = Ragged(np.frombuffer(b"A" * n_ops, np.uint8), np.array([0, n_ops], np.int64))
    batch.qual = Ragged(np.full(n_ops, 40, np.uint8), np.array([0, n_ops], np.int64))

    blob = bam.format_bam(hdr, batch)
    hdr2, batch2 = bam.parse_bam(blob)
    assert len(batch2.cigar_len.row(0)) == n_ops
    assert bytes(batch2.cigar_op.row(0)[:4].tobytes()) == b"MIMI"
    assert sam.format_sam(hdr2, batch2) == sam.format_sam(hdr, batch)


def test_bgzf_corrupt_bsize_rejected():
    # A block whose BC field claims a BSIZE smaller than its own framing
    # must be rejected (not underflow into a huge payload size).
    from elprep_tpu.io import bgzf
    import struct
    good = bgzf.compress(b"hello world" * 100)
    bad = bytearray(good)
    # patch the first block's BSIZE to 5 (stored as BSIZE-1 at offset 16)
    struct.pack_into("<H", bad, 16, 5 - 1)
    with pytest.raises(ValueError):
        bgzf._frame_blocks(bytes(bad))
    with pytest.raises(ValueError):
        bgzf.decompress(bytes(bad))


def test_streaming_bam_reader_matches_whole_file(tmp_path):
    # iter_sam_chunks over a BAM must reproduce parse_bam exactly, in
    # bounded chunks (reference: bam-files.go:780-800 streaming framing)
    data = samgen.make_sam(4000, seed=21)
    hdr, batch = sam.parse_sam(data)
    p = tmp_path / "t.bam"
    sam.write_sam_file(str(p), hdr, batch, fmt="bam")

    whole_hdr, whole = sam.read_sam_file(str(p))
    chunks = []
    n_chunks = 0
    import io as _io
    from elprep_tpu.io.bam import iter_bam_chunks

    with open(p, "rb") as f:
        head = f.read(1)
        for h, b in iter_bam_chunks(f, head=head, chunk_bytes=1 << 16):
            n_chunks += 1
            chunks.append(b)
    assert n_chunks > 1, "expected multiple streamed chunks"
    from elprep_tpu.core.batch import ReadBatch

    merged = ReadBatch.concat(chunks)
    assert len(merged) == len(whole)
    np.testing.assert_array_equal(merged.qname, whole.qname)
    np.testing.assert_array_equal(merged.flag, whole.flag)
    np.testing.assert_array_equal(merged.pos, whole.pos)
    assert sam.format_alignments(merged) == sam.format_alignments(whole)


def test_streaming_bam_writer_byte_identical(tmp_path):
    from elprep_tpu.io.bam import StreamingBamWriter, format_bam

    data = samgen.make_sam(3000, seed=22)
    hdr, batch = sam.parse_sam(data)
    whole = format_bam(hdr, batch)
    p = tmp_path / "s.bam"
    with open(p, "wb") as f:
        w = StreamingBamWriter(f, hdr)
        step = 257
        for i in range(0, len(batch), step):
            w.write_batch(batch.select(np.arange(i, min(i + step, len(batch)))))
        w.close()
    assert p.read_bytes() == whole


def test_streaming_bgzf_writer_byte_identical():
    import random
    from elprep_tpu.io.bgzf import StreamingBgzfWriter, compress
    import io as _io

    rng = random.Random(1)
    payload = bytes(rng.getrandbits(8) for _ in range(300_000))
    buf = _io.BytesIO()
    w = StreamingBgzfWriter(buf, flush_blocks=2)
    for i in range(0, len(payload), 10_007):
        w.write(payload[i : i + 10_007])
    w.close()
    assert buf.getvalue() == compress(payload)
