"""Multi-file input merging tests (reference: sam/merge-inputs.go)."""

import numpy as np

from elprep_tpu.io.merge_inputs import merge_sequence_dictionaries, read_and_merge_files


def test_merge_sequence_dictionaries_union():
    a = [{"SN": "chr1", "LN": "100"}, {"SN": "chr3", "LN": "300"}]
    b = [{"SN": "chr2", "LN": "200"}, {"SN": "chr3", "LN": "300"}]
    merged = merge_sequence_dictionaries(a, b)
    assert [d["SN"] for d in merged] == ["chr1", "chr2", "chr3"]


def test_read_and_merge_files(tmp_path):
    f1 = tmp_path / "a.sam"
    f1.write_bytes(
        b"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:1000\n"
        b"@RG\tID:rg1\tSM:s1\n@PG\tID:pg1\tPN:x\n"
        b"r1\t0\tchr1\t10\t60\t4M\t*\t0\t0\tACGT\tIIII\tRG:Z:rg1\n")
    f2 = tmp_path / "b.sam"
    f2.write_bytes(
        b"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr2\tLN:2000\n"
        b"@RG\tID:rg1\tSM:s2\n@PG\tID:pg1\tPN:y\n"
        b"r2\t0\tchr2\t20\t60\t4M\t*\t0\t0\tACGT\tIIII\tRG:Z:rg1\n")
    hdr, batch = read_and_merge_files([str(f1), str(f2)])
    assert [d["SN"] for d in hdr.sq] == ["chr1", "chr2"]
    # colliding RG/PG IDs renamed
    rg_ids = [r["ID"] for r in hdr.rg]
    assert rg_ids[0] == "rg1" and rg_ids[1] != "rg1"
    pg_ids = [r["ID"] for r in hdr.pg]
    assert pg_ids[0] == "pg1" and pg_ids[1] != "pg1"
    # second file's read got its RG tag rewritten to the renamed id
    assert len(batch) == 2
    vals = batch.tags.extract_z(b"RG")
    assert vals[0] == b"rg1"
    assert vals[1] == rg_ids[1].encode()
    # SO reset to unknown after merging
    assert hdr.hd["SO"] == "unknown"
