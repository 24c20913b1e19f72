"""Multi-chip sharded pipeline vs whole-file equality
(reference contract: sfm output == filter output, README.md:134-137;
here the mesh replaces the split files, parallel/sharded.py).

Runs on the 8-device virtual CPU mesh from conftest."""

import os

import numpy as np
import pytest

import samgen
from elprep_tpu import cli
from elprep_tpu.core.header import SortingOrder
from elprep_tpu.core.pipeline import SamData, run_pipeline
from elprep_tpu.filters import simple as fsimple
from elprep_tpu.filters.markdup import MarkDuplicatesState, mark_duplicates_filter
from elprep_tpu.io import sam as samio
from elprep_tpu.parallel.mesh import make_mesh
from elprep_tpu.parallel.sharded import (
    plan_shards,
    run_sharded_sort_dedup,
    shard_spans,
)


CONTIGS = [(f"chr{i}", 40_000 + 7_000 * i) for i in range(1, 7)]


def _sam_with_cross_pairs(n=3000, seed=5):
    """Synthetic SAM incl. cross-contig pairs and duplicate groups that
    straddle contigs (the case sfm handles with spread files)."""
    header = samgen.make_header_lines(
        CONTIGS, rgs=[{"ID": "rg1", "LB": "lib1", "SM": "s1", "PU": "u1"}])
    lines = samgen.random_reads(n - 200, CONTIGS, seed=seed, rg_ids=["rg1"])
    import random

    rng = random.Random(seed + 1)
    qual = "I" * 100
    seq = "".join(rng.choice("ACGT") for _ in range(100))

    def cross_pair(q, c1, p1, c2, p2):
        return [
            f"{q}\t97\t{c1}\t{p1}\t60\t100M\t{c2}\t{p2}\t0\t{seq}\t{qual}\tRG:Z:rg1",
            f"{q}\t145\t{c2}\t{p2}\t60\t100M\t{c1}\t{p1}\t0\t{seq}\t{qual}\tRG:Z:rg1",
        ]

    extra = []
    # duplicate cross-contig pairs: same positions -> dup group whose
    # mates live in different shards
    for k in range(50):
        c1, c2 = rng.sample(range(len(CONTIGS)), 2)
        p1 = rng.randrange(1000, 30_000)
        p2 = rng.randrange(1000, 30_000)
        extra += cross_pair(f"x{k:04d}a", CONTIGS[c1][0], p1, CONTIGS[c2][0], p2)
        extra += cross_pair(f"x{k:04d}b", CONTIGS[c1][0], p1, CONTIGS[c2][0], p2)
    return ("\n".join(header + lines + extra) + "\n").encode()


@pytest.fixture(scope="module")
def parsed():
    hdr, batch = samio.parse_sam(_sam_with_cross_pairs())
    return hdr, batch


def _serial_result(hdr, batch):
    state = MarkDuplicatesState()
    out = run_pipeline(
        SamData(hdr.clone() if hasattr(hdr, "clone") else hdr, batch),
        [fsimple.add_refid, mark_duplicates_filter(state=state)],
        SortingOrder.COORDINATE,
    )
    return out


def test_shard_spans_contiguous():
    hdr, _ = samio.parse_sam(_sam_with_cross_pairs(600))
    spans = shard_spans(hdr, 4)
    assert len(spans) == len(CONTIGS) + 1
    assert (np.diff(spans[:-1]) >= 0).all()  # contiguous non-decreasing
    assert spans[-1] == 3  # unmapped in last shard


def test_sharded_equals_serial_sort_dedup(parsed):
    hdr, batch0 = parsed
    data = samio.parse_sam(_sam_with_cross_pairs())  # fresh copies
    hdr_a, batch_a = data
    serial = _serial_result(hdr_a, batch_a)

    hdr_b, batch_b = samio.parse_sam(_sam_with_cross_pairs())
    prep = run_pipeline(SamData(hdr_b, batch_b), [fsimple.add_refid],
                        SortingOrder.KEEP)
    mesh = make_mesh(8)
    sharded_batch, _ = run_sharded_sort_dedup(prep.batch, prep.header, mesh)
    hdr_b.set_hd_so(SortingOrder.COORDINATE)

    a, b = serial.batch, sharded_batch
    assert len(a) == len(b)
    np.testing.assert_array_equal(a.qname, b.qname)
    np.testing.assert_array_equal(a.flag, b.flag)
    np.testing.assert_array_equal(a.pos, b.pos)
    # full byte equality through the SAM formatter
    sa = samio.format_sam(serial.header, a)
    sb = samio.format_sam(hdr_b, b)
    assert sa == sb


def test_plan_shards_helpers_cover_cross_pairs(parsed):
    hdr, batch = samio.parse_sam(_sam_with_cross_pairs())
    prep = run_pipeline(SamData(hdr, batch), [fsimple.add_refid],
                        SortingOrder.KEEP)
    shard_rows, n_home, _ = plan_shards(prep.batch, prep.header, 8)
    total_home = sum(n_home)
    assert total_home == len(prep.batch)
    # helpers exist (there are cross-contig pairs spanning shards)
    assert sum(len(r) for r in shard_rows) > total_home


def test_cli_sharded_five_step_byte_equal(tmp_path):
    """filter --sharded output (BAM + metrics + recal) == plain filter
    output on the same input (the sfm==whole-file contract over the mesh)."""
    data = _sam_with_cross_pairs(2000, seed=9)
    sam_in = tmp_path / "in.sam"
    sam_in.write_bytes(data)

    # reference fasta for BQSR
    rng = np.random.RandomState(3)
    bases = np.frombuffer(b"ACGT", np.uint8)
    fasta = tmp_path / "ref.fasta"
    with open(fasta, "w") as f:
        for name, ln in CONTIGS:
            f.write(">%s\n" % name)
            s = rng.choice(bases, ln).tobytes().decode()
            for i in range(0, ln, 70):
                f.write(s[i : i + 70] + "\n")
    assert cli.main(["fasta-to-elfasta", str(fasta), str(tmp_path / "ref.elfasta")]) == 0

    def run(tag, extra):
        out = tmp_path / tag
        out.mkdir()
        rc = cli.main([
            "filter", str(sam_in), str(out / "out.sam"),
            "--mark-duplicates",
            "--mark-optical-duplicates", str(out / "metrics.txt"),
            "--sorting-order", "coordinate",
            "--bqsr", str(out / "out.recal"),
            "--reference", str(tmp_path / "ref.elfasta"),
            "--haplotypecaller", str(out / "out.vcf.gz"),
            "--reference-confidence", "GVCF",
        ] + extra)
        assert rc == 0
        return out

    plain = run("plain", [])
    sharded = run("sharded", ["--sharded"])

    def body(p):  # the @PG CL line embeds the differing argv
        return [l for l in p.read_bytes().split(b"\n") if not l.startswith(b"@PG")]

    assert body(plain / "out.sam") == body(sharded / "out.sam")
    assert (plain / "out.recal").read_text() == (sharded / "out.recal").read_text()
    pm = [l for l in (plain / "metrics.txt").read_text().splitlines()
          if not l.startswith("#")]
    sm = [l for l in (sharded / "metrics.txt").read_text().splitlines()
          if not l.startswith("#")]
    assert pm == sm
    import gzip

    def vcf_body(p):
        return [l for l in gzip.open(p, "rb").read().split(b"\n")
                if not l.startswith(b"##")]

    assert vcf_body(plain / "out.vcf.gz") == vcf_body(sharded / "out.vcf.gz")


def test_sharded_empty_and_unmapped_shards(tmp_path):
    """Edge cases: contigs with no reads (empty shards) and unmapped
    reads (refid -1 -> last shard, sorting after all valid refids)."""
    header = samgen.make_header_lines(
        CONTIGS, rgs=[{"ID": "rg1", "LB": "lib1", "SM": "s1", "PU": "u1"}])
    qual = "I" * 20
    seq = "ACGTACGTACGTACGTACGT"
    lines = [
        # reads only on the first and last contig; middles empty
        f"q1\t0\t{CONTIGS[0][0]}\t500\t60\t20M\t*\t0\t0\t{seq}\t{qual}\tRG:Z:rg1",
        f"q2\t0\t{CONTIGS[-1][0]}\t900\t60\t20M\t*\t0\t0\t{seq}\t{qual}\tRG:Z:rg1",
        # unmapped read (no coordinates)
        f"u1\t4\t*\t0\t0\t*\t*\t0\t0\t{seq}\t{qual}\tRG:Z:rg1",
    ]
    data = ("\n".join(header + lines) + "\n").encode()

    hdr_a, batch_a = samio.parse_sam(data)
    serial = _serial_result(hdr_a, batch_a)

    hdr_b, batch_b = samio.parse_sam(data)
    prep = run_pipeline(SamData(hdr_b, batch_b), [fsimple.add_refid],
                        SortingOrder.KEEP)
    sharded_batch, _ = run_sharded_sort_dedup(prep.batch, prep.header,
                                              make_mesh(8))
    hdr_b.set_hd_so(SortingOrder.COORDINATE)
    assert samio.format_sam(serial.header, serial.batch) == \
        samio.format_sam(hdr_b, sharded_batch)
    # unmapped read sorts last
    assert bytes(sharded_batch.qname[-1]) == b"u1"
