"""Cross-mode differential on an adversarial fixture: serial `filter`,
`filter --sharded`, and `sfm` must produce record-identical BAM + VCF +
recal + metrics (the reference's losslessness contract,
README.md:134-137), including with N bases, MAPQ-0 reads,
secondary/supplementary records, unmapped reads, cross-contig pairs
(the sfm spread path), and a >50-deep pileup that fires the HC
downsampler (placed on the FIRST contig so every mode's Java-LCG
stream is still fresh when it fires — the same per-slice-stream
contract the sfm and multihost tests pin)."""

import gzip

import numpy as np
import pytest

import samgen
from elprep_tpu import cli

CONTIGS = [("chr1", 30_000), ("chr2", 26_000), ("chr3", 22_000)]


def _adversarial_sam():
    genome = samgen.make_genome(CONTIGS, seed=41)
    header = samgen.make_header_lines(
        CONTIGS, rgs=[{"ID": "rg1", "LB": "lib1", "SM": "s1", "PU": "u1"}])
    lines = samgen.reads_from_genome(6000, CONTIGS, genome, seed=43,
                                     rg_ids=["rg1"])
    import random

    rng = random.Random(47)
    extra = []
    ref1 = genome["chr1"]
    qual = "I" * 100

    def gseq(cname, pos, n=100):
        return genome[cname][pos - 1 : pos - 1 + n].decode()

    # deep pileup on chr1 (fires the downsampler with a FRESH stream in
    # every mode); distinct mate positions keep pair dedup keys unique
    base = gseq("chr1", 5000)
    alt = base[:50] + ("A" if base[50] != "A" else "C") + base[51:]
    for i in range(60):
        mpos = 5140 + i
        tlen = mpos + 100 - 5000
        q = f"deep{i:04d}"
        extra.append(f"{q}\t99\tchr1\t5000\t60\t100M\t=\t{mpos}\t{tlen}\t"
                     f"{alt if i % 2 else base}\t{qual}\tRG:Z:rg1")
        extra.append(f"{q}\t147\tchr1\t{mpos}\t60\t100M\t=\t5000\t{-tlen}\t"
                     f"{gseq('chr1', mpos)}\t{qual}\tRG:Z:rg1")
    # N-heavy reads
    for i in range(30):
        pos = rng.randrange(1000, 20000)
        s = list(gseq("chr1", pos))
        for k in rng.sample(range(100), rng.randrange(3, 30)):
            s[k] = "N"
        extra.append(f"nn{i:04d}\t0\tchr1\t{pos}\t{rng.randrange(0, 60)}\t"
                     f"100M\t*\t0\t0\t{''.join(s)}\t{qual}\tRG:Z:rg1")
    # secondary + supplementary copies
    for i in range(20):
        pos = rng.randrange(1000, 18000)
        flag = 0x100 if i % 2 else 0x800
        extra.append(f"ss{i:04d}\t{flag}\tchr2\t{pos}\t30\t"
                     f"50S50M\t*\t0\t0\t{gseq('chr2', pos)}\t{qual}\tRG:Z:rg1")
    # unmapped reads (with and without coordinates)
    for i in range(15):
        pos = rng.randrange(1, 20000)
        extra.append(f"um{i:04d}\t4\tchr3\t{pos}\t0\t*\t*\t0\t0\t"
                     f"{gseq('chr3', max(1, pos))}\t{qual}\tRG:Z:rg1")
    # cross-contig pairs (duplicated into sfm's spread file)
    for i in range(12):
        p1 = rng.randrange(1000, 20000)
        p2 = rng.randrange(1000, 20000)
        q = f"xc{i:04d}"
        tl = 0
        extra.append(f"{q}\t97\tchr1\t{p1}\t60\t100M\tchr3\t{p2}\t{tl}\t"
                     f"{gseq('chr1', p1)}\t{qual}\tRG:Z:rg1")
        extra.append(f"{q}\t145\tchr3\t{p2}\t60\t100M\tchr1\t{p1}\t{tl}\t"
                     f"{gseq('chr3', p2)}\t{qual}\tRG:Z:rg1")
    return genome, ("\n".join(header + lines + extra) + "\n").encode()


def _vcf_records(p):
    return [l for l in gzip.open(p, "rb").read().split(b"\n")
            if not l.startswith(b"##")]


def _bam_body(p):
    from elprep_tpu.io import sam

    hdr, batch = sam.read_sam_file(str(p))
    return [l for l in sam.format_sam(hdr, batch).split(b"\n")
            if not l.startswith(b"@")]


def _metrics(p):
    return [l for l in open(p).read().splitlines() if not l.startswith("#")]


@pytest.mark.slow
def test_serial_sharded_sfm_record_identical(tmp_path):
    genome, sam_bytes = _adversarial_sam()
    sam_in = tmp_path / "in.sam"
    sam_in.write_bytes(sam_bytes)
    fasta = tmp_path / "ref.fasta"
    with open(fasta, "w") as f:
        for name, _ in CONTIGS:
            f.write(">%s\n%s\n" % (name, genome[name].decode()))
    elfasta = tmp_path / "ref.elfasta"
    assert cli.main(["fasta-to-elfasta", str(fasta), str(elfasta)]) == 0

    def run(cmd, out_dir, extra=()):
        out_dir.mkdir()
        argv = [cmd, str(sam_in), str(out_dir / "out.bam"),
                "--mark-duplicates",
                "--mark-optical-duplicates", str(out_dir / "metrics.txt"),
                "--sorting-order", "coordinate",
                "--bqsr", str(out_dir / "out.recal"),
                "--reference", str(elfasta),
                "--haplotypecaller", str(out_dir / "out.vcf.gz"),
                "--reference-confidence", "GVCF"] + list(extra)
        assert cli.main(argv) == 0, argv
        return out_dir

    serial = run("filter", tmp_path / "serial")
    sharded = run("filter", tmp_path / "sharded", ["--sharded"])
    sfm = run("sfm", tmp_path / "sfm",
              ["--tmp-path", str(tmp_path / "t"), "--contig-group-size", "1"])

    ref_bam = _bam_body(serial / "out.bam")
    ref_vcf = _vcf_records(serial / "out.vcf.gz")
    assert len(ref_vcf) > 100
    # the engineered het SNP at chr1:5051 survives every mode
    assert any(l.startswith(b"chr1\t5051\t") and b"," in l.split(b"\t")[4]
               or l.startswith(b"chr1\t5051\t") for l in ref_vcf)
    for mode in (sharded, sfm):
        assert _bam_body(mode / "out.bam") == ref_bam, mode
        assert _vcf_records(mode / "out.vcf.gz") == ref_vcf, mode
        assert (mode / "out.recal").read_text() == \
            (serial / "out.recal").read_text(), mode
        assert _metrics(mode / "metrics.txt") == \
            _metrics(serial / "metrics.txt"), mode
