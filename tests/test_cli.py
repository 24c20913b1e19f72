"""CLI integration tests: the full 5-step pipeline, converters,
split/merge, and sfm (reference: cmd/)."""

import gzip
import os

import numpy as np
import pytest

from elprep_tpu import cli

_BASES = np.frombuffer(b"ACGT", np.uint8)


def _mkref(rng, n):
    return rng.choice(_BASES, n).tobytes()


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("cli")
    rng = np.random.RandomState(99)
    ref1 = _mkref(rng, 4000)
    ref2 = _mkref(rng, 3000)
    # FASTA
    fasta = wd / "ref.fasta"
    with open(fasta, "w") as f:
        f.write(">chr1 test\n")
        for i in range(0, len(ref1), 70):
            f.write(ref1[i : i + 70].decode() + "\n")
        f.write(">chr2\n")
        for i in range(0, len(ref2), 70):
            f.write(ref2[i : i + 70].decode() + "\n")
    assert cli.main(["fasta-to-elfasta", str(fasta), str(wd / "ref.elfasta")]) == 0

    # SAM with a het SNP at chr1:2001 and duplicates
    alt1 = ref1[:2000] + (b"A" if ref1[2000:2001] != b"A" else b"C") + ref1[2001:]
    lines = [
        "@HD\tVN:1.6\tSO:unknown",
        "@SQ\tSN:chr1\tLN:4000",
        "@SQ\tSN:chr2\tLN:3000",
        "@RG\tID:rg1\tLB:lib1\tSM:sample1\tPU:unit1",
    ]
    qual = "I" * 100

    def pair(qname, chrom, hap, p1, p2):
        s1 = hap[p1 - 1 : p1 - 1 + 100].decode()
        s2 = hap[p2 - 1 : p2 - 1 + 100].decode()
        tl = p2 - p1 + 100
        return [
            f"{qname}\t99\t{chrom}\t{p1}\t60\t100M\t=\t{p2}\t{tl}\t{s1}\t{qual}\tRG:Z:rg1",
            f"{qname}\t147\t{chrom}\t{p2}\t60\t100M\t=\t{p1}\t{-tl}\t{s2}\t{qual}\tRG:Z:rg1",
        ]

    reads = []
    for i in range(30):
        hap = ref1 if i % 2 == 0 else alt1
        start = 1900 + i * 3  # unique starts: no accidental duplicates
        reads += pair(f"M:R:F:1:2203:{1000+i*10}:{2000}", "chr1", hap, start, start + 150)
    # duplicates: same positions, same library
    reads += pair("M:R:F:1:2203:5000:6000", "chr1", ref1, 500, 700)
    reads += pair("M:R:F:1:2203:5004:6004", "chr1", ref1, 500, 700)
    # chr2 reads
    for i in range(6):
        start = 1000 + i * 40
        reads += pair(f"M:R:F:1:1101:{2000+i*17}:{3000}", "chr2", ref2, start, start + 120)
    sam = wd / "in.sam"
    with open(sam, "w") as f:
        f.write("\n".join(lines) + "\n" + "\n".join(reads) + "\n")

    # known sites (empty bed -> elsites via bed)
    bed = wd / "sites.bed"
    with open(bed, "w") as f:
        f.write("chr1\t100\t200\n")
    assert cli.main(["bed-to-elsites", str(bed), str(wd / "sites.elsites")]) == 0
    return wd


def test_five_step_pipeline(workdir):
    wd = workdir
    rc = cli.main([
        "filter", str(wd / "in.sam"), str(wd / "out.bam"),
        "--mark-duplicates", "--mark-optical-duplicates", str(wd / "metrics.txt"),
        "--sorting-order", "coordinate",
        "--bqsr", str(wd / "out.recal"),
        "--known-sites", str(wd / "sites.elsites"),
        "--reference", str(wd / "ref.elfasta"),
        "--haplotypecaller", str(wd / "out.vcf.gz"),
        "--reference-confidence", "NONE",
        "--host-pairhmm",
    ])
    assert rc == 0
    # BAM output exists and is coordinate-sorted with dup flags
    from elprep_tpu.io import sam as samio

    hdr, batch = samio.read_sam_file(str(wd / "out.bam"))
    assert hdr.hd["SO"] == "coordinate"
    assert ((batch.flag & 0x400) != 0).sum() == 2  # one duplicate pair
    # metrics in Picard format
    metrics = open(wd / "metrics.txt").read()
    assert "picard.sam.DuplicationMetrics" in metrics
    assert "lib1" in metrics
    # recal report in GATK format
    recal = open(wd / "out.recal").read()
    assert recal.startswith("#:GATKReport.v1.1:5")
    # VCF has the het SNP at chr1:2001
    from elprep_tpu.io import vcf as vcfmod

    vhdr, variants = vcfmod.read_vcf_file(str(wd / "out.vcf.gz"))
    v = next((v for v in variants if v.chrom == "chr1" and v.pos == 2001), None)
    assert v is not None, [(x.chrom, x.pos) for x in variants]
    assert sorted(v.genotypes[0].gt) == [0, 1]


def test_split_merge_roundtrip(workdir, tmp_path):
    wd = workdir
    split_dir = tmp_path / "splits_out"
    rc = cli.main(["split", str(wd / "in.sam"), str(split_dir),
                   "--output-prefix", "t", "--contig-group-size", "1"])
    assert rc == 0
    # one group per contig + unmapped
    import glob

    groups = sorted(glob.glob(str(split_dir / "splits" / "t-group*.sam")))
    assert len(groups) == 2
    # group headers carry @cs records
    from elprep_tpu.io import sam as samio

    ghdr, _ = samio.read_sam_file(groups[0])
    assert ghdr.contigs() == ["chr1"]
    merged = tmp_path / "merged.sam"
    rc = cli.main(["merge", str(split_dir / "splits"), str(merged),
                   "--input-prefix", "t"])
    # spread file lives one level up; copy it in place as sfm would
    import shutil

    shutil.copy(str(split_dir / "t-spread.sam"), str(split_dir / "splits" / "t-spread.sam"))
    rc = cli.main(["merge", str(split_dir / "splits"), str(merged),
                   "--input-prefix", "t"])
    assert rc == 0
    hdr0, b0 = samio.read_sam_file(str(wd / "in.sam"))
    hdr1, b1 = samio.read_sam_file(str(merged))
    assert len(b0) == len(b1)
    assert sorted(b0.qname.astype(bytes)) == sorted(b1.qname.astype(bytes))


def test_sfm_pipeline(workdir, tmp_path):
    wd = workdir
    out = tmp_path / "sfm_out.sam"
    rc = cli.main([
        "sfm", str(wd / "in.sam"), str(out),
        "--tmp-path", str(tmp_path / "sfmtmp"),
        "--contig-group-size", "1",
        "--mark-optical-duplicates", str(tmp_path / "sfm_metrics.txt"),
        "--mark-duplicates", "--sorting-order", "coordinate",
    ])
    assert rc == 0
    from elprep_tpu.io import sam as samio

    hdr, batch = samio.read_sam_file(str(out))
    hdr0, b0 = samio.read_sam_file(str(wd / "in.sam"))
    assert len(batch) == len(b0)
    assert hdr.hd["SO"] == "coordinate"
    assert ((batch.flag & 0x400) != 0).sum() == 2
    assert "picard.sam.DuplicationMetrics" in open(tmp_path / "sfm_metrics.txt").read()


def test_sfm_equals_whole_file(workdir, tmp_path):
    """sfm output must match whole-file filter output (README.md:134-137)."""
    wd = workdir
    whole = tmp_path / "whole.sam"
    rc = cli.main(["filter", str(wd / "in.sam"), str(whole),
                   "--mark-duplicates", "--sorting-order", "coordinate"])
    assert rc == 0
    sfm_out = tmp_path / "sfm.sam"
    rc = cli.main(["sfm", str(wd / "in.sam"), str(sfm_out),
                   "--tmp-path", str(tmp_path / "tmp2"),
                   "--contig-group-size", "1",
                   "--mark-duplicates", "--sorting-order", "coordinate"])
    assert rc == 0
    from elprep_tpu.io import sam as samio

    h1, b1 = samio.read_sam_file(str(whole))
    h2, b2 = samio.read_sam_file(str(sfm_out))
    assert len(b1) == len(b2)
    # flags (incl duplicate marks) and coordinates agree
    k1 = sorted(zip(b1.qname.astype(bytes), b1.flag, b1.pos))
    k2 = sorted(zip(b2.qname.astype(bytes), b2.flag, b2.pos))
    assert k1 == k2


def test_vcf_to_elsites(workdir, tmp_path):
    wd = workdir
    vcf_file = tmp_path / "x.vcf"
    with open(vcf_file, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        f.write("chr1\t100\t.\tA\tT\t50\t.\t.\n")
        f.write("chr1\t200\t.\tAC\tA\t50\t.\t.\n")
    rc = cli.main(["vcf-to-elsites", str(vcf_file), str(tmp_path / "x.elsites")])
    assert rc == 0
    from elprep_tpu.io import intervals as iv

    sites = iv.from_elsites_file(str(tmp_path / "x.elsites"))
    assert "chr1" in sites and len(sites["chr1"]) == 2


def test_streaming_fast_path(workdir, tmp_path):
    """No sort/dedup/bqsr/hc -> the streaming path runs and matches the
    in-memory result (reference: cmd/filter.go:328-341)."""
    wd = workdir
    out_stream = tmp_path / "stream.sam"
    rc = cli.main(["filter", str(wd / "in.sam"), str(out_stream),
                   "--filter-mapping-quality", "30"])
    assert rc == 0
    out_mem = tmp_path / "mem.sam"
    rc = cli.main(["filter", str(wd / "in.sam"), str(out_mem),
                   "--filter-mapping-quality", "30", "--sorting-order", "keep",
                   "--mark-duplicates"])  # force in-memory path
    assert rc == 0
    s1 = open(out_stream, "rb").read()
    s2 = open(out_mem, "rb").read()
    # same reads (in-memory adds dup flags; compare qnames + positions)
    b1 = [l.split(b"\t")[:4] for l in s1.splitlines() if not l.startswith(b"@")]
    b2 = [l.split(b"\t")[:4] for l in s2.splitlines() if not l.startswith(b"@")]
    def strip_flag(rows):
        return [(r[0], r[2], r[3]) for r in rows]
    assert strip_flag(b1) == strip_flag(b2)


def test_pipe_stdin_stdout(workdir, tmp_path):
    """Non-seekable input (FIFO) through the streaming path
    (reference: sam/aln-files.go:144-251 stdin/stdout support)."""
    import os
    import threading

    wd = workdir
    fifo = str(tmp_path / "in.fifo")
    os.mkfifo(fifo)
    data = open(wd / "in.sam", "rb").read()

    def writer():
        with open(fifo, "wb") as f:
            f.write(data)

    t = threading.Thread(target=writer)
    t.start()
    out = tmp_path / "piped.sam"
    rc = cli.main(["filter", fifo, str(out), "--filter-mapping-quality", "1"])
    t.join()
    assert rc == 0
    n_in = sum(1 for l in data.splitlines() if not l.startswith(b"@"))
    n_out = sum(1 for l in open(out, "rb").read().splitlines()
                if not l.startswith(b"@"))
    assert n_out == n_in


def test_optical_metrics_after_coordinate_sort(workdir, tmp_path):
    """Duplicate-pair metrics must survive the coordinate sort: the
    dedup aux columns are permuted with the reads (regression — stale
    pre-sort columns mis-joined pairs and reported 0 duplicates)."""
    sam = tmp_path / "dup.sam"
    q = "I" * 50
    lines = ["@HD\tVN:1.6\tSO:unknown", "@SQ\tSN:chr1\tLN:4000",
             "@RG\tID:rg1\tLB:lib1\tSM:s1\tPU:u1"]
    for x in (32767, 32797):  # 30 px apart on the same tile
        qn = f"M:R:F:1:2203:{x}:5000"
        lines.append(f"{qn}\t99\tchr1\t100\t60\t50M\t=\t300\t250\t{'A'*50}\t{q}\tRG:Z:rg1")
        lines.append(f"{qn}\t147\tchr1\t300\t60\t50M\t=\t100\t-250\t{'C'*50}\t{q}\tRG:Z:rg1")
    sam.write_text("\n".join(lines) + "\n")
    out = tmp_path / "dup.bam"
    metrics = tmp_path / "m.txt"
    rc = cli.main(["filter", str(sam), str(out), "--mark-duplicates",
                   "--mark-optical-duplicates", str(metrics),
                   "--sorting-order", "coordinate"])
    assert rc == 0
    row = next(l for l in metrics.read_text().splitlines() if l.startswith("lib1"))
    f = row.split("\t")
    assert f[2] == "2"   # READ_PAIRS_EXAMINED
    assert f[6] == "1"   # READ_PAIR_DUPLICATES
    assert f[7] == "1"   # READ_PAIR_OPTICAL_DUPLICATES


def test_sfm_cross_contig_duplicates(workdir, tmp_path):
    """Cross-contig duplicate pairs must be dedup-marked by sfm exactly
    like whole-file processing — requires the spread file to be filtered
    (reference: cmd/sfm.go:709-731)."""
    sam = tmp_path / "cross.sam"
    q = "I" * 50
    lines = ["@HD\tVN:1.6\tSO:unknown", "@SQ\tSN:chr1\tLN:4000",
             "@SQ\tSN:chr2\tLN:3000", "@RG\tID:rg1\tLB:lib1\tSM:s1\tPU:u1"]
    for x in (1000, 5000):  # two cross-contig pairs, same coords -> 1 dup
        qn = f"M:R:F:1:2203:{x}:7000"
        lines.append(f"{qn}\t97\tchr1\t500\t60\t50M\tchr2\t800\t0\t{'A'*50}\t{q}\tRG:Z:rg1")
        lines.append(f"{qn}\t145\tchr2\t800\t60\t50M\tchr1\t500\t0\t{'C'*50}\t{q}\tRG:Z:rg1")
    for i in range(4):
        p = 1200 + i * 37
        lines.append(f"N{i}\t99\tchr1\t{p}\t60\t50M\t=\t{p+100}\t150\t{'G'*50}\t{q}\tRG:Z:rg1")
        lines.append(f"N{i}\t147\tchr1\t{p+100}\t60\t50M\t=\t{p}\t-150\t{'T'*50}\t{q}\tRG:Z:rg1")
    sam.write_text("\n".join(lines) + "\n")
    from elprep_tpu.io import sam as samio

    whole = tmp_path / "whole.sam"
    assert cli.main(["filter", str(sam), str(whole), "--mark-duplicates",
                     "--sorting-order", "coordinate"]) == 0
    sfm_out = tmp_path / "sfm.sam"
    assert cli.main(["sfm", str(sam), str(sfm_out), "--mark-duplicates",
                     "--sorting-order", "coordinate", "--contig-group-size", "1",
                     "--tmp-path", str(tmp_path / "t")]) == 0
    _, b1 = samio.read_sam_file(str(whole))
    _, b2 = samio.read_sam_file(str(sfm_out))
    w = sorted((bytes(b1.qname[i]), int(b1.flag[i])) for i in range(len(b1)))
    s = sorted((bytes(b2.qname[i]), int(b2.flag[i])) for i in range(len(b2)))
    assert w == s
    assert sum(1 for _, f in w if f & 0x400) == 2  # one dup pair marked


def test_sfm_bqsr_and_hc_equal_whole_file(workdir, tmp_path):
    """Two-phase sfm BQSR (tables-only per shard -> combined apply) and
    per-shard HC reproduce whole-file results exactly
    (reference: cmd/sfm.go:655-877)."""
    wd = workdir
    from elprep_tpu.io import sam as samio

    base = ["--mark-duplicates", "--sorting-order", "coordinate",
            "--bqsr", "", "--reference", str(wd / "ref.elfasta"),
            "--haplotypecaller", "", "--reference-confidence", "NONE"]

    def run(cmd, out_bam, recal, vcf, extra=()):
        a = list(base)
        a[a.index("--bqsr") + 1] = recal
        a[a.index("--haplotypecaller") + 1] = vcf
        assert cli.main([cmd, str(wd / "in.sam"), out_bam] + a + list(extra)) == 0

    run("filter", str(tmp_path / "w.bam"), str(tmp_path / "w.recal"),
        str(tmp_path / "w.vcf.gz"))
    run("sfm", str(tmp_path / "s.bam"), str(tmp_path / "s.recal"),
        str(tmp_path / "s.vcf.gz"),
        extra=["--contig-group-size", "1", "--tmp-path", str(tmp_path / "t")])

    import gzip

    wv = [l for l in gzip.open(tmp_path / "w.vcf.gz", "rt") if not l.startswith("#")]
    sv = [l for l in gzip.open(tmp_path / "s.vcf.gz", "rt") if not l.startswith("#")]
    assert wv == sv
    assert open(tmp_path / "w.recal").read() == open(tmp_path / "s.recal").read()
    _, b1 = samio.read_sam_file(str(tmp_path / "w.bam"))
    _, b2 = samio.read_sam_file(str(tmp_path / "s.bam"))
    w = sorted((bytes(b1.qname[i]), int(b1.flag[i]), b1.qual.row(i).tobytes())
               for i in range(len(b1)))
    s = sorted((bytes(b2.qname[i]), int(b2.flag[i]), b2.qual.row(i).tobytes())
               for i in range(len(b2)))
    assert w == s


def test_sfm_gvcf_equals_whole_file(workdir, tmp_path):
    """GVCF through sfm == whole-file GVCF: split-file HC is scoped to
    the @cs contigs (reference: CallVariants validContigs,
    haplotypecaller.go:678-744)."""
    import gzip

    wd = workdir
    assert cli.main(["filter", str(wd / "in.sam"), str(tmp_path / "w.bam"),
                     "--mark-duplicates", "--sorting-order", "coordinate",
                     "--reference", str(wd / "ref.elfasta"),
                     "--haplotypecaller", str(tmp_path / "w.vcf.gz"),
                     "--reference-confidence", "GVCF"]) == 0
    assert cli.main(["sfm", str(wd / "in.sam"), str(tmp_path / "s.bam"),
                     "--mark-duplicates", "--sorting-order", "coordinate",
                     "--reference", str(wd / "ref.elfasta"),
                     "--haplotypecaller", str(tmp_path / "s.vcf.gz"),
                     "--reference-confidence", "GVCF",
                     "--contig-group-size", "1",
                     "--tmp-path", str(tmp_path / "t")]) == 0
    w = [l for l in gzip.open(tmp_path / "w.vcf.gz", "rt") if not l.startswith("#")]
    s = [l for l in gzip.open(tmp_path / "s.vcf.gz", "rt") if not l.startswith("#")]
    assert w == s


def test_target_regions_restricts_calling(workdir, tmp_path):
    """--target-regions BED restricts HC to the given spans
    (reference: cmd/filter.go --target-regions + computeRegion BED flow,
    haplotypecaller.go:735-798)."""
    wd = workdir
    bed = tmp_path / "targets.bed"
    # cover only chr1:1900-2300 (0-based BED), around the het SNP at 2001
    bed.write_text("chr1\t1900\t2300\n")

    def run(tag, extra):
        out = tmp_path / ("tr_%s.vcf.gz" % tag)
        rc = cli.main([
            "filter", str(wd / "in.sam"), "/dev/null",
            "--mark-duplicates", "--sorting-order", "coordinate",
            "--reference", str(wd / "ref.elfasta"),
            "--haplotypecaller", str(out),
            "--reference-confidence", "NONE", "--host-pairhmm",
        ] + extra)
        assert rc == 0
        from elprep_tpu.io import vcf as vcfmod

        return vcfmod.read_vcf_file(str(out))[1]

    targeted = run("bed", ["--target-regions", str(bed)])
    full = run("full", [])
    # the SNP call inside the target span is present in both
    assert any(v.pos == 2001 for v in targeted)
    assert any(v.pos == 2001 for v in full)
    # targeted calling emits nothing outside the padded span
    for v in targeted:
        assert v.chrom == "chr1"
        assert 1900 - 100 <= v.pos <= 2300 + 100
    # chr2 had reads but no targets -> absent from targeted run
    assert not any(v.chrom == "chr2" for v in targeted)


def test_sfm_single_end_equals_whole_file(tmp_path):
    """sfm --single-end (no spread file, split-merge.go:664-724) must
    match the whole-file filter output."""
    import samgen

    contigs = [("c1", 50_000), ("c2", 40_000), ("c3", 30_000)]
    header = samgen.make_header_lines(
        contigs, rgs=[{"ID": "rg1", "LB": "l1", "SM": "s1"}])
    import random

    rng = random.Random(3)
    lines = []
    for i in range(600):
        c, ln = contigs[rng.randrange(3)]
        pos = rng.randrange(1, ln - 200)
        if rng.random() < 0.3:
            pos = 1000 + 10 * (i % 5)  # duplicate clusters
        seq = "".join(rng.choice("ACGT") for _ in range(80))
        qual = "".join(chr(33 + rng.randrange(15, 40)) for _ in range(80))
        flag = 0x10 if rng.random() < 0.5 else 0
        lines.append(f"r{i:05d}\t{flag}\t{c}\t{pos}\t40\t80M\t*\t0\t0\t{seq}\t{qual}\tRG:Z:rg1")
    sam_in = tmp_path / "se.sam"
    sam_in.write_text("\n".join(header + lines) + "\n")

    whole = tmp_path / "whole.sam"
    assert cli.main(["filter", str(sam_in), str(whole),
                     "--mark-duplicates", "--sorting-order", "coordinate"]) == 0
    sfm_out = tmp_path / "sfm.sam"
    assert cli.main(["sfm", str(sam_in), str(sfm_out), "--single-end",
                     "--tmp-path", str(tmp_path / "t"),
                     "--contig-group-size", "1",
                     "--mark-duplicates", "--sorting-order", "coordinate"]) == 0
    from elprep_tpu.io import sam as samio

    h1, b1 = samio.read_sam_file(str(whole))
    h2, b2 = samio.read_sam_file(str(sfm_out))
    assert len(b1) == len(b2)
    k1 = list(zip(b1.qname.astype(bytes), b1.flag, b1.pos))
    k2 = list(zip(b2.qname.astype(bytes), b2.flag, b2.pos))
    assert k1 == k2


def test_merge_optical_duplicates_metrics_cli(workdir, tmp_path):
    """split -> per-group intermediates -> merge-optical-duplicates-metrics
    == whole-file metrics (reference: cmd/merge-optical-duplicates-metrics.go,
    gob merge mark-optical-duplicates.go:701-731)."""
    wd = workdir
    whole_metrics = tmp_path / "whole_metrics.txt"
    assert cli.main(["filter", str(wd / "in.sam"), "/dev/null",
                     "--mark-duplicates",
                     "--mark-optical-duplicates", str(whole_metrics),
                     "--sorting-order", "keep"]) == 0

    assert cli.main(["split", str(wd / "in.sam"), str(tmp_path / "sp"),
                     "--output-prefix", "x", "--output-type", "sam",
                     "--contig-group-size", "1"]) == 0
    import glob as _glob

    inter_dir = tmp_path / "inter"
    inter_dir.mkdir()
    inters = []
    for i, gf in enumerate(sorted(_glob.glob(str(tmp_path / "sp" / "splits" / "x-*.sam")))):
        ip = str(inter_dir / ("m%d.intermediate" % i))
        assert cli.main(["filter", gf, "/dev/null", "--mark-duplicates",
                         "--mark-optical-duplicates-intermediate", ip,
                         "--sorting-order", "keep"]) == 0
        inters.append(ip)
    # the spread file holds cross-group pairs
    spread = str(tmp_path / "sp" / "x-spread.sam")
    import os as _os

    if _os.path.exists(spread):
        ip = str(inter_dir / "spread.intermediate")
        assert cli.main(["filter", spread, "/dev/null", "--mark-duplicates",
                         "--mark-optical-duplicates-intermediate", ip,
                         "--sorting-order", "keep"]) == 0
    merged = tmp_path / "merged_metrics.txt"
    assert cli.main(["merge-optical-duplicates-metrics",
                     str(wd / "in.sam"), "out.sam", str(merged),
                     str(inter_dir)]) == 0

    def body(p):
        return [l for l in open(p).read().splitlines()
                if l and not l.startswith("#")]

    assert body(merged) == body(whole_metrics)


def test_bp_resolution_cli(workdir, tmp_path):
    """--reference-confidence BP_RESOLUTION at the CLI level: one record
    per covered position (no GVCF banding), <NON_REF> alt present
    (reference: haplotypecaller.go:117-123,213-224)."""
    wd = workdir
    out = tmp_path / "bp.vcf.gz"
    rc = cli.main([
        "filter", str(wd / "in.sam"), str(tmp_path / "bp.bam"),
        "--reference", str(wd / "ref.elfasta"),
        "--haplotypecaller", str(out),
        "--reference-confidence", "BP_RESOLUTION",
        "--host-pairhmm",
    ])
    assert rc == 0
    from elprep_tpu.io import vcf as vcfmod

    vhdr, variants = vcfmod.read_vcf_file(str(out))
    chr1 = [v for v in variants if v.chrom == "chr1"]
    assert chr1
    # per-position: positions are consecutive within covered spans and
    # no record carries an END (banding) INFO key
    assert all("END" not in v.info for v in chr1)
    pos = [v.pos for v in chr1]
    assert len(pos) == len(set(pos))
    runs = sum(1 for a, b in zip(pos, pos[1:]) if b != a + 1)
    assert runs <= 4  # a handful of covered spans, all base-resolved
    # the het SNP is still called
    v = next((v for v in chr1 if v.pos == 2001), None)
    assert v is not None and sorted(v.genotypes[0].gt) == [0, 1]


def test_assembly_region_padding_flag(workdir, tmp_path, monkeypatch):
    """--assembly-region-padding reaches HCParams.padding (region
    extension; reference: cmd/filter.go:468, default 100) and the
    pipeline still calls the het SNP with a non-default value."""
    wd = workdir
    seen = []
    from elprep_tpu.hc import activity as hact

    real = hact.make_hc_params

    def spy(*a, **kw):
        p = real(*a, **kw)
        seen.append(p.padding)
        return p

    # cli imports make_hc_params inside the function; patch the source
    monkeypatch.setattr(hact, "make_hc_params", spy)

    out = tmp_path / "pad60.vcf.gz"
    rc = cli.main([
        "filter", str(wd / "in.sam"), str(tmp_path / "pad60.bam"),
        "--reference", str(wd / "ref.elfasta"),
        "--haplotypecaller", str(out),
        "--reference-confidence", "NONE",
        "--assembly-region-padding", "60",
        "--host-pairhmm",
    ])
    assert rc == 0
    assert 60 in seen
    from elprep_tpu.io import vcf as vcfmod

    _, variants = vcfmod.read_vcf_file(str(out))
    s = next(v for v in variants if v.pos == 2001)
    assert sorted(s.genotypes[0].gt) == [0, 1]


def test_sfm_bqsr_hc_forwards_assembly_region_padding(workdir, tmp_path):
    """sfm's phase-2 per-group HC jobs must forward
    --assembly-region-padding (they are rebuilt from an allowlist, not
    the raw argv): sfm == whole-file with a non-default padding (0)."""
    import gzip

    wd = workdir
    common = ["--mark-duplicates", "--sorting-order", "coordinate",
              "--bqsr-tables-only", "", "--reference", str(wd / "ref.elfasta"),
              "--reference-confidence", "GVCF",
              "--assembly-region-padding", "0"]
    # whole-file run (bqsr via filter needs --bqsr; use the plain pair)
    assert cli.main(["filter", str(wd / "in.sam"), str(tmp_path / "w.bam"),
                     "--mark-duplicates", "--sorting-order", "coordinate",
                     "--bqsr", str(tmp_path / "w.recal"),
                     "--known-sites", str(wd / "sites.elsites"),
                     "--reference", str(wd / "ref.elfasta"),
                     "--haplotypecaller", str(tmp_path / "w.vcf.gz"),
                     "--reference-confidence", "GVCF",
                     "--assembly-region-padding", "0"]) == 0
    assert cli.main(["sfm", str(wd / "in.sam"), str(tmp_path / "s.bam"),
                     "--mark-duplicates", "--sorting-order", "coordinate",
                     "--bqsr", str(tmp_path / "s.recal"),
                     "--known-sites", str(wd / "sites.elsites"),
                     "--reference", str(wd / "ref.elfasta"),
                     "--haplotypecaller", str(tmp_path / "s.vcf.gz"),
                     "--reference-confidence", "GVCF",
                     "--assembly-region-padding", "0",
                     "--contig-group-size", "1",
                     "--tmp-path", str(tmp_path / "t")]) == 0
    w = [l for l in gzip.open(tmp_path / "w.vcf.gz", "rt") if not l.startswith("#")]
    s = [l for l in gzip.open(tmp_path / "s.vcf.gz", "rt") if not l.startswith("#")]
    assert w == s
    # and a padding-100 whole-file run must NOT equal the padding-0 one
    # (otherwise this test could pass vacuously)
    assert cli.main(["filter", str(wd / "in.sam"), str(tmp_path / "w100.bam"),
                     "--mark-duplicates", "--sorting-order", "coordinate",
                     "--bqsr", str(tmp_path / "w100.recal"),
                     "--known-sites", str(wd / "sites.elsites"),
                     "--reference", str(wd / "ref.elfasta"),
                     "--haplotypecaller", str(tmp_path / "w100.vcf.gz"),
                     "--reference-confidence", "GVCF"]) == 0
    w100 = [l for l in gzip.open(tmp_path / "w100.vcf.gz", "rt")
            if not l.startswith("#")]
    assert w100 != w


def test_cli_corrupt_input_errors(workdir, tmp_path, capsys):
    """Corrupt inputs produce one-line CLI errors, never tracebacks
    (reference failure policy: log.Panic-wrapped helpers,
    internal/files.go:89-141; here: ValueError -> one stderr line,
    rc=1)."""
    wd = workdir
    # 1. plain gzip (not BGZF): missing FEXTRA flag
    import gzip as _gz

    plain_gz = tmp_path / "plain.gz"
    with _gz.open(plain_gz, "wb") as f:
        f.write(b"not a bam")
    rc = cli.main(["filter", str(plain_gz), str(tmp_path / "o1.sam")])
    assert rc == 1
    err = capsys.readouterr().err
    assert ("FEXTRA" in err or "BGZF" in err) and "Traceback" not in err

    # 2. missing input file
    rc = cli.main(["filter", str(tmp_path / "nope.sam"),
                   str(tmp_path / "o2.sam")])
    assert rc == 1
    err = capsys.readouterr().err
    assert "not found" in err

    # 3. SAM alignment line missing mandatory fields
    bad = tmp_path / "bad.sam"
    bad.write_text("@HD\tVN:1.6\n@SQ\tSN:c\tLN:100\nr1\t0\tc\t1\n")
    rc = cli.main(["filter", str(bad), str(tmp_path / "o3.sam")])
    assert rc == 1
    err = capsys.readouterr().err
    assert "elprep_tpu filter:" in err and "Traceback" not in err

    # 4. unknown command
    assert cli.main(["frobnicate"]) == 1
    assert "unknown command" in capsys.readouterr().err
