"""Multi-host (2-process) sharded pipeline vs whole-file equality.

The reference blesses manual multi-node distribution via split/filter/merge
(reference: README.md:679-682); the TPU-native analog is one SPMD program
over a jax.distributed multi-process mesh (parallel/multihost.py).  Here two
worker processes, each with 4 virtual CPU devices, form a global 8-device
mesh; the sort/dedup verdicts come back through a cross-process all_gather
and the BQSR tables through a cross-process psum.  Both workers' outputs
must byte-equal the single-process whole-file run.
"""

import gzip
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import samgen
from elprep_tpu import cli

CONTIGS = [(f"chr{i}", 30_000 + 5_000 * i) for i in range(1, 5)]


def _make_sam(n=1200, seed=11):
    header = samgen.make_header_lines(
        CONTIGS, rgs=[{"ID": "rg1", "LB": "lib1", "SM": "s1", "PU": "u1"}])
    lines = samgen.random_reads(n - 100, CONTIGS, seed=seed, rg_ids=["rg1"])
    import random

    rng = random.Random(seed + 1)
    qual = "I" * 100
    seq = "".join(rng.choice("ACGT") for _ in range(100))
    extra = []
    for k in range(25):  # cross-contig duplicate pairs spanning shards
        c1, c2 = rng.sample(range(len(CONTIGS)), 2)
        p1 = rng.randrange(1000, 20_000)
        p2 = rng.randrange(1000, 20_000)
        for tag in "ab":
            q = f"x{k:04d}{tag}"
            extra.append(f"{q}\t97\t{CONTIGS[c1][0]}\t{p1}\t60\t100M\t"
                         f"{CONTIGS[c2][0]}\t{p2}\t0\t{seq}\t{qual}\tRG:Z:rg1")
            extra.append(f"{q}\t145\t{CONTIGS[c2][0]}\t{p2}\t60\t100M\t"
                         f"{CONTIGS[c1][0]}\t{p1}\t0\t{seq}\t{qual}\tRG:Z:rg1")
    return ("\n".join(header + lines + extra) + "\n").encode()


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _filter_args(sam_in, out_dir, elfasta, extra=()):
    return [
        "filter", str(sam_in), str(out_dir / "out.sam"),
        "--mark-duplicates",
        "--mark-optical-duplicates", str(out_dir / "metrics.txt"),
        "--sorting-order", "coordinate",
        "--bqsr", str(out_dir / "out.recal"),
        "--reference", str(elfasta),
    ] + list(extra)


def _body(p):  # @PG CL embeds the differing argv
    return [l for l in p.read_bytes().split(b"\n") if not l.startswith(b"@PG")]


def _metrics(p):  # '#' lines embed the command line
    return [l for l in p.read_text().splitlines() if not l.startswith("#")]


@pytest.mark.slow
def test_multihost_two_process_byte_equal(tmp_path):
    sam_in = tmp_path / "in.sam"
    sam_in.write_bytes(_make_sam())

    rng = np.random.RandomState(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    fasta = tmp_path / "ref.fasta"
    with open(fasta, "w") as f:
        for name, ln in CONTIGS:
            f.write(">%s\n" % name)
            s = rng.choice(bases, ln).tobytes().decode()
            for i in range(0, ln, 70):
                f.write(s[i:i + 70] + "\n")
    elfasta = tmp_path / "ref.elfasta"
    assert cli.main(["fasta-to-elfasta", str(fasta), str(elfasta)]) == 0

    plain = tmp_path / "plain"
    plain.mkdir()
    assert cli.main(_filter_args(sam_in, plain, elfasta)) == 0

    port = _free_port()
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"host{pid}"
        out.mkdir()
        outs.append(out)
        cmd = [sys.executable, "-m", "elprep_tpu.parallel.multihost",
               "--coordinator", f"127.0.0.1:{port}",
               "--num-processes", "2", "--process-id", str(pid),
               "--local-devices", "4", "--"] + \
            _filter_args(sam_in, out, elfasta, ["--sharded"])
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    fail = []
    for pid, pr in enumerate(procs):
        try:
            out_bytes, _ = pr.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for p2 in procs:
                p2.kill()
            pytest.fail(f"multihost worker {pid} timed out")
        if pr.returncode != 0:
            fail.append((pid, pr.returncode, out_bytes.decode(errors="replace")))
    assert not fail, f"worker failures: {fail}"

    for out in outs:  # every process holds the replicated result
        assert _body(out / "out.sam") == _body(plain / "out.sam")
        assert (out / "out.recal").read_text() == \
            (plain / "out.recal").read_text()
        assert _metrics(out / "metrics.txt") == _metrics(plain / "metrics.txt")


def _vcf_records(p):
    """Decompressed VCF lines minus ## meta (embeds the differing argv)."""
    data = gzip.open(p, "rb").read() if str(p).endswith(".gz") else p.read_bytes()
    return [l for l in data.split(b"\n") if not l.startswith(b"##")]


def _deep_pileup_lines(genome, cname, pos, n=60, read_len=100, alt_every=2):
    """n paired reads all STARTING at ``pos`` (downsampler input: >50
    reads per alignment start fires the Java-LCG draws,
    haploutils.go:241-275) with DISTINCT mate positions so their pair
    dedup keys are unique — none get duplicate-flagged away before the
    HC read filter. Every ``alt_every``-th read carries an ALT base at
    offset 50, so WHICH 50 reads survive downsampling changes AD/PL."""
    ref = genome[cname]
    qual = "I" * read_len
    base = ref[pos - 1 : pos - 1 + read_len].decode()
    alt_base = "A" if base[50] != "A" else "C"
    alt = base[:50] + alt_base + base[51:]
    lines = []
    for i in range(n):
        mpos = pos + 140 + i
        seq1 = alt if i % alt_every else base
        seq2 = ref[mpos - 1 : mpos - 1 + read_len].decode()
        tlen = mpos + read_len - pos
        q = f"dp{cname}{i:04d}"
        lines.append(f"{q}\t99\t{cname}\t{pos}\t60\t{read_len}M\t=\t{mpos}"
                     f"\t{tlen}\t{seq1}\t{qual}\tRG:Z:rg1")
        lines.append(f"{q}\t147\t{cname}\t{mpos}\t60\t{read_len}M\t=\t{pos}"
                     f"\t{-tlen}\t{seq2}\t{qual}\tRG:Z:rg1")
    return lines


def _records_for(records, contigs):
    pref = tuple(c.encode() + b"\t" for c in contigs)
    return [l for l in records if l.startswith(pref)]


@pytest.mark.slow
def test_multihost_downsampler_divergence_mode(tmp_path):
    """Pin the multi-host downsampling contract (round-4 verdict #6):
    each contig slice starts a fresh Java-LCG stream, so when >50-deep
    pileups sit on BOTH sides of the partition boundary, (a) the first
    slice still byte-equals a whole-file run (its stream prefix is
    identical), (b) the second slice diverges from whole-file — its
    stream no longer sees the first slice's draws — and equals the
    fresh-stream oracle (a whole-file run whose earlier deep pileup is
    absent), and (c) the run says so on stderr. This is the concurrent
    analog of the reference's per-job sfm seeding (cmd/sfm.go:634-644)."""
    genome = samgen.make_genome(CONTIGS, seed=31)
    header = samgen.make_header_lines(
        CONTIGS, rgs=[{"ID": "rg1", "LB": "lib1", "SM": "s1", "PU": "u1"}])
    base = samgen.reads_from_genome(800, CONTIGS, genome, seed=37,
                                    rg_ids=["rg1"])
    deep1 = _deep_pileup_lines(genome, "chr1", 5000)   # slice-0 side
    deep3 = _deep_pileup_lines(genome, "chr3", 5000)   # slice-1 side
    sam_in = tmp_path / "in.sam"
    sam_in.write_bytes(("\n".join(header + base + deep1 + deep3) + "\n")
                       .encode())
    # fresh-stream oracle for the second slice: same input minus the
    # FIRST slice's deep pileup, so its whole-file LCG stream is still
    # untouched when chr3's downsampler fires
    sam_oracle = tmp_path / "in_oracle.sam"
    sam_oracle.write_bytes(("\n".join(header + base + deep3) + "\n")
                           .encode())
    fasta = tmp_path / "ref.fasta"
    with open(fasta, "w") as f:
        for name, _ in CONTIGS:
            f.write(">%s\n%s\n" % (name, genome[name].decode()))
    elfasta = tmp_path / "ref.elfasta"
    assert cli.main(["fasta-to-elfasta", str(fasta), str(elfasta)]) == 0

    def hc_args(sam, out_dir, extra=()):
        # NO --bqsr: recal tables are trained on the WHOLE file, so the
        # oracle input (minus chr1's deep pileup) would shift chr3's
        # recalibrated quals by a ulp-level PL — this test isolates the
        # LCG-stream effect, the only cross-contig HC coupling left
        return [
            "filter", str(sam), str(out_dir / "out.sam"),
            "--mark-duplicates", "--sorting-order", "coordinate",
            "--reference", str(elfasta),
            "--haplotypecaller", str(out_dir / "out.vcf.gz"),
            "--reference-confidence", "GVCF"] + list(extra)

    plain = tmp_path / "plain"
    plain.mkdir()
    assert cli.main(hc_args(sam_in, plain)) == 0
    oracle = tmp_path / "oracle"
    oracle.mkdir()
    assert cli.main(hc_args(sam_oracle, oracle)) == 0

    port = _free_port()
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    env["ELPREP_TPU_HC_SHARD_DIR"] = str(shard_dir)
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"host{pid}"
        out.mkdir()
        outs.append(out)
        cmd = [sys.executable, "-m", "elprep_tpu.parallel.multihost",
               "--coordinator", f"127.0.0.1:{port}",
               "--num-processes", "2", "--process-id", str(pid),
               "--local-devices", "4", "--"] + \
            hc_args(sam_in, out, ["--sharded"])
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    worker_out = []
    fail = []
    for pid, pr in enumerate(procs):
        try:
            out_bytes, _ = pr.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for p2 in procs:
                p2.kill()
            pytest.fail(f"multihost worker {pid} timed out")
        worker_out.append(out_bytes)
        if pr.returncode != 0:
            fail.append((pid, pr.returncode, out_bytes.decode(errors="replace")))
    assert not fail, f"worker failures: {fail}"

    # the contig partition actually split between the two deep pileups
    from elprep_tpu.parallel.multihost import hc_contig_partition

    counts = []
    data = sam_in.read_bytes()
    for c, _ in CONTIGS:
        counts.append(sum(1 for l in data.split(b"\n")
                          if l.split(b"\t")[2:3] == [c.encode()]))
    assert list(hc_contig_partition(counts, 2)) == [0, 0, 1, 1], counts

    # (c) every process whose slice fired the downsampler warned
    for pid in range(2):
        assert b"downsampling fired in a multi-host run" in worker_out[pid], \
            worker_out[pid].decode(errors="replace")[-2000:]

    mh = _vcf_records(outs[0] / "out.vcf.gz")
    whole = _vcf_records(plain / "out.vcf.gz")
    orac = _vcf_records(oracle / "out.vcf.gz")
    # (a) first slice: stream prefix identical -> records equal whole-file
    assert _records_for(mh, ["chr1", "chr2"]) == \
        _records_for(whole, ["chr1", "chr2"])
    # (b) second slice: fresh per-slice stream == fresh-stream oracle ...
    assert _records_for(mh, ["chr3", "chr4"]) == \
        _records_for(orac, ["chr3", "chr4"])
    # ... and genuinely diverges from the whole-file single stream
    assert _records_for(mh, ["chr3"]) != _records_for(whole, ["chr3"])
    # both processes gathered identical finals
    assert (outs[0] / "out.vcf.gz").read_bytes() == \
        (outs[1] / "out.vcf.gz").read_bytes()


@pytest.mark.slow
def test_multihost_haplotypecaller_contig_partitioned(tmp_path):
    """Full 5-step incl. GVCF HaplotypeCaller across 2 processes: each
    calls variants on its contiguous contig slice and gathers the shard
    VCFs in contig order (parallel/multihost.py) — the analog of the
    reference's per-node sfm HC jobs (cmd/sfm.go:769-876). Outputs must
    be identical across processes and record-equal to whole-file."""
    genome = samgen.make_genome(CONTIGS, seed=23)
    header = samgen.make_header_lines(
        CONTIGS, rgs=[{"ID": "rg1", "LB": "lib1", "SM": "s1", "PU": "u1"}])
    lines = samgen.reads_from_genome(900, CONTIGS, genome, seed=29,
                                     rg_ids=["rg1"])
    sam_in = tmp_path / "in.sam"
    sam_in.write_bytes(("\n".join(header + lines) + "\n").encode())
    fasta = tmp_path / "ref.fasta"
    with open(fasta, "w") as f:
        for name, _ in CONTIGS:
            f.write(">%s\n%s\n" % (name, genome[name].decode()))
    elfasta = tmp_path / "ref.elfasta"
    assert cli.main(["fasta-to-elfasta", str(fasta), str(elfasta)]) == 0

    def hc_args(out_dir, extra=()):
        return _filter_args(sam_in, out_dir, elfasta, [
            "--haplotypecaller", str(out_dir / "out.vcf.gz"),
            "--reference-confidence", "GVCF"] + list(extra))

    plain = tmp_path / "plain"
    plain.mkdir()
    assert cli.main(hc_args(plain)) == 0

    port = _free_port()
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # per-process output dirs (so outputs byte-compare), one shared
    # shard-exchange dir (the shared-filesystem contract)
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    env["ELPREP_TPU_HC_SHARD_DIR"] = str(shard_dir)
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"host{pid}"
        out.mkdir()
        outs.append(out)
        cmd = [sys.executable, "-m", "elprep_tpu.parallel.multihost",
               "--coordinator", f"127.0.0.1:{port}",
               "--num-processes", "2", "--process-id", str(pid),
               "--local-devices", "4", "--"] + hc_args(out, ["--sharded"])
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    fail = []
    for pid, pr in enumerate(procs):
        try:
            out_bytes, _ = pr.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for p2 in procs:
                p2.kill()
            pytest.fail(f"multihost worker {pid} timed out")
        if pr.returncode != 0:
            fail.append((pid, pr.returncode, out_bytes.decode(errors="replace")))
    assert not fail, f"worker failures: {fail}"

    ref_records = _vcf_records(plain / "out.vcf.gz")
    assert len(ref_records) > 10  # real GVCF content, not an empty file
    for out in outs:
        assert _vcf_records(out / "out.vcf.gz") == ref_records
        assert _body(out / "out.sam") == _body(plain / "out.sam")
    assert not list(shard_dir.glob("*.part*")), \
        "shard VCFs (and sidecars) must be cleaned up"
    # byte-identical final VCFs across processes (same gather everywhere)
    assert (outs[0] / "out.vcf.gz").read_bytes() == \
        (outs[1] / "out.vcf.gz").read_bytes()
