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
    assert not list(shard_dir.glob("*.part")), "shard VCFs must be cleaned up"
    # byte-identical final VCFs across processes (same gather everywhere)
    assert (outs[0] / "out.vcf.gz").read_bytes() == \
        (outs[1] / "out.vcf.gz").read_bytes()
