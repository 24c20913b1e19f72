"""Large-scale stress run: 1M reads over 8 contigs through the full
5-step pipeline (dedup + optical metrics + BQSR + apply + GVCF HC).

Builds a cached fixture under .bench_cache/stress1m (~8x the bench.py
e2e fixture, multi-contig so the HC cross-span pipeline matters), then
times one CLI run. Usage:

    [ELPREP_TPU_PLATFORM=cpu] python tools/stress.py [--reads N]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def build_fixture(n_reads: int) -> str:
    cache = os.path.join(_REPO, ".bench_cache", "stress%dk" % (n_reads // 1000))
    if os.path.exists(os.path.join(cache, "DONE")):
        return cache
    os.makedirs(cache, exist_ok=True)
    from samgen import make_genome, make_header_lines, reads_from_genome

    contigs = [("chr%d" % (i + 1), 2_000_000 - i * 150_000) for i in range(8)]
    genome = make_genome(contigs, seed=17)
    header = make_header_lines(
        contigs, rgs=[{"ID": "rg1", "LB": "lib1", "SM": "s1", "PU": "u1"}])
    t0 = time.time()
    lines = reads_from_genome(n_reads, contigs, genome, seed=23,
                              rg_ids=["rg1"])
    print("generated %d reads in %.1fs" % (len(lines), time.time() - t0))
    with open(os.path.join(cache, "in.sam"), "w") as fh:
        fh.write("\n".join(header) + "\n")
        fh.write("\n".join(lines) + "\n")
    fasta = os.path.join(cache, "ref.fasta")
    with open(fasta, "w") as fh:
        for name, _ in contigs:
            fh.write(">%s\n" % name)
            seq = genome[name].decode()
            for k in range(0, len(seq), 70):
                fh.write(seq[k : k + 70] + "\n")
    with open(os.path.join(cache, "sites.bed"), "w") as fh:
        fh.write("chr1\t1000\t2000\nchr3\t5000\t9000\n")
    from elprep_tpu import cli

    assert cli.main(["fasta-to-elfasta", fasta,
                     os.path.join(cache, "ref.elfasta")]) == 0
    assert cli.main(["bed-to-elsites", os.path.join(cache, "sites.bed"),
                     os.path.join(cache, "sites.elsites")]) == 0
    os.remove(fasta)
    with open(os.path.join(cache, "DONE"), "w") as fh:
        fh.write("ok\n")
    return cache


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1_000_000)
    ap.add_argument("--timed", action="store_true")
    ap.add_argument("--json", action="store_true",
                    help="print one machine-readable JSON line at the end")
    args = ap.parse_args()
    cache = build_fixture(args.reads)
    from elprep_tpu import cli

    out = tempfile.mkdtemp(prefix="elprep_stress_")
    try:
        argv = [
            "filter", os.path.join(cache, "in.sam"),
            os.path.join(out, "out.bam"),
            "--mark-duplicates",
            "--mark-optical-duplicates", os.path.join(out, "metrics.txt"),
            "--sorting-order", "coordinate",
            "--bqsr", os.path.join(out, "out.recal"),
            "--known-sites", os.path.join(cache, "sites.elsites"),
            "--reference", os.path.join(cache, "ref.elfasta"),
            "--haplotypecaller", os.path.join(out, "out.vcf.gz"),
            "--reference-confidence", "GVCF",
        ] + (["--timed"] if args.timed else [])
        t0 = time.perf_counter()
        rc = cli.main(argv)
        dt = time.perf_counter() - t0
        import resource

        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        print("stress: %d reads in %.1fs = %.0f reads/s rc=%d maxrss=%.1fGB"
              % (args.reads, dt, args.reads / dt, rc, rss))
        if args.json:
            import json

            from elprep_tpu.ops.pairhmm import _SESSION_BACKEND

            print(json.dumps({
                "reads": args.reads, "seconds": round(dt, 2),
                "reads_per_sec": round(args.reads / dt, 1), "rc": rc,
                "maxrss_gb": round(rss, 2),
                # what the session committed to (None if HC never
                # dispatched a PairHMM batch)
                "pairhmm_backend": _SESSION_BACKEND[0]}))
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
