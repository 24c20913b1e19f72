"""sfm-vs-whole-file characterization at stress scale (config-4 analog).

Runs the full 5-step pipeline (dedup + optical metrics + BQSR + apply +
GVCF HC) on the stress fixture twice — whole-file `filter` and
split/filter/merge `sfm` — asserts record-level equality of the BAM and
VCF outputs (the reference's losslessness contract, README.md:134-137),
and reports wall times. One JSON line for the SCALING/SFM artifact.

Usage: timeout 3600 python tools/sfm_bench.py [--reads 4000000]
           [--jobs 1] [--skip-hc]
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))


def _vcf_records(p: str):
    with gzip.open(p, "rb") as f:
        return [l for l in f.read().split(b"\n") if not l.startswith(b"##")]


def _bam_body_lines(p: str):
    from elprep_tpu.io import sam

    hdr, batch = sam.read_sam_file(p)
    text = sam.format_sam(hdr, batch)
    return [l for l in text.split(b"\n") if not l.startswith(b"@")]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=4_000_000)
    ap.add_argument("--jobs", type=int, default=1)
    ap.add_argument("--skip-hc", action="store_true")
    args = ap.parse_args()

    from stress import build_fixture

    from elprep_tpu import cli
    from elprep_tpu.splitmerge_cli import sfm_command

    cache = build_fixture(args.reads)
    row = {"reads": args.reads, "jobs": args.jobs, "hc": not args.skip_hc}

    wd = tempfile.mkdtemp(prefix="sfm_bench_")
    whole = os.path.join(wd, "whole")
    sfm = os.path.join(wd, "sfm")
    os.makedirs(whole)
    os.makedirs(sfm)

    def common(out_dir):
        a = ["--mark-duplicates",
             "--mark-optical-duplicates", os.path.join(out_dir, "metrics.txt"),
             "--sorting-order", "coordinate",
             "--bqsr", os.path.join(out_dir, "out.recal"),
             "--known-sites", os.path.join(cache, "sites.elsites"),
             "--reference", os.path.join(cache, "ref.elfasta")]
        if not args.skip_hc:
            a += ["--haplotypecaller", os.path.join(out_dir, "out.vcf.gz"),
                  "--reference-confidence", "GVCF"]
        return a

    t0 = time.perf_counter()
    rc = cli.main(["filter", os.path.join(cache, "in.sam"),
                   os.path.join(whole, "out.bam")] + common(whole))
    row["whole_file_s"] = round(time.perf_counter() - t0, 2)
    assert rc == 0, "whole-file filter failed"

    t0 = time.perf_counter()
    rc = sfm_command([os.path.join(cache, "in.sam"),
                      os.path.join(sfm, "out.bam"),
                      "--nr-of-jobs", str(args.jobs),
                      "--tmp-path", os.path.join(wd, "sfm_tmp")] + common(sfm))
    row["sfm_s"] = round(time.perf_counter() - t0, 2)
    assert rc == 0, "sfm failed"

    t0 = time.perf_counter()
    eq_bam = _bam_body_lines(os.path.join(whole, "out.bam")) == \
        _bam_body_lines(os.path.join(sfm, "out.bam"))
    row["bam_records_equal"] = bool(eq_bam)
    if not args.skip_hc:
        row["vcf_records_equal"] = bool(
            _vcf_records(os.path.join(whole, "out.vcf.gz"))
            == _vcf_records(os.path.join(sfm, "out.vcf.gz")))
    row["compare_s"] = round(time.perf_counter() - t0, 2)
    m_w = open(os.path.join(whole, "metrics.txt")).read().splitlines()
    m_s = open(os.path.join(sfm, "metrics.txt")).read().splitlines()
    row["metrics_equal"] = [l for l in m_w if not l.startswith("#")] == \
        [l for l in m_s if not l.startswith("#")]
    import shutil

    shutil.rmtree(wd, ignore_errors=True)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
