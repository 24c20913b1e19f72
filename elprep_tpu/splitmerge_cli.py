"""split / merge / sfm subcommands
(reference: cmd/split.go, cmd/merge.go, cmd/sfm.go,
cmd/merge-optical-duplicates-metrics.go).

``sfm`` runs split -> per-group filter -> merge. The reference spawns
elprep subprocesses per group (cmd/sfm.go:605-907); here groups run
in-process sequentially — the single shared TPU chip makes in-process
execution the faster arrangement, and metrics/BQSR-table merging uses
the same intermediate-file reductions.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile
from typing import List

from .core.header import SortingOrder


def run(cmd: str, argv: List[str]) -> int:
    if cmd == "split":
        return split_command(argv)
    if cmd == "merge":
        return merge_command(argv)
    if cmd == "sfm":
        return sfm_command(argv)
    if cmd == "merge-optical-duplicates-metrics":
        return merge_metrics_command(argv)
    return 1


def split_command(argv: List[str]) -> int:
    from . import splitmerge

    p = argparse.ArgumentParser(prog="elprep_tpu split")
    p.add_argument("input")
    p.add_argument("output_path")
    p.add_argument("--output-prefix", default="")
    p.add_argument("--output-type", default="sam")
    p.add_argument("--contig-group-size", type=int, default=0)
    p.add_argument("--single-end", action="store_true")
    p.add_argument("--nr-of-threads", type=int, default=0)
    p.add_argument("--timed", action="store_true")
    args = p.parse_args(argv)
    prefix = args.output_prefix or os.path.basename(args.input).split(".")[0]
    os.makedirs(args.output_path, exist_ok=True)
    splitmerge.split_file_per_chromosome(
        args.input, args.output_path, prefix, args.output_type,
        args.contig_group_size, single_end=args.single_end)
    return 0


def merge_command(argv: List[str]) -> int:
    from . import splitmerge

    p = argparse.ArgumentParser(prog="elprep_tpu merge")
    p.add_argument("input_path")
    p.add_argument("output")
    p.add_argument("--input-prefix", default="")
    p.add_argument("--input-type", default="sam")
    p.add_argument("--output-type", default="")
    p.add_argument("--single-end", action="store_true")
    p.add_argument("--nr-of-threads", type=int, default=0)
    p.add_argument("--timed", action="store_true")
    args = p.parse_args(argv)
    input_path = args.input_path
    prefix = args.input_prefix
    if not prefix:
        files = glob.glob(os.path.join(input_path, "*-group00001.*")) + \
            glob.glob(os.path.join(input_path, "*-unmapped.*"))
        if not files:
            print("no split files found", file=sys.stderr)
            return 1
        base = os.path.basename(files[0])
        prefix = base.rsplit("-", 1)[0]
    out_format = args.output_type or ("bam" if args.output.endswith(".bam") else "sam")
    hdr = splitmerge.header_from_any_split_file(input_path, prefix, args.input_type)
    if hdr.hd_so() == SortingOrder.COORDINATE:
        splitmerge.merge_sorted_files_split_per_chromosome(
            input_path, args.output, prefix, args.input_type, out_format, hdr)
    else:
        splitmerge.merge_unsorted_files_split_per_chromosome(
            input_path, args.output, prefix, args.input_type, out_format, hdr,
            single_end=args.single_end)
    return 0


def sfm_command(argv: List[str]) -> int:
    """(reference: cmd/sfm.go:605-907)"""
    from . import splitmerge
    from .cli import filter_command
    from .filters import optical as foptical

    p = argparse.ArgumentParser(prog="elprep_tpu sfm", allow_abbrev=False)
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--intermediate-files-output-type", default="sam")
    p.add_argument("--contig-group-size", type=int, default=0)
    p.add_argument("--single-end", action="store_true")
    p.add_argument("--tmp-path", default="")
    p.add_argument("--mark-optical-duplicates", default="")
    p.add_argument("--haplotypecaller", default="")
    p.add_argument("--nr-of-jobs", type=int, default=1,
                   help="process per contig group, N at a time (the "
                        "reference runs one subprocess at a time, "
                        "cmd/sfm.go:612; >1 is an extension — each job "
                        "starts a fresh RNG stream)")
    # remaining args forwarded to per-group filter invocations
    args, passthrough = p.parse_known_args(argv)

    tmp_root = args.tmp_path or tempfile.mkdtemp(prefix="elprep_tpu_sfm_")
    os.makedirs(tmp_root, exist_ok=True)
    prefix = os.path.basename(args.input).split(".")[0]
    ext = args.intermediate_files_output_type

    # phase 1: split
    splitmerge.split_file_per_chromosome(
        args.input, tmp_root, prefix, ext, args.contig_group_size,
        single_end=args.single_end)
    splits_dir = os.path.join(tmp_root, "splits")
    filtered_dir = os.path.join(tmp_root, "filtered")
    os.makedirs(filtered_dir, exist_ok=True)

    metrics_dir = os.path.join(tmp_root, "metrics")
    vcfs_dir = os.path.join(tmp_root, "vcfs")
    os.makedirs(metrics_dir, exist_ok=True)
    os.makedirs(vcfs_dir, exist_ok=True)

    # phase 2: per-group filter
    group_files = sorted(glob.glob(os.path.join(splits_dir, prefix + "-*." + ext)))
    spread_file = os.path.join(tmp_root, prefix + "-spread." + ext)
    job_argvs = []
    for gf in group_files:
        base = os.path.basename(gf)
        out_gf = os.path.join(filtered_dir, base)
        fargv = [gf, out_gf] + list(passthrough)
        if args.mark_optical_duplicates:
            fargv += ["--mark-optical-duplicates-intermediate",
                      os.path.join(metrics_dir, base + ".metrics")]
        if args.haplotypecaller and "unmapped" not in base:
            fargv += ["--haplotypecaller",
                      os.path.join(vcfs_dir, base + ".vcf.gz"),
                      "--spread-file", spread_file]
        job_argvs.append(fargv)
    if args.nr_of_jobs > 1:
        # subprocess pool (reference pattern: exec.Command(os.Args[0],...),
        # cmd/sfm.go:612 — run one at a time there; N at a time here)
        import subprocess
        import sys as _sys
        from concurrent.futures import ThreadPoolExecutor

        pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env["PYTHONPATH"] = pkg_parent + os.pathsep + env.get("PYTHONPATH", "")

        def run_one(fargv):
            return subprocess.run(
                [_sys.executable, "-m", "elprep_tpu", "filter"] + fargv,
                env=env).returncode
        with ThreadPoolExecutor(max_workers=args.nr_of_jobs) as pool:
            for rc in pool.map(run_one, job_argvs):
                if rc != 0:
                    return rc
    else:
        for fargv in job_argvs:
            rc = filter_command(fargv)
            if rc != 0:
                return rc
    # the filtered dir IS the merge input; spread file sits beside it
    if os.path.exists(spread_file):
        import shutil

        shutil.copy(spread_file, os.path.join(filtered_dir,
                                              os.path.basename(spread_file)))

    # phase 3: merge
    out_format = "bam" if args.output.endswith(".bam") else "sam"
    hdr = splitmerge.header_from_any_split_file(filtered_dir, prefix, ext)
    if hdr.hd_so() == SortingOrder.COORDINATE:
        splitmerge.merge_sorted_files_split_per_chromosome(
            filtered_dir, args.output, prefix, ext, out_format, hdr)
    else:
        splitmerge.merge_unsorted_files_split_per_chromosome(
            filtered_dir, args.output, prefix, ext, out_format, hdr,
            single_end=args.single_end)

    # phase 4: metric + VCF reductions (gob -> JSON/concat equivalents)
    if args.mark_optical_duplicates:
        paths = sorted(glob.glob(os.path.join(metrics_dir, "*.metrics")))
        ctrs = foptical.load_and_combine_metrics(paths)
        foptical.print_duplicates_metrics(
            args.mark_optical_duplicates, "elprep_tpu sfm " + " ".join(argv), ctrs)
    if args.haplotypecaller:
        _combine_vcf_outputs(sorted(glob.glob(os.path.join(vcfs_dir, "*.vcf.gz"))),
                             args.haplotypecaller)
    return 0


def _combine_vcf_outputs(paths: List[str], output: str) -> None:
    """(reference: CombineVcfOutputs, haploutils.go:481-499): concatenate
    per-split VCFs, header from the first."""
    from .io import bgzf

    bodies = []
    header = None
    for i, path in enumerate(paths):
        with open(path, "rb") as f:
            data = f.read()
        if data[:1] == b"\x1f":
            data = bgzf.decompress(data)
        lines = data.split(b"\n")
        body_start = 0
        for j, line in enumerate(lines):
            if line.startswith(b"#"):
                body_start = j + 1
            else:
                break
        if header is None:
            header = b"\n".join(lines[:body_start]) + b"\n" if body_start else b""
        body = b"\n".join(l for l in lines[body_start:] if l)
        if body:
            bodies.append(body)
    out = (header or b"") + (b"\n".join(bodies) + b"\n" if bodies else b"")
    if output.endswith(".gz"):
        out = bgzf.compress(out)
    with open(output, "wb") as f:
        f.write(out)


def merge_metrics_command(argv: List[str]) -> int:
    from .filters import optical as foptical

    p = argparse.ArgumentParser(prog="elprep_tpu merge-optical-duplicates-metrics")
    p.add_argument("metrics_path")
    p.add_argument("output")
    args = p.parse_args(argv)
    paths = sorted(glob.glob(os.path.join(args.metrics_path, "*")))
    ctrs = foptical.load_and_combine_metrics(paths)
    foptical.print_duplicates_metrics(args.output, "elprep_tpu " + " ".join(argv), ctrs)
    return 0
