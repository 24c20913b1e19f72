"""Command-line interface (reference: main.go, cmd/filter.go, cmd/convert.go).

Subcommands: ``filter`` (the 5-step best-practices pipeline over one
file), ``vcf-to-elsites``, ``bed-to-elsites``, ``fasta-to-elfasta``,
``split``, ``merge``, ``sfm``.

The phase order is fixed regardless of option order
(reference: README.md:276-294): filters -> (optical) duplicate marking
-> BQSR -> sort -> output / variant calling.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Dict, List, Optional, Tuple

import numpy as np


_PHASE = [0]


def _timed(enabled: bool, msg: str, fn, profile: str = ""):
    """(reference: timedRun, cmd/util.go:262-281)"""
    _PHASE[0] += 1
    if profile:
        import cProfile

        pr = cProfile.Profile()
        pr.enable()
    if enabled:
        t0 = time.time()
        print(msg, file=sys.stderr)
        out = fn()
        print(f"  done in {time.time() - t0:.2f}s", file=sys.stderr)
    else:
        out = fn()
    if profile:
        pr.disable()
        pr.dump_stats(f"{profile}{_PHASE[0]}.prof")
    return out


def _setup_log(log_path: str, command_line: str) -> None:
    """Tee stderr into a timestamped log file
    (reference: cmd/util.go:228-260)."""
    if not log_path:
        return
    os.makedirs(log_path, exist_ok=True)
    name = os.path.join(log_path, "elprep_tpu-%s.log" % time.strftime("%Y-%m-%d-%H-%M-%S"))
    class _Tee:
        def __init__(self, f1, f2):
            self.f1, self.f2 = f1, f2
        def write(self, s):
            self.f1.write(s)
            self.f2.write(s)
        def flush(self):
            self.f1.flush()
            self.f2.flush()
    fh = open(name, "a")
    fh.write(command_line + "\n")
    sys.stderr = _Tee(sys.stderr, fh)


def _build_filter_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="elprep_tpu filter", add_help=True)
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--output-type", choices=["sam", "bam"], default="")
    p.add_argument("--filter-unmapped-reads", action="store_true")
    p.add_argument("--filter-unmapped-reads-strict", action="store_true")
    p.add_argument("--filter-mapping-quality", type=int, default=0)
    p.add_argument("--filter-non-exact-mapping-reads", action="store_true")
    p.add_argument("--filter-non-exact-mapping-reads-strict", action="store_true")
    p.add_argument("--filter-non-overlapping-reads", default="")
    p.add_argument("--clear-duplicate-flag", action="store_true")
    p.add_argument("--rename-chromosomes", action="store_true")
    p.add_argument("--clean-sam", action="store_true")
    p.add_argument("--replace-reference-sequences", default="")
    p.add_argument("--replace-read-group", default="")
    p.add_argument("--mark-duplicates", action="store_true")
    p.add_argument("--mark-optical-duplicates", default="")
    p.add_argument("--mark-optical-duplicates-intermediate", default="")
    p.add_argument("--optical-duplicates-pixel-distance", type=int, default=100)
    p.add_argument("--remove-duplicates", action="store_true")
    p.add_argument("--remove-optional-fields", default="")
    p.add_argument("--keep-optional-fields", default="")
    p.add_argument("--sorting-order", default="keep",
                   choices=["keep", "unknown", "unsorted", "queryname", "coordinate"])
    p.add_argument("--bqsr", default="")
    p.add_argument("--bqsr-tables-only", default="")
    p.add_argument("--bqsr-apply", default="")
    p.add_argument("--recal-file", default="")
    p.add_argument("--bqsr-tablename-prefix", default="GATK",
                   help="prefix used in BQSR table reports (cmd/filter.go:481)")
    p.add_argument("--reference", default="")
    p.add_argument("--known-sites", default="")
    p.add_argument("--quantize-levels", type=int, default=0)
    p.add_argument("--sqq", default="")
    p.add_argument("--max-cycle", type=int, default=500)
    p.add_argument("--haplotypecaller", default="")
    p.add_argument("--reference-confidence", default="GVCF",
                   choices=["GVCF", "BP_RESOLUTION", "NONE"])
    p.add_argument("--assembly-region-padding", type=int, default=100,
                   help="padding around assembly regions during variant "
                        "calling (only with --haplotypecaller)")
    p.add_argument("--sample-name", default="")
    p.add_argument("--target-regions", default="")
    p.add_argument("--spread-file", default="")
    p.add_argument("--random-seed-file", default="")
    p.add_argument("--nr-of-threads", type=int, default=0)
    p.add_argument("--timed", action="store_true")
    p.add_argument("--profile", default="",
                   help="write a cProfile dump per phase to PREFIX<phase>.prof")
    p.add_argument("--log-path", default="")
    p.add_argument("--activity-profile", default="")
    p.add_argument("--assembly-regions", default="")
    p.add_argument("--mark-duplicates-deterministic", action="store_true")  # compat no-op
    p.add_argument("--pg-cmd-line", default="",
                   help="program command line to be stored in the header "
                        "(only for sfm subcommands) (cmd/filter.go:475)")
    p.add_argument("--randomized-qd", action="store_true",
                   help="jitter QD >= 35 with Gaussian noise like the "
                        "reference's default build "
                        "(randomized-max-qd.go:30-44); default is the "
                        "deterministic fixed_high_qd clamp")
    p.add_argument("--pedantic", action="store_true",
                   help="binary-parity behaviors of the reference's "
                        "`pedantic` build tag: Java-style float rounding, "
                        "int16 tile wraparound, x87 log10")
    p.add_argument("--host-pairhmm", action="store_true",
                   help="use the f64 host PairHMM instead of the device kernel")
    p.add_argument("--sharded", action="store_true",
                   help="shard the in-memory pipeline over all visible "
                        "devices: per-shard sort+dedup and a psum-reduced "
                        "BQSR table build replace sfm's split files and "
                        "gob merges (reference: cmd/sfm.go:605-907)")
    return p


def filter_command(argv: List[str]) -> int:
    from .core.header import SortingOrder
    from .core.pipeline import SamData, run_pipeline
    from .io import sam as samio
    from . import filters as F
    from .filters import simple as fsimple
    from .filters.markdup import MarkDuplicatesState, mark_duplicates_filter
    from .filters import optical as foptical
    from .filters import bqsr as fbqsr
    from .filters import bqsr_report
    from .io.fasta import MappedFasta, RefIndex
    from .io import bed as bedio
    from .io import intervals as iv

    args = _build_filter_parser().parse_args(argv)
    command_line = "elprep_tpu filter " + " ".join(argv)

    sorting_order = SortingOrder(args.sorting_order)
    if args.nr_of_threads > 0:
        # (reference: runtime.GOMAXPROCS, cmd/filter.go:906-909)
        from . import native

        native.set_default_threads(args.nr_of_threads)
    if args.pedantic:
        from . import pedantic

        pedantic.set_pedantic(True)
    want_bqsr = bool(args.bqsr or args.bqsr_tables_only)
    want_hc = bool(args.haplotypecaller)
    if (want_bqsr or args.bqsr_apply) and not args.reference:
        print("error: --reference required for BQSR", file=sys.stderr)
        return 2
    if want_hc and not args.reference:
        print("error: --reference required for --haplotypecaller", file=sys.stderr)
        return 2
    if not (want_bqsr or args.bqsr_apply):
        # (reference: checkNonBQSROptions, cmd/util.go:183-194)
        for flag_name, is_set in (("--quantize-levels", args.quantize_levels != 0),
                                  ("--sqq", bool(args.sqq)),
                                  ("--known-sites", bool(args.known_sites))):
            if is_set:
                print(f"Warning: The {flag_name} optional flag is set without "
                      "using --bqsr. This parameter is ignored because base "
                      "recalibration is not requested.", file=sys.stderr)

    # filters1 construction mirrors cmd/filter.go:691-780
    filters1: List = []
    if args.filter_unmapped_reads_strict:
        filters1.append(fsimple.remove_unmapped_reads_strict)
    elif args.filter_unmapped_reads:
        filters1.append(fsimple.remove_unmapped_reads)
    if args.filter_mapping_quality > 0:
        filters1.append(fsimple.remove_mapping_quality_less_than(args.filter_mapping_quality))
    if args.filter_non_exact_mapping_reads:
        filters1.append(fsimple.remove_non_exact_mapping_reads)
    if args.filter_non_exact_mapping_reads_strict:
        filters1.append(fsimple.remove_non_exact_mapping_reads_strict)
    if args.filter_non_overlapping_reads:
        bed = bedio.parse_bed(args.filter_non_overlapping_reads)
        filters1.append(fsimple.remove_non_overlapping_reads(bed))
    if args.clear_duplicate_flag:
        filters1.append(fsimple.clear_duplicate_flag)
    if args.rename_chromosomes:
        filters1.append(fsimple.rename_chromosomes)
    if args.clean_sam:
        filters1.append(fsimple.clean_sam)
    if args.replace_reference_sequences:
        filters1.append(fsimple.replace_reference_sequence_dictionary_from_sam_file(
            args.replace_reference_sequences))
    if args.replace_read_group:
        from .core.header import parse_header_line_from_string

        filters1.append(fsimple.add_or_replace_read_group(
            parse_header_line_from_string(args.replace_read_group)))
    if (args.replace_reference_sequences or args.mark_duplicates
            or sorting_order in (SortingOrder.COORDINATE, SortingOrder.QUERYNAME)
            or want_bqsr or args.bqsr_apply or want_hc):
        filters1.append(fsimple.add_refid)
    use_sharded = bool(args.sharded and args.mark_duplicates
                       and sorting_order == SortingOrder.COORDINATE)
    md_state = None
    if args.mark_duplicates and not use_sharded:
        md_state = MarkDuplicatesState()
        filters1.append(mark_duplicates_filter(state=md_state))
    # in sharded mode remove_optional_reads runs after the sharded
    # dedup+sort, preserving the serial phase order
    post_dedup_filters: List = [fsimple.remove_optional_reads]
    if not use_sharded:
        filters1.extend(post_dedup_filters)

    filters2: List = []
    if args.remove_duplicates:
        filters2.append(fsimple.remove_duplicate_reads)
    if args.remove_optional_fields:
        if args.remove_optional_fields == "all":
            # "all" removes everything = keep the empty set
            # (reference: cmd/filter.go:879-880 KeepOptionalFields(nil))
            filters2.append(fsimple.keep_optional_fields([]))
        else:
            tags = [t.strip() for t in args.remove_optional_fields.split(",")]
            filters2.append(fsimple.remove_optional_fields(tags))
    if args.keep_optional_fields:
        if args.keep_optional_fields == "none":
            filters2.append(fsimple.keep_optional_fields([]))
        else:
            tags = [t.strip() for t in args.keep_optional_fields.split(",")]
            filters2.append(fsimple.keep_optional_fields(tags))
    # --pg-cmd-line overrides the @PG CL (nested sfm invocations pass
    # the outer command, reference: cmd/filter.go:933-943)
    filters1.insert(0, fsimple.add_pg_line({
        "ID": "elprep_tpu", "PN": "elprep_tpu", "VN": "5.1.3",
        "CL": args.pg_cmd_line or command_line,
    }))
    from .hc.genotyping import set_randomized_qd

    set_randomized_qd(args.randomized_qd)

    bed_obj = None
    bed_regions = None
    if args.target_regions:
        bed_obj = bedio.parse_bed(args.target_regions)
        bed_regions = iv.from_bed(bed_obj)
        for c in list(bed_regions):
            bed_regions[c] = iv.flatten(iv.sort_by_start(bed_regions[c]))

    # Streaming fast path (reference: runBestPracticesPipeline,
    # cmd/filter.go:328-341): no sort/dedup/BQSR/HC -> constant memory
    streaming_ok = (
        sorting_order in (SortingOrder.KEEP, SortingOrder.UNKNOWN, SortingOrder.UNSORTED)
        and not args.mark_duplicates and not want_bqsr and not args.bqsr_apply
        and not want_hc and not args.spread_file
        and not os.path.isdir(args.input)
        and args.output not in ("/dev/null", "/dev/zero")
    )
    if streaming_ok:
        def streaming_phase():
            # Overlapped 3-stage pipeline: a reader/parser thread feeds
            # batches through a bounded queue, filters run on the main
            # thread, and a formatter/writer thread drains a second
            # queue — wall approaches max(stage) instead of the sum
            # (reference: pargo pipeline, sam/filter-pipeline.go:269-296).
            # The hot parse/format/compress work runs in the native lib
            # with the GIL released, so the threads genuinely overlap.
            import queue
            import threading

            from .core.pipeline import apply_filters, compose_filters, effective_sorting_order

            fmt = args.output_type or ("bam" if args.output.endswith(".bam") else "sam")
            all_filters = filters1 + filters2
            q_in: "queue.Queue" = queue.Queue(maxsize=3)
            q_out: "queue.Queue" = queue.Queue(maxsize=3)
            errors: List[BaseException] = []

            def reader():
                try:
                    for item in samio.iter_sam_chunks(args.input):
                        q_in.put(item)
                except BaseException as e:  # propagate to main
                    errors.append(e)
                finally:
                    q_in.put(None)

            def writer_thread():
                try:
                    with open(args.output, "wb") as f:
                        writer = None
                        while True:
                            item = q_out.get()
                            if item is None:
                                break
                            hdr, batch = item
                            if writer is None:
                                if fmt == "sam":
                                    f.write(samio.format_sam_header(hdr))
                                    writer = ("sam", f)
                                else:
                                    from .io.bam import StreamingBamWriter

                                    writer = ("bam", StreamingBamWriter(f, hdr))
                            if writer[0] == "sam":
                                writer[1].write(samio.format_alignments(batch))
                            else:
                                writer[1].write_batch(batch)
                        if writer is not None and writer[0] == "bam":
                            writer[1].close()
                except BaseException as e:
                    errors.append(e)
                    # drain so the producer can finish
                    while q_out.get() is not None:
                        pass

            t_read = threading.Thread(target=reader, daemon=True)
            t_write = threading.Thread(target=writer_thread, daemon=True)
            t_read.start()
            t_write.start()
            bfs = None
            first = True
            while True:
                item = q_in.get()
                if item is None:
                    break
                hdr, batch = item
                if first:
                    bfs = compose_filters(hdr, all_filters)
                    effective_sorting_order(sorting_order, hdr, hdr.hd_so())
                    first = False
                q_out.put((hdr, apply_filters(batch, bfs)))
            q_out.put(None)
            t_read.join()
            t_write.join()
            if errors:
                raise errors[0]

        _timed(args.timed, "Running pipeline.", streaming_phase, args.profile)
        return 0

    # Phase 1: read into memory + filters + sort. A directory input
    # merges all contained files (reference: sam/merge-inputs.go).
    def read_phase():
        if os.path.isdir(args.input):
            from .io.merge_inputs import read_and_merge_files

            files = sorted(
                os.path.join(args.input, f) for f in os.listdir(args.input)
                if not f.startswith("."))
            hdr, batch = read_and_merge_files(files)
        else:
            hdr, batch = samio.read_sam_file(args.input)
        if use_sharded:
            from .core.pipeline import effective_sorting_order
            from .parallel.mesh import make_mesh
            from .parallel.sharded import run_sharded_sort_dedup

            data0 = run_pipeline(SamData(hdr, batch), filters1, SortingOrder.KEEP)
            so = effective_sorting_order(sorting_order, data0.header,
                                         hdr.hd_so())
            mesh = make_mesh()
            batch2, _ = run_sharded_sort_dedup(
                data0.batch, data0.header, mesh,
                do_sort=so == SortingOrder.COORDINATE)
            return run_pipeline(SamData(data0.header, batch2),
                                post_dedup_filters, SortingOrder.KEEP)
        return run_pipeline(SamData(hdr, batch), filters1, sorting_order)

    _setup_log(args.log_path, command_line)
    if want_bqsr or want_hc:
        # pre-spawn the worker pool: the children's jax/package imports
        # overlap the read phase instead of stalling the first pooled use
        from .hc.parallel import get_pool

        nw = args.nr_of_threads if args.nr_of_threads > 0 else (os.cpu_count() or 1)
        if os.environ.get("ELPREP_TPU_HC_WORKERS"):
            nw = int(os.environ["ELPREP_TPU_HC_WORKERS"])
        get_pool(nw)
    if want_hc:
        # warm the first span's main-thread build path during the read
        # phase: hc-module imports plus one realistic-size
        # band_pass/region pass so the first contig's build doesn't pay
        # fresh-segment faults + import latency on the HC critical path
        import threading

        def _warm_hc_build():
            try:
                import numpy as _np

                from .hc import genotyping, refconf  # noqa: F401
                from .hc.activity import (HCParams, band_pass_states,
                                          compute_assembly_regions)

                p = HCParams()
                z = _np.zeros(2_000_000)
                st = band_pass_states(z, z, p)
                compute_assembly_regions("warm", b"A" * 1000, 0, 1000, 1000,
                                         st[:1000], p)
            except Exception:
                pass

        threading.Thread(target=_warm_hc_build, daemon=True).start()
    data = _timed(args.timed, "Reading SAM into memory and applying filters.", read_phase, args.profile)

    # Phase 2: optical duplicates — independent of BQSR (pure host math
    # over a snapshot of the post-dedup batch), so when a table build
    # follows it runs concurrently with it: the main process mostly
    # idles waiting on the pool during recalibration
    optical_future = None
    if args.mark_optical_duplicates or args.mark_optical_duplicates_intermediate:
        def optical_phase(ob=data.batch, oh=data.header):
            from .filters.markdup import aux_from_temps

            aux = aux_from_temps(ob) or (md_state.aux if md_state else None)
            ctrs = foptical.mark_optical_duplicates(
                ob, oh, aux,
                pixel_distance=args.optical_duplicates_pixel_distance)
            if args.mark_optical_duplicates:
                foptical.print_duplicates_metrics(
                    args.mark_optical_duplicates, command_line, ctrs)
            else:
                foptical.save_metrics_intermediate(
                    args.mark_optical_duplicates_intermediate, ctrs)

        if args.bqsr or args.bqsr_tables_only:
            from concurrent.futures import ThreadPoolExecutor

            _optical_pool = ThreadPoolExecutor(max_workers=1)
            optical_future = _optical_pool.submit(optical_phase)
            _optical_pool.shutdown(wait=False)
            if args.timed:
                print("Marking optical duplicates (overlapped with "
                      "recalibration).")
        else:
            _timed(args.timed, "Marking optical duplicates.", optical_phase,
                   args.profile)

    post_sort = sorting_order
    if post_sort != SortingOrder.UNSORTED:
        post_sort = SortingOrder.KEEP

    ref_index = None
    mapped_fasta = None
    if args.reference:
        mapped_fasta = MappedFasta(args.reference)
        ref_index = RefIndex(mapped_fasta)

    # Phase 3-5: BQSR
    recal_file = args.bqsr or args.bqsr_tables_only
    if recal_file:
        known = [s for s in args.known_sites.split(",") if s]
        recal = fbqsr.BaseRecalibrator(known, ref_index)
        if bed_obj is not None:
            data.batch = run_pipeline(
                data, [fsimple.remove_non_overlapping_reads(bed_obj)],
                post_sort).batch
        if use_sharded:
            from .parallel.mesh import make_mesh
            from .parallel.sharded import sharded_recalibrate

            def recal_fn():
                return sharded_recalibrate(recal, data.header, data.batch,
                                           args.max_cycle, make_mesh())
        else:
            def recal_fn():
                from .hc.parallel import get_pool

                nw = args.nr_of_threads if args.nr_of_threads > 0 else (os.cpu_count() or 1)
                if os.environ.get("ELPREP_TPU_HC_WORKERS"):
                    nw = int(os.environ["ELPREP_TPU_HC_WORKERS"])
                return recal.recalibrate(data.header, data.batch, args.max_cycle,
                                         pool=get_pool(nw))
        try:
            tables = _timed(args.timed, "Base recalibration.", recal_fn,
                            args.profile)
        except BaseException:
            # surface (or at least report) the overlapped optical thread
            # before the recal error propagates — it must not be left
            # failing invisibly during interpreter teardown
            if optical_future is not None:
                from concurrent.futures import wait as _fwait

                _fwait([optical_future])
                exc = optical_future.exception()
                if exc is not None:
                    print(f"elprep_tpu: optical duplicate marking also "
                          f"failed: {exc}", file=sys.stderr)
            raise
        if optical_future is not None:
            optical_future.result()  # re-raises optical failures
            optical_future = None
        os.makedirs(os.path.dirname(os.path.abspath(recal_file)) or ".", exist_ok=True)
        if args.bqsr_tables_only and not args.bqsr:
            # raw (pre-finalize) intermediate tables for later combining
            # (reference: print-bqsr.go:301-329 writes gob tables)
            bqsr_report.save_intermediate(tables, recal_file)
        else:
            tables.finalize()
            bqsr_report.print_bqsr_tables(tables, recal_file,
                                          prefix=args.bqsr_tablename_prefix)
        if args.bqsr:  # apply unless tables-only
            sqq = [int(s) for s in args.sqq.split(",") if s]

            def apply_phase():
                return run_pipeline(
                    data,
                    [fbqsr.apply_bqsr_filter(tables, args.quantize_levels, sqq,
                                             args.max_cycle)],
                    post_sort)

            data = _timed(args.timed, "Apply BQSR.", apply_phase, args.profile)
    elif args.bqsr_apply:
        tables = bqsr_report.load_and_combine_bqsr_tables(args.bqsr_apply)
        tables.finalize()
        if args.recal_file:
            bqsr_report.print_bqsr_tables(tables, args.recal_file,
                                          prefix=args.bqsr_tablename_prefix)
        sqq = [int(s) for s in args.sqq.split(",") if s]
        data = run_pipeline(
            data, [fbqsr.apply_bqsr_filter(tables, args.quantize_levels, sqq,
                                           args.max_cycle)], post_sort)

    # remaining pipeline (cmd/filter.go:66-140)
    write_output = args.output not in ("/dev/null", "/dev/zero")
    if args.spread_file:
        data = _merge_spread_file(data, args.spread_file, post_sort)
    pending_write = []
    if write_output:
        def write_phase():
            fmt = args.output_type or ("bam" if args.output.endswith(".bam") else "sam")
            out = run_pipeline(data, filters2, post_sort)
            if want_hc:
                # overlap the file write with variant calling. The
                # column ARRAYS are immutable by construction, but the
                # HC prep rebinds attributes on the shared batch (it
                # drops the tags column to save RAM, hcprep.py
                # haplotype_call_aln), so the writer serializes its own
                # shallow snapshot of the column references.
                import copy
                import threading

                snap = copy.copy(out.batch)
                # headers are tiny and HC filters may mutate them in
                # place (e.g. dropping the @sr user record)
                snap_hdr = copy.deepcopy(out.header)
                errs = []

                def _write():
                    try:
                        samio.write_sam_file(args.output, snap_hdr,
                                             snap, fmt=fmt)
                    except BaseException as e:  # re-raised after HC
                        errs.append(e)

                th = threading.Thread(target=_write, name="output-writer")
                th.start()
                pending_write.append((th, errs))
            else:
                samio.write_sam_file(args.output, out.header, out.batch, fmt=fmt)
            return out

        data = _timed(args.timed, "Write to file.", write_phase, args.profile)

    try:
        if want_hc:
            _timed(args.timed, "Calling variants.",
                   lambda: _run_haplotypecaller(args, data, mapped_fasta, bed_regions,
                                                command_line, post_sort), args.profile)
    finally:
        import sys as _sys

        in_flight = _sys.exc_info()[0] is not None
        for th, errs in pending_write:
            th.join()
            # don't supplant an in-flight HC exception with the writer's
            if errs and not in_flight:
                raise errs[0]
    return 0


def _merge_spread_file(data, spread_file: str, post_sort):
    """(reference: parseAndMergeSpreadFile, cmd/filter.go:44-64)"""
    from .core.batch import ReadBatch
    from .core.header import SortingOrder
    from .core.pipeline import SamData, run_pipeline
    from .io import sam as samio
    from .filters import simple as fsimple

    hdr2, spread = samio.read_sam_file(spread_file)
    # the group's OWN contigs from its @cs records — not the full @SQ
    # dictionary (reference: reads.Header.Contigs(), filter.go:49-56)
    cs = data.header.contigs()
    if not cs:
        raise ValueError(
            "Cannot call haplotypes on split file without contig information.")
    contigs = {c.encode() if isinstance(c, str) else c for c in cs}
    names_pool = np.array(spread.names, dtype=bytes) if spread.names else np.array([b""], dtype=bytes)
    keep = np.array([names_pool[spread.rname_id[i]] in contigs for i in range(len(spread))], bool)
    spread = spread.select(keep)
    sd = run_pipeline(SamData(data.header, spread), [fsimple.add_refid], SortingOrder.KEEP)
    merged = ReadBatch.concat([data.batch, sd.batch])
    # the reference MERGES the sorted spread reads into the sorted group
    # (ParallelStableMerge by CoordinateLess, cmd/filter.go:63); after a
    # concat the batch is NOT sorted even though the header still says
    # coordinate — requesting COORDINATE directly would be elided as
    # redundant, leaving the spread reads appended at the end (caught by
    # tests/test_crossmode.py). Drop the SO claim so the sort really runs.
    hdr2 = data.header.clone()
    hdr2.hd["SO"] = "unknown"
    out = SamData(hdr2, merged)
    return run_pipeline(out, [fsimple.add_refid], SortingOrder.COORDINATE)


def _run_haplotypecaller(args, data, mapped_fasta, bed_regions, command_line,
                         post_sort) -> None:
    from .core.pipeline import run_pipeline
    from .filters.hcprep import filter_reads_by_sample_name, haplotype_call_aln
    from .filters.clipping import ClipRead
    from .hc import driver as hcdriver
    from .hc.activity import make_hc_params
    from .io import vcf as vcfmod

    sample_box = [args.sample_name]
    data = run_pipeline(data, [filter_reads_by_sample_name(sample_box),
                               haplotype_call_aln], post_sort)
    params = make_hc_params(args.reference_confidence,
                            assembly_region_padding=args.assembly_region_padding,
                            command_line=command_line)
    # carried in params so spawned HC workers see the mode too
    params.randomized_qd = bool(getattr(args, "randomized_qd", False))
    if args.random_seed_file and os.path.exists(args.random_seed_file):
        content = open(args.random_seed_file).read().strip()
        if content != "init":
            from .hc.activity import JavaRandom

            params.random = JavaRandom.from_reflect(int(content))

    # normalized reference accessor (fasta.ToUpperAndN semantics)
    _norm = bytes(
        (ord(chr(c).upper()) if chr(c).upper() in "ACGT"
         else (ord("N") if chr(c).upper() in "NRYMKWSBDHV" else c))
        for c in range(256)
    )
    ref_cache: Dict[str, bytes] = {}

    def get_reference(contig: str) -> bytes:
        if contig not in ref_cache:
            seq = mapped_fasta.seq(contig)
            if seq is None:
                raise ValueError(f"contig {contig} not found in reference")
            ref_cache[contig] = np.asarray(seq).tobytes().translate(_norm)
        return ref_cache[contig]

    # columnar batch -> per-contig columnar blocks (coordinate order
    # preserved; ClipReads materialize in the HC workers, not here)
    from .hc.readblock import ContigReadBlock

    batch = data.batch
    reads_by_contig: Dict[str, ContigReadBlock] = {}
    for rid in np.unique(batch.rname_id) if len(batch) else []:
        nm = batch.names[rid] if 0 <= rid < len(batch.names) else b""
        reads_by_contig[nm.decode()] = ContigReadBlock.from_batch(
            batch, np.flatnonzero(batch.rname_id == rid), nm)

    bed_spans = None
    if bed_regions is not None:
        bed_spans = {c: [(int(s), int(e)) for s, e in ivals]
                     for c, ivals in bed_regions.items()}
    ap = open(args.activity_profile, "w") if args.activity_profile else None
    ar = open(args.assembly_regions, "w") if args.assembly_regions else None
    try:
        nr_workers = args.nr_of_threads if args.nr_of_threads > 0 else (os.cpu_count() or 1)
        if os.environ.get("ELPREP_TPU_HC_WORKERS"):
            nr_workers = int(os.environ["ELPREP_TPU_HC_WORKERS"])
        # multi-chip PairHMM: the batched pair dispatch shards over the
        # same mesh as the sort/dedup/BQSR phases (cleared otherwise —
        # the module state must not leak into later non-sharded runs).
        # Multi-host: LOCAL chips only — PairHMM dispatch composition
        # depends on worker-pool drain timing, which is nondeterministic
        # across processes, so no collective may ride inside it.
        from .ops.pairhmm import set_pairhmm_mesh

        mh_pid, mh_n = 0, 1
        if getattr(args, "sharded", False):
            import jax

            mh_n = jax.process_count()
            mh_pid = jax.process_index()
            if mh_n > 1:
                from jax.sharding import Mesh

                local = np.asarray(jax.local_devices())
                set_pairhmm_mesh(
                    Mesh(local, ("dp",)) if local.size > 1 else None)
            else:
                from .parallel.mesh import make_mesh

                set_pairhmm_mesh(make_mesh())
        else:
            set_pairhmm_mesh(None)
        # multi-host: contig-partitioned calling with an ordered VCF
        # gather — the TPU-native analog of the reference's per-node sfm
        # HC jobs + CombineVcfOutputs (cmd/sfm.go:769-876,
        # haploutils.go:481-499). Every process derives the identical
        # contiguous partition from the replicated batch, calls variants
        # on its slice only, writes a shard VCF to the shared
        # filesystem, barriers, and gathers all shards in contig order
        # into identical final outputs.
        hc_out = args.haplotypecaller
        mh_shards = None
        mh_restrict = None
        if mh_n > 1:
            from .parallel.multihost import hc_contig_partition

            # commit ONE PairHMM backend for the whole job: each process
            # probes its own link, so a borderline link could split the
            # run between 'pallas' and 'host' and the gathered VCF would
            # mix ulp-different f32 likelihood regimes across contig
            # slices. Process 0's session commitment wins everywhere.
            from jax.experimental import multihost_utils as _mhu

            from .ops.pairhmm import _SESSION_BACKEND, pairhmm_session_backend

            _kinds = ("pallas", "host", "scan")
            _be = np.int32(_kinds.index(pairhmm_session_backend()))
            _SESSION_BACKEND[0] = _kinds[
                int(_mhu.broadcast_one_to_all(_be))]
            # partition ALL header contigs (zero-coverage GVCF bands are
            # emitted per @SQ contig, so read-less contigs need an owner
            # too), weighted by read count
            sq_names = [sq["SN"] for sq in data.header.sq]
            owner = hc_contig_partition(
                [len(reads_by_contig.get(nm, ())) for nm in sq_names], mh_n)
            mh_restrict = {nm for i, nm in enumerate(sq_names)
                           if owner[i] == mh_pid}
            if os.environ.get("ELPREP_TPU_HC_TRACE"):
                per_proc = [0] * mh_n
                for i, nm in enumerate(sq_names):
                    per_proc[owner[i]] += len(reads_by_contig.get(nm, ()))
                print("[hc] contig partition reads per process: %s"
                      % per_proc, file=sys.stderr, flush=True)
            reads_by_contig = {nm: blk for nm, blk in reads_by_contig.items()
                               if nm in mh_restrict}
            # shard exchange rides the shared filesystem (the reference's
            # multi-node recipe assumes the same for its split files,
            # README.md:679-682). Default: the output's directory; when
            # each process writes to its own output dir, point every
            # process at one shared dir via ELPREP_TPU_HC_SHARD_DIR.
            shard_dir = os.environ.get(
                "ELPREP_TPU_HC_SHARD_DIR",
                os.path.dirname(os.path.abspath(args.haplotypecaller)) or ".")
            base = os.path.basename(args.haplotypecaller)
            # .gz shards + header sidecars: the gather concatenates the
            # compressed body BLOCKS directly (no recompress)
            mh_shards = [os.path.join(shard_dir,
                                      "%s.mh%03d.part.gz" % (base, p))
                         for p in range(mh_n)]
            hc_out = mh_shards[mh_pid]
        # streaming writeback: the VCF header must be written before any
        # variants, so write it from a first pass of the header builder,
        # then flush records incrementally as call_variants emits them
        os.makedirs(os.path.dirname(os.path.abspath(args.haplotypecaller)) or ".",
                    exist_ok=True)
        sink = vcfmod.AsyncVariantSink(vcfmod.StreamingVcfWriter(
            hc_out,
            hcdriver.write_vcf_header(params, data.header, sample_box[0],
                                      get_reference),
            shard_sidecar=(mh_shards is not None
                           or bool(os.environ.get("ELPREP_TPU_VCF_SHARD")))))
        # PairHMM placement is a session property: a TPU session runs
        # the Pallas kernel for EVERY dispatch (it wins from tiny batch
        # sizes and per-dispatch switching would break serial==parallel
        # byte equality; measured basis in CROSSOVER_r03.json) — so
        # unlike the columnar phases there is no read-count offload here
        try:
            vcf_header, variants = hcdriver.call_variants(
                params, data.header, reads_by_contig, get_reference,
                sample_name=sample_box[0], bed_regions=bed_spans,
                use_device_pairhmm=not args.host_pairhmm,
                activity_profile=ap, assembly_regions_out=ar,
                nr_workers=nr_workers, variant_sink=sink,
                restrict_contigs=mh_restrict,
            )
        finally:
            if os.environ.get("ELPREP_TPU_HC_TRACE"):
                import time as _t
                _c0 = _t.perf_counter()
                sink.close()
                print("[hc] sink.close took %.3fs"
                      % (_t.perf_counter() - _c0), file=sys.stderr, flush=True)
            else:
                sink.close()
        if mh_n > 1 and params.downsample_fired:
            # per-slice LCG streams: selection within >50-deep pileups
            # now depends on the contig partition, so byte-equality with
            # a whole-file (single-stream) run no longer holds — same
            # contract as the reference's per-job sfm seeding
            # (cmd/sfm.go:634-644), but say so out loud
            print("elprep_tpu: warning: HC downsampling fired in a "
                  "multi-host run; downsampled-read selection uses "
                  "per-contig-slice RNG streams and may differ from a "
                  "single-process run (coverage-equivalent output)",
                  file=sys.stderr, flush=True)
        if mh_shards is not None:
            # all shard VCFs visible -> gather in contig order (process
            # p owns the p-th contiguous contig slice, so shard order IS
            # contig order) -> every process writes an identical final
            # VCF -> barrier again before shard cleanup so no process
            # deletes a shard a peer is still reading
            from .parallel.multihost import hc_gather_barrier
            from .splitmerge_cli import _combine_vcf_outputs

            _g0 = time.perf_counter()
            hc_gather_barrier("elprep-hc-shards")
            _g1 = time.perf_counter()
            _combine_vcf_outputs(mh_shards, args.haplotypecaller)
            _g2 = time.perf_counter()
            hc_gather_barrier("elprep-hc-gathered")
            for victim in (mh_shards[mh_pid], mh_shards[mh_pid] + ".hdroff"):
                try:
                    os.remove(victim)
                except OSError:
                    pass
            if os.environ.get("ELPREP_TPU_HC_TRACE"):
                print("[hc] shard gather: barrier %.3fs combine %.3fs "
                      "total %.3fs"
                      % (_g1 - _g0, _g2 - _g1, time.perf_counter() - _g0),
                      file=sys.stderr, flush=True)
    finally:
        if ap:
            ap.close()
        if ar:
            ar.close()
    if args.random_seed_file and mh_pid == 0:
        # multi-host: only process 0 writes (the shared-filesystem path
        # would race; per-slice LCG streams mirror sfm's per-job seeds)
        with open(args.random_seed_file, "w") as f:
            f.write(str(params.random.reflect_seed()))


# ---------------------------------------------------------------------------
# converters (cmd/convert.go:35-100)
# ---------------------------------------------------------------------------


def vcf_to_elsites(argv: List[str]) -> int:
    from .io import intervals as iv
    from .io import vcf as vcfmod

    p = argparse.ArgumentParser(prog="elprep_tpu vcf-to-elsites")
    p.add_argument("vcf")
    p.add_argument("elsites")
    args = p.parse_args(argv)
    with open(args.vcf, "rb") as f:
        data = f.read()
    if data[:1] == b"\x1f":
        from .io import bgzf

        data = bgzf.decompress(data)
    by_chrom = vcfmod.scan_vcf_sites(data)
    ivals = {c: iv.flatten(iv.sort_by_start(iv.make([s for s, _ in xs],
                                                    [e for _, e in xs])))
             for c, xs in by_chrom.items()}
    iv.to_elsites_file(ivals, args.elsites)
    return 0


def bed_to_elsites(argv: List[str]) -> int:
    from .io import bed as bedio
    from .io import intervals as iv

    p = argparse.ArgumentParser(prog="elprep_tpu bed-to-elsites")
    p.add_argument("bed")
    p.add_argument("elsites")
    args = p.parse_args(argv)
    bed = bedio.parse_bed(args.bed)
    ivals = {c: iv.flatten(iv.sort_by_start(x)) for c, x in iv.from_bed(bed).items()}
    iv.to_elsites_file(ivals, args.elsites)
    return 0


def fasta_to_elfasta(argv: List[str]) -> int:
    from .io import fasta as fastaio

    p = argparse.ArgumentParser(prog="elprep_tpu fasta-to-elfasta")
    p.add_argument("fasta")
    p.add_argument("elfasta")
    args = p.parse_args(argv)
    contigs = fastaio.parse_fasta(args.fasta)
    fastaio.to_elfasta(contigs, args.elfasta)
    return 0


def _setup_jax_cache() -> None:
    """Persistent compilation cache (first kernel compiles through the
    remote TPU compiler are slow; reruns start hot)."""
    try:
        import jax

        cache = os.environ.get(
            "ELPREP_TPU_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache)
        # persist even fast-compiling programs: the small sort/dedup/BQSR
        # helpers (~0.1s compiles) otherwise rebuild in EVERY run and in
        # every pool worker, costing more wall than they ever save
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def main(argv: Optional[List[str]] = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    from . import native as _native

    _native.tune_malloc()
    # platform override for subprocess workers (the axon TPU plugin
    # ignores JAX_PLATFORMS; jax.config must be set pre-init)
    plat = os.environ.get("ELPREP_TPU_PLATFORM")
    if plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    _setup_jax_cache()
    if not argv:
        print(
            "elprep_tpu — TPU-native secondary-analysis engine\n"
            "commands: filter, split, merge, sfm, vcf-to-elsites, "
            "bed-to-elsites, fasta-to-elfasta",
            file=sys.stderr,
        )
        return 1
    cmd, rest = argv[0], argv[1:]
    try:
        if cmd == "filter":
            return filter_command(rest)
        if cmd == "vcf-to-elsites":
            return vcf_to_elsites(rest)
        if cmd == "bed-to-elsites":
            return bed_to_elsites(rest)
        if cmd == "fasta-to-elfasta":
            return fasta_to_elfasta(rest)
        if cmd in ("split", "merge", "sfm", "merge-optical-duplicates-metrics"):
            from . import splitmerge_cli

            return splitmerge_cli.run(cmd, rest)
    except FileNotFoundError as e:
        print(f"elprep_tpu {cmd}: file not found: {e.filename or e}", file=sys.stderr)
        return 1
    except ValueError as e:
        print(f"elprep_tpu {cmd}: {e}", file=sys.stderr)
        return 1
    print(f"unknown command {cmd}", file=sys.stderr)
    return 1
