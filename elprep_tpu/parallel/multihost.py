"""Multi-host (N-process) execution of the sharded pipeline phases.

The reference's multi-node story is manual: split the input with `elprep
split`, run `elprep filter` per node, merge the outputs and gob-reduce the
.elrecal tables (reference: README.md:679-682, cmd/sfm.go:605-907).  The
TPU-native equivalent is a *single SPMD program over a multi-process device
mesh*: each host process owns a slice of the global mesh
(``jax.distributed.initialize``), the read shards land on the devices each
process owns, and the cross-node reductions are XLA collectives over DCN —
``psum`` for the BQSR covariate tables (replacing the gob merge) and
``all_gather`` for the sort/dedup verdicts (replacing the output-file
merge).

Every process parses the same (shared-filesystem) input and computes the
identical deterministic shard plan; ``parallel.sharded._put`` then
materializes only the shards owned by the process's local devices, so no
read data ever crosses hosts outside the collectives.  All processes run
the same program and end with replicated results; each writes its own copy
of the output, which a launcher byte-compares for the determinism check.

Run one worker per host::

    python -m elprep_tpu.parallel.multihost \
        --coordinator HOST:PORT --num-processes N --process-id I \
        [--local-devices D] -- filter IN OUT --sharded ...

The ``--local-devices`` flag forces D virtual CPU devices per process
(test topology); on real TPU pods the plugin reports the local chips.

The HaplotypeCaller phase is contig-partitioned: each process calls
variants on a contiguous slice of the contig list (balanced by read
count — a deterministic plan every process computes identically from
the replicated batch), its PairHMM batches shard over the process's
LOCAL chips only (no cross-process collectives ride inside the
worker-pool drain, whose timing is nondeterministic), and the per-
process shard VCFs gather in contig order through the shared
filesystem — the direct analog of the reference's per-node sfm HC
jobs + CombineVcfOutputs (reference: cmd/sfm.go:769-876,
haploutils.go:481-499).  Like the reference's sfm mode, each contig
slice starts a fresh Java-LCG stream (cli.py seeds per process), so
equality with a whole-file run holds exactly when the downsampler does
not fire — the same contract the sfm tests pin.
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional

import numpy as np


def hc_contig_partition(read_counts, n_procs: int) -> "np.ndarray":
    """Contiguous contig->process assignment balanced by read count.

    A contig is owned by the process whose cumulative-weight band its
    MIDPOINT falls in (cut points at equal fractions), so a contig
    straddling a cut goes to whichever side holds more of it — the
    start-position rule this replaces assigned it to the earlier
    process, measured costing a [1.69M, 1.02M] split (and a 10 s
    gather-barrier wait on the idle process) on the 4M stress fixture,
    whose decreasing contig sizes straddle the half. Every process derives
    the identical plan from the replicated post-BQSR batch. Returns
    int32 [n_contigs] of owning process ids (monotone nondecreasing)."""
    counts = np.asarray(read_counts, np.int64)
    if len(counts) == 0:
        return np.zeros(0, np.int32)
    cum = np.cumsum(counts) - counts
    total = max(int(counts.sum()), 1)
    mid2 = 2 * cum + counts  # 2x the contig's cumulative midpoint
    return np.minimum((mid2 * n_procs) // (2 * total),
                      n_procs - 1).astype(np.int32)


def hc_gather_barrier(name: str) -> None:
    """Block until every process reaches this point (shard VCFs are
    visible on the shared filesystem before any process gathers)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_devices: Optional[int] = None) -> None:
    """Initialize JAX distributed for one worker process.

    Must run before any JAX backend use. ``local_devices`` forces virtual
    CPU devices (the 2-process x 4-device test topology); None keeps the
    platform's real local devices."""
    if local_devices is not None:
        flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
                 if not f.startswith("--xla_force_host_platform_device_count")]
        flags.append(f"--xla_force_host_platform_device_count={local_devices}")
        os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax

    if local_devices is not None:
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    import argparse

    p = argparse.ArgumentParser(
        prog="elprep_tpu.parallel.multihost",
        description="one multi-host worker; pass the filter command after --")
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=None)
    if "--" in argv:
        split = argv.index("--")
        own, rest = argv[:split], argv[split + 1:]
    else:
        own, rest = argv, []
    args = p.parse_args(own)
    if not rest:
        p.error("missing filter command after --")
    if "--sharded" not in rest:
        rest = rest + ["--sharded"]

    initialize(args.coordinator, args.num_processes, args.process_id,
               args.local_devices)

    from .. import cli

    return cli.main(rest)


if __name__ == "__main__":
    raise SystemExit(main())
