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
The HaplotypeCaller phase is intentionally not multi-host yet: its
PairHMM dispatch order depends on worker-pool drain timing, which is not
deterministic across processes, so its collectives could misalign.  Run
HC per-shard via sfm, or single-host.
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional


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
    # match --haplotypecaller, --haplotypecaller=x, and the unambiguous
    # argparse prefix abbreviations (--ha, --hap, ...) the downstream
    # parser would accept (--h alone is ambiguous with --host-pairhmm
    # and rejected there)
    def _is_hc_flag(a: str) -> bool:
        flag = a.split("=", 1)[0]
        return (a.startswith("--ha") and
                "--haplotypecaller".startswith(flag))

    if any(_is_hc_flag(a) for a in rest if a.startswith("--")):
        p.error("HaplotypeCaller is not multi-host yet (run it via sfm "
                "per-shard or single-host)")
    if "--sharded" not in rest:
        rest = rest + ["--sharded"]

    initialize(args.coordinator, args.num_processes, args.process_id,
               args.local_devices)

    from .. import cli

    return cli.main(rest)


if __name__ == "__main__":
    raise SystemExit(main())
