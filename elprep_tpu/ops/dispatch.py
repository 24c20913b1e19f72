"""Host-vs-accelerator dispatch cost model.

The columnar sort/dedup/BQSR kernels are latency-bound at small batch
sizes: a single device step is a handful of fused XLA programs, so when
the accelerator sits behind a high-latency link (or the batch is small
relative to per-dispatch overhead), the host CPU backend finishes the
same program faster than the transfer+dispatch round trips alone. This
module centralizes the decision: batches below ``ELPREP_TPU_DEVICE_MIN_READS``
(default 4M reads) execute their jitted programs on the host CPU
backend via ``jax.default_device``; larger batches use the configured
accelerator. The batched PairHMM dispatch is deliberately NOT part of
this cost model: on a TPU session the Pallas kernel runs for every
dispatch (measured to win from ~128 pairs including packing+transfer,
16x at 2048 — CROSSOVER_r03.json — and to cost almost nothing below
that), because a per-dispatch backend switch would give serial and
pooled HC, which batch pairs differently, ulp-different likelihoods
and break the byte-equality contract.

The integer sort/dedup/table programs are bit-identical across
backends by construction. The PairHMM f32 likelihoods are the one
backend-sensitive surface: CPU-default sessions always use the jitted
lax.scan formulation, while accelerator sessions use the Pallas TPU
kernel above the crossover — ulp-level f32 differences between those
kernels are inherent to using the TPU kernel at all (both are held to
the f64 oracle within 5e-4, tests/test_pairhmm.py), and the crossover
only moves where that existing boundary sits.
"""

from __future__ import annotations

import contextlib
import os

_DEFAULT_MIN_READS = 1 << 22  # 4M reads: below this, latency dominates


def _threshold() -> int:
    v = os.environ.get("ELPREP_TPU_DEVICE_MIN_READS")
    if v:
        try:
            return int(v)
        except ValueError:
            pass
    return _DEFAULT_MIN_READS


def offloads_to_host(n_rows: int) -> bool:
    """True only when the session default backend is an accelerator AND
    the batch sits below the dispatch-latency crossover — i.e. the cost
    model actively overrides the accelerator. On a CPU-default session
    this is always False (nothing to override)."""
    import jax

    try:
        return jax.default_backend() != "cpu" and n_rows < _threshold()
    except Exception:
        return False


def routes_to_host(n_rows: int) -> bool:
    """True when an ``n_rows``-row columnar program should execute on the
    host CPU backend (either it already is the default, or the batch is
    below the dispatch-latency crossover)."""
    import jax

    try:
        return jax.default_backend() == "cpu" or n_rows < _threshold()
    except Exception:
        return True


def compute_device(n_rows: int):
    """Context manager placing jitted columnar programs for an
    ``n_rows``-row batch: host CPU backend below the threshold, the
    session default (TPU) otherwise."""
    import jax

    try:
        if jax.default_backend() != "cpu" and n_rows < _threshold():
            return jax.default_device(jax.devices("cpu")[0])
    except Exception:
        pass
    return contextlib.nullcontext()
