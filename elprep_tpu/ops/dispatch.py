"""Host-vs-accelerator dispatch cost model.

The columnar sort/dedup/BQSR kernels are latency-bound at small batch
sizes: a single device step is a handful of fused XLA programs, so when
the accelerator sits behind a high-latency link (or the batch is small
relative to per-dispatch overhead), the host CPU backend finishes the
same program faster than the transfer+dispatch round trips alone. This
module centralizes the decision: batches below ``ELPREP_TPU_DEVICE_MIN_READS``
(default 4M reads) execute their jitted programs on the host CPU
backend via ``jax.default_device``; larger batches use the configured
accelerator — but only if a one-time link-bandwidth probe shows the
host->device path can pay for the data these phases move (see
``_columnar_on_accel``; ``ELPREP_TPU_LINK_MBPS`` overrides the probe). The batched PairHMM dispatch is deliberately NOT part of
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

# Link-probe state: measured host->device MB/s (None = not probed yet).
_LINK_MBPS: list = [None]

# Below this link bandwidth the columnar phases can never win on the
# accelerator: they move ~230 packed bytes/read for ~5 us/read of host
# work, so the link must sustain >= ~50 MB/s just to break even on
# transfer, and >= ~500 MB/s once the device program itself (~9 us/read
# measured at 2M, CROSSOVER_r03) is accounted for. Real PCIe/ICI
# attachments run 10-25 GB/s; only a relay/tunnel sits below the floor.
_LINK_FLOOR_MBPS = 500.0
_PROBE_BYTES = 8 << 20


def _probe_link_mbps() -> float:
    """Measure the host->accelerator link once (8 MB put, timed to
    host-side completion). Cached for the session; override with
    ELPREP_TPU_LINK_MBPS to skip the probe."""
    if _LINK_MBPS[0] is not None:
        return _LINK_MBPS[0]
    v = os.environ.get("ELPREP_TPU_LINK_MBPS")
    if v:
        try:
            _LINK_MBPS[0] = float(v)
            return _LINK_MBPS[0]
        except ValueError:
            pass
    import time

    import numpy as np

    try:
        import jax

        a = np.ones(_PROBE_BYTES, np.uint8)
        d = jax.device_put(a)          # warm the connection + compile path
        float(np.asarray(d[:1])[0])
        # best of 2: one transient stall on an oscillating link must not
        # pin the whole session to the host when the link is healthy
        # (the floor decision is sticky for the session)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            d = jax.device_put(a)
            float(np.asarray(d[:1])[0])    # forces completion through relays
            best = min(best, max(time.perf_counter() - t0, 1e-6))
        _LINK_MBPS[0] = (_PROBE_BYTES / 1e6) / best
    except Exception:
        _LINK_MBPS[0] = float("inf")   # cannot probe: keep static model
    return _LINK_MBPS[0]


def reset_link_probes() -> None:
    """Clear every cached link-probe result (bandwidth, latency, and the
    session PairHMM backend commitment, which derives from them). For
    benchmarks/tools that temporarily override ELPREP_TPU_LINK_MBPS to
    force a routing decision: without the reset the override would stay
    cached and poison later 'document the real link' probes (the
    BENCH_r04 link_h2d_mbps=1e9 artifact bug)."""
    _LINK_MBPS[0] = None
    _LINK_LATENCY[0] = None
    from . import pairhmm as _ph

    _ph._SESSION_BACKEND[0] = None


_LINK_LATENCY = [None]


def probe_link_latency_s() -> float:
    """Measured per-dispatch round-trip latency of the accelerator link
    (tiny put + scalar fetch, best of 2). Cached per session; override
    with ELPREP_TPU_LINK_LATENCY_S. PCIe chips measure ~1-5 ms; the
    shared relay oscillates 0.1-2 s — the HC PairHMM batcher uses this
    to size its dispatches (hc/parallel._dispatch_tuning)."""
    if _LINK_LATENCY[0] is not None:
        return _LINK_LATENCY[0]
    v = os.environ.get("ELPREP_TPU_LINK_LATENCY_S")
    if v:
        try:
            _LINK_LATENCY[0] = float(v)
            return _LINK_LATENCY[0]
        except ValueError:
            pass
    import time

    import numpy as np

    try:
        import jax

        a = np.ones(128, np.uint8)
        d = jax.device_put(a)
        float(np.asarray(d[:1])[0])  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            d = jax.device_put(a)
            float(np.asarray(d[:1])[0])
            best = min(best, time.perf_counter() - t0)
        _LINK_LATENCY[0] = best
    except Exception:
        _LINK_LATENCY[0] = 0.0
    return _LINK_LATENCY[0]


def _threshold() -> int:
    v = os.environ.get("ELPREP_TPU_DEVICE_MIN_READS")
    if v:
        try:
            return int(v)
        except ValueError:
            pass
    return _DEFAULT_MIN_READS


def _columnar_on_accel(n_rows: int) -> bool:
    """Should an n_rows columnar program run on the accelerator?

    Two gates, both measured: the batch must exceed the dispatch-latency
    crossover (ELPREP_TPU_DEVICE_MIN_READS, default 4M — CROSSOVER_r03),
    AND the host->device link must sustain at least _LINK_FLOOR_MBPS.
    The second gate is probed once per session: the columnar phases are
    data-dense/compute-light (~230 packed bytes per ~5 us of host work),
    so behind a slow relay (measured 15-135 MB/s on the shared tunnel,
    day-dependent) no batch size ever pays for the transfer, while on a
    PCIe/ICI-attached chip (10-25 GB/s) the read-count crossover is the
    operative one. The PairHMM is deliberately exempt from both gates
    (compute-dense; see module docstring)."""
    if n_rows < _threshold():
        return False
    return _probe_link_mbps() >= _LINK_FLOOR_MBPS


def offloads_to_host(n_rows: int) -> bool:
    """True only when the session default backend is an accelerator AND
    the cost model actively overrides it for this batch. On a
    CPU-default session this is always False (nothing to override)."""
    import jax

    try:
        return jax.default_backend() != "cpu" and not _columnar_on_accel(n_rows)
    except Exception:
        return False


def routes_to_host(n_rows: int) -> bool:
    """True when an ``n_rows``-row columnar program should execute on the
    host CPU backend (either it already is the default, or the cost
    model routes it there)."""
    import jax

    try:
        return jax.default_backend() == "cpu" or not _columnar_on_accel(n_rows)
    except Exception:
        return True


def compute_device(n_rows: int):
    """Context manager placing jitted columnar programs for an
    ``n_rows``-row batch: host CPU backend when the cost model routes
    there, the session default (TPU) otherwise."""
    import jax

    try:
        if jax.default_backend() != "cpu" and not _columnar_on_accel(n_rows):
            return jax.default_device(jax.devices("cpu")[0])
    except Exception:
        pass
    return contextlib.nullcontext()
