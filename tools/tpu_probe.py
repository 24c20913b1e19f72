"""One-shot probes of the attached accelerator: H2D bandwidth, fused
columnar-step resident time, and table-build strategy microbenches.

Numbers feed the resident-pipeline design (packed transfer + on-device
unpack); run on a quiet host, under timeout, one at a time.

Usage: timeout 600 python tools/tpu_probe.py [h2d|step|hist] ...
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402


def sync(x) -> float:
    from __graft_entry__ import sync_scalar

    return sync_scalar(x)


def probe_h2d() -> None:
    import jax

    print("backend:", jax.default_backend(), jax.devices())
    for mb in (16, 64, 256):
        a = np.random.randint(0, 255, mb << 20, np.uint8)
        t0 = time.perf_counter()
        d = jax.device_put(a)
        sync(d)
        dt = time.perf_counter() - t0
        print("H2D %4d MB: %6.2fs = %7.1f MB/s" % (mb, dt, mb / dt))
        # D2H
        t0 = time.perf_counter()
        _ = np.asarray(d)
        dt = time.perf_counter() - t0
        print("D2H %4d MB: %6.2fs = %7.1f MB/s" % (mb, dt, mb / dt))


def probe_step(n_reads: int = 2_097_152) -> None:
    """Fused columnar step, resident (no transfer in the timing)."""
    import jax

    from __graft_entry__ import fused_device_step, fused_step_columns

    step = fused_device_step()
    cols = fused_step_columns(n_reads)
    dcols = [jax.device_put(c) for c in cols]
    sync(dcols[-1])
    out = step(*dcols)
    sync(out)  # compile
    for _ in range(2):
        t0 = time.perf_counter()
        out = step(*dcols)
        s = sync(out)
        print("fused step %d reads resident: %.2fs (s=%.1f)"
              % (n_reads, time.perf_counter() - t0, s))


def probe_hist(n: int = 256 << 20 >> 7) -> None:
    """Histogram strategies for the covariate tables on the accelerator:
    scatter-add vs sort+segment-sum, 94*1001 bins, n codes."""
    import jax
    import jax.numpy as jnp

    nbins = 94 * 1001
    codes = np.random.randint(0, nbins, n, np.int32)
    d = jax.device_put(codes)
    sync(d)

    @jax.jit
    def scatter(c):
        return jnp.zeros(nbins, jnp.int32).at[c].add(1, mode="drop")

    @jax.jit
    def sorted_hist(c):
        s = jnp.sort(c)
        # counts via searchsorted on bin boundaries
        edges = jnp.arange(nbins + 1, dtype=jnp.int32)
        idx = jnp.searchsorted(s, edges)
        return jnp.diff(idx)

    for name, fn in (("scatter", scatter), ("sort+searchsorted", sorted_hist)):
        out = fn(d)
        sync(out)
        t0 = time.perf_counter()
        out = fn(d)
        sync(out)
        dt = time.perf_counter() - t0
        print("%-18s %d codes: %6.2fs = %6.1f Mcodes/s"
              % (name, n, dt, n / 1e6 / dt))


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "h2d"
    if which == "h2d":
        probe_h2d()
    elif which == "step":
        probe_step(int(sys.argv[2]) if len(sys.argv) > 2 else 2_097_152)
    elif which == "hist":
        probe_hist(int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000 * 100)
    else:
        raise SystemExit("unknown probe " + which)


if __name__ == "__main__":
    main()
