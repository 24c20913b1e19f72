"""Packed host->device column transfer.

The columnar phases are transfer-bound on anything slower than PCIe
(CROSSOVER_r03: ~445 B/read shipped for the fused step; the measured
break-even link bandwidth is what gates accelerator dispatch in
ops/dispatch). The dominant per-read bytes are the [n, L] base matrix
and the [n, L] skip mask, both massively redundant:

- bases draw from a tiny alphabet (ACGTN + case variants in practice,
  <= 16 distinct byte values in any real batch), so they pack into
  4-bit dictionary indices -- 2 bases/byte, fully lossless for ANY
  alphabet up to 16 symbols (unlike BAM nibble codes, which fold case
  and would change covariate contexts for lowercase SAM input);
- the skip mask is boolean, so it bit-packs 8x.

Packing happens host-side (one LUT gather + shift/or), unpacking
on-device INSIDE the jitted consumer, where XLA fuses the shifts and
the 16-entry gather into the covariate program -- the dense [n, L]
matrix exists only in HBM-resident registers/fusions, never on the
link. Net: base 152 B -> 76 B, skip 152 B -> 19 B per 152 bp read
(~60% of the fused step's per-read transfer removed).

Reference contract: this is pure transport -- unpack(pack(x)) == x
bit-exactly (fuzzed in tests/test_packed.py), so every consumer's
output is unchanged vs shipping dense columns.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def pack_nibble_dict(arr: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Pack a [n, L] uint8 matrix whose values draw from <= 16 distinct
    bytes into ([n, ceil(L/2)] uint8, lut[16] uint8). Returns None when
    the alphabet exceeds 16 symbols (caller ships dense)."""
    arr = np.ascontiguousarray(arr, np.uint8)
    present = np.zeros(256, bool)
    present[arr.reshape(-1)] = True
    vals = np.flatnonzero(present)
    if len(vals) > 16:
        return None
    lut = np.zeros(16, np.uint8)
    lut[: len(vals)] = vals.astype(np.uint8)
    code_of = np.zeros(256, np.uint8)
    code_of[vals] = np.arange(len(vals), dtype=np.uint8)
    idx = code_of[arr]
    n, L = arr.shape
    if L % 2:
        idx = np.concatenate([idx, np.zeros((n, 1), np.uint8)], axis=1)
    packed = (idx[:, 0::2] << 4) | idx[:, 1::2]
    return packed, lut


def unpack_nibble_dict(packed, lut, L: int):
    """Device-side inverse of :func:`pack_nibble_dict` (jnp, jit-safe):
    [n, ceil(L/2)] uint8 + lut[16] -> [n, L] uint8."""
    import jax.numpy as jnp

    hi = (packed >> 4).astype(jnp.uint8)
    lo = (packed & 0xF).astype(jnp.uint8)
    idx = jnp.stack([hi, lo], axis=2).reshape(packed.shape[0], -1)[:, :L]
    return jnp.asarray(lut, jnp.uint8)[idx]


def pack_bits(mask: np.ndarray) -> np.ndarray:
    """Bit-pack a [n, L] boolean matrix to [n, ceil(L/8)] uint8
    (big-endian within each byte, np.packbits convention)."""
    return np.packbits(np.ascontiguousarray(mask, bool), axis=1)


def unpack_bits(packed, L: int):
    """Device-side inverse of :func:`pack_bits` (jnp, jit-safe)."""
    import jax.numpy as jnp

    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & 1
    return bits.reshape(packed.shape[0], -1)[:, :L].astype(bool)
