"""Parallel BGZF block codec.

The reference implements BGZF as a 3-stage pargo pipeline: serial block
framing from the gzip "BC" extra subfield, parallel flate decompress with
CRC32 checks, ordered emit (reference: utils/bgzf/bgzf-files.go:95-265;
writer mirror :324-431). Here framing is a serial scan over the in-memory
buffer and the per-block inflate/deflate fans out over a thread pool
(zlib releases the GIL), with order restored by list position — the same
structure without channels.

Maximum uncompressed payload per block is 65536 bytes
(bgzf-files.go:51); the closing EOF marker is the fixed 28-byte empty
block (bgzf-files.go:53-63).
"""

from __future__ import annotations

import struct
import zlib
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

MAX_BLOCK_SIZE = 65536

# Empty-payload BGZF block marking EOF (reference: bgzf-files.go:53-63).
BGZF_EOF = bytes([
    0x1F, 0x8B, 0x08, 0x04, 0x00, 0x00,
    0x00, 0x00, 0x00, 0xFF, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1B, 0x00,
    0x03, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00,
])

_shared_pool: Optional[ThreadPoolExecutor] = None


def _pool() -> ThreadPoolExecutor:
    global _shared_pool
    if _shared_pool is None:
        import os

        _shared_pool = ThreadPoolExecutor(max_workers=min(32, os.cpu_count() or 4))
    return _shared_pool


def _frame_blocks(data: bytes) -> List[range]:
    """Serial stage: find (start, end) of every gzip member using the BC
    extra subfield (reference: readBgzfBlock, bgzf-files.go:95-160)."""
    spans: List[range] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("did not find gzip magic in BGZF block header")
        flg = data[pos + 3]
        if not flg & 4:
            raise ValueError("BGZF block without FEXTRA flag")
        xlen = struct.unpack_from("<H", data, pos + 10)[0]
        # scan the extra subfields for 'BC'
        xpos = pos + 12
        xend = xpos + xlen
        bsize = None
        while xpos < xend:
            si1, si2, slen = data[xpos], data[xpos + 1], struct.unpack_from("<H", data, xpos + 2)[0]
            if si1 == 0x42 and si2 == 0x43 and slen == 2:
                bsize = struct.unpack_from("<H", data, xpos + 4)[0] + 1
            xpos += 4 + slen
        if bsize is None:
            raise ValueError("BGZF block without BC extra subfield")
        if bsize < 12 + xlen + 8 or pos + bsize > n:
            raise ValueError("corrupt BGZF block: BSIZE smaller than its own framing")
        spans.append(range(pos, pos + bsize))
        pos += bsize
    return spans


def _inflate_block(data: bytes, span: range) -> bytes:
    flg = data[span.start + 3]
    xlen = struct.unpack_from("<H", data, span.start + 10)[0]
    payload_start = span.start + 12 + xlen
    if flg & ~4:
        raise ValueError("unsupported gzip FLG bits in BGZF block")
    crc, isize = struct.unpack_from("<II", data, span.stop - 8)
    raw = zlib.decompress(data[payload_start : span.stop - 8], wbits=-15)
    if len(raw) != isize:
        raise ValueError("BGZF block size mismatch")
    if zlib.crc32(raw) != crc:
        raise ValueError("BGZF block CRC32 mismatch")
    return raw


def decompress(data: bytes) -> bytes:
    """Decompress a whole BGZF byte buffer (all blocks, parallel).
    Uses the native C++ codec when available (elprep_tpu.native)."""
    if not data:
        return b""
    from .. import native

    if native.available():
        out = native.bgzf_decompress(data)
        if out is not None:
            return out
    spans = _frame_blocks(data)
    if len(spans) == 1:
        return _inflate_block(data, spans[0])
    chunks = list(_pool().map(lambda s: _inflate_block(data, s), spans))
    return b"".join(chunks)


def _deflate_block(chunk: bytes, level: int) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    payload = co.compress(chunk) + co.flush()
    bsize = len(payload) + 12 + 6 + 8
    if bsize > MAX_BLOCK_SIZE:
        # incompressible payload: halve the chunk so BSIZE fits in uint16
        half = len(chunk) // 2
        return _deflate_block(chunk[:half], level) + _deflate_block(chunk[half:], level)
    header = struct.pack(
        "<2sBBIBBH2sHH",
        b"\x1f\x8b", 8, 4, 0, 0, 0xFF, 6, b"BC", 2, bsize - 1,
    )
    trailer = struct.pack("<II", zlib.crc32(chunk), len(chunk))
    return header + payload + trailer


def compress(data: bytes, level: int = 6, eof: bool = True) -> bytes:
    """Compress a byte buffer into BGZF blocks (64KB chop, parallel) and
    append the EOF marker (reference: bgzf-files.go:324-431).
    Uses the native C++ codec when available."""
    from .. import native

    if native.available():
        out = native.bgzf_compress(data, level=level, eof=eof)
        if out is not None:
            return out
    chunks = [data[i : i + MAX_BLOCK_SIZE] for i in range(0, len(data), MAX_BLOCK_SIZE)]
    if len(chunks) <= 1:
        blocks = [_deflate_block(c, level) for c in chunks]
    else:
        blocks = list(_pool().map(lambda c: _deflate_block(c, level), chunks))
    if eof:
        blocks.append(BGZF_EOF)
    return b"".join(blocks)


def is_bgzf(data: bytes) -> bool:
    return data[:2] == b"\x1f\x8b" and len(data) >= 12 and (data[3] & 4) != 0
