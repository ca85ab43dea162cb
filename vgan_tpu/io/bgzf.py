"""BGZF (blocked gzip) reader/writer.

GAM files are BGZF streams (htslib-style gzip members carrying a BC
extra field with the compressed block size), as produced by libvgio's
BlockedGzipOutputStream. We implement both directions so the framework
can read reference-produced GAMs and emit GAMs the reference toolchain
(and ours) can read back. Reference consumer: `src/readGAM.h:37-51`.
"""
from __future__ import annotations

import gzip
import io
import struct
import zlib

# BGZF constants
_HDR = b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff\x06\x00\x42\x43\x02\x00"
_EOF_BLOCK = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)
MAX_BLOCK = 0xFF00  # uncompressed payload per block (htslib convention)


def is_bgzf(head: bytes) -> bool:
    return head[:4] == b"\x1f\x8b\x08\x04"


def decompress(data: bytes) -> bytes:
    """Decompress a full BGZF (or plain multi-member gzip) stream."""
    return gzip.decompress(data)


def read_file(path: str) -> bytes:
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    return data


def compress(payload: bytes) -> bytes:
    """Compress bytes into a BGZF stream (with EOF block)."""
    out = io.BytesIO()
    for off in range(0, len(payload), MAX_BLOCK):
        chunk = payload[off : off + MAX_BLOCK]
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        cdata = co.compress(chunk) + co.flush()
        bsize = len(cdata) + len(_HDR) + 2 + 8  # header + BSIZE field + crc/isize
        block = (
            _HDR
            + struct.pack("<H", bsize - 1)
            + cdata
            + struct.pack("<II", zlib.crc32(chunk) & 0xFFFFFFFF, len(chunk))
        )
        out.write(block)
    out.write(_EOF_BLOCK)
    return out.getvalue()


def write_file(path: str, payload: bytes) -> None:
    with open(path, "wb") as f:
        f.write(compress(payload))
