"""Block-level archive framing.

Every compressed block is self-contained:

    magic "JAM" | crc:u32le | csize:u32le | blocksize:u32le | payload[csize]

`blocksize` is the *configured* block size (the maximum raw size), not the
raw size of this particular block; the raw size is recovered by decoding.
This framing is what makes the format embarrassingly parallel and
block-granular restartable.

Reference behavior: jampack.cpp:122-164 (CompWriteBlock/DecompReadBlock).
"""

import struct
from dataclasses import dataclass

from .constants import BWT_UNITS, MAGIC, MIN_BLOCKSIZE, MAX_BLOCKSIZE

# Native-mode container: same framing plus two stream-parameter words (the
# BWT anchor count and the rANS lane-interleave width).  Only this framework
# reads it; the default "JAM" framing stays byte-compatible with the
# reference.
MAGIC_NATIVE = b"JTX"

_HEADER = struct.Struct("<3sIii")
_NATIVE_EXT = struct.Struct("<ii")
HEADER_SIZE = _HEADER.size  # 15


@dataclass
class BlockHeader:
    crc: int
    csize: int
    blocksize: int
    units: int = BWT_UNITS
    lanes: int = 0


def write_block(out, crc: int, payload: bytes, blocksize: int,
                units: int = BWT_UNITS, lanes: int = 0) -> None:
    native = units != BWT_UNITS or lanes >= 2
    magic = MAGIC_NATIVE if native else MAGIC
    out.write(_HEADER.pack(magic, crc & 0xFFFFFFFF, len(payload), blocksize))
    if native:
        out.write(_NATIVE_EXT.pack(units, lanes))
    out.write(payload)


def read_block(inp):
    """Read one framed block; returns (BlockHeader, payload) or None at EOF."""
    raw = inp.read(HEADER_SIZE)
    if len(raw) == 0:
        return None
    if len(raw) < HEADER_SIZE:
        raise ValueError("truncated block header")
    magic, crc, csize, blocksize = _HEADER.unpack(raw)
    if (
        magic not in (MAGIC, MAGIC_NATIVE)
        or blocksize < MIN_BLOCKSIZE
        or blocksize > MAX_BLOCKSIZE
        or csize < 0
        or csize > MAX_BLOCKSIZE
    ):
        raise ValueError("refusing to read from corrupt header")
    units, lanes = BWT_UNITS, 0
    if magic == MAGIC_NATIVE:
        ext = inp.read(_NATIVE_EXT.size)
        if len(ext) < _NATIVE_EXT.size:
            raise ValueError("truncated native header")
        units, lanes = _NATIVE_EXT.unpack(ext)
        if units < 1 or units > (1 << 24):
            raise ValueError("corrupt native anchor count")
        if lanes < 0 or lanes > (1 << 16):
            raise ValueError("corrupt native lane count")
    payload = inp.read(csize)
    if len(payload) < csize:
        raise ValueError("truncated block payload")
    return BlockHeader(crc, csize, blocksize, units, lanes), payload
