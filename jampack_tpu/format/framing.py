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

from .constants import MAGIC, MIN_BLOCKSIZE, MAX_BLOCKSIZE

_HEADER = struct.Struct("<3sIii")
HEADER_SIZE = _HEADER.size  # 15


@dataclass
class BlockHeader:
    crc: int
    csize: int
    blocksize: int


def write_block(out, crc: int, payload: bytes, blocksize: int) -> None:
    out.write(_HEADER.pack(MAGIC, crc & 0xFFFFFFFF, len(payload), blocksize))
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
        magic != MAGIC
        or blocksize < MIN_BLOCKSIZE
        or blocksize > MAX_BLOCKSIZE
        or csize < 0
        or csize > MAX_BLOCKSIZE
    ):
        raise ValueError("refusing to read from corrupt header")
    payload = inp.read(csize)
    if len(payload) < csize:
        raise ValueError("truncated block payload")
    return BlockHeader(crc, csize, blocksize), payload
