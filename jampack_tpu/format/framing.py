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

# Native-mode container (JTX v2): same framing plus two stream-parameter
# words (the BWT anchor count and the rANS lane-interleave width).  Only
# this framework reads it; the default "JAM" framing stays byte-compatible
# with the reference.  History: v1 carried a single '<i' ext word (units
# only); the one-time pre-format-lock growth to '<ii' happened before the
# .jtx golden fixture locked the bytes.  Any future ext-layout change MUST
# bump this magic — the ext words carry no version field of their own.
MAGIC_NATIVE = b"JTX"
MAX_RANS_LANES = 4096  # mirrored by runtime.pipeline.validate_rans_lanes

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


def is_native(units: int, lanes: int = 0) -> bool:
    """True when the stream parameters require the JTX container."""
    return units != BWT_UNITS or lanes >= 2


def header_size(units: int, lanes: int = 0) -> int:
    """On-disk header bytes for a block with these stream parameters."""
    return HEADER_SIZE + (_NATIVE_EXT.size if is_native(units, lanes) else 0)


def write_block(out, crc: int, payload: bytes, blocksize: int,
                units: int = BWT_UNITS, lanes: int = 0) -> None:
    native = is_native(units, lanes)
    magic = MAGIC_NATIVE if native else MAGIC
    out.write(_HEADER.pack(magic, crc & 0xFFFFFFFF, len(payload), blocksize))
    if native:
        out.write(_NATIVE_EXT.pack(units, lanes))
    out.write(payload)


def read_block(inp, want_payload: bool = True):
    """Read one framed block; returns (BlockHeader, payload) or None at EOF.

    want_payload=False skips the payload (seek on seekable streams) and
    returns payload=None — cheap block enumeration for multi-host work
    division and `jam i`."""
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
        if lanes < 0 or lanes == 1 or lanes > MAX_RANS_LANES:
            raise ValueError("corrupt native lane count")
    if not want_payload:
        # forward skip: seek when possible, bounded read otherwise
        if inp.seekable():
            pos = inp.tell()
            inp.seek(0, 2)
            end = inp.tell()
            if end - pos < csize:
                raise ValueError("truncated block payload")
            inp.seek(pos + csize)
        else:
            skipped = len(inp.read(csize))
            if skipped < csize:
                raise ValueError("truncated block payload")
        return BlockHeader(crc, csize, blocksize, units, lanes), None
    payload = inp.read(csize)
    if len(payload) < csize:
        raise ValueError("truncated block payload")
    return BlockHeader(crc, csize, blocksize, units, lanes), payload
