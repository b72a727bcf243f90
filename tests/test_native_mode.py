"""Native JTX stream mode: tunable anchor counts and ANS chunk sizes."""

import io

import numpy as np
import pytest

from jampack_tpu.runtime.engines import NativeEngine, TpuEngine
from jampack_tpu.runtime.pipeline import (
    Engine,
    Options,
    compress_stream,
    decompress_stream,
)

RNG = np.random.default_rng(99)
DATA = (
    b"native mode stream with more anchors " * 2000
    + bytes(RNG.integers(0, 256, 40000, dtype=np.uint8))
)


@pytest.mark.parametrize("units", [120, 480, 1920])
@pytest.mark.parametrize("chunk_kb", [64, 256, 1024])
def test_native_mode_roundtrip(units, chunk_kb):
    opt = Options(filters=0, anchor_units=units, ans_chunk=chunk_kb << 10)
    arc = io.BytesIO()
    compress_stream(io.BytesIO(DATA), arc, opt, engine=NativeEngine())
    back = io.BytesIO()
    decompress_stream(io.BytesIO(arc.getvalue()), back, engine=NativeEngine())
    assert back.getvalue() == DATA


def test_native_mode_cross_engine():
    opt = Options(filters=0, anchor_units=960, ans_chunk=128 << 10)
    arc = io.BytesIO()
    compress_stream(io.BytesIO(DATA), arc, opt, engine=NativeEngine())
    for engine in (Engine(), NativeEngine(), TpuEngine()):
        back = io.BytesIO()
        decompress_stream(io.BytesIO(arc.getvalue()), back, engine=engine)
        assert back.getvalue() == DATA


def test_small_chunks_stay_ref_compatible(oracle, tmp_path):
    """Sub-1MB ANS chunks are legal in the reference format: the reference
    binary must decode archives using them (anchors stay at 120)."""
    opt = Options(filters=0, ans_chunk=128 << 10)
    jam = tmp_path / "chunked.jam"
    back = tmp_path / "back.bin"
    with open(jam, "wb") as f:
        compress_stream(io.BytesIO(DATA), f, opt, engine=NativeEngine())
    oracle.decompress(jam, back)
    assert back.read_bytes() == DATA


def test_jtx_magic_only_for_native_units():
    arc = io.BytesIO()
    compress_stream(io.BytesIO(DATA), arc,
                    Options(filters=0, anchor_units=480), engine=NativeEngine())
    assert arc.getvalue()[:3] == b"JTX"
    arc2 = io.BytesIO()
    compress_stream(io.BytesIO(DATA), arc2, Options(filters=0),
                    engine=NativeEngine())
    assert arc2.getvalue()[:3] == b"JAM"
