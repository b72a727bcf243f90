"""Golden-stream regression tests.

tests/fixtures/ holds archives produced by the compiled reference binary
(-f0/-f1/-f2/-m1/-m2 on a deterministic mixed-content input).  Every engine
must decode them bit-exactly forever — this pins the decode contract even
without the oracle binary present.  Additionally our default-settings
encoder must reproduce the reference's -f1 archive byte-for-byte.
"""

import io
import os

import numpy as np
import pytest

from jampack_tpu.runtime.engines import NativeEngine, TpuEngine
from jampack_tpu.runtime.pipeline import (
    Engine,
    Options,
    compress_stream,
    decompress_stream,
)

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _read(name):
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


GOLDEN_INPUT = _read("golden_input.bin")


@pytest.mark.parametrize("arc", ["golden_f0.jam", "golden_f1.jam",
                                 "golden_f2.jam", "golden_m1.jam",
                                 "golden_m2.jam"])
@pytest.mark.parametrize("engine_cls", [Engine, NativeEngine, TpuEngine],
                         ids=["numpy", "native", "tpu"])
def test_every_engine_decodes_golden(arc, engine_cls):
    out = io.BytesIO()
    decompress_stream(io.BytesIO(_read(arc)), out, engine=engine_cls())
    assert out.getvalue() == GOLDEN_INPUT


@pytest.mark.parametrize("engine_cls", [Engine, NativeEngine],
                         ids=["numpy", "native"])
def test_default_encode_matches_reference_bytes(engine_cls):
    """Default -f1 encode reproduces the reference archive byte-for-byte."""
    arc = io.BytesIO()
    compress_stream(io.BytesIO(GOLDEN_INPUT), arc, Options(filters=1),
                    engine=engine_cls())
    assert arc.getvalue() == _read("golden_f1.jam")


@pytest.mark.parametrize("engine_cls", [Engine, NativeEngine, TpuEngine],
                         ids=["numpy", "native", "tpu"])
def test_every_engine_decodes_golden_jtx(engine_cls):
    """JTX format lock: archive written at (u=960, L=16, c=256K) when the
    native container was finalized; every engine must decode it forever."""
    out = io.BytesIO()
    decompress_stream(io.BytesIO(_read("golden_jtx_u960_L16_c256.jtx")), out,
                      engine=engine_cls())
    assert out.getvalue() == GOLDEN_INPUT


def test_jtx_encoder_reproduces_golden_bytes():
    """JTX encode determinism: same options -> same bytes as the fixture."""
    arc = io.BytesIO()
    compress_stream(
        io.BytesIO(GOLDEN_INPUT), arc,
        Options(filters=1, anchor_units=960, ans_chunk=256 << 10,
                rans_lanes=16),
        engine=NativeEngine(),
    )
    assert arc.getvalue() == _read("golden_jtx_u960_L16_c256.jtx")


@pytest.mark.parametrize("mode", ["-m1", "-m2"])
def test_m1_m2_archives_match_reference_bytes(oracle, tmp_path, mode):
    """The anti-context match finders (m1 hash chain, m2 suffix array) must
    reproduce the reference's parsing decisions byte-for-byte — including
    the CHHM's never-updated PreviousValue quirk (cyclichhm.cpp:63)."""
    rng = np.random.default_rng(3)
    rec = np.zeros((5000, 24), np.uint8)
    rec[:, 0] = np.arange(5000) % 251
    rec[:, 1:9] = (np.arange(5000)[:, None] * np.arange(1, 9)[None, :]) % 256
    rec[:, 9:] = rng.integers(0, 12, (5000, 15))
    src = tmp_path / "struct.bin"
    src.write_bytes(rec.tobytes())

    ref_jam = tmp_path / "ref.jam"
    oracle.compress(src, ref_jam, mode, "-f1")

    arc = io.BytesIO()
    with open(src, "rb") as f:
        compress_stream(f, arc, Options(filters=1,
                                        match_finder=int(mode[2])),
                        engine=NativeEngine())
    assert arc.getvalue() == ref_jam.read_bytes()
