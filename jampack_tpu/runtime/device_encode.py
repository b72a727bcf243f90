"""Host wrapper for the fused device-resident block encode.

The encode mirror of runtime/device_decode.py: all O(n) data work runs
inside one jitted device program per block (kernels/encode_stages.
encode_block_core — the device counterpart of the reference's per-block
Comp() chain, jampack.cpp:30-42); the host computes the checksum and
splices format *metadata* (chunk headers, lane tables) around the
device-produced payload byte ranges.

Supported configuration: match_finder=3 (LZ store) + filters=0 — the
modes whose stage lengths are static functions of the block size, so the
whole chain compiles with static shapes.  Archives are byte-identical to
every host engine's at the same Options (tests/test_device_pipeline.py).
"""

import numpy as np

from ..format import checksum as _checksum
from ..format.constants import ANS_CHUNK_SIZE
from ..format.varint import encode_leb128
from ..stages.ans import write_chunk_header
from .pipeline import LZ_MODE_STORE, Options


def filter_configs(data: np.ndarray, filters: int):
    """Per-64KB-chunk (type, width) picks for the fused chain's filter
    stage, computed over the store-framed stage-1 buffer [token | data]
    (the filters' actual input, jampack.cpp:36-37).  The picks come from
    the device search with host f64 near-tie re-scoring, so they match
    the host engines' exactly.  None for -f0 (passthrough headers)."""
    if filters == 0:
        return None
    from ..format.constants import LZ_MIN_MATCH
    from ..kernels.filters_search import pick_f1_configs, pick_f2_configs
    from ..stages.lz77 import write_token

    s1 = np.concatenate([
        np.frombuffer(write_token(LZ_MIN_MATCH, LZ_MIN_MATCH, 0), np.uint8),
        np.asarray(data, dtype=np.uint8)])
    picks = (pick_f1_configs if filters == 1 else pick_f2_configs)(s1)
    return np.asarray(picks, dtype=np.int32).reshape(-1, 2)


def encode_block_device(data: np.ndarray, opt: Options):
    """Encode one block entirely on device; returns (crc, payload bytes).

    Raises NotImplementedError for configurations whose encoders are
    host-only (real LZ match finding, filter search) — callers fall back
    to the host engines there."""
    import jax
    import jax.numpy as jnp

    from ..kernels.encode_stages import encode_block_core

    if opt.match_finder != LZ_MODE_STORE or opt.filters not in (0, 1, 2):
        raise NotImplementedError(
            "device encode supports match_finder=3 (store) + filters 0/1/2")
    data = np.ascontiguousarray(np.asarray(data, dtype=np.uint8))
    n = int(data.size)
    crc = _checksum.integrity_check(data)
    units = int(opt.anchor_units)
    # tiny blocks (no full BWT row per unit) take the host path
    if n < max(4 * units, 1024):
        raise NotImplementedError("block too small for the device chain")
    chunk = min(max(int(opt.ans_chunk), 1), ANS_CHUNK_SIZE)
    lanes = int(opt.rans_lanes)

    bufs, ptrs, oks, freqs, rlens = encode_block_core(
        jnp.asarray(data), filter_configs(data, opt.filters), n=n,
        units=units, chunk=chunk, lanes=lanes, lpx_spans=int(opt.lpx_spans))
    # compact the per-chain payload tails into one dense byte array ON
    # DEVICE: the (NL, cap) grid is ~5x the real payload and host transfer
    # is the tunneled platform's wall (one ~330 ms scatter buys ~1.4 s of
    # transfer on an 8 MB block)
    cap = int(bufs.shape[1])
    dense = _compact_chains(bufs, ptrs)
    ptrs = np.asarray(jax.device_get(ptrs))
    oks = np.asarray(jax.device_get(oks))
    freqs = np.asarray(jax.device_get(freqs))
    rlens = np.asarray(jax.device_get(rlens))
    if not bool(oks.all()):
        raise ValueError(
            "model failure (CDF): chunk not encodable in ref-compat mode")
    lens = cap - ptrs.astype(np.int64)
    total = int(lens.sum())
    dense = np.asarray(jax.device_get(dense[:total]))
    return crc, splice_dense(dense, lens, freqs, rlens, n, units, chunk,
                             lanes)


def _compact_chains_impl(bufs, ptrs):
    """Scatter every chain's payload tail bufs[i, ptrs[i]:] into a dense
    byte array at exclusive-cumsum offsets (device-side; one scatter)."""
    import jax.numpy as jnp

    NL, cap = bufs.shape
    lens = cap - ptrs
    offs = jnp.cumsum(lens) - lens
    col = jnp.arange(cap, dtype=ptrs.dtype)[None, :]
    valid = col >= ptrs[:, None]
    dst = jnp.where(valid, offs[:, None] + (col - ptrs[:, None]), NL * cap)
    return jnp.zeros(NL * cap + 1, jnp.uint8).at[dst.reshape(-1)].set(
        jnp.where(valid, bufs, 0).reshape(-1), mode="drop")[:-1]


_COMPACT_CACHE = {}


def _compact_chains(bufs, ptrs):
    import jax

    fn = _COMPACT_CACHE.get("fn")
    if fn is None:
        fn = _COMPACT_CACHE["fn"] = jax.jit(_compact_chains_impl)
    return fn(bufs, ptrs)


def stage4_len(n: int, units: int) -> int:
    """Entropy-stage input length for a block of n raw bytes in the
    store/filters-off configuration (the same static math as the core)."""
    from ..format.constants import FILTER_BLOCK_SIZE, LZ_MIN_MATCH
    from ..kernels.encode_stages import _ceil_div
    from ..stages.lz77 import write_token

    T = len(write_token(LZ_MIN_MATCH, LZ_MIN_MATCH, 0))
    n1 = n + T
    n2 = n1 + 2 * _ceil_div(n1, FILTER_BLOCK_SIZE)
    return n2 + T + 4 * units


def splice_payload(bufs, ptrs, freqs, rlens, n: int, units: int, chunk: int,
                   lanes: int) -> bytes:
    """Assemble one block's payload from the core's padded (NL, cap)
    outputs (host arrays) — concatenates the chain tails and delegates to
    splice_dense."""
    lens = bufs.shape[1] - np.asarray(ptrs, dtype=np.int64)
    dense = np.concatenate(
        [bufs[i, int(ptrs[i]):] for i in range(bufs.shape[0])])
    return splice_dense(dense, lens, freqs, rlens, n, units, chunk, lanes)


def splice_dense(dense, lens, freqs, rlens, n: int, units: int, chunk: int,
                 lanes: int) -> bytes:
    """Assemble one block's payload from densely packed chain payloads
    (chain i's bytes at [offs[i], offs[i]+lens[i]), offs = exclusive
    cumsum): per chunk, header + (lane table +) chain payloads — the same
    format path as stages/ans.py ans_encode / jn_ans.cpp."""
    from ..kernels.encode_stages import _ceil_div

    eff = max(lanes, 1)
    C = rlens.size
    n4 = stage4_len(n, units)
    assert C == _ceil_div(n4, chunk)
    offs = np.concatenate([[0], np.cumsum(lens)])
    out = bytearray()
    for c in range(C):
        olen = min(chunk, n4 - chunk * c)
        i0 = c * eff
        if lanes >= 2:
            table = b"".join(encode_leb128(int(lens[i0 + l]))
                             for l in range(eff))
            body = table + dense[offs[i0]:offs[i0 + eff]].tobytes()
        else:
            body = dense[offs[i0]:offs[i0 + 1]].tobytes()
        out += write_chunk_header(freqs[c], olen, len(body), int(rlens[c]))
        out += body
    return bytes(out)
