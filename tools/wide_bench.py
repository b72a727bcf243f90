"""Msym/s microbench of the wide rANS decoder (kernels/rans_wide.py).

Encodes a real post-BWT-style stream with the native engine into a JTX
wide-interleave layout (chunks x lanes chains), then times
decode_lanes_wide in lockstep over all chains and reports decoded
symbols per second.  Sync by fetching a scalar (block_until_ready is
unreliable on the tunneled platform); best-of-trials because the shared
chip's process contention varies +-50%.

Usage: python tools/wide_bench.py [total_lanes] [mb]
  total_lanes: chunk_count * lanes target (default 1024)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def textlike(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    alpha = np.frombuffer(b" etaoinshrdlucmfwypvbgkqjxz.,\n", dtype=np.uint8)
    return alpha[(x >> 16) % 30]


def main():
    import jax
    import jax.numpy as jnp

    from jampack_tpu.kernels.rans_wide import decode_lanes_wide
    from jampack_tpu.runtime.engines import NativeEngine
    from jampack_tpu.stages.ans import (
        lane_rlen, read_chunk_header, read_lane_table)

    total_lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = mb << 20
    lanes = 16
    nchunks = max(total_lanes // lanes, 1)
    chunk = max(n // nchunks, 1 << 10)

    # make the symbol stream BWT-shaped so model/exponent usage is realistic
    from jampack_tpu.runtime.engines import NativeEngine
    ne = NativeEngine()
    data = textlike(n)
    bwt = ne.bwt_forward(data)[: n]  # drop anchors; content only
    blob = np.frombuffer(ne.ans_encode(bwt, chunk, lanes), dtype=np.uint8)

    view = memoryview(blob.tobytes())
    pos = 0
    starts, rlens, total_syms = [], [], 0
    while pos < len(view):
        freqs, olen, clen, rlen, pos = read_chunk_header(view, pos)
        lane_clens, p = read_lane_table(view, pos, rlen, lanes)
        starts.extend(np.cumsum([p] + lane_clens[:-1]).tolist())
        rlens.extend(lane_rlen(rlen, lanes, l) for l in range(lanes))
        total_syms += rlen
        pos += clen

    L = len(starts)
    rmax = int(np.max(rlens))
    rmax_p = 1 << (rmax - 1).bit_length()
    starts = jnp.asarray(np.asarray(starts, np.int32))
    rlens_a = jnp.asarray(np.asarray(rlens, np.int32))
    buf = jnp.asarray(blob)
    print(f"chains={L} rmax={rmax} total_syms={total_syms}")

    syms, ok = decode_lanes_wide(buf, starts, rlens_a, rmax_p)
    assert bool(jnp.all(ok)), "final-state invariant failed"
    _ = np.asarray(syms[0, 0])

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        syms, ok = decode_lanes_wide(buf, starts, rlens_a, rmax_p)
        # device-side scalar slice: np.asarray(syms) would pull the whole
        # (L, rmax) array through the ~20 MB/s tunnel inside the timing
        _ = np.asarray(syms.ravel()[0])
        best = min(best, time.time() - t0)
    print(f"L={L} wall={best:.3f}s -> {total_syms/best/1e6:.2f} Msym/s "
          f"({total_syms/L} sym/lane avg)")


if __name__ == "__main__":
    main()
