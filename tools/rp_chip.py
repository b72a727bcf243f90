"""On-chip validation + timing of the Pallas wide-rANS step kernel.

Compares decode_lanes_wide_pallas (compiled Mosaic, interpret=False)
against decode_lanes_wide (the XLA reference kernel) on the real TPU:
bit parity first, then best-of-trials Msym/s for both.  Run ONLY when
nothing else holds the tunneled device.

Usage: python tools/rp_chip.py [total_lanes] [mb]
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

    from jampack_tpu.kernels.rans_pallas import decode_lanes_wide_pallas
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

    print(f"backend={jax.default_backend()}", flush=True)
    ne = NativeEngine()
    data = textlike(n)
    bwt = ne.bwt_forward(data)[:n]
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
    bufp = np.zeros(blob.size + 64, np.uint8)
    bufp[:blob.size] = blob
    buf = jnp.asarray(bufp)
    print(f"chains={L} rmax={rmax} total_syms={total_syms}", flush=True)

    # ---- parity (compiled Mosaic)
    a, aok = decode_lanes_wide(buf, starts, rlens_a, rmax_p)
    b, bok = decode_lanes_wide_pallas(buf, starts, rlens_a, rmax_p)
    a_np, b_np = np.asarray(a), np.asarray(b)
    ok_match = np.array_equal(np.asarray(aok), np.asarray(bok))
    print(f"ok parity: {ok_match}; all ok: {bool(np.asarray(aok).all())}",
          flush=True)
    if not np.array_equal(a_np, b_np):
        bad = np.argwhere(a_np != b_np)
        print(f"MISMATCH at {bad[:5].tolist()}  "
              f"xla={a_np[tuple(bad[0])]} pallas={b_np[tuple(bad[0])]}")
        raise SystemExit(1)
    print("bit parity: PASS", flush=True)

    # ---- timing, best of 3 each
    def bench(fn, tag):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            syms, ok = fn(buf, starts, rlens_a, rmax_p)
            _ = np.asarray(syms.ravel()[0])
            best = min(best, time.time() - t0)
        print(f"{tag}: wall={best:.3f}s -> "
              f"{total_syms / best / 1e6:.2f} Msym/s", flush=True)
        return best

    t_x = bench(decode_lanes_wide, "xla  ")
    t_p = bench(decode_lanes_wide_pallas, "pallas")
    print(f"speedup: {t_x / t_p:.2f}x", flush=True)


if __name__ == "__main__":
    main()
