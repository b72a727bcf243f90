"""On-chip scaling sweep of the wide rANS decode loop (VERDICT r2 item 3).

Separates per-step FIXED overhead (kernel-count / loop bookkeeping) from
per-step DATA cost by timing decode_lanes_wide at several (lanes, steps)
points on a real 8 MB-block JT3 payload re-dealt at different lane
interleaves.  If time/step is ~flat in L, the loop is fixed-overhead
bound and raising the stream's lane count (fewer, fatter steps) is the
lever; if it scales with L, the body is data-bound and needs fusion
surgery.  Also times the -f2 device config search and the Lpx span walk
at two span counts for the same decision.

Usage: python -u tools/wide_sweep.py [mb]
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


def sync(x):
    return np.asarray(x.ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    from jampack_tpu.runtime.engines import NativeEngine
    from jampack_tpu.runtime.pipeline import Options, compress_block
    from jampack_tpu.runtime.device_decode import (
        block_meta, pack_meta, plan_shapes)
    from jampack_tpu.kernels.rans_wide import decode_lanes_wide

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = (mb << 20) - ((mb << 20) % 120)
    data = textlike(n)
    ne = NativeEngine()

    print("=== wide rANS loop: lanes sweep (chunk=8K) ===", flush=True)
    for lanes in (16, 32, 64):
        opt = Options(blocksize=n, filters=0, match_finder=0,
                      rans_lanes=lanes, ans_chunk=8 << 10, anchor_units=960,
                      lpx_spans=4096)
        crc, payload = compress_block(data, opt, ne)
        meta = block_meta(payload, lanes)
        shapes = plan_shapes([meta], [len(payload)], n, lanes)
        packed = pack_meta(meta, payload, shapes)
        pay, starts, rlens = (jax.device_put(jnp.asarray(a))
                              for a in packed[:3])
        max_rlen = shapes["rmax"]
        steps = int(packed[2].max())
        L = int(packed[1].shape[0])
        fn = jax.jit(lambda p, s, r: decode_lanes_wide(
            p, s, r, max_rlen, groups=0))
        syms, ok = fn(pay, starts, rlens)
        sync(syms)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            syms, ok = fn(pay, starts, rlens)
            sync(syms)
            best = min(best, time.time() - t0)
        print(f"lanes={lanes:3d} L={L} steps~{steps} payload={len(payload)}"
              f" wall={best:.3f}s  per-step={best/max(steps,1)*1e3:.3f} ms",
              flush=True)

    print("=== Lpx span walk: span sweep ===", flush=True)
    from jampack_tpu.kernels.device_stages import lpx_dyn_core
    from functools import partial

    cap = 1 << max((n - 1).bit_length(), 16)
    buf = np.zeros(cap, np.uint8)
    buf[:n] = data
    bufd = jax.device_put(jnp.asarray(buf))
    for spans in (4096, 8192):
        fn = jax.jit(partial(lpx_dyn_core, out_cap=cap, decode=True,
                             spans=spans))
        out, sup = fn(bufd, n)
        sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out, sup = fn(bufd, n)
            sync(out)
            best = min(best, time.time() - t0)
        steps = -(-n // spans)
        print(f"spans={spans:5d} steps~{steps} wall={best:.3f}s "
              f"per-step={best/steps*1e3:.3f} ms", flush=True)

    print("=== -f2 device config search ===", flush=True)
    from jampack_tpu.kernels.filters_search import score_all_configs

    t0 = time.time()
    s = score_all_configs(data)
    print(f"f2 sweep first (incl compile): {time.time()-t0:.2f}s", flush=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        s = score_all_configs(data)
        best = min(best, time.time() - t0)
    print(f"f2 sweep steady: {best:.2f}s (host single-core baseline 4.8s)",
          flush=True)


if __name__ == "__main__":
    main()
