"""The JT3 span-count dial, quantified (VERDICT r3 #5a).

Measures (a) the on-chip Lpx span-walk wall of lpx_dyn_core at S = 4096 /
8192 / 16384 on the 8 MB bench buffer — the serial walk is n/S lockstep
steps, so S divides the OVERHEAD term while the 13n/86M gather floor is
span-independent — and (b) the ratio cost of shorter spans on the
Lpx-favourable logs corpus (each span's model warms up from scratch, so
more spans = less gain; host-side encode, exact payload bytes).

Usage: python tools/lpx_span_sweep.py [--ratio-only]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def logs(n):
    out = bytearray()
    i = 0
    while len(out) < n:
        out += (b"ts=2026-08-20T09:%02d:%02d level=INFO module=core"
                b" id=%06d\n" % (i // 60 % 60, i % 60, i * 37 % 999983))
        i += 1
    return np.frombuffer(bytes(out[:n]), np.uint8)


def textlike(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    alpha = np.frombuffer(b" etaoinshrdlucmfwypvbgkqjxz.,\n", dtype=np.uint8)
    return alpha[(x >> 16) % 30]


def ratio_table():
    from jampack_tpu.runtime.engines import NativeEngine
    from jampack_tpu.runtime.pipeline import Options, compress_block_ex

    n = 2 << 20
    data = logs(n)
    eng = NativeEngine()
    print(f"{'spans':>6s} {'payload(B)':>10s} {'vs S=4':>8s}")
    base = None
    for s in (4, 64, 1024, 4096, 8192, 16384):
        _, p, _ = compress_block_ex(
            data, Options(blocksize=n, lpx_spans=s), eng)
        if base is None:
            base = len(p)
        print(f"{s:6d} {len(p):10d} {len(p)/base:8.4f}")


def walk_sweep():
    import jax
    import jax.numpy as jnp

    from jampack_tpu.kernels.device_stages import lpx_dyn_core

    n = (8 << 20)
    out_cap = int(n * 1.05) + 1024
    mb = 1 << 20
    out_cap = ((out_cap + mb - 1) // mb) * mb
    data = textlike(n)
    buf = np.zeros(out_cap, np.uint8)
    buf[:n] = data
    jb = jax.device_put(jnp.asarray(buf))
    for S in (4096, 8192, 16384):
        from functools import partial

        f = jax.jit(partial(lpx_dyn_core, out_cap=out_cap, decode=True,
                            spans=S))
        out, sup = f(jb, jnp.int32(n))
        assert bool(np.asarray(sup))
        np.asarray(out.ravel()[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out, sup = f(jb, jnp.int32(n))
            np.asarray(out.ravel()[0])
            best = min(best, time.time() - t0)
        print(f"S={S:6d}  walk {best*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    ratio_table()
    if "--ratio-only" not in sys.argv:
        walk_sweep()
