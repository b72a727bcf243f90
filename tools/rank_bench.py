"""A/B the SRC rank decode: XLA lockstep (rank_decode_core) vs the Pallas
step kernel (rank_pallas.rank_decode_pallas) at the 8 MB bench shapes
(2048 chunk lanes x 8192 output bytes).

Usage: python tools/rank_bench.py [--cpu]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    cpu = "--cpu" in sys.argv
    if cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from jampack_tpu.kernels.device_stages import rank_decode_core
    from jampack_tpu.kernels.rank_pallas import rank_decode_pallas
    from jampack_tpu.stages.rank import rank_encode

    L, ocap = (64, 512) if cpu else (2048, 8192)
    rng = np.random.default_rng(9)
    ranks = np.zeros((L, ocap), np.uint8)
    freqs = np.zeros((L, 256), np.int32)
    olens = np.full(L, ocap, np.int32)
    base_raw = np.repeat(rng.integers(0, 60, ocap),
                         rng.integers(1, 5, ocap))[:ocap].astype(np.uint8)
    for l in range(L):
        raw = np.roll(base_raw, l)  # distinct per-lane streams, same mass
        r, f = rank_encode(raw)
        ranks[l] = np.asarray(r, np.uint8)
        freqs[l] = np.asarray(f, np.int32)

    jr, jf, jo = jnp.asarray(ranks), jnp.asarray(freqs), jnp.asarray(olens)
    fns = {
        "xla": jax.jit(lambda r, f, o: rank_decode_core(r, f, o, ocap)),
        "pallas": jax.jit(lambda r, f, o: rank_decode_pallas(
            r, f, o, ocap, interpret=cpu)),
    }
    ref = None
    for name, fn in fns.items():
        out, ok = fn(jr, jf, jo)
        o_n, k_n = np.asarray(out), np.asarray(ok)
        assert k_n.all(), name
        if ref is None:
            ref = o_n
        else:
            assert np.array_equal(ref, o_n), name
        if cpu:
            print(f"{name}: parity ok")
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out, ok = fn(jr, jf, jo)
            np.asarray(out.ravel()[0])
            best = min(best, time.time() - t0)
        print(f"{name:7s} {best*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
