"""A/B the encode model pass: XLA lockstep (rans_wide.model_pairs_wide)
vs the Pallas known-symbol kernel (rans_pallas.model_pairs_wide_pallas)
at the 8 MB bench shapes (16384 chains x 512 symbols).

Usage: python tools/pairs_bench.py [--cpu]
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

    from jampack_tpu.kernels.rans_pallas import model_pairs_wide_pallas
    from jampack_tpu.kernels.rans_wide import model_pairs_wide

    L, mr = (256, 64) if cpu else (16384, 512)
    rng = np.random.default_rng(5)
    chains = np.where(rng.random((L, mr)) < 0.55,
                      rng.integers(0, 3, (L, mr)),
                      rng.integers(0, 250, (L, mr))).astype(np.uint16)
    rlens = np.full(L, mr, np.int32)
    rlens[:: 7] = mr // 2  # ragged lanes

    jc, jr = jnp.asarray(chains), jnp.asarray(rlens)
    import functools
    fns = {
        "xla": jax.jit(functools.partial(model_pairs_wide, max_rlen=mr)),
        "pallas": jax.jit(functools.partial(
            model_pairs_wide_pallas, max_rlen=mr, interpret=cpu)),
    }
    ref = None
    for name, fn in fns.items():
        lo, fq, ok = fn(jc, jr)
        lo_n, fq_n, ok_n = (np.asarray(lo), np.asarray(fq), np.asarray(ok))
        if ref is None:
            ref = (lo_n, fq_n, ok_n)
        else:
            assert np.array_equal(ref[2], ok_n)
            for l in range(L):
                k = 2 * int(rlens[l])
                assert np.array_equal(ref[0][l, :k], lo_n[l, :k]), (name, l)
                assert np.array_equal(ref[1][l, :k], fq_n[l, :k]), (name, l)
        if cpu:
            print(f"{name}: parity ok")
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            lo, fq, ok = fn(jc, jr)
            np.asarray(lo.ravel()[0])
            best = min(best, time.time() - t0)
        msym = L * mr / 1e6
        print(f"{name:7s} {best*1e3:8.1f} ms  ({msym/best:.1f} Msym/s)")


if __name__ == "__main__":
    main()
