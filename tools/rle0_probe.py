"""A/B the RLE0 decode kernel's two random-access ops on the bench shapes.

Variants (each vmapped over the fused chain's (CMAX=2048, S=8192) layout):
  base    — current rle0_decode_core
  scan    — prefix[endi] gather replaced by a flipped cummin scan (prefix
            is a nondecreasing cumsum, so min over run-ends at-or-after ==
            the NEAREST end's prefix)
  probe   — scan + the output scatter replaced by [pack|sort|aligned-select]

Usage: python tools/rle0_probe.py           (chip)
       python tools/rle0_probe.py --cpu     (correctness only)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from jampack_tpu.kernels.device_stages import rle0_decode_core
    from jampack_tpu.stages.rle0 import rle0_encode

    CMAX, S, OCAP = (64, 1024, 1024) if "--cpu" in sys.argv \
        else (2048, 8192, 8192)

    rng = np.random.default_rng(3)
    syms = np.zeros((CMAX, S), np.uint16)
    rlens = np.zeros(CMAX, np.int32)
    olens = np.zeros(CMAX, np.int32)
    for c in range(CMAX):
        # rank-like input: zero-heavy with nonzero bursts
        raw = np.where(rng.random(OCAP) < 0.7, 0,
                       rng.integers(1, 255, OCAP)).astype(np.uint8)
        enc = np.asarray(rle0_encode(raw), np.uint16)
        k = min(enc.size, S)
        syms[c, :k] = enc[:k]
        rlens[c] = k
        olens[c] = raw.size if enc.size <= S else 0

    def rle0_scan(s, rlen, olen, out_cap):
        Sd = s.shape[0]
        idx = jnp.arange(Sd, dtype=jnp.int32)
        valid = idx < rlen
        v = s.astype(jnp.int32)
        is_bit = valid & (v <= 1)
        prev_bit = jnp.concatenate([jnp.zeros(1, bool), is_bit[:-1]])
        next_bit = jnp.concatenate([is_bit[1:], jnp.zeros(1, bool)])
        run_start = is_bit & ~prev_bit
        run_end = is_bit & ~next_bit
        endi = jnp.flip(jax.lax.cummin(
            jnp.flip(jnp.where(run_end, idx, jnp.int32(Sd)))))
        shift = jnp.clip(endi - idx, 0, 31)
        contrib = jnp.where(is_bit, v << shift, 0)
        prefix = jnp.cumsum(contrib)
        # NEAREST run-end's prefix via reverse cummin (prefix nondecreasing)
        pend = jnp.flip(jax.lax.cummin(
            jnp.flip(jnp.where(run_end, prefix, jnp.int32(2**31 - 1)))))
        run_len = endi - idx + 1
        run_bits = pend - (prefix - contrib)
        overflow = jnp.any(run_start & (run_len > 30))
        run_val = (jnp.int32(1) << jnp.clip(run_len, 0, 30)) | run_bits
        zeros_out = jnp.maximum(run_val - 1, 0)
        out_len_here = jnp.where(
            valid & (v > 1), 1, jnp.where(run_start, zeros_out, 0))
        pos = jnp.cumsum(out_len_here) - out_len_here
        total = jnp.sum(out_len_here)
        out = jnp.zeros(out_cap, jnp.uint8)
        nz = valid & (v > 1)
        out = out.at[jnp.where(nz, pos, out_cap)].set(
            jnp.where(nz, (v - 1).astype(jnp.uint8), 0), mode="drop")
        ok = (total == olen) & ~overflow
        return out, ok

    fns = {
        "base": lambda s, rl, ol: rle0_decode_core(s, rl, ol, OCAP),
        "scan": lambda s, rl, ol: rle0_scan(s, rl, ol, OCAP),
    }
    js = jnp.asarray(syms)
    jr = jnp.asarray(rlens)
    jo = jnp.asarray(olens)
    ref = None
    for name, fn in fns.items():
        f = jax.jit(jax.vmap(fn))
        out, ok = f(js, jr, jo)
        got = np.asarray(out)
        assert bool(np.asarray(ok).all()), name
        if ref is None:
            ref = got
        else:
            assert np.array_equal(ref, got), f"{name} mismatch"
        if "--cpu" in sys.argv:
            print(f"{name}: ok")
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out, ok = f(js, jr, jo)
            np.asarray(out.ravel()[0])
            best = min(best, time.time() - t0)
        print(f"{name:6s} {best*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
