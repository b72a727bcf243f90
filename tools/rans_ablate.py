"""Ablate the in-chain wide-rANS decode cost (round 4).

The Pallas step kernel measures ~0.32 ms/step in the synthetic rp_chip
harness but ~0.72 ms/step inside the fused chain shapes.  Candidates for
the delta: the per-step payload window gather (16K random elements from a
~6 MB table) and the per-step grouped slab write (2048 non-contiguous
16-lane rows).  This tool times the full driver loop with each part
stubbed out:

  full      — decode_lanes_wide_pallas as shipped (groups slab layout)
  nogather  — window fetch replaced by a constant (wrong bytes, same cost
              shape otherwise)
  noslab    — symbols discarded (loop carries state only)
  nogroups  — groups=0 flat (L, mr) layout

Usage: python tools/rans_ablate.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from jampack_tpu.kernels import rans_pallas as rp
    from jampack_tpu.runtime.device_decode import block_meta, pack_meta, \
        plan_shapes
    from jampack_tpu.runtime.engines import NativeEngine
    from jampack_tpu.runtime.pipeline import Options, compress_block

    n = (8 << 20) - ((8 << 20) % 120)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    alpha = np.frombuffer(b" etaoinshrdlucmfwypvbgkqjxz.,\n", dtype=np.uint8)
    data = alpha[(x >> 16) % 30]
    lanes = 16
    opt = Options(blocksize=n, filters=0, match_finder=0, rans_lanes=lanes,
                  ans_chunk=8 << 10, anchor_units=960, lpx_spans=4096)
    crc, payload = compress_block(data, opt, NativeEngine())
    meta = block_meta(payload, lanes)
    shapes = plan_shapes([meta], [len(payload)], n, lanes)
    pay, starts, rlens, olens, crlens, freqs = (
        jax.device_put(jnp.asarray(a))
        for a in pack_meta(meta, payload, shapes))
    rmax, CMAX = shapes["rmax"], shapes["cmax"]

    def variant(name, gather=True, slab=True, groups=True):
        g = CMAX if groups else 0

        @partial(jax.jit, static_argnames=())
        def run(buf, starts_, rlens_):
            L = starts_.shape[0]
            Lp = max(128, -(-L // 128) * 128)
            LB = rp._pick_lb(Lp)
            pad = Lp - L
            buf32 = buf.astype(jnp.uint32)
            bp = jnp.pad(buf32, (0, 3))
            win = (bp[:-3] | (bp[1:-2] << 8) | (bp[2:-1] << 16)
                   | (bp[3:] << 24)).astype(jnp.int32)

            def read32(p):
                return (buf32[p] | (buf32[p + 1] << 8)
                        | (buf32[p + 2] << 16)
                        | (buf32[p + 3] << 24)).astype(jnp.int32)

            starts_p = jnp.pad(starts_, (0, pad))
            rlens_p = jnp.pad(rlens_, (0, pad), constant_values=-1)
            regs = jnp.zeros((8, Lp), jnp.int32)
            for k in range(4):
                regs = regs.at[k, :].set(read32(starts_p + 4 * k))
            regs = regs.at[4, :].set(starts_p + 16)
            bank = jnp.broadcast_to(
                jnp.asarray(rp._BANK_INIT.astype(np.int32))[:, None],
                (256, Lp))
            qf = jnp.zeros((256, Lp), jnp.int32)
            qse = jnp.zeros((16, Lp), jnp.int32).at[8:14, :].set(8)
            rl2 = rlens_p[None, :].astype(jnp.int32)
            rowc = jnp.asarray(rp._ROWC)
            segbt = jnp.asarray(rp._SEGBT, jnp.bfloat16)
            segqt = jnp.asarray(rp._SEGQT, jnp.bfloat16)
            cumt = jnp.asarray(rp._CUMT, jnp.bfloat16)
            mixb = jnp.asarray(rp._MIXB)
            step = rp._step_call(LB, Lp, False)
            if g:
                lanes_per = L // g
                syms = jnp.zeros((g, rmax, lanes_per), jnp.uint16)
            else:
                syms = jnp.zeros((L, rmax), jnp.uint16)

            def body(i, carry):
                bank, qf, qse, regs, syms = carry
                if gather:
                    w = win[jnp.clip(regs[4, :], 0, win.shape[0] - 1)]
                else:
                    w = jnp.broadcast_to(jnp.int32(0x01010101), (Lp,))
                wb = jnp.stack([(w >> (8 * k)) & 0xFF for k in range(4)],
                               axis=0)
                i2 = jnp.full((1, 1), i, jnp.int32)
                bank, qf, qse, regs, sym = step(
                    i2, bank, qf, qse, regs, wb, rl2, rowc, segbt, segqt,
                    cumt, mixb)
                if slab:
                    symv = sym[0, :L].astype(jnp.uint16)
                    if g:
                        syms2 = jax.lax.dynamic_update_slice(
                            syms, symv.reshape(g, 1, lanes_per), (0, i, 0))
                    else:
                        syms2 = syms.at[:, i].set(symv)
                else:
                    # keep syms live without writing (fold a scalar in)
                    syms2 = syms
                    regs = regs.at[7, 0].add(sym[0, 0])
                return bank, qf, qse, regs, syms2

            steps = jnp.minimum(jnp.maximum(jnp.max(rlens_), 0), rmax)
            bank, qf, qse, regs, syms = jax.lax.fori_loop(
                0, steps, body, (bank, qf, qse, regs, syms))
            return syms, regs

        r = run(pay, starts, rlens)
        np.asarray(r[1].ravel()[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            r = run(pay, starts, rlens)
            np.asarray(r[1].ravel()[0])
            best = min(best, time.time() - t0)
        print(f"{name:9s} {best*1e3:8.1f} ms", flush=True)

    variant("full")
    variant("nogather", gather=False)
    variant("noslab", slab=False)
    variant("nogroups", groups=False)


if __name__ == "__main__":
    main()
