"""Microbench: per-step cost of Lpx table access strategies on chip.

Strategies for `row = tbl[lane, t, lp]` + `tbl[lane, t, lp] = new` under a
(L, 3, 256, 5) int32 table, L lanes in lockstep:

  scatter : batched gather + batched scatter (current _update_table form)
  dense   : one-hot masked select / masked update (streams whole table)
  matmul  : one-hot einsum gather + masked update

Usage: python tools/lpx_probe.py [L] [steps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jampack_tpu  # noqa: F401  (sets cache env)
import jax
import jax.numpy as jnp


def sync(x):
    # slice the scalar ON DEVICE before fetching: np.asarray(x) would pull
    # the whole array through the ~20 MB/s tunnel inside the timed region
    return np.asarray(x.ravel()[0])


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    key = jax.random.PRNGKey(0)
    tbl0 = jax.random.randint(key, (L, 3, 256, 5), 0, 1000, jnp.int32)
    lanes = jnp.arange(L)

    def mk_idx(i, seed_row):
        # pseudo-random per-lane (t, lp) evolving with i
        h = (seed_row * 2654435 + i * 40503) & 0x7FFFFFFF
        return (h % 3, (h >> 8) & 0xFF)

    def step_scatter(i, tbl):
        t, lp = mk_idx(i, lanes)
        row = tbl[lanes, t, lp]              # (L, 5) gather
        new = row + 1
        return tbl.at[lanes, t, lp].set(new)

    def step_dense(i, tbl):
        t, lp = mk_idx(i, lanes)
        m_t = (jnp.arange(3)[None, :] == t[:, None])          # (L,3)
        m_lp = (jnp.arange(256)[None, :] == lp[:, None])      # (L,256)
        mask = (m_t[:, :, None] & m_lp[:, None, :])           # (L,3,256)
        row = jnp.sum(jnp.where(mask[..., None], tbl, 0), axis=(1, 2))  # (L,5)
        new = row + 1
        return jnp.where(mask[..., None], new[:, None, None, :], tbl)

    def step_matmul(i, tbl):
        t, lp = mk_idx(i, lanes)
        oh_lp = (jnp.arange(256)[None, :] == lp[:, None]).astype(jnp.float32)
        # select order slice densely, then one-hot matmul over lp
        m_t = (jnp.arange(3)[None, :] == t[:, None])
        slc = jnp.sum(jnp.where(m_t[:, :, None, None], tbl, 0), axis=1)  # (L,256,5)
        row = jnp.einsum("lc,lcf->lf", oh_lp, slc.astype(jnp.float32))
        new = row.astype(jnp.int32) + 1
        mask = (m_t[:, :, None] & (oh_lp > 0)[:, None, :])
        return jnp.where(mask[..., None], new[:, None, None, :], tbl)

    for name, step in [("scatter", step_scatter), ("dense", step_dense),
                       ("matmul", step_matmul)]:
        fn = jax.jit(lambda tbl, step=step: jax.lax.fori_loop(
            0, steps, step, tbl))
        r = fn(tbl0); sync(r)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            r = fn(tbl0); sync(r)
            best = min(best, time.time() - t0)
        print(f"{name:8s} L={L} steps={steps}: {best*1e3:8.1f} ms "
              f"({best/steps*1e6:8.1f} us/step)")


if __name__ == "__main__":
    main()
