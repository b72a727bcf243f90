"""Decompose the Lpx per-step cost: carry copy vs gather vs scatter vs vmap.

Usage: python tools/lpx_probe2.py [L] [steps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jampack_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def sync(x):
    # slice the scalar ON DEVICE before fetching: np.asarray(x) would pull
    # the whole array through the ~20 MB/s tunnel inside the timed region
    return np.asarray(x.ravel()[0])


def bench(name, fn, *args):
    r = fn(*args); sync(r if not isinstance(r, tuple) else r[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = fn(*args)
        sync(r if not isinstance(r, tuple) else r[0])
        best = min(best, time.time() - t0)
    return best


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    key = jax.random.PRNGKey(0)
    tbl0 = jax.random.randint(key, (L, 3, 256, 5), 0, 1000, jnp.int32)
    lanes = jnp.arange(L)

    def mk_idx(i, seed_row):
        h = (seed_row * 2654435 + i * 40503) & 0x7FFFFFFF
        return (h % 3, (h >> 8) & 0xFF)

    cases = {}

    # 1. carry-only: tbl + 1 per step (pure stream, no random access)
    def step_carry(i, tbl):
        return tbl + 1
    cases["carry_add"] = step_carry

    # 2. tiny touch: update one STATIC row per step (aliasable)
    def step_static(i, tbl):
        return tbl.at[:, 0, 0, :].add(1)
    cases["static_row"] = step_static

    # 3. gather only (result folded into a static write)
    def step_gather(i, tbl):
        t, lp = mk_idx(i, lanes)
        row = tbl[lanes, t, lp]
        return tbl.at[:, 0, 0, :].add(row)
    cases["gather_row"] = step_gather

    # 4. scatter only (no gather)
    def step_scatter(i, tbl):
        t, lp = mk_idx(i, lanes)
        return tbl.at[lanes, t, lp].set(jnp.broadcast_to(i, (L, 5)))
    cases["scatter_row"] = step_scatter

    # 5. flat-index gather+scatter (single fused index)
    tblf0 = tbl0.reshape(L, 3 * 256 * 5)
    def step_flat(i, tbl):
        t, lp = mk_idx(i, lanes)
        base = (t * 256 + lp) * 5
        idx = base[:, None] + jnp.arange(5)[None, :]
        row = jnp.take_along_axis(tbl, idx, axis=1)
        return jnp.where(
            (jnp.arange(3 * 256 * 5)[None, :] >= base[:, None])
            & (jnp.arange(3 * 256 * 5)[None, :] < base[:, None] + 5),
            0, tbl) + jnp.zeros_like(tbl).at[lanes[:, None], idx].set(row + 1)
    # too clever; simpler: gather + scatter via take_along/put_along
    def step_flat2(i, tbl):
        t, lp = mk_idx(i, lanes)
        base = (t * 256 + lp) * 5
        idx = base[:, None] + jnp.arange(5)[None, :]
        row = jnp.take_along_axis(tbl, idx, axis=1)
        return jax.lax.scatter(
            tbl, idx[..., None].astype(jnp.int32), row + 1,
            jax.lax.ScatterDimensionNumbers(
                update_window_dims=(), inserted_window_dims=(1,),
                scatter_dims_to_operand_dims=(1,),
                operand_batching_dims=(0,),
                scatter_indices_batching_dims=(0,)),
            indices_are_sorted=False, unique_indices=True)
    cases["flat_tkal"] = step_flat2

    for name, step in cases.items():
        t0arg = tblf0 if name.startswith("flat") else tbl0
        try:
            fn = jax.jit(lambda tbl, step=step: jax.lax.fori_loop(
                0, steps, step, tbl))
            best = bench(name, fn, t0arg)
            print(f"{name:12s} L={L} steps={steps}: {best*1e3:8.1f} ms "
                  f"({best/steps*1e6:8.1f} us/step)")
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
