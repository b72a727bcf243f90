"""Price the forward-BWT ISA alternatives (VERDICT r3 #7).

The doubling kernel's FINAL position-space ISA sort exists only to slice
isa[0] and the `units` anchor values.  If those can be extracted from the
sorted `order` directly, the last 1-key+payload lax.sort (~40 ms/8.4M)
drops out of every forward call.  Candidates:

  isa_sort   — the current lax.sort((order, rank)) baseline
  scatter    — drop-mode scatter of j into a (units+1,) table at
               order[j]//step where order[j] hits the anchor grid
  argmin     — isa[0] alone via argmin(order) (always needed)

Usage: python tools/anchor_probe.py [--cpu]
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

    n = (1 << 20) if "--cpu" in sys.argv else (8 << 20) - ((8 << 20) % 1920)
    units = 1920
    step = n // units
    rng = np.random.default_rng(0)
    order = rng.permutation(n).astype(np.int32)
    rank_sorted = np.arange(n, dtype=np.int32)  # distinct-ranks regime
    want_isa = np.argsort(order, kind="stable").astype(np.int32)
    want_anchors = want_isa[: units * step : step]

    jo = jnp.asarray(order)
    jr = jnp.asarray(rank_sorted)

    @jax.jit
    def isa_sort(o, r):
        _, rank = jax.lax.sort((o, r), num_keys=1, is_stable=False)
        return rank[: units * step : step], rank[0]

    @jax.jit
    def scatter(o):
        j = jnp.arange(n, dtype=jnp.int32)
        u = o // step
        hit = (o < units * step) & (o - u * step == 0)
        tbl = jnp.zeros(units + 1, jnp.int32).at[
            jnp.where(hit, u, units)].set(j, mode="drop")
        return tbl[:units], jnp.argmin(o)

    @jax.jit
    def argmin_only(o):
        return jnp.argmin(o)

    for name, fn, args in (("isa_sort", isa_sort, (jo, jr)),
                           ("scatter", scatter, (jo,)),
                           ("argmin", argmin_only, (jo,))):
        r = fn(*args)
        leaves = jax.tree_util.tree_leaves(r)
        a0 = np.asarray(leaves[0])
        if name in ("isa_sort", "scatter"):
            assert np.array_equal(a0, want_anchors), name
            assert int(np.asarray(leaves[1])) == int(want_isa[0]), name
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            r = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
            best = min(best, time.time() - t0)
        print(f"{name:10s} {best*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
