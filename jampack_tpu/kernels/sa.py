"""TPU suffix-array construction: prefix doubling on XLA sort.

Replaces the role of the reference's vendored divsufsort (divsufsort.cpp)
with an O(n log^2 n) rank-doubling pipeline that is all sorts, gathers and
segmented scans — the shapes XLA tiles well on TPU.  Deterministic and
memory-frugal: peak device footprint ~ 3 int32 arrays of n.

The early-exit on fully distinct ranks makes typical text converge in
~log2(LCP_max) rounds rather than log2(n).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n",))
def _sa_doubling(t: jnp.ndarray, n: int):
    # Initial key: 3 bytes packed into 27 bits with 9-bit biased fields —
    # real bytes map to 1..256 and past-the-end to 0, so shorter suffixes
    # sort first even when the text contains zero bytes.  Skips the k=1,2
    # doubling rounds.
    t32 = t.astype(jnp.int32) + 1
    b1 = jnp.concatenate([t32[1:], jnp.zeros(1, jnp.int32)])
    b2 = jnp.concatenate([t32[2:], jnp.zeros(2, jnp.int32)])
    rank = (t32 << 18) | (b1 << 9) | b2
    order = jnp.arange(n, dtype=jnp.int32)

    def round_fn(k, rank, order):
        # per-position keys: (rank[i], rank[i+k] or -1); two-key lexicographic
        # lax.sort avoids any packed-key overflow at 8M+ scale
        pos = jnp.arange(n, dtype=jnp.int32)
        key1 = rank
        key2 = jnp.where(pos + k < n, rank[jnp.minimum(pos + k, n - 1)], -1)
        k1s, k2s, order = jax.lax.sort((key1, key2, pos), num_keys=2, is_stable=True)
        boundaries = jnp.concatenate(
            [
                jnp.ones(1, dtype=jnp.int32),
                ((k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])).astype(jnp.int32),
            ]
        )
        new_rank = jnp.cumsum(boundaries) - 1
        rank = jnp.zeros_like(rank).at[order].set(new_rank)
        return rank, order, new_rank[-1] == n - 1

    def cond(carry):
        _, _, done, k = carry
        return jnp.logical_and(jnp.logical_not(done), k < 2 * n)

    def body(carry):
        rank, order, _, k = carry
        rank, order, done = round_fn(k, rank, order)
        return rank, order, done, k * 2

    rank, order, done, _ = jax.lax.while_loop(
        cond, body, (rank, order, jnp.array(False), jnp.array(3, dtype=jnp.int32))
    )
    return order


def suffix_array_tpu(t: np.ndarray) -> np.ndarray:
    t = np.asarray(t, dtype=np.uint8)
    n = t.size
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    if n == 1:
        return np.zeros(1, dtype=np.int32)
    order = _sa_doubling(jnp.asarray(t), n)
    return np.asarray(jax.device_get(order), dtype=np.int32)


@partial(jax.jit, static_argnames=("nlen",))
def _bwt_from_sa(t: jnp.ndarray, sa: jnp.ndarray, nlen: int):
    """Emit BWT rows with the primary-index row dropped (bwt.cpp:50-58)."""
    idx = jnp.argmin(sa)  # position of suffix 0 (rank of whole string)
    prev = t[(sa - 1) % nlen]
    out = jnp.empty(nlen, dtype=jnp.uint8)
    out = out.at[0].set(t[nlen - 1])
    pos = jnp.arange(nlen, dtype=jnp.int32)
    # out[i+1] = prev[i] for i < idx ; out[i] = prev[i] for i > idx
    shifted = jnp.where(pos[1:] <= idx, prev[pos[1:] - 1], prev[pos[1:]])
    out = out.at[1:].set(shifted)
    return out, idx


def forward_bwt_tpu(data: np.ndarray, units: int = 120) -> np.ndarray:
    """Device-side forward BWT; format-identical to stages.bwt.forward_bwt."""
    from .ibwt import plant_anchors

    t = np.asarray(data, dtype=np.uint8)
    n = t.size
    out = np.empty(n + units * 4, dtype=np.uint8)
    remainder = n % units
    nlen = n - remainder
    out[nlen:n] = t[nlen:n]
    if nlen > 0:
        sa = suffix_array_tpu(t[:nlen])
        bwt, _ = _bwt_from_sa(jnp.asarray(t[:nlen]), jnp.asarray(sa), nlen)
        out[:nlen] = np.asarray(jax.device_get(bwt))
        out[n:] = plant_anchors(sa, nlen, units).astype("<i4").view(np.uint8)
    else:
        out[n:] = 0
    return out
