"""Multi-chip block sharding: data-parallel codec steps over a device mesh.

The format is embarrassingly parallel (each framed block is self-contained),
so the distributed design is: shard a batch of fixed-size blocks along a
`data` mesh axis with shard_map, run the full per-block TPU transform stack
on each device, and reduce per-block metrics with psum over ICI.  Compressed
variable-length outputs are size-prefixed into fixed budgets and gathered in
file order on the host (SURVEY.md section 5.8).

Multi-host: the same mesh spans hosts via jax.distributed.initialize();
blocks are read per-host, decoded locally, written per-host and concatenated
in index order — no cross-host data dependencies exist at all.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_vma=False)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_rep=False)


def make_mesh(n_devices=None):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("data",))


def _sa_fixed(t, n):
    """Prefix-doubling suffix array on a fixed-shape uint8 block (jit-safe)."""
    rank = t.astype(jnp.int32)
    order = jnp.arange(n, dtype=jnp.int32)

    def round_fn(carry):
        rank, order, _, k = carry
        pos = jnp.arange(n, dtype=jnp.int32)
        key1 = rank
        key2 = jnp.where(pos + k < n, rank[jnp.minimum(pos + k, n - 1)], -1)
        k1s, k2s, order = jax.lax.sort((key1, key2, pos), num_keys=2,
                                       is_stable=True)
        boundaries = jnp.concatenate(
            [jnp.ones(1, jnp.int32),
             ((k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])).astype(jnp.int32)]
        )
        new_rank = jnp.cumsum(boundaries) - 1
        rank = jnp.zeros_like(rank).at[order].set(new_rank)
        return rank, order, new_rank[-1] == n - 1, k * 2

    def cond(carry):
        _, _, done, k = carry
        return jnp.logical_and(jnp.logical_not(done), k < 2 * n)

    _, order, _, _ = jax.lax.while_loop(
        cond, round_fn,
        (rank, order, jnp.array(False), jnp.array(1, jnp.int32)))
    return order


def codec_block_step(block):
    """Full TPU transform cycle on one fixed-size block: forward BWT (suffix
    sort + emission + anchor planting) then inverse (LF map + 120-chain
    chase).  Returns (reconstruction, bwt, checksum-ish metric).  This is the
    flagship jittable compute step of the framework."""
    n = block.shape[0]
    units = 120 if n % 120 == 0 else 1
    sa = _sa_fixed(block, n)

    # forward emission (bwt.cpp:50-58 semantics)
    idx_sa = jnp.argmin(sa)
    prev = block[(sa - 1) % n]
    pos = jnp.arange(n, dtype=jnp.int32)
    bwt = jnp.where(pos == 0, block[n - 1],
                    jnp.where(pos <= idx_sa, prev[pos - 1], prev[pos]))

    # plant anchors: SA positions of the `units` equally spaced suffixes
    step = n // units
    targets = jnp.where(sa % step == 0, sa // step, units)  # `units` drops
    anchors = jnp.zeros(units, jnp.int32).at[targets].set(pos, mode="drop") + 1
    idx = anchors[0]

    # inverse: LF map + chase
    positions = jnp.where(pos >= idx, pos + 1, pos)
    lf = positions[jnp.argsort(bwt, stable=True)]

    out = jnp.zeros((step, units), dtype=jnp.uint8)

    def body(i, carry):
        p, out = carry
        p = lf[p - 1]
        sym = bwt[p - (p >= idx).astype(jnp.int32)]
        return p, jax.lax.dynamic_update_slice(out, sym[None, :], (i, 0))

    _, out = jax.lax.fori_loop(0, step, body, (anchors, out))
    recon = out.T.reshape(-1)
    metric = jnp.sum(bwt.astype(jnp.uint32))
    return recon, bwt, metric


def sharded_codec_step(mesh: Mesh):
    """Builds the jitted data-parallel step over `mesh`: each device runs the
    full block transform on its shard; per-block metrics psum over ICI."""

    def per_shard(local_blocks):
        recon, bwt, metric = jax.vmap(codec_block_step)(local_blocks)
        total = jax.lax.psum(jnp.sum(metric), axis_name="data")
        return recon, bwt, total

    return jax.jit(
        shard_map(
            per_shard,
            mesh,
            (P("data", None),),
            (P("data", None), P("data", None), P()),
        )
    )


def roundtrip_blocks(blocks: np.ndarray, mesh: Mesh = None):
    """Host entry: blocks (B, L) uint8, B divisible by mesh size.  Returns
    (reconstruction, bwt, metric) gathered in block order."""
    mesh = mesh or make_mesh()
    step = sharded_codec_step(mesh)
    sharded = jax.device_put(
        jnp.asarray(blocks), NamedSharding(mesh, P("data", None))
    )
    recon, bwt, metric = step(sharded)
    return (np.asarray(recon), np.asarray(bwt), int(metric))
