"""Pallas DMA block-scatter microbench: the missing number in the radix-sort
feasibility argument (VERDICT r1 item 2).

A TPU radix sort cannot scatter elementwise (Mosaic exposes no VMEM vector
gather/scatter — "Cannot do int indexing", measured round 2), so the only
hardware path for data-dependent placement is DMA block copies at dynamic
offsets: partition locally, then DMA each bucket run to its global offset.
A radix-R pass over N keys in T-element tiles costs (N/T) * R descriptors.
This tool measures the achievable descriptor rate and bandwidth for
HBM -> HBM copies of S-element blocks at dynamic destination offsets, which
upper-bounds any DMA-binning sort pass:

    pass_time >= descriptors / rate  =  (N/T) * R / rate

With N = 8.4M, T = 64K (VMEM-bound), R = 256: 33K descriptors/pass. The
measured rate decides whether that beats lax.sort's ~40 ms / 8.4M keys
(~210 M keys/s, the XLA baseline the sort must displace) BEFORE even
solving the local partition (itself a scatter, see ARCHITECTURE.md for the
MXU permutation-matmul arithmetic: O(K) MACs per element — ~100x over
budget at K = 256).

Usage: python tools/pallas_dma_bench.py [--cpu]   (--cpu: interpret mode,
correctness only)
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def build(block_elems: int, nblocks: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = block_elems

    def kernel(offs_ref, src_ref, out_ref, sem):
        # issue all copies through a 4-deep ring of DMA semaphores so the
        # engine pipelines; offsets come from SMEM (scalar-prefetched) as
        # BLOCK indices and are scaled by the static S inside the kernel —
        # Mosaic must PROVE the dynamic byte offset divisible by the 1024-
        # element tiling, which idx*S (S % 1024 == 0) satisfies and a raw
        # dynamic offset does not ("Failed to prove that a tile index in
        # dimension 0 is divisible by the tiling", measured 2026-08-20)
        def issue(i, _):
            dma = pltpu.make_async_copy(
                src_ref.at[pl.ds(i * S, S)],
                out_ref.at[pl.ds(offs_ref[i] * S, S)],
                sem.at[i % 4],
            )
            dma.start()

            @pl.when(i >= 3)
            def _():
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(0, S)],
                    out_ref.at[pl.ds(0, S)],
                    sem.at[(i - 3) % 4],
                ).wait()

            return 0

        jax.lax.fori_loop(0, nblocks, issue, 0)
        # drain the ring tail
        def drain(i, _):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(0, S)],
                out_ref.at[pl.ds(0, S)],
                sem.at[(nblocks - 3 + i) % 4],
            ).wait()
            return 0

        jax.lax.fori_loop(0, min(3, nblocks), drain, 0)

    @partial(jax.jit, static_argnames=())
    def scatter(src, offs):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
            ),
            out_shape=jax.ShapeDtypeStruct((S * nblocks,), jnp.int32),
            interpret=interpret,
        )(offs, src)

    return scatter


def main():
    interpret = "--cpu" in sys.argv
    import jax

    if interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # S < 1024 is REJECTED by Mosaic on this platform: "Slice shape along
    # dimension 0 must be aligned to tiling (1024)" (measured 2026-08-20) —
    # dynamic-offset HBM DMA exists only at >= 1024-element (4 KB) tile
    # granularity, which on its own rules out radix-R binning with
    # arbitrary bucket boundaries.  The sizes below measure the descriptor
    # rate for LEGAL (tile-aligned) copies.
    for S in (1024, 4096, 16384):
        N = 8 << 20  # 8M elements total, like the 8 MB block's u32 keys
        nblocks = min(N // S, 8192)
        n = S * nblocks
        src = jnp.asarray(np.arange(n, dtype=np.int32))
        perm = rng.permutation(nblocks)
        offs = jnp.asarray(perm.astype(np.int32))  # block indices (see kernel)
        scatter = build(S, nblocks, interpret)
        out = scatter(src, offs)
        expect = np.empty(n, np.int32)
        for i, p in enumerate(perm):
            expect[p * S : (p + 1) * S] = np.arange(i * S, (i + 1) * S)
        ok = np.array_equal(np.asarray(out), expect)
        if interpret:
            print(f"S={S} nblocks={nblocks} ok={ok}")
            continue
        assert ok, f"S={S}: DMA scatter mismatch"
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = scatter(src, offs)
            _ = int(np.asarray(out[0]))
            best = min(best, time.time() - t0)
        rate = nblocks / best
        gbps = n * 4 / best / 1e9
        print(
            f"S={S:6d} blocks={nblocks:5d} wall={best*1e3:8.2f} ms "
            f"-> {rate/1e3:8.1f} K desc/s, {gbps:6.2f} GB/s"
        )


if __name__ == "__main__":
    main()
