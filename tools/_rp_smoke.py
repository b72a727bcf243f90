"""Ad-hoc: rans_pallas interpret-mode parity vs rans_wide (CPU)."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from jampack_tpu.stages.ans import (
    ans_encode_chunk, lane_rlen, read_chunk_header, read_lane_table)
from jampack_tpu.kernels.rans_wide import decode_lanes_wide
from jampack_tpu.kernels.rans_pallas import decode_lanes_wide_pallas

RNG = np.random.default_rng(7)


def make_case(n, lanes, seed):
    rng = np.random.default_rng(seed)
    data = np.repeat(rng.integers(0, 60, n, dtype=np.uint8),
                     rng.integers(1, 20, n)).astype(np.uint8)[:n]
    blob = ans_encode_chunk(data, lanes)
    view = memoryview(blob)
    freqs, olen, clen, rlen, pos = read_chunk_header(view, 0)
    lane_clens, p = read_lane_table(view, pos, rlen, lanes)
    starts = np.cumsum([p] + lane_clens[:-1]).astype(np.int32)
    rlens = np.asarray([lane_rlen(rlen, lanes, l) for l in range(lanes)],
                       np.int32)
    return np.frombuffer(blob, np.uint8), starts, rlens


for (n, lanes, seed) in [(3000, 4, 1), (5000, 8, 2), (1200, 2, 3)]:
    buf, starts, rlens = make_case(n, lanes, seed)
    mr = 1 << int(np.max(rlens) - 1).bit_length()
    bufp = np.zeros(buf.size + 64, np.uint8)
    bufp[:buf.size] = buf
    a, aok = decode_lanes_wide(jnp.asarray(bufp), jnp.asarray(starts),
                               jnp.asarray(rlens), mr)
    b, bok = decode_lanes_wide_pallas(jnp.asarray(bufp), jnp.asarray(starts),
                                      jnp.asarray(rlens), mr,
                                      interpret=True)
    a, b = np.asarray(a), np.asarray(b)
    assert np.array_equal(np.asarray(aok), np.asarray(bok)), (n, lanes)
    assert bool(np.all(np.asarray(aok))), (n, lanes, "ok false")
    if not np.array_equal(a, b):
        bad = np.argwhere(a != b)
        print("MISMATCH", n, lanes, bad[:5], a[tuple(bad[0])],
              b[tuple(bad[0])])
        raise SystemExit(1)
    print("ok", n, lanes, a.shape)

# grouped emission parity
buf, starts, rlens = make_case(4000, 4, 9)
mr = 1 << int(np.max(rlens) - 1).bit_length()
bufp = np.zeros(buf.size + 64, np.uint8)
bufp[:buf.size] = buf
a, _ = decode_lanes_wide(jnp.asarray(bufp), jnp.asarray(starts),
                         jnp.asarray(rlens), mr, groups=1)
b, _ = decode_lanes_wide_pallas(jnp.asarray(bufp), jnp.asarray(starts),
                                jnp.asarray(rlens), mr, groups=1,
                                interpret=True)
assert np.array_equal(np.asarray(a), np.asarray(b)), "groups mismatch"
print("groups ok")
print("ALL PASS")
