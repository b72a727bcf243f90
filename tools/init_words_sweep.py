"""On-chip sweep of the forward-sort init width (VERDICT r4 #4).

The prefix-doubling forward sort opens with one multi-key lax.sort over
_INIT_WORDS packed 4-byte words (k0 = 4*W bytes) + the remaining-length
tiebreak; each extra word adds a sort operand (bandwidth) but can resolve
more ranks up front and save whole doubling rounds (~2 sorts = ~80 ms
each at 8 MB).  This tool measures BOTH sides of that trade on hardware:

  python tools/init_words_sweep.py            # parent: spawns one child
                                              # per W in {2,3,4,5}
  python tools/init_words_sweep.py --child    # one W (from env), 3 corpora
  python tools/init_words_sweep.py --rounds   # eager per-round timing
                                              # table for the u1920 stream

Corpora: textlike (the bench stream — tiny LCPs, init alone resolves),
logs (structured, LCPs ~40-80), periodic-1K (LCP = n, worst case: every
round runs).
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def textlike(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    alpha = np.frombuffer(b" etaoinshrdlucmfwypvbgkqjxz.,\n", dtype=np.uint8)
    return alpha[(x >> 16) % 30]


def logs_corpus(n):
    out = bytearray()
    i = 0
    while len(out) < n:
        out += (b"ts=2026-08-20T09:%02d:%02d level=INFO module=core"
                b" id=%06d\n" % (i // 60 % 60, i % 60, i * 37 % 999983))
        i += 1
    return np.frombuffer(bytes(out[:n]), np.uint8)


def periodic(n):
    pat = np.random.default_rng(3).integers(0, 256, 1024, dtype=np.uint8)
    return np.tile(pat, n // pat.size + 1)[:n].copy()


def _sync(x):
    return int(np.asarray(x.ravel()[0]))


def child(mb: int):
    import jax

    from jampack_tpu.kernels import sa as sa_mod
    from jampack_tpu.kernels.sa import bwt_from_prev_sorted, sa_doubling_core

    W = sa_mod._INIT_WORDS
    n = (mb << 20) - ((mb << 20) % (120 * 16))
    units = 1920
    step = n // units

    @jax.jit
    def forward(t):
        sa, isa, prev_sorted = sa_doubling_core(t, n)
        bwt = bwt_from_prev_sorted(prev_sorted, isa[0], n)
        return bwt, isa[: units * step : step] + 1

    out = {"init_words": W, "k0": 4 * W, "mb": mb}
    for name, gen in (("text", textlike), ("logs", logs_corpus),
                      ("periodic1k", periodic)):
        td = jax.device_put(jax.numpy.asarray(gen(n)))
        bwt, anch = forward(td)  # compile + warmup
        _sync(bwt)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(2):
                bwt, anch = forward(td)
                _sync(bwt)
                _sync(anch)
            best = min(best, (time.time() - t0) / 2)
        out[name + "_s"] = round(best, 4)
    print(json.dumps(out), flush=True)


def rounds_table(mb: int):
    """Eager per-round timing at the current W: init sort, then each
    doubling round as its own jitted step, reporting resolved-rank
    fraction and wall per round — the committed sort-timing table for the
    u1920 bench stream (text) plus the worst case (periodic)."""
    import jax
    import jax.numpy as jnp

    from jampack_tpu.kernels import sa as sa_mod

    W = sa_mod._INIT_WORDS
    n = (mb << 20) - ((mb << 20) % (120 * 16))
    k0 = 4 * W

    @jax.jit
    def init(t):
        t32 = t.astype(jnp.int32)
        pos = jnp.arange(n, dtype=jnp.int32)
        words = [sa_mod._pack4(t32, 4 * i, n) for i in range(W)]
        rem = jnp.minimum(n - pos, k0).astype(jnp.uint32)
        prev = jnp.concatenate([t32[n - 1:], t32[: n - 1]])
        sorted_ops = jax.lax.sort(
            tuple(words) + (rem, pos, prev), num_keys=W + 1, is_stable=True)
        order = sorted_ops[-2]
        prev_sorted = sorted_ops[-1]
        neq = jnp.zeros(n - 1, dtype=bool)
        for key in sorted_ops[: W + 1]:
            neq = neq | (key[1:] != key[:-1])
        boundaries = jnp.concatenate(
            [jnp.ones(1, jnp.int32), neq.astype(jnp.int32)])
        rank_sorted = jnp.cumsum(boundaries) - 1
        return rank_sorted, order, prev_sorted

    @jax.jit
    def one_round(k, rank_sorted, order, prev):
        _, rank = jax.lax.sort((order, rank_sorted), num_keys=1,
                               is_stable=False)
        pos = jnp.arange(n, dtype=jnp.int32)
        key2 = jax.lax.dynamic_slice(
            jnp.concatenate([rank, jnp.full(n, -1, jnp.int32)]),
            (jnp.minimum(k, n),), (n,))
        key2 = jnp.where(pos + k < n, key2, -1)
        k1s, k2s, order, prev_sorted = jax.lax.sort(
            (rank, key2, pos, prev), num_keys=2, is_stable=True)
        boundaries = jnp.concatenate([
            jnp.ones(1, jnp.int32),
            ((k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])).astype(
                jnp.int32)])
        rank_sorted = jnp.cumsum(boundaries) - 1
        return rank_sorted, order, prev_sorted, rank_sorted[-1]

    for name, gen in (("text", textlike), ("periodic1k", periodic)):
        t = jax.device_put(jnp.asarray(gen(n)))
        prev = jnp.concatenate([t.astype(jnp.int32)[n - 1:],
                                t.astype(jnp.int32)[: n - 1]])
        init(t)  # compile
        t0 = time.time()
        rank_sorted, order, prev_sorted = init(t)
        resolved0 = _sync(rank_sorted[-1:])
        t_init = time.time() - t0
        print(f"[{name}] init W={W} (k0={k0}): {t_init*1e3:.0f} ms, "
              f"resolved {resolved0 + 1}/{n} "
              f"({100 * (resolved0 + 1) / n:.2f}%)", flush=True)
        k = k0
        r = 0
        while resolved0 + 1 < n and k < 2 * n and r < 24:
            one_round(k, rank_sorted, order, prev)  # compile this shape
            t0 = time.time()
            rank_sorted, order, prev_sorted, top = one_round(
                k, rank_sorted, order, prev)
            top = _sync(top[None])
            dt = time.time() - t0
            r += 1
            print(f"[{name}] round {r} (k={k}): {dt*1e3:.0f} ms, "
                  f"resolved {top + 1}/{n} ({100 * (top + 1) / n:.2f}%)",
                  flush=True)
            resolved0 = top
            k *= 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--rounds", action="store_true")
    ap.add_argument("--mb", type=int, default=8)
    args = ap.parse_args()
    if args.child:
        child(args.mb)
        return
    if args.rounds:
        rounds_table(args.mb)
        return
    # W=2 (k0=8) consistently WEDGED the tunnel-side compile (3/3
    # attempts, 2026-08-20) and was superseded by k0=12 rounds ago; the
    # open question is whether WIDER inits pay, so sweep 3..5.
    for w in (3, 4, 5):
        env = dict(os.environ, JAMPACK_SA_INIT_WORDS=str(w))
        print(f"--- W={w} (k0={4 * w}) ---", flush=True)
        # the tunnel sometimes WEDGES a fresh process's first big
        # dispatch (CLAUDE.md round-5 flakiness mode): bound each child
        # and retry once; start_new_session so a timeout kill reaps the
        # whole child group instead of orphaning it on the device
        for attempt in (1, 2, 3):
            try:
                subprocess.run(
                    [sys.executable, "-u", __file__, "--child",
                     "--mb", str(args.mb)], env=env, check=True,
                    timeout=900, start_new_session=True)
                break
            except subprocess.TimeoutExpired:
                print(f"(W={w} attempt {attempt} timed out; retrying)",
                      flush=True)
            except subprocess.CalledProcessError as e:
                print(f"(W={w} attempt {attempt} rc={e.returncode}; "
                      f"retrying)", flush=True)


if __name__ == "__main__":
    main()
