"""Calibrate the Lpx auto-gate threshold (pipeline.LPX_AUTO_MIN_ZERO_GAIN).

For each baseline corpus, measures (a) the gate's proxy — fraction of the
block's bytes the Lpx stage newly zeroes — and (b) the ground truth: the
final archive payload size with the stage on vs off.  The threshold is
sound iff every corpus where Lpx shrinks the archive materially sits above
it and everything below it loses ~nothing by skipping.

Runs on the host native engine (no device).  Usage:
    python tools/lpx_gate_calib.py [mb_per_corpus]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def textlike(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    alpha = np.frombuffer(b" etaoinshrdlucmfwypvbgkqjxz.,\n", dtype=np.uint8)
    return alpha[(x >> 16) % 30]


def logs(n):
    out = bytearray()
    i = 0
    while len(out) < n:
        out += (b"ts=2026-08-20T09:%02d:%02d level=INFO module=core"
                b" id=%06d\n" % (i // 60 % 60, i % 60, i * 37 % 999983))
        i += 1
    return np.frombuffer(bytes(out[:n]), np.uint8)


def corpora(n):
    rng = np.random.default_rng(7)
    rec = np.zeros(n, np.uint8)
    rec[0::4] = 200 + (np.arange(rec[0::4].size) % 9)
    rec[1::4] = (np.arange(rec[1::4].size) // 3) & 0xFF
    rec[2::4] = rng.integers(0, 16, rec[2::4].size)
    rec[3::4] = np.cumsum(rng.integers(0, 3, rec[3::4].size)).astype(np.uint8)
    pat = rng.integers(0, 256, 64 << 10, dtype=np.uint8)
    dedupe = np.tile(pat, n // pat.size + 1)[:n].copy()
    dedupe[rng.integers(0, n, n // 64)] ^= 0xFF
    zeros = np.zeros(n, np.uint8)
    zeros[rng.integers(0, n, n // 256)] = rng.integers(1, 256, n // 256)
    rand = rng.integers(0, 256, n, dtype=np.uint8)
    delta = (128 + 80 * np.sin(np.arange(n) / 9.0)
             + rng.normal(0, 2, n)).astype(np.uint8)
    with open("/usr/bin/python3", "rb") as f:  # any ELF on this host
        elf = np.frombuffer(f.read(n), np.uint8)
    return [("text", textlike(n)), ("logs", logs(n)), ("records", rec),
            ("dedupe", dedupe), ("zeros", zeros), ("random", rand),
            ("audio", delta), ("elf", elf)]


def main():
    from jampack_tpu.runtime.engines import NativeEngine
    from jampack_tpu.runtime.pipeline import (
        LPX_AUTO_MIN_ZERO_GAIN, Options, compress_block_ex)

    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    n = int(mb * (1 << 20))
    eng = NativeEngine()
    print(f"{'corpus':8s} {'zero-gain':>9s} {'on(B)':>9s} {'off(B)':>9s} "
          f"{'off/on':>7s}  gate(thr={LPX_AUTO_MIN_ZERO_GAIN}) sound?")
    for name, data in corpora(n):
        # proxy, measured exactly as the gate does (post-filters stage in)
        pre = np.asarray(eng.lz_encode(data, 0), np.uint8)
        fl = np.asarray(eng.filters_encode(pre, 1), np.uint8)
        lx = np.asarray(eng.lpx_encode(fl, 4), np.uint8)
        gain = (int(np.count_nonzero(lx == 0))
                - int(np.count_nonzero(fl == 0))) / max(fl.size, 1)
        _, p_on, _ = compress_block_ex(
            data, Options(blocksize=n, lpx_spans=4), eng)
        _, p_off, _ = compress_block_ex(
            data, Options(blocksize=n, lpx_spans=0), eng)
        skip = gain < LPX_AUTO_MIN_ZERO_GAIN
        ratio = len(p_off) / max(len(p_on), 1)
        # sound: skipping loses < 0.5% where gated off; keeping is allowed
        # to be near-neutral (within 0.5%) — that direction mirrors the
        # reference's always-on behavior, the costly error is only a
        # skipped big win
        sound = (ratio < 1.005) if skip else (ratio >= 0.995)
        print(f"{name:8s} {gain:9.4f} {len(p_on):9d} {len(p_off):9d} "
              f"{ratio:7.4f}  {'SKIP' if skip else 'keep':4s} "
              f"{'ok' if sound else 'VIOLATION'}")


if __name__ == "__main__":
    main()
