"""On-chip parity smoke: fused encode + fused decode on the REAL TPU
backend, bytes asserted against the native host engine (VERDICT r2 item 2).

The CPU backend is not a faithful proxy for TPU scatter/MXU lowering
(round 2 shipped a real-hardware-only encode corruption), so this tool is
the chip-side counterpart of the reference's runtime self-checking
(SURVEY §4): ~16 MB of mixed corpora through

  * fused device ENCODE (encode_block_device, m3 store + -f0/-f1) — byte
    contract vs compress_block on the native engine at the same Options
  * fused device DECODE (decode_block_device) of native-engine JT3
    streams — output vs the raw corpus

and prints ONE JSON line {"pass": bool, "cases": {...}}.  Run it whenever
the tunnel is up; record results in BASELINE.md.

Usage: python -u tools/chip_parity.py [--quick]
  --quick: 1 MB corpora (compile-dominated; for smoke after kernel edits)
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _watchdog(seconds=3600):
    def fire():
        print(json.dumps({"pass": False,
                          "error": f"exceeded {seconds}s (tunnel down?)"}),
              flush=True)
        os._exit(1)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def textlike(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    alpha = np.frombuffer(b" etaoinshrdlucmfwypvbgkqjxz.,\n", dtype=np.uint8)
    return alpha[(x >> 16) % 30]


def corpora(big, small):
    rng = np.random.default_rng(7)
    rec = np.zeros(small, np.uint8)
    rec[0::4] = 200 + (np.arange(rec[0::4].size) % 9)          # tag channel
    rec[1::4] = (np.arange(rec[1::4].size) // 3) & 0xFF        # slow counter
    rec[2::4] = rng.integers(0, 16, rec[2::4].size)            # small noise
    rec[3::4] = np.cumsum(rng.integers(0, 3, rec[3::4].size)).astype(
        np.uint8)                                              # drifting sum
    pat = rng.integers(0, 256, 64 << 10, dtype=np.uint8)
    dedupe = np.tile(pat, small // pat.size + 1)[:small].copy()
    dedupe[rng.integers(0, small, small // 64)] ^= 0xFF
    zeros = np.zeros(small, np.uint8)
    zeros[rng.integers(0, small, small // 256)] = rng.integers(
        1, 256, small // 256)
    rand = rng.integers(0, 256, small, dtype=np.uint8)
    return [("text8", textlike(big)), ("records", rec),
            ("dedupe", dedupe), ("zeros", zeros), ("random", rand)]


def main():
    quick = "--quick" in sys.argv
    wd = _watchdog(7200)
    import jax

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          file=sys.stderr, flush=True)

    from jampack_tpu.runtime.device_decode import decode_block_device
    from jampack_tpu.runtime.device_encode import encode_block_device
    from jampack_tpu.runtime.engines import NativeEngine
    from jampack_tpu.runtime.pipeline import Options, compress_block

    big = (1 << 20) if quick else (8 << 20)
    small = (1 << 20) if quick else (2 << 20)
    ne = NativeEngine()
    cases = {}
    ok_all = True
    t_all = time.time()
    total_mb = 0.0

    for name, data in corpora(big, small):
        n = int(data.size)
        total_mb += n / 1e6
        base = dict(blocksize=n, rans_lanes=16, ans_chunk=8 << 10,
                    anchor_units=960, lpx_spans=4096)

        # fused ENCODE byte contract (m3 store; f1 on the records corpus)
        filters = 1 if name == "records" else 0
        eopt = Options(match_finder=3, filters=filters, **base)
        try:
            t0 = time.time()
            crc_e, pay_e = encode_block_device(data, eopt)
            dt = time.time() - t0
            crc_h, pay_h = compress_block(data, eopt, ne)
            ok = (crc_e == crc_h) and (pay_e == pay_h)
            if not ok and len(pay_e) == len(pay_h):
                d = np.flatnonzero(np.frombuffer(pay_e, np.uint8)
                                   != np.frombuffer(pay_h, np.uint8))
                cases[f"enc:{name}:firstdiff"] = int(d[0]) if d.size else -1
            cases[f"enc:{name}"] = (
                round(n / 1e6 / dt, 2) if ok else "FAIL")
            ok_all &= ok
        except Exception as e:  # noqa: BLE001
            cases[f"enc:{name}"] = f"error: {e}"
            ok_all = False

        # fused DECODE of a native-engine JT3 stream
        dopt = Options(match_finder=0, filters=0, **base)
        try:
            crc, payload = compress_block(data, dopt, ne)
            t0 = time.time()
            back = decode_block_device(payload, crc, n, dopt.anchor_units,
                                       dopt.rans_lanes, dopt.lpx_spans)
            dt = time.time() - t0
            ok = np.array_equal(back, data)
            cases[f"dec:{name}"] = (
                round(n / 1e6 / dt, 2) if ok else "FAIL")
            ok_all &= ok
        except Exception as e:  # noqa: BLE001
            cases[f"dec:{name}"] = f"error: {e}"
            ok_all = False
        print(f"  {name}: enc={cases.get(f'enc:{name}')} "
              f"dec={cases.get(f'dec:{name}')}", file=sys.stderr, flush=True)

    # ---- round-4 widening (VERDICT r3 #8), on the text corpus:
    # (a) default-Options JAM streams (lanes=0, units=120, spans=4, m0+f1)
    #     through BOTH fused paths — the ref-compat corner (jampack.cpp:
    #     30-58 default path) the CPU suite can't vouch for on hardware,
    # (b) one -f2 fused encode,
    # (c) a device-encode -> device-decode composition.
    from jampack_tpu.runtime.device_encode import encode_block_device_lz

    data = textlike((1 << 20) if quick else (4 << 20), seed=11)
    n = int(data.size)
    total_mb += 3 * n / 1e6

    jam = Options(blocksize=n, match_finder=0, filters=1)  # pure defaults
    try:
        t0 = time.time()
        crc_e, pay_e = encode_block_device_lz(data, jam, ne)
        dt = time.time() - t0
        ok = (crc_e, pay_e) == compress_block(data, jam, ne)
        cases["enc:jam_default"] = round(n / 1e6 / dt, 2) if ok else "FAIL"
        ok_all &= ok
        t0 = time.time()
        back = decode_block_device(pay_e, crc_e, n, jam.anchor_units,
                                   jam.rans_lanes, jam.lpx_spans)
        dt = time.time() - t0
        ok = np.array_equal(back, data)
        cases["dec:jam_default"] = round(n / 1e6 / dt, 2) if ok else "FAIL"
        ok_all &= ok
    except Exception as e:  # noqa: BLE001
        cases["enc:jam_default"] = f"error: {e}"
        ok_all = False

    f2opt = Options(blocksize=n, match_finder=3, filters=2, rans_lanes=16,
                    ans_chunk=8 << 10, anchor_units=960, lpx_spans=4096)
    try:
        t0 = time.time()
        crc_e, pay_e = encode_block_device(data, f2opt)
        dt = time.time() - t0
        ok = (crc_e, pay_e) == compress_block(data, f2opt, ne)
        cases["enc:f2"] = round(n / 1e6 / dt, 2) if ok else "FAIL"
        ok_all &= ok
        # (c) composition: decode the device-encoded stream on device
        back = decode_block_device(pay_e, crc_e, n, f2opt.anchor_units,
                                   f2opt.rans_lanes, f2opt.lpx_spans)
        ok = np.array_equal(back, data)
        cases["dec:of_device_enc"] = "ok" if ok else "FAIL"
        ok_all &= ok
    except Exception as e:  # noqa: BLE001
        cases["enc:f2"] = f"error: {e}"
        ok_all = False
    print(f"  widened: jam_default enc={cases.get('enc:jam_default')} "
          f"dec={cases.get('dec:jam_default')} f2={cases.get('enc:f2')} "
          f"compose={cases.get('dec:of_device_enc')}",
          file=sys.stderr, flush=True)

    wd.cancel()
    print(json.dumps({"pass": bool(ok_all), "mb": round(total_mb, 1),
                      "wall_s": round(time.time() - t_all, 1),
                      "unit": "MB/s incl transfers", "cases": cases}))
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
