"""On-chip archive-level run of the fused CLI path (VERDICT r4 #5).

Builds a >=32 MB 4-block input whose blocks split under the -Sa gate
(records-like keeps Lpx, random/text skip it), then drives the REAL CLI
entry (`--engine fused c` / `d`) on the chip mesh — the first hardware
exercise of encode_archive_sharded / decode_archive_sharded's batching,
span-word grouping, and gather plumbing (the virtual-CPU dryrun covers
the same code, this is the chip log).  Parity: archive bytes vs the
host native engine, decode bytes vs the input.

    python tools/fused_cli_chip.py [workdir]
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def build_input(path: str, mb_per_block: int = 8) -> bytes:
    n = mb_per_block << 20
    rng = np.random.default_rng(5)
    out = bytearray()
    i = 0
    while len(out) < n:  # records: Lpx-predictable -> gate KEEPS
        out += b"ts=2026-08-20T09:%02d:%02d level=INFO module=core " \
               b"id=%06d\n" % (i // 60 % 60, i % 60, i)
        i += 1
    rec = bytes(out[:n])
    rnd = rng.integers(0, 256, n, dtype=np.uint8).tobytes()  # gate SKIPS
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    alpha = np.frombuffer(b" etaoinshrdlucmfwypvbgkqjxz.,\n", dtype=np.uint8)
    txt = alpha[(x >> 16) % 30].tobytes()  # textlike: gate SKIPS
    data = rec + rnd + txt + rec  # 4 blocks, mixed gate outcomes
    with open(path, "wb") as f:
        f.write(data)
    return data


def run(cmd):
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True)
    dt = time.time() - t0
    tail = (p.stdout.strip().splitlines() or [""])[-1]
    print(f"$ {' '.join(cmd)}\n  [{dt:.1f}s] {tail}")
    if p.returncode != 0:
        print(p.stderr[-2000:])
        raise SystemExit(f"command failed rc={p.returncode}")
    return dt


def main():
    wd = sys.argv[1] if len(sys.argv) > 1 else "build/fused_cli"
    os.makedirs(wd, exist_ok=True)
    inp = os.path.join(wd, "input.bin")
    data = build_input(inp)
    mb = len(data) / 1e6
    flags = ["-b8", "-m3", "-f0", "-u960", "-c16", "-L4", "-S8", "-Sa"]
    py = [sys.executable, "-u", "-m", "jampack_tpu.cli"]

    # host-native reference archive (the byte contract)
    t_h = run(py + ["c", inp, f"{wd}/host.jt3"] + flags + ["--engine=native"])
    # fused mesh encode on the chip
    t_e = run(py + ["c", inp, f"{wd}/fused.jt3"] + flags + ["--engine=fused"])
    with open(f"{wd}/host.jt3", "rb") as a, open(f"{wd}/fused.jt3",
                                                 "rb") as b:
        same = a.read() == b.read()
    print(f"archive bytes identical to host encoder: {same}")
    if not same:
        raise SystemExit("BYTE CONTRACT VIOLATION")
    # span words must genuinely mix (records block kept, others skipped)
    from jampack_tpu.format import framing

    spans = []
    with open(f"{wd}/fused.jt3", "rb") as f:
        while True:
            rec = framing.read_block(f, want_payload=False)
            if rec is None:
                break
            spans.append(rec[0].lpx_spans)
    print(f"per-block span words: {spans}")
    assert 0 in spans and 8 in spans, "gate did not split on this input"

    # fused mesh decode on the chip (span-word groups)
    t_d = run(py + ["d", f"{wd}/fused.jt3", f"{wd}/fused.out",
                    "--engine=fused"])
    with open(f"{wd}/fused.out", "rb") as f:
        ok = f.read() == data
    print(f"decode bit-exact: {ok}")
    if not ok:
        raise SystemExit("DECODE MISMATCH")
    print(json.dumps({
        "mb": round(mb, 1), "blocks": len(spans), "spans": spans,
        "enc_native_s": round(t_h, 1), "enc_fused_s": round(t_e, 1),
        "dec_fused_s": round(t_d, 1),
        "enc_fused_mbps": round(mb / t_e, 2),
        "dec_fused_mbps": round(mb / t_d, 2)}))


if __name__ == "__main__":
    main()
