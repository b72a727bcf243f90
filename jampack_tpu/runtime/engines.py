"""Engine implementations for the block pipeline.

- Engine (runtime.pipeline): pure Python/numpy executable spec.
- TpuEngine: BWT forward/inverse and rANS symbol decode on device via the
  JAX/XLA kernels; remaining serial transforms on host (the native C++
  engine takes those over — see native/).
"""

import numpy as np

from ..runtime.pipeline import Engine
from ..stages.ans import read_chunk_header
from ..stages.rank import rank_decode
from ..stages.rle0 import rle0_decode


class TpuEngine(Engine):
    name = "tpu"

    def bwt_forward(self, data):
        from ..kernels.sa import forward_bwt_tpu

        return forward_bwt_tpu(data)

    def bwt_inverse(self, data):
        from ..kernels.ibwt import inverse_bwt_tpu

        return inverse_bwt_tpu(data)

    def ans_decode(self, data):
        from ..kernels.rans_decode import decode_chunk_tpu

        buf = np.asarray(data, dtype=np.uint8)
        view = memoryview(buf.tobytes())
        pos = 0
        parts = []
        while pos < len(view):
            freqs, olen, clen, rlen, pos = read_chunk_header(view, pos)
            syms = decode_chunk_tpu(buf[pos : pos + clen], rlen)
            ranked = rle0_decode(syms, olen)
            parts.append(rank_decode(ranked, freqs))
            pos += clen
        return np.concatenate(parts) if parts else np.zeros(0, dtype=np.uint8)
