"""TPU structured-rANS chunk decoder.

One chunk is an irreducibly serial chain (adaptive models update per
symbol), so the kernel is a `fori_loop` whose body does alphabet-wide
*vector* work: CDF mixing updates (<=129-wide VPU ops), searchsorted
symbol lookups, and mask-unrolled byte renormalization.  Throughput comes
from chunk parallelism (P5/P6 of the survey): many chunks decode
concurrently via `jax.vmap` across the padded chunk batch — thousands per
pod once blocks are sharded.

Bit-exact contract: identical int32 semantics to stages/models.py (and thus
to the reference's model.cpp / rans_byte.hpp / ans.cpp decode loop).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..format.constants import (
    MAX_MODELS,
    MODEL_SWITCH_THRESHOLD,
    PROB_BITS,
    PROB_SCALE,
    RANS_BYTE_L,
)
from ..format.tables import EXPONENT, MODEL_ALPHABET

RATE = 5
UPDATE_RATE = 64 << 10
_QALPHA = 129  # widest quasi alphabet; all quasi state padded to this
_NQ = MAX_MODELS - MODEL_SWITCH_THRESHOLD  # 6 quasi models (e = 2..7)
_QALPHAS = np.asarray(MODEL_ALPHABET[MODEL_SWITCH_THRESHOLD:], dtype=np.int32)


def _adaptive_mix(alpha: int) -> np.ndarray:
    rows = np.ones((alpha, alpha + 1), dtype=np.int64)
    rows[:, 0] = 0
    for sym in range(alpha):
        rows[sym, sym + 1] += PROB_SCALE - alpha
    return np.cumsum(rows, axis=1).astype(np.int32)


def _adaptive_init(alpha: int) -> np.ndarray:
    scale = PROB_SCALE // alpha
    freqs = np.full(alpha, scale, dtype=np.int64)
    freqs[0] += PROB_SCALE - scale * alpha
    return np.concatenate([[0], np.cumsum(freqs)]).astype(np.int32)


def _quasi_init_cum() -> np.ndarray:
    """Initial padded cum tables for the 6 quasi models, padding = huge."""
    out = np.full((_NQ, _QALPHA + 1), 1 << 30, dtype=np.int32)
    for i, alpha in enumerate(_QALPHAS):
        scale = PROB_SCALE // int(alpha)
        freqs = np.full(alpha, scale, dtype=np.int64)
        freqs[0] += PROB_SCALE - scale * int(alpha)
        out[i, : alpha + 1] = np.concatenate([[0], np.cumsum(freqs)])
    return out


# Constant tables (device-resident after first jit).
_EXP_MIX = _adaptive_mix(MAX_MODELS)
_EXP_INIT = _adaptive_init(MAX_MODELS)
_MANT_ADAPT_MIX = np.stack([
    np.pad(_adaptive_mix(int(MODEL_ALPHABET[e])), ((0, 0), (0, 0)))
    for e in range(MODEL_SWITCH_THRESHOLD)
])  # alphas are both 2 -> shape (2, 2, 3)
_MANT_ADAPT_INIT = np.stack([
    _adaptive_init(int(MODEL_ALPHABET[e])) for e in range(MODEL_SWITCH_THRESHOLD)
])
_QUASI_INIT_CUM = _quasi_init_cum()
_QMASK = (np.arange(_QALPHA)[None, :] < _QALPHAS[:, None])  # (6, 129) valid lanes


def _renorm(x, ptr, buf):
    """Unrolled byte renormalization (max 2 refills from a normalized state)."""
    for _ in range(3):
        need = x < RANS_BYTE_L
        x = jnp.where(need, (x << 8) | buf[ptr].astype(jnp.uint32), x)
        ptr = jnp.where(need, ptr + 1, ptr)
    return x, ptr


@partial(jax.jit, static_argnames=("max_rlen",))
def decode_chunk_syms(buf: jnp.ndarray, start: jnp.ndarray, rlen: jnp.ndarray,
                      max_rlen: int) -> jnp.ndarray:
    """Decode the structured 16-bit symbols of one chunk.

    buf: uint8 array containing the rANS payload at offset `start`
    rlen: number of symbols; max_rlen: static padded loop bound.
    Returns uint16 symbols padded to max_rlen.
    """
    buf = buf.astype(jnp.uint32)
    mask16 = jnp.uint32(PROB_SCALE - 1)

    # init 4 interleaved states (little-endian 4-byte each)
    def read32(p):
        return (buf[p] | (buf[p + 1] << 8) | (buf[p + 2] << 16) | (buf[p + 3] << 24))

    R = jnp.stack([read32(start + 4 * i) for i in range(4)]).astype(jnp.uint32)
    ptr = start + 16

    exp_cum = jnp.asarray(_EXP_INIT)
    exp_mix = jnp.asarray(_EXP_MIX)
    ma_cum = jnp.asarray(_MANT_ADAPT_INIT)
    ma_mix = jnp.asarray(_MANT_ADAPT_MIX)
    q_cum = jnp.asarray(_QUASI_INIT_CUM)
    q_freqs = jnp.zeros((_NQ, _QALPHA), dtype=jnp.int32)
    q_seen = jnp.zeros(_NQ, dtype=jnp.int32)
    q_exp = jnp.full(_NQ, 8, dtype=jnp.int32)
    q_alphas = jnp.asarray(_QALPHAS)
    q_mask = jnp.asarray(_QMASK)
    exponent = jnp.asarray(EXPONENT.astype(np.int32))

    syms = jnp.zeros(max_rlen, dtype=jnp.uint16)

    def adaptive_update(cum, mix_row):
        upd = cum + ((mix_row - cum) >> RATE)
        n = cum.shape[0]
        keep = (jnp.arange(n) == 0) | (jnp.arange(n) == n - 1)
        return jnp.where(keep, cum, upd)

    def body(i, carry):
        R, ptr, exp_cum, ma_cum, q_cum, q_freqs, q_seen, q_exp, syms = carry

        # ---- exponent symbol (adaptive, alpha=8)
        x = R[0]
        rng = (x & mask16).astype(jnp.int32)
        e = jnp.searchsorted(exp_cum, rng, side="right").astype(jnp.int32) - 1
        lo = exp_cum[e]
        fq = exp_cum[e + 1] - lo
        x = fq.astype(jnp.uint32) * (x >> PROB_BITS) + (x & mask16) - lo.astype(jnp.uint32)
        x, ptr = _renorm(x, ptr, buf)
        exp_cum = adaptive_update(exp_cum, exp_mix[e])
        R = jnp.stack([R[1], R[2], R[3], x])

        # ---- mantissa symbol
        x = R[0]
        rng = (x & mask16).astype(jnp.int32)
        is_adaptive = e < MODEL_SWITCH_THRESHOLD
        ei = jnp.clip(e, 0, MODEL_SWITCH_THRESHOLD - 1)
        qi = jnp.clip(e - MODEL_SWITCH_THRESHOLD, 0, _NQ - 1)

        m_a = jnp.searchsorted(ma_cum[ei], rng, side="right").astype(jnp.int32) - 1
        m_q = jnp.searchsorted(q_cum[qi], rng, side="right").astype(jnp.int32) - 1
        m = jnp.where(is_adaptive, m_a, m_q)
        lo = jnp.where(is_adaptive, ma_cum[ei, m_a], q_cum[qi, m_q])
        hi = jnp.where(is_adaptive, ma_cum[ei, m_a + 1], q_cum[qi, m_q + 1])
        fq = hi - lo
        x = fq.astype(jnp.uint32) * (x >> PROB_BITS) + (x & mask16) - lo.astype(jnp.uint32)
        x, ptr = _renorm(x, ptr, buf)
        R = jnp.stack([R[1], R[2], R[3], x])

        # ---- adaptive mantissa update (masked when quasi)
        new_ma = adaptive_update(ma_cum[ei], ma_mix[ei, jnp.clip(m_a, 0, 1)])
        ma_cum = ma_cum.at[ei].set(jnp.where(is_adaptive, new_ma, ma_cum[ei]))

        # ---- quasi mantissa update (masked when adaptive)
        qf = q_freqs[qi].at[m_q].add(jnp.where(is_adaptive, 0, PROB_BITS))
        qs = q_seen[qi] + jnp.where(is_adaptive, 0, 1)
        alpha = q_alphas[qi]
        lanes = q_mask[qi]

        def rescale(args):
            qf, _qcum, qexp = args
            total = jnp.sum(qf * lanes)
            # smallest log with (total >> log) + alpha <= PROB_SCALE
            logv = jax.lax.while_loop(
                lambda lg: ((total >> lg) + alpha) > PROB_SCALE,
                lambda lg: lg + 1,
                jnp.int32(0),
            )
            f = jnp.where(lanes, (qf >> logv) + 1, 0)
            t2 = jnp.sum(f)
            # C-int32 wrap semantics of ProbScale * f / total (model.cpp:183):
            # int32 shift wraps exactly like C, and lax.div truncates toward 0
            prod = f << PROB_BITS
            q = jax.lax.div(prod, t2)
            q = q.at[0].add(PROB_SCALE - jnp.sum(q * lanes))
            q = jnp.where(lanes, q, 0)
            cum = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(q)])
            cum = jnp.where(
                jnp.arange(_QALPHA + 1) <= alpha, cum, jnp.int32(1 << 30)
            )
            new_exp = jnp.where(qexp < UPDATE_RATE, qexp << 1, UPDATE_RATE)
            return jnp.zeros_like(qf), cum, jnp.int32(0), new_exp

        def no_rescale(args):
            qf, qcum, qexp = args
            return qf, qcum, qs, qexp

        do_rescale = jnp.logical_and(jnp.logical_not(is_adaptive), qs > q_exp[qi])
        qf2, qcum2, qs2, qexp2 = jax.lax.cond(
            do_rescale, rescale, no_rescale, (qf, q_cum[qi], q_exp[qi])
        )
        q_freqs = q_freqs.at[qi].set(qf2)
        q_cum = q_cum.at[qi].set(qcum2)
        q_seen = q_seen.at[qi].set(qs2)
        q_exp = q_exp.at[qi].set(qexp2)

        sym = (exponent[e] + m).astype(jnp.uint16)
        syms = syms.at[i].set(sym)
        return R, ptr, exp_cum, ma_cum, q_cum, q_freqs, q_seen, q_exp, syms

    init = (R, ptr, exp_cum, ma_cum, q_cum, q_freqs, q_seen, q_exp, syms)
    R, ptr, *_, syms = jax.lax.fori_loop(0, rlen, body, init)
    ok = jnp.all(R == jnp.uint32(RANS_BYTE_L))
    return syms, ok


def decode_chunk_tpu(payload: np.ndarray, rlen: int) -> np.ndarray:
    """Host wrapper: decode one chunk's symbols on device."""
    buf = jnp.asarray(np.asarray(payload, dtype=np.uint8))
    max_rlen = int(rlen)
    syms, ok = decode_chunk_syms(buf, jnp.int32(0), jnp.int32(rlen), max_rlen)
    if not bool(ok):
        raise ValueError("invalid rANS state")
    return np.asarray(jax.device_get(syms))[:rlen]


@partial(jax.jit, static_argnames=("max_rlen",))
def _decode_lanes(buf, starts, rlens, max_rlen: int):
    """All lanes of a JTX wide-interleave chunk in lockstep: the serial
    model/rANS chain becomes an L-wide vector loop (survey P6, generalized
    from the reference's 4-state ILP interleave)."""
    return jax.vmap(
        lambda s, r: decode_chunk_syms(buf, s, r, max_rlen),
        in_axes=(0, 0),
    )(starts, rlens)


def decode_lanes_tpu(buf: np.ndarray, starts: np.ndarray,
                     rlens: np.ndarray) -> np.ndarray:
    """Host wrapper: decode every lane of one chunk on device.

    buf: the whole ANS stream; starts[l]: payload offset of lane l;
    rlens[l]: symbols owned by lane l.  Returns (L, max_rlen) uint16.
    """
    max_rlen = int(np.max(rlens)) if rlens.size else 0
    if max_rlen == 0:
        return np.zeros((len(starts), 0), dtype=np.uint16)
    syms, ok = _decode_lanes(
        jnp.asarray(np.asarray(buf, dtype=np.uint8)),
        jnp.asarray(starts, dtype=jnp.int32),
        jnp.asarray(rlens, dtype=jnp.int32),
        max_rlen,
    )
    if not bool(jnp.all(ok)):
        raise ValueError("invalid rANS state")
    return np.asarray(jax.device_get(syms))
