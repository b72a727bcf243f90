"""Wide (lane-vectorized) TPU rANS decoder.

decode_chunk_syms (rans_decode.py) decodes one chain with proper scalar
control flow; under jax.vmap its lax.cond turns into a select, so the
expensive quasi rescale body runs every step for every lane.  This kernel
instead carries the lane dimension explicitly: all model banks get a
leading L axis, symbol lookups are vectorized compares, and the quasi
rescale hides behind ONE scalar predicate ("does any active lane rescale
this step") so its cost is paid only on the steps that need it — early in
a chunk while the update period is still doubling (model.cpp:160-204),
then once per 64K quasi symbols per lane.

Bit-exact with rans_common / stages.models: int32 mixing shifts, the
unsigned rescale stretch, truncating division, byte-renorm order.
Lanes of unequal length freeze (no byte consumption, no model updates)
once exhausted so their final-state invariant still holds.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..format.constants import (
    MODEL_SWITCH_THRESHOLD,
    PROB_BITS,
    PROB_SCALE,
    RANS_BYTE_L,
)
from ..format.tables import EXPONENT
from .rans_common import (
    EXP_INIT,
    EXP_MIX,
    MANT_ADAPT_INIT,
    MANT_ADAPT_MIX,
    NQ,
    QALPHA,
    QALPHAS,
    QMASK,
    QUASI_INIT_CUM,
    RATE,
    UPDATE_RATE,
)

_NSW = MODEL_SWITCH_THRESHOLD  # 2 adaptive mantissa models


def _find(cum_rows, rng):
    """searchsorted(side='right') - 1 on monotone rows: count(cum <= rng)."""
    return (
        jnp.sum(cum_rows <= rng[:, None], axis=1).astype(jnp.int32) - 1
    )


@partial(jax.jit, static_argnames=("max_rlen",))
def decode_lanes_wide(buf: jnp.ndarray, starts: jnp.ndarray,
                      rlens: jnp.ndarray, max_rlen: int):
    """Decode L independent chains in lockstep.

    buf: uint8 stream; starts/rlens: (L,) per-chain payload offsets and
    symbol counts.  Returns (syms (L, max_rlen) uint16, ok (L,) bool).
    """
    L = starts.shape[0]
    buf = buf.astype(jnp.uint32)
    mask16 = jnp.uint32(PROB_SCALE - 1)
    l_idx = jnp.arange(L, dtype=jnp.int32)

    def read32(p):
        return buf[p] | (buf[p + 1] << 8) | (buf[p + 2] << 16) | (buf[p + 3] << 24)

    R = jnp.stack([read32(starts + 4 * i) for i in range(4)], axis=1)  # (L,4)
    R = R.astype(jnp.uint32)
    ptr = starts + 16

    exp_cum = jnp.broadcast_to(jnp.asarray(EXP_INIT), (L, 9)).astype(jnp.int32)
    ma_cum = jnp.broadcast_to(jnp.asarray(MANT_ADAPT_INIT), (L, _NSW, 3)).astype(jnp.int32)
    q_cum = jnp.broadcast_to(jnp.asarray(QUASI_INIT_CUM), (L, NQ, QALPHA + 1)).astype(jnp.int32)
    q_freqs = jnp.zeros((L, NQ, QALPHA), dtype=jnp.int32)
    q_seen = jnp.zeros((L, NQ), dtype=jnp.int32)
    q_exp = jnp.full((L, NQ), 8, dtype=jnp.int32)

    exp_mix = jnp.asarray(EXP_MIX)              # (8, 9)
    ma_mix = jnp.asarray(MANT_ADAPT_MIX)        # (2, 2, 3)
    q_alphas = jnp.asarray(QALPHAS)             # (6,)
    q_mask = jnp.asarray(QMASK)                 # (6, 129)
    exponent = jnp.asarray(EXPONENT.astype(np.int32))
    syms = jnp.zeros((L, max_rlen), dtype=jnp.uint16)

    def renorm(x, ptr, active):
        for _ in range(3):
            need = active & (x < RANS_BYTE_L)
            x = jnp.where(need, (x << 8) | buf[ptr], x)
            ptr = jnp.where(need, ptr + 1, ptr)
        return x, ptr

    def advance(x, lo, fq):
        return (
            fq.astype(jnp.uint32) * (x >> PROB_BITS)
            + (x & mask16)
            - lo.astype(jnp.uint32)
        )

    def body(i, carry):
        (R, ptr, exp_cum, ma_cum, q_cum, q_freqs, q_seen, q_exp, syms) = carry
        active = i < rlens

        # ---- exponent symbol (adaptive, alpha = 8)
        x = R[:, 0]
        rng = (x & mask16).astype(jnp.int32)
        e = _find(exp_cum, rng)
        lo = jnp.take_along_axis(exp_cum, e[:, None], axis=1)[:, 0]
        hi = jnp.take_along_axis(exp_cum, e[:, None] + 1, axis=1)[:, 0]
        x2 = advance(x, lo, hi - lo)
        x2, ptr = renorm(x2, ptr, active)
        # adaptive CDF mixing (interior entries only), frozen when inactive
        mix_rows = exp_mix[e]
        upd = exp_cum + ((mix_rows - exp_cum) >> RATE)
        interior = (jnp.arange(9) > 0) & (jnp.arange(9) < 8)
        exp_cum = jnp.where(active[:, None] & interior[None, :], upd, exp_cum)
        R = jnp.concatenate(
            [R[:, 1:], jnp.where(active, x2, R[:, 0])[:, None]], axis=1
        )

        # ---- mantissa symbol
        x = R[:, 0]
        rng = (x & mask16).astype(jnp.int32)
        is_adaptive = e < _NSW
        ei = jnp.clip(e, 0, _NSW - 1)
        qi = jnp.clip(e - _NSW, 0, NQ - 1)

        # model-row selection by k-way select, NOT take_along_axis: a
        # random gather over the (L, NQ, 130) bank costs ~100 ms/step at
        # tens of thousands of lanes on this platform (CLAUDE.md facts);
        # NQ/NSW are tiny static counts so masked selects are ~free VPU ops
        ma_rows = jnp.where(
            (ei == 0)[:, None], ma_cum[:, 0], ma_cum[:, 1]
        )  # (L, 3)
        q_rows = q_cum[:, 0]
        for k in range(1, NQ):
            q_rows = jnp.where((qi == k)[:, None], q_cum[:, k], q_rows)
        m_a = _find(ma_rows, rng)
        m_q = _find(q_rows, rng)
        m = jnp.where(is_adaptive, m_a, m_q)
        lo_a = jnp.take_along_axis(ma_rows, m_a[:, None], axis=1)[:, 0]
        hi_a = jnp.take_along_axis(ma_rows, m_a[:, None] + 1, axis=1)[:, 0]
        lo_q = jnp.take_along_axis(q_rows, m_q[:, None], axis=1)[:, 0]
        hi_q = jnp.take_along_axis(q_rows, m_q[:, None] + 1, axis=1)[:, 0]
        lo = jnp.where(is_adaptive, lo_a, lo_q)
        fq = jnp.where(is_adaptive, hi_a - lo_a, hi_q - lo_q)
        x2 = advance(x, lo, fq)
        x2, ptr = renorm(x2, ptr, active)
        R = jnp.concatenate(
            [R[:, 1:], jnp.where(active, x2, R[:, 0])[:, None]], axis=1
        )

        # ---- adaptive mantissa update (alpha = 2: interior entry is col 1)
        a_upd = active & is_adaptive
        mix_a = ma_mix[ei, jnp.clip(m_a, 0, 1)]  # (L, 3)
        new_rows = ma_rows + ((mix_a - ma_rows) >> RATE)
        interior3 = (jnp.arange(3) == 1)
        new_rows = jnp.where(interior3[None, :], new_rows, ma_rows)
        new_rows = jnp.where(a_upd[:, None], new_rows, ma_rows)
        # static-slice writes per model (2-way) instead of a scatter
        ma_cum = jnp.stack(
            [jnp.where((a_upd & (ei == k))[:, None], new_rows, ma_cum[:, k])
             for k in range(_NSW)], axis=1)

        # ---- quasi mantissa count/seen updates (masked adds per model)
        q_upd = active & jnp.logical_not(is_adaptive)
        hit_col = jnp.arange(QALPHA)[None, :] == m_q[:, None]  # (L, 129)
        q_freqs = jnp.stack(
            [q_freqs[:, k]
             + jnp.where((q_upd & (qi == k))[:, None] & hit_col,
                         jnp.int32(PROB_BITS), 0)
             for k in range(NQ)], axis=1)
        nq_col = jnp.arange(NQ)[None, :]
        q_hit = (nq_col == qi[:, None]) & q_upd[:, None]  # (L, NQ)
        q_seen = q_seen + q_hit.astype(jnp.int32)
        seen_row = jnp.sum(jnp.where(q_hit, q_seen, 0), axis=1)
        exp_row = jnp.sum(jnp.where(q_hit, q_exp, 0), axis=1)

        # ---- quasi rescale behind ONE scalar predicate
        pred = q_upd & (seen_row > exp_row)

        def rescale(args):
            q_freqs, q_cum, q_seen, q_exp = args
            qf = q_freqs[:, 0]                          # (L, 129) via select
            for k in range(1, NQ):
                qf = jnp.where((qi == k)[:, None], q_freqs[:, k], qf)
            alpha = q_alphas[qi]                        # (L,)
            lanes = q_mask[qi]                          # (L, 129)
            total = jnp.sum(qf * lanes, axis=1)
            # smallest log with (total>>log)+alpha <= 2^16; fori keeps the
            # traced body small (this unrolled 21x dominated compile time)
            logv = jax.lax.fori_loop(
                0, 21,
                lambda _, lv: lv
                + (((total >> lv) + alpha) > PROB_SCALE).astype(jnp.int32),
                jnp.zeros_like(total),
            )
            f = jnp.where(lanes, (qf >> logv[:, None]) + 1, 0)
            t2 = jnp.sum(f, axis=1)
            # model.cpp:183 is UNSIGNED arithmetic; product < 2^32: exact
            prod = f.astype(jnp.uint32) << PROB_BITS
            q = (prod // t2[:, None].astype(jnp.uint32)).astype(jnp.int32)
            fix = PROB_SCALE - jnp.sum(q * lanes, axis=1)
            q = q.at[:, 0].add(fix)
            q = jnp.where(lanes, q, 0)
            cum = jnp.concatenate(
                [jnp.zeros((L, 1), jnp.int32), jnp.cumsum(q, axis=1)], axis=1
            )
            cum = jnp.where(
                jnp.arange(QALPHA + 1)[None, :] <= alpha[:, None],
                cum,
                jnp.int32(1 << 30),
            )
            # masked static-slice writes per model (no scatters)
            rowm = [(pred & (qi == k))[:, None] for k in range(NQ)]
            q_cum = jnp.stack(
                [jnp.where(rowm[k], cum, q_cum[:, k]) for k in range(NQ)],
                axis=1)
            q_freqs = jnp.stack(
                [jnp.where(rowm[k], 0, q_freqs[:, k]) for k in range(NQ)],
                axis=1)
            resc_hit = (nq_col == qi[:, None]) & pred[:, None]  # (L, NQ)
            q_seen = jnp.where(resc_hit, 0, q_seen)
            new_exp = jnp.where(q_exp < UPDATE_RATE, q_exp << 1, UPDATE_RATE)
            q_exp = jnp.where(resc_hit, new_exp, q_exp)
            return q_freqs, q_cum, q_seen, q_exp

        q_freqs, q_cum, q_seen, q_exp = jax.lax.cond(
            jnp.any(pred), rescale, lambda a: a,
            (q_freqs, q_cum, q_seen, q_exp),
        )

        sym = (exponent[e] + m).astype(jnp.uint16)
        syms = syms.at[:, i].set(jnp.where(active, sym, syms[:, i]))
        return (R, ptr, exp_cum, ma_cum, q_cum, q_freqs, q_seen, q_exp, syms)

    init = (R, ptr, exp_cum, ma_cum, q_cum, q_freqs, q_seen, q_exp, syms)
    # traced bound: max_rlen is only the (bucketed) output width, so shape
    # padding costs zero loop steps and compile variants stay bounded
    steps = jnp.minimum(jnp.maximum(jnp.max(rlens), 0), max_rlen)
    out = jax.lax.fori_loop(0, steps, body, init)
    R, syms = out[0], out[-1]
    # rlens < 0 marks batch-padding lanes (no chain there at all)
    ok = jnp.all(R == jnp.uint32(RANS_BYTE_L), axis=1) | (rlens < 0)
    return syms, ok
