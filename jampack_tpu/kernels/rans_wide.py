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

Performance structure (measured on v5e):
  * model banks are per-model-width — the 6 quasi alphabets are
    [4,8,16,32,64,129], so carrying them at a shared 129-wide layout
    tripled every step's VPU work;
  * NO per-step gathers or scatters: model-row reads are masked
    reductions over monotone CDF rows (lo = max cum <= rng, hi = min
    cum > rng), model writes are k-way masked static-slice updates —
    random gather/scatter at tens of thousands of lanes costs ~100 ms
    per op on this platform;
  * the rescale's log search is a fori_loop (unrolled it dominated
    compile time).

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
    QALPHAS,
    QUASI_INIT_CUM,
    RATE,
    UPDATE_RATE,
)

_NSW = MODEL_SWITCH_THRESHOLD  # 2 adaptive mantissa models


def _find_lo_hi(rows, rng):
    """(m, lo, hi) on a monotone cum row batch without gathers:
    m = count(cum <= rng) - 1, lo = max cum <= rng, hi = min cum > rng."""
    le = rows <= rng[:, None]
    m = jnp.sum(le, axis=1).astype(jnp.int32) - 1
    lo = jnp.max(jnp.where(le, rows, jnp.int32(-1)), axis=1)
    hi = jnp.min(jnp.where(le, jnp.int32(1 << 30), rows), axis=1)
    return m, lo, hi


@partial(jax.jit, static_argnames=("max_rlen", "groups"))
def decode_lanes_wide(buf: jnp.ndarray, starts: jnp.ndarray,
                      rlens: jnp.ndarray, max_rlen: int, groups: int = 0):
    """Decode L independent chains in lockstep.

    buf: uint8 stream; starts/rlens: (L,) per-chain payload offsets and
    symbol counts.  Returns (syms (L, max_rlen) uint16, ok (L,) bool).

    With `groups` = G > 0 (G must divide L), the symbols are emitted
    directly in round-robin-undealt layout instead: (G, max_rlen * L//G)
    uint16 with chunk-row g's symbol j at column j — i.e. step i writes
    the (G, L//G) slab at columns [i*L//G, (i+1)*L//G).  This makes the
    consumer's per-chunk "lane undeal" a no-op: the reshape+transpose form
    of that undeal cost ~1.8 s per 8 MB block on this platform, the
    in-loop slab write costs nothing over the (L,) column write."""
    L = starts.shape[0]
    buf = buf.astype(jnp.uint32)
    mask16 = jnp.uint32(PROB_SCALE - 1)
    # 4-byte little-endian lookahead window at every position: the two
    # renorms of a step consume <= 4 sequential bytes total, so ONE window
    # gather per step replaces up to four byte gathers (gathers are the
    # per-step random-access cost; the window build is elementwise)
    bp = jnp.pad(buf, (0, 3))
    win = bp[:-3] | (bp[1:-2] << 8) | (bp[2:-1] << 16) | (bp[3:] << 24)

    def read32(p):
        return buf[p] | (buf[p + 1] << 8) | (buf[p + 2] << 16) | (buf[p + 3] << 24)

    R = jnp.stack([read32(starts + 4 * i) for i in range(4)], axis=1)  # (L,4)
    R = R.astype(jnp.uint32)
    ptr = starts + 16

    alphas = [int(a) for a in QALPHAS]  # (6,) static per-model widths
    exp_cum = jnp.broadcast_to(jnp.asarray(EXP_INIT), (L, 9)).astype(jnp.int32)
    ma_cum = jnp.broadcast_to(jnp.asarray(MANT_ADAPT_INIT), (L, _NSW, 3)).astype(jnp.int32)
    qc = tuple(
        jnp.broadcast_to(jnp.asarray(QUASI_INIT_CUM[k, : alphas[k] + 1]),
                         (L, alphas[k] + 1)).astype(jnp.int32)
        for k in range(NQ)
    )
    qf = tuple(jnp.zeros((L, alphas[k]), jnp.int32) for k in range(NQ))
    q_seen = jnp.zeros((L, NQ), dtype=jnp.int32)
    q_exp = jnp.full((L, NQ), 8, dtype=jnp.int32)

    exp_mix = jnp.asarray(EXP_MIX)              # (8, 9)
    ma_mix = jnp.asarray(MANT_ADAPT_MIX)        # (2, 2, 3)
    exponent = jnp.asarray(EXPONENT.astype(np.int32))
    if groups:
        assert L % groups == 0
        syms = jnp.zeros((groups, max_rlen, L // groups), dtype=jnp.uint16)
    else:
        syms = jnp.zeros((L, max_rlen), dtype=jnp.uint16)
    nq_col = jnp.arange(NQ)[None, :]

    def renorm(x, w, kb, active):
        # two refills always suffice: pre-advance x >= 2^23 and freq >= 1
        # give post-advance x >= 2^7, and 7 + 2*8 = 23 bits renormalizes.
        # Bytes come from the step's window w at local byte offset kb (< 4
        # over both renorms of a step by the bound above).
        for _ in range(2):
            need = active & (x < RANS_BYTE_L)
            byte = (w >> (kb << 3).astype(jnp.uint32)) & jnp.uint32(0xFF)
            x = jnp.where(need, (x << 8) | byte, x)
            kb = jnp.where(need, kb + 1, kb)
        return x, kb

    def advance(x, lo, fq):
        return (
            fq.astype(jnp.uint32) * (x >> PROB_BITS)
            + (x & mask16)
            - lo.astype(jnp.uint32)
        )

    def body(i, carry):
        (R, ptr, exp_cum, ma_cum, qc, qf, q_seen, q_exp, syms) = carry
        active = i < rlens
        w = win[ptr]  # the step's single payload gather
        kb = jnp.zeros_like(ptr)

        # ---- exponent symbol (adaptive, alpha = 8)
        x = R[:, 0]
        rng = (x & mask16).astype(jnp.int32)
        e, lo, hi = _find_lo_hi(exp_cum, rng)
        x2 = advance(x, lo, hi - lo)
        x2, kb = renorm(x2, w, kb, active)
        # adaptive CDF mixing (interior entries only), frozen when inactive;
        # 8-way select instead of exp_mix[e]: a (L,9) random gather per
        # step costs more than 8 masked row selects at wide L
        mix_rows = jnp.broadcast_to(exp_mix[0], (L, 9))
        for kk in range(1, 8):
            mix_rows = jnp.where((e == kk)[:, None], exp_mix[kk], mix_rows)
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

        ma_rows = jnp.where(
            (ei == 0)[:, None], ma_cum[:, 0], ma_cum[:, 1]
        )  # (L, 3)
        m_a, lo_a, hi_a = _find_lo_hi(ma_rows, rng)
        m_ks, lo_ks, hi_ks = [], [], []
        for k in range(NQ):
            mk, lok, hik = _find_lo_hi(qc[k], rng)
            m_ks.append(mk)
            lo_ks.append(lok)
            hi_ks.append(hik)
        m_q, lo_q, hi_q = m_ks[0], lo_ks[0], hi_ks[0]
        for k in range(1, NQ):
            sel = qi == k
            m_q = jnp.where(sel, m_ks[k], m_q)
            lo_q = jnp.where(sel, lo_ks[k], lo_q)
            hi_q = jnp.where(sel, hi_ks[k], hi_q)
        m = jnp.where(is_adaptive, m_a, m_q)
        lo = jnp.where(is_adaptive, lo_a, lo_q)
        fq = jnp.where(is_adaptive, hi_a - lo_a, hi_q - lo_q)
        x2 = advance(x, lo, fq)
        x2, kb = renorm(x2, w, kb, active)
        ptr = ptr + kb
        R = jnp.concatenate(
            [R[:, 1:], jnp.where(active, x2, R[:, 0])[:, None]], axis=1
        )

        # ---- adaptive mantissa update (alpha = 2: interior entry is col 1)
        a_upd = active & is_adaptive
        m_a01 = jnp.clip(m_a, 0, 1)
        mix_a = jnp.broadcast_to(ma_mix[0, 0], (L, 3))  # 4-way select
        for ii in range(2):
            for jj in range(2):
                if ii == 0 and jj == 0:
                    continue
                mix_a = jnp.where(((ei == ii) & (m_a01 == jj))[:, None],
                                  ma_mix[ii, jj], mix_a)
        new_rows = ma_rows + ((mix_a - ma_rows) >> RATE)
        interior3 = (jnp.arange(3) == 1)
        new_rows = jnp.where(interior3[None, :], new_rows, ma_rows)
        new_rows = jnp.where(a_upd[:, None], new_rows, ma_rows)
        ma_cum = jnp.stack(
            [jnp.where((a_upd & (ei == k))[:, None], new_rows, ma_cum[:, k])
             for k in range(_NSW)], axis=1)

        # ---- quasi mantissa count/seen updates (masked adds per model)
        q_upd = active & jnp.logical_not(is_adaptive)
        qf = tuple(
            qf[k]
            + jnp.where(
                (q_upd & (qi == k))[:, None]
                & (jnp.arange(alphas[k])[None, :] == m_ks[k][:, None]),
                jnp.int32(PROB_BITS), 0)
            for k in range(NQ)
        )
        q_hit = (nq_col == qi[:, None]) & q_upd[:, None]  # (L, NQ)
        q_seen = q_seen + q_hit.astype(jnp.int32)
        seen_row = jnp.sum(jnp.where(q_hit, q_seen, 0), axis=1)
        exp_row = jnp.sum(jnp.where(q_hit, q_exp, 0), axis=1)

        # ---- quasi rescale behind ONE scalar predicate
        pred = q_upd & (seen_row > exp_row)

        def rescale(args):
            qc, qf, q_seen, q_exp = args
            new_qc, new_qf = [], []
            for k in range(NQ):
                alpha = alphas[k]
                qfk = qf[k]                                 # (L, alpha)
                total = jnp.sum(qfk, axis=1)
                # smallest log with (total>>log)+alpha <= 2^16; fori keeps
                # the traced body small
                logv = jax.lax.fori_loop(
                    0, 21,
                    lambda _, lv: lv
                    + (((total >> lv) + alpha) > PROB_SCALE).astype(jnp.int32),
                    jnp.zeros_like(total),
                )
                f = (qfk >> logv[:, None]) + 1
                t2 = jnp.sum(f, axis=1)
                # model.cpp:183 is UNSIGNED; product < 2^32: exact
                prod = f.astype(jnp.uint32) << PROB_BITS
                q = (prod // t2[:, None].astype(jnp.uint32)).astype(jnp.int32)
                fix = PROB_SCALE - jnp.sum(q, axis=1)
                q = q.at[:, 0].add(fix)
                cum = jnp.concatenate(
                    [jnp.zeros((L, 1), jnp.int32), jnp.cumsum(q, axis=1)],
                    axis=1)
                rowm = (pred & (qi == k))[:, None]
                new_qc.append(jnp.where(rowm, cum, qc[k]))
                new_qf.append(jnp.where(rowm, 0, qfk))
            resc_hit = (nq_col == qi[:, None]) & pred[:, None]  # (L, NQ)
            q_seen = jnp.where(resc_hit, 0, q_seen)
            new_exp = jnp.where(q_exp < UPDATE_RATE, q_exp << 1, UPDATE_RATE)
            q_exp = jnp.where(resc_hit, new_exp, q_exp)
            return tuple(new_qc), tuple(new_qf), q_seen, q_exp

        qc, qf, q_seen, q_exp = jax.lax.cond(
            jnp.any(pred), rescale, lambda a: a,
            (qc, qf, q_seen, q_exp),
        )

        base = jnp.zeros_like(e)  # 8-way select of EXPONENT[e]
        for kk in range(1, 8):
            base = jnp.where(e == kk, jnp.int32(int(EXPONENT[kk])), base)
        sym = (base + m).astype(jnp.uint16)
        # each column is written exactly once and the buffer starts zeroed,
        # so inactive lanes store 0 — no read of the old value needed
        sym = jnp.where(active, sym, 0)
        if groups:
            syms = syms.at[:, i, :].set(sym.reshape(groups, L // groups))
        else:
            syms = syms.at[:, i].set(sym)
        return (R, ptr, exp_cum, ma_cum, qc, qf, q_seen, q_exp, syms)

    init = (R, ptr, exp_cum, ma_cum, qc, qf, q_seen, q_exp, syms)
    # traced bound: max_rlen is only the (bucketed) output width, so shape
    # padding costs zero loop steps and compile variants stay bounded
    steps = jnp.minimum(jnp.maximum(jnp.max(rlens), 0), max_rlen)
    out = jax.lax.fori_loop(0, steps, body, init)
    R, syms = out[0], out[-1]
    if groups:
        syms = syms.reshape(groups, max_rlen * (L // groups))
    # rlens < 0 marks batch-padding lanes (no chain there at all)
    ok = jnp.all(R == jnp.uint32(RANS_BYTE_L), axis=1) | (rlens < 0)
    return syms, ok
