"""Pallas VMEM-resident wide rANS decode step.

decode_lanes_wide (rans_wide.py) is bit-exact but DATA-bound on this
platform: its loop body materializes a dozen (L, 256) intermediates in HBM
per symbol step (measured ~linear in L at fixed total work — BASELINE.md
round-3 lanes sweep), so the 8 MB bench block spends ~1.6 s in the entropy
stage alone.  This kernel runs the ENTIRE step body — model-bank range
search, rANS advance + renorm, adaptive CDF mixing, quasi counts and the
quasi rescale — inside ONE Pallas program per lane block, so HBM sees only
the loop-carried state (bank, quasi freqs, seen/exp, rANS registers) once
per step and every intermediate lives in VMEM.  The one per-step random
access, the payload window fetch win[ptr], stays on the XLA side (Mosaic
has no VMEM vector gather on this platform) and feeds the kernel as four
byte planes.

Layout: lanes-minor.  The model bank is (256, L) — the transpose of
rans_wide's (L, 256) — so per-lane scalars are (1, L) rows (VPU-friendly)
and bank segments are STATIC row ranges.  Per-model segment sums lower to
MXU contractions with static 0/1 indicator matrices whose operands are
byte-plane splits (every bf16 addend is an integer <= 256, every f32
partial sum < 2^24: exact by construction, same argument as rans_wide).

The quasi rescale (model.cpp:160-204 semantics via stages/models) runs
EVERY step, masked to the lanes that actually rescale: at tens of
thousands of lockstep lanes some lane rescales nearly every step, so the
scalar any-lane cond that rans_wide uses would fire continuously anyway —
predication is cheaper than a branch here.  Its exact integer division
floor((f << 16) / t2) is computed in f32 with an integer remainder fixup
(_div_fix16: quotient <= 2^16 so one correctly-rounded multiply puts the
estimate within 2^-7 of truth; two guard rounds absorb an approximate
VPU reciprocal), property-tested against the uint32 reference division.

Bit-exact with decode_lanes_wide / stages.models: int32 mixing shifts,
unsigned rescale stretch, truncating division, byte-renorm order, frozen
exhausted lanes.  Reference semantics: ans.cpp:152-208, model.cpp:60-204.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format.constants import PROB_BITS, PROB_SCALE, RANS_BYTE_L
from ..format.tables import EXPONENT
from .rans_common import NQ, RATE, UPDATE_RATE
from .rans_wide import (
    _ALPHAS,
    _BANK_INIT,
    _BOFF,
    _NSW,
    _QALPHA_L,
    _QOFF,
    _SEG_ID,
    _SEG_START,
)
from .rans_wide import EXP_MIX  # re-exported via rans_common import there

_BCOLS = 256
_LB = 1024  # lanes per Pallas program (VMEM working set ~8 MB at 1024)

# ---------------------------------------------------------------------------
# Static row-space tables (numpy, baked once).

# Q space: 253 rows = one row per quasi symbol, models in order, padded to
# 256.  Row r of quasi model k is r - _QOFF[k] within the model.
_QROWS = int(_QOFF[-1])  # 253
_qrow_model = np.full(_BCOLS, 7, np.int32)          # 7 = pad (never matches)
_qrow_within = np.zeros(_BCOLS, np.int32)
for _k in range(NQ):
    _a = _QALPHA_L[_k]
    _qrow_model[_QOFF[_k]:_QOFF[_k] + _a] = _k
    _qrow_within[_QOFF[_k]:_QOFF[_k] + _a] = np.arange(_a)

# per-row constants, one (256, 8) i32 operand
_ROWC = np.zeros((_BCOLS, 8), np.int32)
_ROWC[:, 0] = _SEG_START.astype(np.int32)   # bank-space segment start
_ROWC[:, 1] = _SEG_ID                        # bank-space model id (0..8)
_ROWC[:, 2] = _qrow_model                    # Q-space model id (0..5, 7=pad)
_ROWC[:, 3] = _qrow_within                   # Q-space symbol index
_ROWC[:, 4] = (np.arange(_BCOLS) - _BOFF[_SEG_ID]).astype(np.int32)
#                                            # bank-space within-segment idx

# (16, 256) bank-space per-model segment indicators (rows 9..15 zero)
_SEGBT = np.zeros((16, _BCOLS), np.float32)
_SEGBT[_SEG_ID, np.arange(_BCOLS)] = 1.0
# (16, 256) Q-space per-model indicators (rows 6..15 zero)
_SEGQT = np.zeros((16, _BCOLS), np.float32)
for _k in range(NQ):
    _SEGQT[_k, _QOFF[_k]:_QOFF[_k] + _QALPHA_L[_k]] = 1.0

# (256, 256) Q->bank within-segment cumulative map: bank interior row
# b0_k + t  =  sum of q rows q0_k .. q0_k + t (t <= alpha_k - 2)
_CUMT = np.zeros((_BCOLS, _BCOLS), np.float32)
for _r in range(_BCOLS):
    _sid = int(_SEG_ID[_r])
    if _sid >= 3:
        _k = _sid - 3
        _t = _r - int(_BOFF[_sid])
        _CUMT[_r, int(_QOFF[_k]):int(_QOFF[_k]) + _t + 1] = 1.0

# (256, 8) exponent-model mix targets: column e holds EXP_MIX[e][1..7] on
# rows 0..6 (the exp model's interior bank rows)
_MIXB = np.zeros((_BCOLS, 8), np.int32)
_MIXB[:7, :] = np.asarray(EXP_MIX)[:, 1:8].T

_EXP_BASE = [int(EXPONENT[k]) for k in range(8)]

# adaptive-mantissa interior mix scalars [ei][m01] (rans_wide ma_mix_i)
from .rans_common import MANT_ADAPT_MIX as _MAM
_MA_MIX = [[int(_MAM[i, j, 1]) for j in range(2)] for i in range(2)]


def _div_fix16(f, t2):
    """floor((f << 16) / t2) elementwise, exact.

    f, t2: int32, 0 <= f <= 2^16, 1 <= t2 <= 2^16 (garbage rows may violate
    f <= t2; the result is then still the exact floor quotient as long as
    f <= 2^16, since q <= 2^32/t2 only matters via q*t2 wraparound — with
    f <= 2^16 the quotient q <= 2^16 * 2^16 / t2 and |r| stays < 2^31).

    N = f * 2^16 is EXACT in f32 (f is exact below 2^24; scaling by a power
    of two is exact).  q0 = fl(N * fl(1/t2)) has relative error <= 2^-23
    from two correctly-rounded ops, i.e. absolute error <= q * 2^-23; two
    integer remainder rounds per direction absorb that plus a ~1e-5-grade
    approximate reciprocal."""
    t2f = t2.astype(jnp.float32)
    rcp = 1.0 / t2f
    n32 = f << 16                       # mod 2^32; true N < 2^32
    q = jnp.floor(f.astype(jnp.float32) * 65536.0 * rcp).astype(jnp.int32)
    r = n32 - q * t2                    # exact: |true r| < 2^31
    # one f32 correction knocks the residual to a few t2
    e = jnp.floor(r.astype(jnp.float32) * rcp).astype(jnp.int32)
    q = q + e
    r = r - e * t2
    for _ in range(2):                  # guard rounds (each direction)
        under = r < 0
        q = jnp.where(under, q - 1, q)
        r = jnp.where(under, r + t2, r)
    for _ in range(2):
        over = r >= t2
        q = jnp.where(over, q + 1, q)
        r = jnp.where(over, r - t2, r)
    return q


def _bplanes(x, hi_shift=8):
    """bf16 byte planes of a nonnegative int32 array (values <= 2^16):
    (x & 0xff, x >> 8); both planes <= 256, exact in bf16."""
    return ((x & 0xFF).astype(jnp.bfloat16),
            (x >> hi_shift).astype(jnp.bfloat16))


def _seg_dot(mat, lo_p, hi_p):
    """Per-model segment sums via two exact bf16 MXU contractions:
    mat (16, 256) bf16 indicator, planes (256, Lb).  Returns (16, Lb) i32."""
    s_lo = jax.lax.dot_general(
        mat, lo_p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s_hi = jax.lax.dot_general(
        mat, hi_p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return s_lo.astype(jnp.int32) + (s_hi.astype(jnp.int32) << 8)


def _model_update(bank, qf, qse, active, e, m, ei, qi, is_adaptive,
                  rowmodel_b, rowmodel_q, rowwithin_q, segqt, cumt, mixb):
    """The model-side state updates shared VERBATIM by the decode step and
    the encode (known-symbol) pairs step: adaptive CDF mixing on bank rows
    0..8, quasi count/seen bumps, and the masked quasi rescale.  Pure
    function of loaded values; both kernels call it after computing
    (e, m) their own way.  Returns (bank, qf, qse)."""
    # ---- adaptive CDF mixing on bank rows 0..8 (int32, >> RATE).
    # (256, Lb) exp mix target via two exact MXU ops: MIXB (256, 8) planes
    # contracted with the e one-hot (8, Lb)
    ohe_b = (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
             == e).astype(jnp.bfloat16)
    mxlo, mxhi = _bplanes(mixb)                     # (256, 8) planes
    mix_e = (jax.lax.dot_general(
        mxlo, ohe_b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
        + (jax.lax.dot_general(
            mxhi, ohe_b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32) << 8))

    # adaptive-mantissa scalar target (rows 7, 8), 4-way select
    m01 = jnp.clip(m, 0, 1)
    mix_a = jnp.full_like(e, _MA_MIX[0][0])
    for ii in range(2):
        for jj in range(2):
            if ii == 0 and jj == 0:
                continue
            mix_a = jnp.where((ei == ii) & (m01 == jj), _MA_MIX[ii][jj],
                              mix_a)
    mix_full = jnp.where(rowmodel_b == 0, mix_e, mix_a)
    upd = bank + ((mix_full - bank) >> RATE)
    upd_mask = active & ((rowmodel_b == 0)
                         | (is_adaptive & (rowmodel_b == 1 + ei)))
    bank = jnp.where(upd_mask, upd, bank)

    # ---- quasi count/seen updates (known symbol index in Q space)
    q_upd = active & jnp.logical_not(is_adaptive)
    oh_cnt = (rowmodel_q == qi) & (rowwithin_q == m) & q_upd
    qf = qf + jnp.where(oh_cnt, jnp.int32(PROB_BITS), 0)
    rowq16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    q_hit = (rowq16 == qi) & q_upd            # rows 0..5
    e_hit = (rowq16 == qi + 8) & q_upd        # rows 8..13
    qse = qse + jnp.where(q_hit, 1, 0)
    seen_row = jnp.sum(jnp.where(q_hit, qse, 0), axis=0, keepdims=True)
    exp_row = jnp.sum(jnp.where(e_hit, qse, 0), axis=0, keepdims=True)

    # ---- quasi rescale, masked-applied (see module docstring)
    pred = q_upd & (seen_row > exp_row)
    # total freq mass = PROB_BITS * seen count (qf only ever grows by
    # PROB_BITS per quasi symbol and zeroes on rescale)
    total = seen_row << 4
    assert PROB_BITS == 16
    alpha = jnp.full_like(e, _QALPHA_L[0])
    for k in range(1, NQ):
        alpha = jnp.where(qi == k, _QALPHA_L[k], alpha)
    logv = jnp.zeros_like(e)
    for _ in range(21):  # smallest log with (total>>log)+alpha <= 2^16
        logv = logv + (((total >> logv) + alpha) > PROB_SCALE)
    fsh = qf >> logv                                # (256, Lb)
    flo, fhi = _bplanes(fsh)
    t2_all = _seg_dot(segqt, flo, fhi)              # (16, Lb) sums of fsh
    t2 = jnp.sum(jnp.where(rowq16 == qi, t2_all, 0), axis=0,
                 keepdims=True) + alpha
    q = _div_fix16(fsh + 1, t2)                     # (256, Lb)
    # active-lane bounds (hold for ANY stream, valid or garbage, because
    # t2 is the segment sum of the f's): q_j <= 2^16 since f_j <= t2;
    # sum(q) <= 2^16 (floors only lose mass) so 0 <= fix <= alpha <= 129
    # and q0 + fix <= 65665 — every byte plane below is exact in bf16.
    # The clips only tame garbage rows of NON-rescaling lanes (masked).
    qsum_all = _seg_dot(segqt, *_bplanes(jnp.clip(q, 0, 65536)))
    qsum = jnp.sum(jnp.where(rowq16 == qi, qsum_all, 0), axis=0,
                   keepdims=True)
    fix = PROB_SCALE - qsum
    q = jnp.where(rowwithin_q == 0, q + fix, q)
    qlo, qhi = _bplanes(jnp.clip(q, 0, 65536 + 129))
    cum = (jax.lax.dot_general(
        cumt, qlo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
        + (jax.lax.dot_general(
            cumt, qhi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32) << 8))
    cum = cum & jnp.int32(0xFFFF)  # uint16 store parity (wrap-regime)
    resc_bank_rows = pred & (rowmodel_b == 3 + qi)  # (256, Lb)
    bank = jnp.where(resc_bank_rows, cum, bank)
    resc_q_rows = pred & (rowmodel_q == qi)
    qf = jnp.where(resc_q_rows, 0, qf)
    resc_seen = q_hit & pred
    resc_exp = e_hit & pred
    qse = jnp.where(resc_seen, 0, qse)
    new_exp = jnp.minimum(qse << 1, UPDATE_RATE)
    qse = jnp.where(resc_exp, new_exp, qse)
    return bank, qf, qse


def _rans_step_kernel(i_ref, bank_ref, qf_ref, qse_ref, regs_ref, wb_ref,
                      rlens_ref, rowc_ref, segbt_ref, segqt_ref, cumt_ref,
                      mixb_ref, bank_out, qf_out, qse_out, regs_out,
                      sym_out):
    """One decode step for a block of Lb lanes; see module docstring."""
    i = i_ref[0, 0]
    bank = bank_ref[...]                     # (256, Lb) i32 interior cums
    qf = qf_ref[...]                         # (256, Lb) i32 quasi freqs (Q)
    qse = qse_ref[...]                       # (16, Lb): rows 0..5 seen,
    #                                          rows 8..13 exp thresholds
    rlens = rlens_ref[...]                   # (1, Lb)
    active = i < rlens                       # (1, Lb)

    seg_start = rowc_ref[:, 0:1] != 0        # (256, 1)
    rowmodel_b = rowc_ref[:, 1:2]
    rowmodel_q = rowc_ref[:, 2:3]
    rowwithin_q = rowc_ref[:, 3:4]
    is_rng1 = rowmodel_b == 0

    r0 = regs_ref[0:1, :]
    r1 = regs_ref[1:2, :]
    r2 = regs_ref[2:3, :]
    r3 = regs_ref[3:4, :]
    ptr = regs_ref[4:5, :]

    # ---- model-bank range search: both comparands known at step start
    mask16 = jnp.int32(PROB_SCALE - 1)
    rng1 = r0 & mask16
    rng2 = r1 & mask16
    rc = jnp.where(is_rng1, rng1, rng2)      # (256, Lb) broadcast
    le = bank <= rc
    bsh = pltpu.roll(bank, 1, axis=0)
    # uint16 wrap parity: rans_wide stores the bank as uint16, so its
    # in-segment diffs wrap mod 2^16 on (hardened-path) garbage streams
    d = (bank - jnp.where(seg_start, 0, bsh)) & jnp.int32(0xFFFF)
    # le shifted down one row = (bank[r-1] <= rc[r-1]); within a segment rc
    # is row-constant so bsh <= rc is exact, and seg-start rows are
    # overridden (Mosaic cannot rotate i1 vectors, so reuse the i32 roll)
    le1 = seg_start | (bsh <= rc)
    oh = le1 & jnp.logical_not(le)           # one-hot of cum[m+1]

    dlo, dhi = _bplanes(d)
    zb = jnp.bfloat16(0)
    lo_all = _seg_dot(segbt_ref[...], jnp.where(le, dlo, zb),
                      jnp.where(le, dhi, zb))
    fqp_all = _seg_dot(segbt_ref[...], jnp.where(oh, dlo, zb),
                       jnp.where(oh, dhi, zb))
    m_all = jax.lax.dot_general(                    # symbol = count of le
        segbt_ref[...], le.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    # last symbol of a model: no interior one-hot => freq = 2^16 - low
    fq_all = jnp.where(fqp_all == 0, PROB_SCALE - lo_all, fqp_all)

    # ---- exponent symbol (model 0, state r0)
    e = m_all[0:1, :]
    lo_e = lo_all[0:1, :]
    fq_e = fq_all[0:1, :]

    def advance(x, lo, fq):
        # u32-parity in i32: logical (not arithmetic) top-half extract so
        # garbage states that run x negative keep the reference bit pattern
        return fq * ((x >> PROB_BITS) & mask16) + (x & mask16) - lo

    wb0 = wb_ref[0:1, :]
    wb1 = wb_ref[1:2, :]
    wb2 = wb_ref[2:3, :]
    wb3 = wb_ref[3:4, :]

    def renorm(x, kb):
        # two refills always suffice (bound argument in rans_wide.renorm)
        for _ in range(2):
            # unsigned x < 2^23 in i32: nonnegative AND below the bound
            need = active & (x >= 0) & (x < RANS_BYTE_L)
            b = jnp.where(kb == 0, wb0,
                          jnp.where(kb == 1, wb1,
                                    jnp.where(kb == 2, wb2, wb3)))
            x = jnp.where(need, (x << 8) | b, x)
            kb = jnp.where(need, kb + 1, kb)
        return x, kb

    kb = jnp.zeros_like(ptr)
    x2, kb = renorm(advance(r0, lo_e, fq_e), kb)
    x2 = jnp.where(active, x2, r0)
    # rotate: (r0, r1, r2, r3) -> (r1, r2, r3, x2)
    r0n, r1n, r2n, r3n = r1, r2, r3, x2

    # ---- mantissa symbol: select the active model's row
    is_adaptive = e < _NSW
    ei = jnp.clip(e, 0, _NSW - 1)
    qi = jnp.clip(e - _NSW, 0, NQ - 1)
    midx = jnp.where(is_adaptive, 1 + ei, 3 + qi)   # (1, Lb) in 1..8
    m = m_all[1:2, :]
    lo = lo_all[1:2, :]
    fq = fq_all[1:2, :]
    for k in range(2, 9):
        sel = midx == k
        m = jnp.where(sel, m_all[k:k + 1, :], m)
        lo = jnp.where(sel, lo_all[k:k + 1, :], lo)
        fq = jnp.where(sel, fq_all[k:k + 1, :], fq)
    x2, kb = renorm(advance(r0n, lo, fq), kb)
    x2 = jnp.where(active, x2, r0n)
    r0n, r1n, r2n, r3n = r1n, r2n, r3n, x2

    # ---- model-side updates (shared with the encode pairs kernel)
    bank, qf, qse = _model_update(
        bank, qf, qse, active, e, m, ei, qi, is_adaptive,
        rowmodel_b, rowmodel_q, rowwithin_q, segqt_ref[...], cumt_ref[...],
        mixb_ref[...])

    # ---- emit
    base = jnp.zeros_like(e)
    for kk in range(1, 8):
        base = jnp.where(e == kk, _EXP_BASE[kk], base)
    sym_out[...] = jnp.where(active, base + m, 0)

    bank_out[...] = bank
    qf_out[...] = qf
    qse_out[...] = qse
    regs_out[0:1, :] = r0n
    regs_out[1:2, :] = r1n
    regs_out[2:3, :] = r2n
    regs_out[3:4, :] = r3n
    regs_out[4:5, :] = ptr + kb
    regs_out[5:8, :] = regs_ref[5:8, :]


# ---------------------------------------------------------------------------
# Host-side driver


def _step_call(LB: int, Lp: int, interpret: bool):
    grid = (Lp // LB,)

    def lane_block(b):
        return (0, b)

    def const_block(b):
        return (0, 0)

    vspec = lambda rows: pl.BlockSpec((rows, LB), lane_block,
                                      memory_space=pltpu.VMEM)
    cspec = lambda shape: pl.BlockSpec(shape, const_block,
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _rans_step_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), const_block, memory_space=pltpu.SMEM),
            vspec(256),            # bank
            vspec(256),            # qf
            vspec(16),             # qse (seen rows 0..5, exp rows 8..13)
            vspec(8),              # regs (R0..R3, ptr)
            vspec(4),              # wb byte planes
            vspec(1),              # rlens
            cspec((256, 8)),       # ROWC
            cspec((16, 256)),      # SEGBT
            cspec((16, 256)),      # SEGQT
            cspec((256, 256)),     # CUMT
            cspec((256, 8)),       # MIXB
        ],
        out_specs=[
            vspec(256), vspec(256), vspec(16), vspec(8), vspec(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((256, Lp), jnp.int32),
            jax.ShapeDtypeStruct((256, Lp), jnp.int32),
            jax.ShapeDtypeStruct((16, Lp), jnp.int32),
            jax.ShapeDtypeStruct((8, Lp), jnp.int32),
            jax.ShapeDtypeStruct((1, Lp), jnp.int32),
        ],
        interpret=interpret,
    )


def _pick_lb(Lp: int) -> int:
    import os

    first = int(os.environ.get("JAMPACK_RANS_LB", _LB))
    for lb in (first, _LB, 512, 256, 128):
        if lb <= Lp and Lp % lb == 0:
            return lb
    return Lp


@partial(jax.jit,
         static_argnames=("max_rlen", "groups", "interpret"))
def decode_lanes_wide_pallas(buf: jnp.ndarray, starts: jnp.ndarray,
                             rlens: jnp.ndarray, max_rlen: int,
                             groups: int = 0, interpret: bool = False):
    """Drop-in for rans_wide.decode_lanes_wide with the step body in one
    Pallas kernel (module docstring).  Same contract: buf uint8, starts /
    rlens (L,), returns (syms, ok) with the `groups` slab layout."""
    L = starts.shape[0]
    Lp = max(128, -(-L // 128) * 128)
    LB = _pick_lb(Lp)
    pad = Lp - L

    buf32 = buf.astype(jnp.uint32)
    bp = jnp.pad(buf32, (0, 3))
    win = bp[:-3] | (bp[1:-2] << 8) | (bp[2:-1] << 16) | (bp[3:] << 24)
    win = win.astype(jnp.int32)  # mod-2^32 bit pattern

    def read32(p):
        return (buf32[p] | (buf32[p + 1] << 8) | (buf32[p + 2] << 16)
                | (buf32[p + 3] << 24)).astype(jnp.int32)

    starts_p = jnp.pad(starts, (0, pad))
    rlens_p = jnp.pad(rlens, (0, pad), constant_values=-1)
    regs = jnp.zeros((8, Lp), jnp.int32)
    for k in range(4):
        regs = regs.at[k, :].set(read32(starts_p + 4 * k))
    regs = regs.at[4, :].set(starts_p + 16)

    bank = jnp.broadcast_to(
        jnp.asarray(_BANK_INIT.astype(np.int32))[:, None], (256, Lp))
    qf = jnp.zeros((256, Lp), jnp.int32)
    qse = jnp.zeros((16, Lp), jnp.int32)
    qse = qse.at[8:14, :].set(8)  # exp thresholds start at 8
    rl2 = rlens_p[None, :].astype(jnp.int32)

    rowc = jnp.asarray(_ROWC)
    segbt = jnp.asarray(_SEGBT, jnp.bfloat16)
    segqt = jnp.asarray(_SEGQT, jnp.bfloat16)
    cumt = jnp.asarray(_CUMT, jnp.bfloat16)
    mixb = jnp.asarray(_MIXB)

    step = _step_call(LB, Lp, interpret)

    if groups:
        assert L % groups == 0
        lanes_per = L // groups
        syms = jnp.zeros((groups, max_rlen, lanes_per), dtype=jnp.uint16)
    else:
        syms = jnp.zeros((L, max_rlen), dtype=jnp.uint16)

    def body(i, carry):
        bank, qf, qse, regs, syms = carry
        w = win[jnp.clip(regs[4, :], 0, win.shape[0] - 1)]
        wb = jnp.stack([(w >> (8 * k)) & 0xFF for k in range(4)], axis=0)
        i2 = jnp.full((1, 1), i, jnp.int32)
        bank, qf, qse, regs, sym = step(
            i2, bank, qf, qse, regs, wb, rl2, rowc, segbt, segqt, cumt,
            mixb)
        symv = sym[0, :L].astype(jnp.uint16)
        if groups:
            syms2 = jax.lax.dynamic_update_slice(
                syms, symv.reshape(groups, 1, lanes_per), (0, i, 0))
        else:
            syms2 = syms.at[:, i].set(symv)
        return bank, qf, qse, regs, syms2

    steps = jnp.minimum(jnp.maximum(jnp.max(rlens), 0), max_rlen)
    bank, qf, qse, regs, syms = jax.lax.fori_loop(
        0, steps, body, (bank, qf, qse, regs, syms))
    if groups:
        syms = syms.reshape(groups, max_rlen * (L // groups))
    flush = jnp.int32(RANS_BYTE_L)
    ok = jnp.all(regs[0:4, :L] == flush, axis=0) | (rlens < 0)
    return syms, ok


# ---------------------------------------------------------------------------
# Encode-side model pass (VERDICT r3 #6): the known-symbol mirror of the
# decode step.  Same bank/segment machinery, no range search and no rANS
# state — per step it reads the symbol column, forms the exp/mantissa
# (low, freq) pairs from lt/one-hot masks over the SAME (256, Lb) bank,
# then runs _model_update verbatim.  Reference: ans.cpp:152-187.


def _model_pairs_kernel(i_ref, sym_ref, bank_ref, qf_ref, qse_ref, ok_ref,
                        rlens_ref, rowc_ref, segbt_ref, segqt_ref, cumt_ref,
                        mixb_ref, bank_out, qf_out, qse_out, ok_out, lo_out,
                        fq_out):
    i = i_ref[0, 0]
    bank = bank_ref[...]                     # (256, Lb) i32 interior cums
    qf = qf_ref[...]
    qse = qse_ref[...]
    ok = ok_ref[...]                         # (1, Lb) i32 0/1
    rlens = rlens_ref[...]
    active = i < rlens
    sym = sym_ref[...]                       # (1, Lb) i32

    seg_start = rowc_ref[:, 0:1] != 0
    rowmodel_b = rowc_ref[:, 1:2]
    rowmodel_q = rowc_ref[:, 2:3]
    rowwithin_q = rowc_ref[:, 3:4]
    rowwithin_b = rowc_ref[:, 4:5]

    # exponent class via the 7 boundary compares; m = sym - base
    e = jnp.zeros_like(sym)
    for b in _EXP_BASE[1:]:
        e = e + jnp.where(sym >= b, 1, 0)
    base = jnp.zeros_like(sym)
    for kk in range(1, 8):
        base = jnp.where(e == kk, _EXP_BASE[kk], base)
    m = sym - base
    is_adaptive = e < _NSW
    ei = jnp.clip(e, 0, _NSW - 1)
    qi = jnp.clip(e - _NSW, 0, NQ - 1)
    midx = jnp.where(is_adaptive, 1 + ei, 3 + qi)   # (1, Lb) in 1..8

    # both ops' (low, freq) from two known-index masks over the bank: the
    # exp op lives in segment 0 (sel = e) and the mantissa op in segment
    # midx (sel = m); _seg_dot gives every model's sum, rows select
    sel = jnp.where(rowmodel_b == 0, e, m)          # (256, Lb) broadcast
    lt = rowwithin_b < sel
    oh = rowwithin_b == sel
    bsh = pltpu.roll(bank, 1, axis=0)
    d = (bank - jnp.where(seg_start, 0, bsh)) & jnp.int32(0xFFFF)
    dlo, dhi = _bplanes(d)
    zb = jnp.bfloat16(0)
    lo_all = _seg_dot(segbt_ref[...], jnp.where(lt, dlo, zb),
                      jnp.where(lt, dhi, zb))       # (16, Lb)
    fqp_all = _seg_dot(segbt_ref[...], jnp.where(oh, dlo, zb),
                       jnp.where(oh, dhi, zb))
    lo_e = lo_all[0:1, :]
    fqp_e = fqp_all[0:1, :]
    lo_m = lo_all[1:2, :]
    fqp_m = fqp_all[1:2, :]
    for k in range(2, 9):
        selk = midx == k
        lo_m = jnp.where(selk, lo_all[k:k + 1, :], lo_m)
        fqp_m = jnp.where(selk, fqp_all[k:k + 1, :], fqp_m)
    alpha_m = jnp.full_like(sym, _ALPHAS[1])
    for k in range(2, 9):
        alpha_m = jnp.where(midx == k, _ALPHAS[k], alpha_m)
    last_e = e == 7
    last_m = m == alpha_m - 1
    fq_e = jnp.where(last_e, PROB_SCALE - lo_e, fqp_e)
    fq_m = jnp.where(last_m, PROB_SCALE - lo_m, fqp_m)
    good = (((last_e | (fqp_e > 0)) & (last_m | (fqp_m > 0)))
            | jnp.logical_not(active))
    ok = jnp.where(good, ok, 0)

    bank, qf, qse = _model_update(
        bank, qf, qse, active, e, m, ei, qi, is_adaptive,
        rowmodel_b, rowmodel_q, rowwithin_q, segqt_ref[...], cumt_ref[...],
        mixb_ref[...])

    bank_out[...] = bank
    qf_out[...] = qf
    qse_out[...] = qse
    ok_out[...] = ok
    lo_out[0:1, :] = lo_e
    lo_out[1:2, :] = lo_m
    fq_out[0:1, :] = fq_e
    fq_out[1:2, :] = fq_m


def _pairs_call(LB: int, Lp: int, interpret: bool):
    grid = (Lp // LB,)

    def lane_block(b):
        return (0, b)

    def const_block(b):
        return (0, 0)

    vspec = lambda rows: pl.BlockSpec((rows, LB), lane_block,
                                      memory_space=pltpu.VMEM)
    cspec = lambda shape: pl.BlockSpec(shape, const_block,
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _model_pairs_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), const_block, memory_space=pltpu.SMEM),
            vspec(1),              # sym column
            vspec(256),            # bank
            vspec(256),            # qf
            vspec(16),             # qse
            vspec(1),              # ok
            vspec(1),              # rlens
            cspec((256, 8)),       # ROWC
            cspec((16, 256)),      # SEGBT
            cspec((16, 256)),      # SEGQT
            cspec((256, 256)),     # CUMT
            cspec((256, 8)),       # MIXB
        ],
        out_specs=[
            vspec(256), vspec(256), vspec(16), vspec(1), vspec(2), vspec(2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((256, Lp), jnp.int32),
            jax.ShapeDtypeStruct((256, Lp), jnp.int32),
            jax.ShapeDtypeStruct((16, Lp), jnp.int32),
            jax.ShapeDtypeStruct((1, Lp), jnp.int32),
            jax.ShapeDtypeStruct((2, Lp), jnp.int32),
            jax.ShapeDtypeStruct((2, Lp), jnp.int32),
        ],
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("max_rlen", "interpret"))
def model_pairs_wide_pallas(chains: jnp.ndarray, rlens: jnp.ndarray,
                            max_rlen: int, interpret: bool = False):
    """Drop-in for rans_wide.model_pairs_wide with the step body in one
    Pallas program.  chains: (L, max_rlen) uint16; rlens (L,).
    Returns (lows (L, 2*max_rlen) u16, fqs (L, 2*max_rlen) u16, ok (L,))."""
    L = chains.shape[0]
    Lp = max(128, -(-L // 128) * 128)
    LB = _pick_lb(Lp)
    pad = Lp - L

    # lanes-major everywhere on the XLA side: big (L, max_rlen)-shaped
    # transposes measure ~0.5-1.8 s at the 8 MB bench shapes on this
    # platform, so the per-step symbol column comes from a (Lp, 1)
    # dynamic_slice (reshape to the kernel's (1, Lp) row is free) and the
    # per-step (2, Lp) outputs transpose SMALL before the column write
    chains_p = jnp.pad(chains, ((0, pad), (0, 0))).astype(jnp.int32)
    rlens_p = jnp.pad(rlens, (0, pad), constant_values=0)
    rl2 = rlens_p[None, :].astype(jnp.int32)

    bank = jnp.broadcast_to(
        jnp.asarray(_BANK_INIT.astype(np.int32))[:, None], (256, Lp))
    qf = jnp.zeros((256, Lp), jnp.int32)
    qse = jnp.zeros((16, Lp), jnp.int32)
    qse = qse.at[8:14, :].set(8)  # exp thresholds start at 8
    ok = jnp.ones((1, Lp), jnp.int32)
    lows = jnp.zeros((Lp, 2 * max_rlen), jnp.uint16)
    fqs = jnp.zeros((Lp, 2 * max_rlen), jnp.uint16)

    rowc = jnp.asarray(_ROWC)
    segbt = jnp.asarray(_SEGBT, jnp.bfloat16)
    segqt = jnp.asarray(_SEGQT, jnp.bfloat16)
    cumt = jnp.asarray(_CUMT, jnp.bfloat16)
    mixb = jnp.asarray(_MIXB)

    step = _pairs_call(LB, Lp, interpret)

    def body(i, carry):
        bank, qf, qse, ok, lows, fqs = carry
        sym = jax.lax.dynamic_slice(chains_p, (0, i), (Lp, 1)).reshape(1, Lp)
        i2 = jnp.full((1, 1), i, jnp.int32)
        bank, qf, qse, ok, lo, fq = step(
            i2, sym, bank, qf, qse, ok, rl2, rowc, segbt, segqt, cumt,
            mixb)
        lows = jax.lax.dynamic_update_slice(
            lows, lo.astype(jnp.uint16).T, (0, 2 * i))
        fqs = jax.lax.dynamic_update_slice(
            fqs, fq.astype(jnp.uint16).T, (0, 2 * i))
        return bank, qf, qse, ok, lows, fqs

    steps = jnp.minimum(jnp.maximum(jnp.max(rlens), 0), max_rlen)
    bank, qf, qse, ok, lows, fqs = jax.lax.fori_loop(
        0, steps, body, (bank, qf, qse, ok, lows, fqs))
    return (lows[:L], fqs[:L], ok[0, :L] != 0)
