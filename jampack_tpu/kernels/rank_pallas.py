"""Pallas VMEM-resident SRC rank decode step.

rank_decode_core (device_stages.py) is the decode chain's third-largest
term on chip (321 ms of the 8 MB block): its lockstep MTF loop runs ~6
(L, 256) masked passes per output byte, each materialized in HBM by XLA.
This kernel mirrors the rans_pallas/_model_pairs structure: the ENTIRE
per-step body — one-hot bucket read, MTF shift + front insert, bucket
cursor advance, retire-on-exhausted, next-symbol/next-cursor derivation —
runs in ONE Pallas program per lane block, so HBM sees only the carried
state once per step.  The single per-step random access, the rank-byte
fetch ranks[l, cur], stays on the XLA side (no VMEM vector gather on this
platform) exactly like the rANS payload window fetch: the kernel OUTPUTS
the next step's cursor so the gather can run between steps.

Layout: lanes-minor (state is (256, L); per-lane scalars are (1, L)
rows).  Supported regime: OCAP <= 0x7FFF so each bucket's (cursor, end)
pair packs into one int32 word (cur | end << 16) — every wide-lane JT3
stream (the only shapes where L is large enough for this kernel to
matter); larger chunks route to the XLA kernel.

Bit-exact with rank_decode_core / rank.cpp:125-150 semantics: the
do-while MTF shift of at least one slot on retire, later-wins r2s
seeding, bucket exhaustion order.
"""


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LB = 1024  # lanes per program (state working set ~2.5 MB at 1024)


def _rank_step_kernel(i_ref, rb_ref, olens_ref, r2s_ref, bkt_ref, misc_ref,
                      r2s_out, bkt_out, misc_out, sym_out, cur_out):
    """One rank-decode step for a block of Lb lanes (module docstring).

    misc rows: 0 = unique, 1 = sym (the symbol being emitted this step).
    rb_ref: (1, Lb) the rank byte fetched at this step's cursor.
    Outputs sym_out = the emitted symbol column, cur_out = the NEXT
    step's clipped cursor (for the XLA-side gather)."""
    i = i_ref[0, 0]
    r2s = r2s_ref[...]                       # (256, Lb) i32 MTF list
    bkt = bkt_ref[...]                       # (256, Lb) i32 cur | end<<16
    unique = misc_ref[0:1, :]
    sym = misc_ref[1:2, :]
    olens = olens_ref[...]                   # (1, Lb)
    rank = rb_ref[...]                       # (1, Lb)
    active = i < olens

    row = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)
    oh = row == sym                          # (256, Lb)
    pk = jnp.sum(jnp.where(oh, bkt, 0), axis=0, keepdims=True)
    cur = pk & 0xFFFF
    end = pk >> 16
    has = active & (cur < end)

    do_mtf = has & (rank > 0)
    fall = active & jnp.logical_not(has) & (unique > 0)
    new_unique = jnp.where(fall, unique - 1, unique)
    m = jnp.maximum(1, new_unique)
    # shifted[r] = r2s[r+1], last row held (the XLA form's concat); Mosaic
    # can roll i32 rows, so roll down one and pin row 255
    rolled = pltpu.roll(r2s, 255, axis=0)  # = shift -1 (roll wants >= 0)
    shifted = jnp.where(row == 255, r2s, rolled)
    # boolean algebra, NOT jnp.where with bool branches: Mosaic cannot
    # truncate the resulting i8 select back to i1 ("Unsupported target
    # bitwidth for truncation", CLAUDE.md round-3 rule)
    shift_mask = ((do_mtf & (row < rank))
                  | (jnp.logical_not(do_mtf) & fall & (row < m)))
    set_mask = do_mtf & (row == rank)
    r2s = jnp.where(set_mask, sym, jnp.where(shift_mask, shifted, r2s))
    # cursor advance: +1 on the packed low half (cur <= end <= 32767:
    # never carries into the end field)
    bkt = bkt + jnp.where(oh & has, 1, 0)
    front = r2s[0:1, :]
    new_sym = jnp.where(do_mtf | fall, front, sym)

    # next step's cursor = (possibly advanced) bucket of the new symbol
    oh2 = row == new_sym
    pk2 = jnp.sum(jnp.where(oh2, bkt, 0), axis=0, keepdims=True)
    cur2 = pk2 & 0xFFFF

    r2s_out[...] = r2s
    bkt_out[...] = bkt
    misc_out[0:1, :] = new_unique
    misc_out[1:2, :] = new_sym
    misc_out[2:8, :] = misc_ref[2:8, :]
    sym_out[...] = jnp.where(active, sym, 0)
    cur_out[...] = cur2


def _step_call(LB: int, Lp: int, interpret: bool):
    grid = (Lp // LB,)

    def lane_block(b):
        return (0, b)

    def const_block(b):
        return (0, 0)

    vspec = lambda rows: pl.BlockSpec((rows, LB), lane_block,
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _rank_step_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), const_block, memory_space=pltpu.SMEM),
            vspec(1),              # rank byte
            vspec(1),              # olens
            vspec(256),            # r2s
            vspec(256),            # bkt
            vspec(8),              # misc
        ],
        out_specs=[vspec(256), vspec(256), vspec(8), vspec(1), vspec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((256, Lp), jnp.int32),
            jax.ShapeDtypeStruct((256, Lp), jnp.int32),
            jax.ShapeDtypeStruct((8, Lp), jnp.int32),
            jax.ShapeDtypeStruct((1, Lp), jnp.int32),
            jax.ShapeDtypeStruct((1, Lp), jnp.int32),
        ],
        interpret=interpret,
    )


def _pick_lb(Lp: int) -> int:
    for lb in (_LB, 512, 256, 128):
        if Lp % lb == 0:
            return lb
    return Lp


def rank_decode_pallas(ranks: jnp.ndarray, freqs: jnp.ndarray,
                       olens: jnp.ndarray, out_cap: int,
                       interpret: bool = False):
    """Drop-in for rank_decode_core in the packed regime
    (ranks.shape[1] <= 0x7FFF).  Same contract: (out (L, out_cap) u8,
    ok (L,) bool)."""
    from .device_stages import rank_setup_core

    L, OCAP = ranks.shape
    assert OCAP <= 0x7FFF
    Lp = max(128, -(-L // 128) * 128)
    LB = _pick_lb(Lp)
    pad = Lp - L

    r2s, bucket, bucket_end, unique, sym0, total = rank_setup_core(
        ranks, freqs)
    ok = (total == jnp.maximum(olens, 0))

    bkt = bucket | (bucket_end << 16)
    r2s_p = jnp.pad(r2s, ((0, pad), (0, 0))).T          # (256, Lp)
    bkt_p = jnp.pad(bkt, ((0, pad), (0, 0))).T
    misc = jnp.zeros((8, Lp), jnp.int32)
    misc = misc.at[0, :L].set(unique)
    misc = misc.at[1, :L].set(sym0)
    olens_p = jnp.pad(olens, (0, pad),
                      constant_values=0)[None, :].astype(jnp.int32)
    ranks_p = jnp.pad(ranks, ((0, pad), (0, 0)))        # (Lp, OCAP)

    # initial cursor: bucket of sym0
    l256 = jnp.arange(256, dtype=jnp.int32)[None, :]
    oh0 = l256 == sym0[:, None]
    cur0 = jnp.sum(jnp.where(oh0, bucket, 0), axis=1)
    cur0 = jnp.pad(cur0, (0, pad))[None, :]

    out = jnp.zeros((Lp, out_cap), jnp.uint8)
    step = _step_call(LB, Lp, interpret)
    lidx = jnp.arange(Lp)

    def body(i, carry):
        r2s_p, bkt_p, misc, cur, out = carry
        rb = ranks_p[lidx, jnp.clip(cur[0], 0, OCAP - 1)].astype(
            jnp.int32)[None, :]
        i2 = jnp.full((1, 1), i, jnp.int32)
        r2s_p, bkt_p, misc, symc, cur = step(i2, rb, olens_p, r2s_p, bkt_p,
                                             misc)
        out = jax.lax.dynamic_update_slice(
            out, symc.astype(jnp.uint8).T, (0, i))
        return r2s_p, bkt_p, misc, cur, out

    steps = jnp.minimum(jnp.maximum(jnp.max(olens), 0), out_cap)
    _, _, _, _, out = jax.lax.fori_loop(
        0, steps, body, (r2s_p, bkt_p, misc, cur0, out))
    return out[:L], ok | (olens <= 0)
