"""Pallas TPU kernels for the value-domain decoder's per-iteration passes.

XLA compiles the CN two-min and VN threshold-tree passes into many small
loop fusions with HBM-materialized intermediates (measured ~6 ms/iter for
CN alone at N=10000, B=4096 on v5e); these kernels run each pass in ONE
HBM round trip — read the (d, n_pad, B) message block tile-by-tile into
VMEM, do all the elementwise work on the VPU, write the updated block —
and fuse the early-exit reductions (CN syndrome parity, VN sign unanimity
and hard bits) into the same pass for free.

Exactness: kernels compute in float32.  Stored values are integers with
|v| <= 32600 (int16 specs) or float32 (the spec's native dtype); sums of
<= 32 such values stay below 2^24, where float32 arithmetic on integers is
exact, so compares/mins/adds reproduce the integer semantics bit-for-bit.
Emission uses the validated select-chain form (levels[#thresholds crossed])
— identical outputs to both the int delta form and the float chain of
decoder/arith_decoder._emit.  CN two-min uses the running min1/min2 +
first-argmin formulation (constant VMEM temps at any degree), which equals
the prefix/suffix form value-for-value: the first slot attaining min1 sees
min2, every other slot sees min1 — chk_update_minsum's min1/min2 semantics
(/root/reference/src/LDPC_Code_LUT.cpp:355-402).

v5e Mosaic does not support int16 vector compares (which is also why the
XLA int16 elementwise path runs slow — everything round-trips through
int32); reading int16 from VMEM and casting to f32 keeps HBM traffic at
2 bytes/value while computing at native VPU width.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cn_pass", "vn_pass", "pallas_supported", "pallas_ok_for_batch"]


def pallas_supported() -> bool:
    import os

    if os.environ.get("LUT_LDPC_NO_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def pallas_ok_for_batch(B: int) -> bool:
    return B % 128 == 0


def _tile_sizes(d: int, B: int):
    """(NT, BT): block plus f32 working set fits VMEM comfortably."""
    BT = min(512, B)
    # ~3 MB for the in+out int16 blocks and ~2 live f32 tiles per slot pass
    NT = (3 << 20) // max(1, d * BT * 6)
    NT = max(16, min(256, (NT // 16) * 16))
    return NT, BT


# ---------------------------------------------------------------------------
# CN pass: min-LUT two-min + sign parity, fused syndrome partial
# ---------------------------------------------------------------------------


def _cn_kernel(m_ref, o_ref, synd_ref, *, d, n_real, NT, BT, out_dtype):
    # pass 1: running two-min and sign parity over slots
    mag0 = jnp.abs(m_ref[0].astype(jnp.float32))
    neg_par = m_ref[0].astype(jnp.float32) < 0
    min1, min2 = mag0, jnp.full((NT, BT), jnp.inf, jnp.float32)
    for j in range(1, d):
        mj = m_ref[j].astype(jnp.float32)
        neg_par = neg_par ^ (mj < 0)
        mag = jnp.abs(mj)
        min2 = jnp.minimum(min2, jnp.maximum(min1, mag))
        min1 = jnp.minimum(min1, mag)
    # pass 2: per-slot output; the FIRST slot attaining min1 sees min2
    cnt = jnp.zeros((NT, BT), jnp.int32)
    for j in range(d):
        mj = m_ref[j].astype(jnp.float32)
        eq = jnp.abs(mj) == min1
        first = eq & (cnt == 0)
        cnt = cnt + eq.astype(jnp.int32)
        tmp = jnp.where(first, min2, min1)
        flip = neg_par ^ (mj < 0)
        o_ref[j] = jnp.where(flip, -tmp, tmp).astype(out_dtype)

    # syndrome partial: parity of input signs, padded rows forced OK;
    # accumulated across node tiles (innermost grid dim -> block stays
    # VMEM-resident; 8 broadcast rows satisfy the (8, 128) tiling)
    ib = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (NT, BT), 0)
    ok = (~neg_par) | (rows >= n_real - ib * NT)
    # reduce in int32 (min == logical AND; Mosaic supports neither i1 row
    # broadcasts nor int8 reductions), cast to int8 only after broadcast
    part = jnp.broadcast_to(
        jnp.min(ok.astype(jnp.int32), axis=0, keepdims=True), (8, BT)
    ).astype(jnp.int8)

    @pl.when(ib == 0)
    def _():
        synd_ref[...] = part

    @pl.when(ib != 0)
    def _():
        synd_ref[...] = synd_ref[...] & part


def cn_pass(m3, n_real: int):
    """Min-LUT CN update on one degree block.

    m3 (d, n_pad, B) values (int16 or float32), slot-major.  Returns
    (out (d, n_pad, B) same dtype, synd_ok (B,) bool) where synd_ok is the
    all-checks-satisfied indicator of the block computed from the INPUT
    sign parities (pre-update messages, matching
    ArithLUTDecoder.convergence).
    """
    d, n_pad, B = m3.shape
    NT, BT = _tile_sizes(d, B)
    grid = (pl.cdiv(B, BT), pl.cdiv(n_pad, NT))  # batch outer, nodes inner
    kern = functools.partial(
        _cn_kernel, d=d, n_real=n_real, NT=NT, BT=BT, out_dtype=m3.dtype
    )
    out, synd = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((d, n_pad, B), m3.dtype),
            jax.ShapeDtypeStruct((8, B), jnp.int8),
        ],
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((d, NT, BT), lambda jb, ib: (0, ib, jb),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((d, NT, BT), lambda jb, ib: (0, ib, jb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, BT), lambda jb, ib: (0, jb),
                             memory_space=pltpu.VMEM),
            ],
        ),
    )(m3)
    return out, synd[0] != 0


# ---------------------------------------------------------------------------
# VN pass: leave-one-out threshold trees, fused unanimity/bits
# ---------------------------------------------------------------------------


def _emit_select(s, thr_ref, lev_ref, tlo_ref, thi_ref, tie_val, nthr):
    """Piecewise-constant emission via the select chain (f32, exact)."""
    out = jnp.full(s.shape, lev_ref[0, 0], jnp.float32)
    for k in range(nthr):
        out = jnp.where(s >= thr_ref[0, k], lev_ref[0, k + 1], out)
    tie = jnp.where(tie_val < 0, tlo_ref[0, 0], thi_ref[0, 0])
    return jnp.where(s == 0.0, tie, out)


def _vn_kernel(m_ref, cha_ref, *refs, ops, d, loo, use_tot, n_real, NT, BT,
               out_dtype):
    # refs = 4 param refs per op (thr, levels, tie_lo, tie_hi) then outputs
    nops = len(ops)
    prm = [refs[4 * oi : 4 * oi + 4] for oi in range(nops)]
    o_ref, bits_ref, unan_ref = refs[4 * nops :]

    cha = cha_ref[...].astype(jnp.float32)  # (NT, BT)
    tot = None
    if use_tot:
        tot = m_ref[0].astype(jnp.float32)
        for j in range(1, d):
            tot = tot + m_ref[j].astype(jnp.float32)
    neg0 = None
    agree = None
    for i in range(d):
        vals = [None] * (d - 1) + [cha]
        for oi, (op_operands, nthr) in enumerate(ops):
            if oi == 0 and tot is not None:
                s = tot - m_ref[i].astype(jnp.float32)
            else:
                s = None
                for sl in op_operands:
                    if vals[sl] is None:  # lazy leaf load
                        vals[sl] = m_ref[int(loo[i, sl])].astype(jnp.float32)
                    s = vals[sl] if s is None else s + vals[sl]
            tie_sl = op_operands[-1]
            if vals[tie_sl] is None:
                vals[tie_sl] = m_ref[int(loo[i, tie_sl])].astype(jnp.float32)
            thr_r, lev_r, tlo_r, thi_r = prm[oi]
            vals.append(
                _emit_select(s, thr_r, lev_r, tlo_r, thi_r, vals[tie_sl], nthr)
            )
        out_i = vals[-1]
        o_ref[i] = out_i.astype(out_dtype)
        ni = out_i < 0
        if neg0 is None:
            neg0 = ni
        else:
            a = ni == neg0
            agree = a if agree is None else (agree & a)
    bits_ref[...] = neg0.astype(jnp.int8)
    if agree is None:  # d == 1
        agree = jnp.ones((NT, BT), bool)
    ib = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (NT, BT), 0)
    agree = agree | (rows >= n_real - ib * NT)
    part = jnp.broadcast_to(
        jnp.min(agree.astype(jnp.int32), axis=0, keepdims=True), (8, BT)
    ).astype(jnp.int8)

    @pl.when(ib == 0)
    def _():
        unan_ref[...] = part

    @pl.when(ib != 0)
    def _():
        unan_ref[...] = unan_ref[...] & part


def vn_pass(m3, cha, struct, prm, loo, use_tot, n_real: int):
    """Leave-one-out VN tree update on one degree block.

    m3 (d, n_pad, B) incoming CN->VN values; cha (n_pad, B) channel values;
    struct the block's ArithTreeSpec (structure only); prm the
    iteration-sliced op params (dicts with thr/levels/tie_lo/tie_hi);
    loo the (d, d) leave-one-out index table (column d-1 = channel slot).

    Returns (out (d, n_pad, B), bits (n_pad, B) uint8, unan (B,) bool):
    bits/unan are the hard decisions and sign-unanimity of the OUTPUT
    messages (= the next iteration's m_vn), padded rows masked.
    """
    d, n_pad, B = m3.shape
    NT, BT = _tile_sizes(d, B)
    grid = (pl.cdiv(B, BT), pl.cdiv(n_pad, NT))  # batch outer, nodes inner
    ops_static = tuple(
        (tuple(int(x) for x in op.operands), int(prm[oi]["thr"].shape[-1]))
        for oi, op in enumerate(struct.ops)
    )
    kern = functools.partial(
        _vn_kernel, ops=ops_static, d=d, loo=np.asarray(loo),
        use_tot=bool(use_tot), n_real=n_real, NT=NT, BT=BT,
        out_dtype=m3.dtype,
    )
    param_args = []
    in_specs = [
        pl.BlockSpec((d, NT, BT), lambda jb, ib: (0, ib, jb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NT, BT), lambda jb, ib: (ib, jb),
                     memory_space=pltpu.VMEM),
    ]
    for oi in range(len(struct.ops)):
        p = prm[oi]
        for key in ("thr", "levels", "tie_lo", "tie_hi"):
            a = jnp.asarray(p[key], jnp.float32).reshape(1, -1)
            param_args.append(a)
            in_specs.append(
                pl.BlockSpec(a.shape, lambda jb, ib: (0, 0),
                             memory_space=pltpu.SMEM)
            )
    out, bits, unan = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((d, n_pad, B), m3.dtype),
            jax.ShapeDtypeStruct((n_pad, B), jnp.int8),
            jax.ShapeDtypeStruct((8, B), jnp.int8),
        ],
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((d, NT, BT), lambda jb, ib: (0, ib, jb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NT, BT), lambda jb, ib: (ib, jb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, BT), lambda jb, ib: (0, jb),
                             memory_space=pltpu.VMEM),
            ],
        ),
    )(m3, cha, *param_args)
    return out, bits.astype(jnp.uint8), unan[0] != 0
