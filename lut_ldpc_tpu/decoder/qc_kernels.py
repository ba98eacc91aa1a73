"""Fused Pallas TPU kernels for quasi-cyclic LUT decoding.

For a QC graph the v2c/c2v message permutations decompose into
per-circulant cyclic shifts with compile-time shift constants
(fast_layout.GroupedLayout.qc_roll_plan).  These kernels fuse the shifts
into the CN / VN passes as static-size HBM->VMEM DMAs (a wrapped roll is
at most two contiguous copies), so one decode iteration touches HBM
exactly four times (CN read+write, VN read+write) instead of paying a
separate DMA-issue-bound row gather (~150 GB/s) per direction:

- ``cn_qc_pass``: reads the (dv, nvar_pad, B) VN-grouped message planes
  with the v2c rolls applied during the DMA, computes the min-LUT CN
  update (two-min + sign parity, value-identical to chk_update_minsum,
  /root/reference/src/LDPC_Code_LUT.cpp:355-402) per check block, writes
  the (dc, nchk_pad, B) CN-grouped planes, and emits per-tile syndrome
  indicators of the INPUT signs (the early-exit syndrome check,
  LDPC_Code_LUT.cpp:327).
- ``vn_qc_pass``: reads the CN-grouped planes with the c2v rolls applied,
  evaluates the per-iteration leave-one-out VN threshold trees (the
  arithmetic value-domain form validated by decoder/arith.py), writes the
  next VN-grouped planes plus hard-decision bits and per-tile sign
  unanimity.

Tiling: the grid runs over (block, z-subtile) with the LANE dimension
kept whole, so every DMA moves fully contiguous (rows x B) chunks at HBM
stream bandwidth; z-subtile boundaries are unrolled into pl.when branches
because the wrap split of each roll is a compile-time constant per
(block, subtile, slot).  Shifts are ARBITRARY: each roll DMA reads an
8-row-enlarged window at the sublane-tile-aligned offset below the
requested one, and a static sublane-offset VMEM slice (r = lo mod 8,
constant across subtiles because NT % 8 == 0) realigns it.  Aligning the
shifts themselves (s % 8 == 0 with 8 | Z) is NOT an option: z mod 8 would
be invariant along every edge and the code would decompose into 8
disconnected length-N/8 subcodes.

Exactness: values are int16 (|v| <= 32600); compute is float32, where
integer arithmetic below 2^24 is exact, emission uses the validated
select-chain form (bit-identical to the int delta form), and the CN
min1/min2 first-argmin formulation equals the prefix/suffix form
value-for-value.  ArithLUTDecoder asserts bit-identicality against the
scalar golden model in the decoder-equivalence suites.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cn_qc_pass", "vn_qc_pass", "qc_kernels_supported"]

_VMEM_LIMIT = 100 * 1024 * 1024


def qc_kernels_supported() -> bool:
    import os

    if os.environ.get("LUT_LDPC_NO_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _pick_nt(Z: int, B: int, nslots: int, budget: int = 40 << 20) -> int:
    """Largest z-subtile NT (multiple of 8, dividing Z) whose scratch +
    f32 temps fit the VMEM budget: ~(4 bytes * 2 * nslots + 40) * NT * B."""
    per_row = (4 * 2 * nslots + 40) * B
    nt = max(8, min(Z, budget // per_row // 8 * 8))
    while Z % nt:
        nt -= 8
    return max(nt, 8)


def _window_pieces(s: int, Z: int, z0: int, NT: int):
    """Static (src_off, dst_off, size) pieces for reading the NT+8-row
    aligned window that covers rows (z - s) mod Z, z in [z0, z0+NT): the
    window starts at lo8 = 8*floor(lo/8) with lo = (z0 - s) mod Z, so
    every src/dst offset and size is a multiple of 8.  The caller slices
    dst rows [lo-lo8, lo-lo8+NT) to realign."""
    lo = (z0 - s) % Z
    lo8 = lo - lo % 8
    W = NT + 8
    pieces, src, dst = [], lo8, 0
    while dst < W:
        n = min(Z - src, W - dst)
        pieces.append((src, dst, n))
        dst += n
        src = 0
    return pieces


def _dma_roll(src_ref, plane, base, dst_ref, slot, s, Z, z0, NT, sems, si):
    dmas = []
    for pi, (so, do, n) in enumerate(_window_pieces(s, Z, z0, NT)):
        d = pltpu.make_async_copy(
            src_ref.at[plane, pl.ds(base + so, n)],
            dst_ref.at[slot, pl.ds(do, n)],
            sems.at[si + pi],
        )
        d.start()
        dmas.append(d)
    return dmas


_SEMS_PER_SLOT = 2  # _window_pieces emits at most 2 wrap pieces (W <= Z+8)


# ---------------------------------------------------------------------------
# CN pass
# ---------------------------------------------------------------------------


def _cn_qc_kernel(m_ref, o_ref, synd_ref, scr_in, scr_al, scr_out, sem_in,
                  sem_out, *, li_plan, Z, NT, dc, out_dtype):
    i = pl.program_id(0)
    zt = pl.program_id(1)
    nzt = pl.num_programs(1)

    for ci in range(len(li_plan)):
        for czt in range(Z // NT):
            @pl.when((i == ci) & (zt == czt))
            def _(ci=ci, czt=czt):
                dmas = []
                si = 0
                for l in range(dc):
                    k, j, s = li_plan[ci][l]
                    dmas += _dma_roll(m_ref, k, j * Z, scr_in, l, s, Z,
                                      czt * NT, NT, sem_in, si)
                    si += _SEMS_PER_SLOT
                for d in dmas:
                    d.wait()

    # realign: window row r = lo mod 8 is the first wanted row; r depends
    # only on the slot's shift (NT % 8 == 0), so one branch per block row
    for ci in range(len(li_plan)):
        @pl.when(i == ci)
        def _(ci=ci):
            for l in range(dc):
                r = (-li_plan[ci][l][2]) % 8
                scr_al[l] = scr_in[l, pl.ds(r, NT)]

    # two-min + parity over slots (f32 compute, exact on int16 values)
    B = scr_al.shape[-1]
    x0 = scr_al[0].astype(jnp.float32)
    neg_par = x0 < 0
    min1, min2 = jnp.abs(x0), jnp.full((NT, B), jnp.inf, jnp.float32)
    for l in range(1, dc):
        xl = scr_al[l].astype(jnp.float32)
        neg_par = neg_par ^ (xl < 0)
        mag = jnp.abs(xl)
        min2 = jnp.minimum(min2, jnp.maximum(min1, mag))
        min1 = jnp.minimum(min1, mag)
    cnt = jnp.zeros((NT, B), jnp.int32)
    for l in range(dc):
        xl = scr_al[l].astype(jnp.float32)
        eq = jnp.abs(xl) == min1
        first = eq & (cnt == 0)
        cnt = cnt + eq.astype(jnp.int32)
        tmp = jnp.where(first, min2, min1)
        flip = neg_par ^ (xl < 0)
        scr_out[l] = jnp.where(flip, -tmp, tmp).astype(out_dtype)

    # per-tile syndrome indicator of the INPUT signs
    synd_ref[...] = jnp.broadcast_to(
        jnp.min((~neg_par).astype(jnp.int32), axis=0, keepdims=True), (8, B)
    ).astype(jnp.int8)

    outs = []
    for l in range(dc):
        d = pltpu.make_async_copy(
            scr_out.at[l],
            o_ref.at[l, pl.ds(i * Z + zt * NT, NT)],
            sem_out.at[l],
        )
        d.start()
        outs.append(d)
    for d in outs:
        d.wait()


def cn_qc_pass(m3, plan, Z, mb, ncp):
    """m3 (dv, nvar_pad, B) int16 -> (m_cn (dc, ncp, B), synd_ok (B,) bool).

    plan: qc_roll_plan entries (k, j, l, i, s); shifts are arbitrary
    (aligned-window DMA + static realign slice).  Pad rows of the output
    planes are left undefined (masked by all consumers)."""
    dv, nvp, B = m3.shape
    dc = max(e[2] for e in plan) + 1
    NT = _pick_nt(Z, B, dc)
    li_plan = [[None] * dc for _ in range(mb)]
    for k, j, l, i, s in plan:
        li_plan[i][l] = (k, j, s)
    li_plan = tuple(tuple(row) for row in li_plan)
    nzt = Z // NT
    grid = (mb, nzt)
    kern = functools.partial(
        _cn_qc_kernel, li_plan=li_plan, Z=Z, NT=NT, dc=dc, out_dtype=m3.dtype
    )
    out, synd = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((dc, ncp, B), m3.dtype),
            jax.ShapeDtypeStruct((mb * nzt * 8, B), jnp.int8),
        ],
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((8, B), lambda i, zt: (i * nzt + zt, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((dc, NT + 8, B), m3.dtype),
            pltpu.VMEM((dc, NT, B), m3.dtype),
            pltpu.VMEM((dc, NT, B), m3.dtype),
            pltpu.SemaphoreType.DMA((_SEMS_PER_SLOT * dc,)),
            pltpu.SemaphoreType.DMA((dc,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(m3)
    synd_ok = jnp.min(synd.reshape(-1, 8, B)[:, 0], axis=0) != 0
    return out, synd_ok


# ---------------------------------------------------------------------------
# VN pass
# ---------------------------------------------------------------------------


def _vn_qc_kernel(*refs, kj_plan, Z, NT, dv, ops, use_tot, out_dtype):
    # refs: m_ref, cha_ref, <4 SMEM per op>, o_ref, bits_ref, unan_ref,
    #       scr_in, scr_al, scr_cha, scr_out, sem_in, sem_cha, sem_out
    nops = len(ops)
    m_ref, cha_ref = refs[0], refs[1]
    prm = [refs[2 + 4 * oi: 2 + 4 * oi + 4] for oi in range(nops)]
    o_ref, bits_ref, unan_ref = refs[2 + 4 * nops: 5 + 4 * nops]
    (scr_in, scr_al, scr_cha, scr_out,
     sem_in, sem_cha, sem_out) = refs[5 + 4 * nops:]

    j = pl.program_id(0)
    zt = pl.program_id(1)

    dcha = pltpu.make_async_copy(
        cha_ref.at[pl.ds(j * Z + zt * NT, NT)], scr_cha, sem_cha
    )
    dcha.start()
    for cj in range(len(kj_plan)):
        for czt in range(Z // NT):
            @pl.when((j == cj) & (zt == czt))
            def _(cj=cj, czt=czt):
                dmas = []
                si = 0
                for k in range(dv):
                    l, i, s = kj_plan[cj][k]
                    # inverse roll: dst[z] = src[l, i*Z + (z + s) % Z]
                    inv = (Z - s) % Z
                    dmas += _dma_roll(m_ref, l, i * Z, scr_in, k, inv, Z,
                                      czt * NT, NT, sem_in, si)
                    si += _SEMS_PER_SLOT
                for d in dmas:
                    d.wait()
    for cj in range(len(kj_plan)):
        @pl.when(j == cj)
        def _(cj=cj):
            for k in range(dv):
                r = kj_plan[cj][k][2] % 8  # (-inv) % 8 == s % 8
                scr_al[k] = scr_in[k, pl.ds(r, NT)]
    dcha.wait()

    B = scr_cha.shape[-1]
    cha = scr_cha[...].astype(jnp.float32)
    msg = [scr_al[k].astype(jnp.float32) for k in range(dv)]
    tot = None
    if use_tot:
        tot = msg[0]
        for k in range(1, dv):
            tot = tot + msg[k]

    neg0 = None
    agree = None
    for i_out in range(dv):
        others = [msg[k] for k in range(dv) if k != i_out]
        vals = others + [cha]
        for oi, (op_operands, nthr) in enumerate(ops):
            if oi == 0 and tot is not None:
                s_sum = tot - msg[i_out]
            else:
                s_sum = vals[op_operands[0]]
                for sl in op_operands[1:]:
                    s_sum = s_sum + vals[sl]
            thr_r, lev_r, tlo_r, thi_r = prm[oi]
            out = jnp.full((NT, B), lev_r[0, 0], jnp.float32)
            for t in range(nthr):
                out = jnp.where(s_sum >= thr_r[0, t], lev_r[0, t + 1], out)
            tie_src = vals[op_operands[-1]]
            tie = jnp.where(tie_src < 0, tlo_r[0, 0], thi_r[0, 0])
            vals.append(jnp.where(s_sum == 0.0, tie, out))
        out_i = vals[-1]
        scr_out[i_out] = out_i.astype(out_dtype)
        ni = out_i < 0
        if neg0 is None:
            neg0 = ni
        else:
            a = ni == neg0
            agree = a if agree is None else (agree & a)
    bits_ref[...] = neg0.astype(jnp.int8)
    if agree is None:
        agree = jnp.ones((NT, B), bool)
    unan_ref[...] = jnp.broadcast_to(
        jnp.min(agree.astype(jnp.int32), axis=0, keepdims=True), (8, B)
    ).astype(jnp.int8)

    outs = []
    for k in range(dv):
        d = pltpu.make_async_copy(
            scr_out.at[k],
            o_ref.at[k, pl.ds(j * Z + zt * NT, NT)],
            sem_out.at[k],
        )
        d.start()
        outs.append(d)
    for d in outs:
        d.wait()


def vn_qc_pass(m_cn, cha, plan, Z, nb, nvp, struct, prm, use_tot):
    """m_cn (dc, nchk_pad, B), cha (nvar_pad, B) int16 values ->
    (m_vn (dv, nvp, B), bits (nb*Z, B) uint8, unan (B,) bool).

    prm: per-op dict with thr (nthr,), levels (nthr+1,), tie_lo, tie_hi
    for ONE iteration (sliced by the caller / scanned as xs)."""
    dc, ncp, B = m_cn.shape
    dv = max(e[0] for e in plan) + 1
    NT = _pick_nt(Z, B, dv + 1)
    kj_plan = [[None] * dv for _ in range(nb)]
    for k, j, l, i, s in plan:
        kj_plan[j][k] = (l, i, s)
    kj_plan = tuple(tuple(row) for row in kj_plan)
    ops_static = tuple(
        (tuple(int(x) for x in op.operands), int(prm[oi]["thr"].shape[-1]))
        for oi, op in enumerate(struct.ops)
    )
    nzt = Z // NT
    grid = (nb, nzt)
    kern = functools.partial(
        _vn_qc_kernel, kj_plan=kj_plan, Z=Z, NT=NT, dv=dv, ops=ops_static,
        use_tot=bool(use_tot), out_dtype=m_cn.dtype,
    )
    param_args = []
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    for oi in range(len(struct.ops)):
        p = prm[oi]
        for key in ("thr", "levels", "tie_lo", "tie_hi"):
            a = jnp.asarray(p[key], jnp.float32).reshape(1, -1)
            param_args.append(a)
            in_specs.append(
                pl.BlockSpec(a.shape, lambda j, zt: (0, 0),
                             memory_space=pltpu.SMEM)
            )
    out, bits, unan = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((dv, nvp, B), m_cn.dtype),
            jax.ShapeDtypeStruct((nb * Z, B), jnp.int8),
            jax.ShapeDtypeStruct((nb * nzt * 8, B), jnp.int8),
        ],
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((NT, B), lambda j, zt: (j * nzt + zt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B), lambda j, zt: (j * nzt + zt, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((dv, NT + 8, B), m_cn.dtype),
            pltpu.VMEM((dv, NT, B), m_cn.dtype),
            pltpu.VMEM((NT, B), m_cn.dtype),
            pltpu.VMEM((dv, NT, B), m_cn.dtype),
            pltpu.SemaphoreType.DMA((_SEMS_PER_SLOT * dv,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((dv,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(m_cn, cha, *param_args)
    bits = bits.astype(jnp.uint8)
    return out, bits, unan.reshape(-1, 8, B)[:, 0].min(axis=0) != 0
