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
    f32 temps fit the VMEM budget: double-buffered int16 in/out windows
    (2*2*2*nslots bytes/row) + realign copy + f32 temps."""
    per_row = (10 * nslots + 40) * B
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


_SEMS_PER_SLOT = 2  # _window_pieces emits at most 2 wrap pieces (W <= Z+8)


# ---------------------------------------------------------------------------
# CN pass
# ---------------------------------------------------------------------------


def _in_dmas(m_ref, scr_in, sem_in, plan_row, Z, z0, NT, buf, dc,
             invert=False):
    """Window-read DMA descriptors for one (block row, z-subtile) step
    into double buffer `buf`; pieces/sizes are compile-time constants."""
    dmas = []
    si = 0
    for l in range(dc):
        k, j, s = plan_row[l]
        if invert:
            s = (Z - s) % Z
        for pi, (so, do, n) in enumerate(_window_pieces(s, Z, z0, NT)):
            dmas.append(pltpu.make_async_copy(
                m_ref.at[k, pl.ds(j * Z + so, n)],
                scr_in.at[buf, l, pl.ds(do, n)],
                sem_in.at[buf, si + pi],
            ))
        si += _SEMS_PER_SLOT
    return dmas


def _out_dmas(o_ref, scr_out, sem_out, Z, NT, nslots, row, zt, buf):
    """Output DMA descriptors for step (row, zt) from double buffer `buf`;
    row/zt/buf may be traced scalars (dynamic ref indices)."""
    return [
        pltpu.make_async_copy(
            scr_out.at[buf, l],
            o_ref.at[l, pl.ds(row * Z + zt * NT, NT)],
            sem_out.at[buf, l],
        )
        for l in range(nslots)
    ]


def _cn_qc_kernel(m_ref, o_ref, synd_ref, scr_in, scr_al, scr_out, sem_in,
                  sem_out, *, li_plan, Z, NT, dc, out_dtype):
    i = pl.program_id(0)
    zt = pl.program_id(1)
    nzt = Z // NT
    mb = len(li_plan)
    nsteps = mb * nzt
    st = i * nzt + zt
    buf = st % 2

    # --- double-buffered input windows: issue step st+1's DMAs before
    # waiting on step st's (issued at step st-1), so the next subtile's
    # HBM reads overlap this subtile's compute + writeback
    for ci in range(mb):
        for czt in range(nzt):
            cst = ci * nzt + czt
            @pl.when((i == ci) & (zt == czt))
            def _(ci=ci, czt=czt, cst=cst):
                if cst == 0:
                    for d in _in_dmas(m_ref, scr_in, sem_in, li_plan[ci],
                                      Z, czt * NT, NT, 0, dc):
                        d.start()
                if cst + 1 < nsteps:
                    nci, nczt = divmod(cst + 1, nzt)
                    for d in _in_dmas(m_ref, scr_in, sem_in, li_plan[nci],
                                      Z, nczt * NT, NT, (cst + 1) % 2, dc):
                        d.start()
                for d in _in_dmas(m_ref, scr_in, sem_in, li_plan[ci],
                                  Z, czt * NT, NT, cst % 2, dc):
                    d.wait()

    # realign: window row r = lo mod 8 is the first wanted row; r depends
    # only on the slot's shift (NT % 8 == 0), so one branch per block row
    for ci in range(mb):
        @pl.when(i == ci)
        def _(ci=ci):
            for l in range(dc):
                r = (-li_plan[ci][l][2]) % 8
                scr_al[l] = scr_in[buf, l, pl.ds(r, NT)]

    # before overwriting scr_out[buf], drain the output DMAs issued from
    # it two steps ago
    if nsteps > 2:
        @pl.when(st >= 2)
        def _():
            pst = st - 2
            for d in _out_dmas(o_ref, scr_out, sem_out, Z, NT, dc,
                               pst // nzt, pst % nzt, buf):
                d.wait()

    # two-min + parity over slots (f32 compute, exact on int16 values;
    # native packed-int16 compares are unsupported by Mosaic on v5e —
    # "Target does not support this comparison" — so 16-bit values only
    # save HBM/VMEM traffic, not VPU ops)
    B = scr_al.shape[-1]
    cdt = jnp.float32
    INF = jnp.asarray(np.inf, cdt)
    x0 = scr_al[0].astype(cdt)
    neg_par = x0 < 0
    min1, min2 = jnp.abs(x0), jnp.full((NT, B), INF, cdt)
    for l in range(1, dc):
        xl = scr_al[l].astype(cdt)
        neg_par = neg_par ^ (xl < 0)
        mag = jnp.abs(xl)
        min2 = jnp.minimum(min2, jnp.maximum(min1, mag))
        min1 = jnp.minimum(min1, mag)
    for l in range(dc):
        xl = scr_al[l].astype(cdt)
        # where |x_l| == min1: the min over the OTHERS is min2 — for a
        # unique minimum by definition, for duplicated minima min2 == min1
        # so the branches agree; no first-argmin bookkeeping needed
        # (value-identical to chk_update_minsum, enforced by the
        # equivalence suites)
        tmp = jnp.where(jnp.abs(xl) == min1, min2, min1)
        flip = neg_par ^ (xl < 0)
        scr_out[buf, l] = jnp.where(flip, -tmp, tmp).astype(out_dtype)

    # per-tile syndrome indicator of the INPUT signs
    synd_ref[...] = jnp.broadcast_to(
        jnp.min((~neg_par).astype(jnp.int32), axis=0, keepdims=True), (8, B)
    ).astype(jnp.int8)

    # issue this step's writeback; it drains two steps later (or in the
    # final-step epilogue below)
    for d in _out_dmas(o_ref, scr_out, sem_out, Z, NT, dc, i, zt, buf):
        d.start()

    @pl.when(st == nsteps - 1)
    def _():
        for d in _out_dmas(o_ref, scr_out, sem_out, Z, NT, dc, i, zt, buf):
            d.wait()
        if nsteps > 1:
            pst = st - 1
            for d in _out_dmas(o_ref, scr_out, sem_out, Z, NT, dc,
                               pst // nzt, pst % nzt, 1 - buf):
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
            pltpu.VMEM((2, dc, NT + 8, B), m3.dtype),
            pltpu.VMEM((dc, NT, B), m3.dtype),
            pltpu.VMEM((2, dc, NT, B), m3.dtype),
            pltpu.SemaphoreType.DMA((2, _SEMS_PER_SLOT * dc)),
            pltpu.SemaphoreType.DMA((2, dc)),
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


def _vn_qc_kernel(*refs, kj_plan, Z, NT, dv, ops, use_tot, out_dtype,
                  int_compute):
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
    nzt = Z // NT
    nb = len(kj_plan)
    nsteps = nb * nzt
    st = j * nzt + zt
    buf = st % 2

    # channel tile: double-buffered with fully dynamic offsets (contiguous
    # single-piece reads need no static pieces)
    def cha_dma(step, b):
        return pltpu.make_async_copy(
            cha_ref.at[pl.ds((step // nzt) * Z + (step % nzt) * NT, NT)],
            scr_cha.at[b], sem_cha.at[b],
        )

    @pl.when(st == 0)
    def _():
        cha_dma(st, buf).start()
    if nsteps > 1:
        @pl.when(st < nsteps - 1)
        def _():
            cha_dma(st + 1, 1 - buf).start()

    # double-buffered input windows (see _cn_qc_kernel)
    for cj in range(nb):
        for czt in range(nzt):
            cst = cj * nzt + czt
            @pl.when((j == cj) & (zt == czt))
            def _(cj=cj, czt=czt, cst=cst):
                if cst == 0:
                    for d in _in_dmas(m_ref, scr_in, sem_in, kj_plan[cj],
                                      Z, czt * NT, NT, 0, dv, invert=True):
                        d.start()
                if cst + 1 < nsteps:
                    ncj, nczt = divmod(cst + 1, nzt)
                    for d in _in_dmas(m_ref, scr_in, sem_in, kj_plan[ncj],
                                      Z, nczt * NT, NT, (cst + 1) % 2, dv,
                                      invert=True):
                        d.start()
                for d in _in_dmas(m_ref, scr_in, sem_in, kj_plan[cj],
                                  Z, czt * NT, NT, cst % 2, dv, invert=True):
                    d.wait()
    for cj in range(nb):
        @pl.when(j == cj)
        def _(cj=cj):
            for k in range(dv):
                r = kj_plan[cj][k][2] % 8  # (-inv) % 8 == s % 8
                scr_al[k] = scr_in[buf, k, pl.ds(r, NT)]
    cha_dma(st, buf).wait()

    if nsteps > 2:
        @pl.when(st >= 2)
        def _():
            pst = st - 2
            for d in _out_dmas(o_ref, scr_out, sem_out, Z, NT, dv,
                               pst // nzt, pst % nzt, buf):
                d.wait()

    B = scr_cha.shape[-1]
    # f32 compute (exact on the int16 values below 2^24); int_compute is
    # plumbing for TPU generations with packed-int16 VPU compares (v5e's
    # Mosaic rejects vector i16 cmp, so it is forced off in vn_qc_pass)
    cdt = jnp.int16 if int_compute else jnp.float32
    zero = jnp.zeros((), cdt)
    cha = scr_cha[buf].astype(cdt)
    msg = [scr_al[k].astype(cdt) for k in range(dv)]
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
        for oi, (op_operands, nthr, sym, has_tie) in enumerate(ops):
            if oi == 0 and tot is not None:
                s_sum = tot - msg[i_out]
            else:
                s_sum = vals[op_operands[0]]
                for sl in op_operands[1:]:
                    s_sum = s_sum + vals[sl]
            thr_r, lev_r, tlo_r, thi_r = prm[oi]
            if sym:
                # sign x magnitude factorization (arith.py sym_thr):
                # half-depth chain on |s|, sign applied once — validated
                # exhaustively at build time against the integer LUT
                msum = jnp.abs(s_sum)
                out = jnp.full((NT, B), lev_r[0, 0].astype(cdt), cdt)
                for t in range(nthr):
                    out = jnp.where(msum >= thr_r[0, t].astype(cdt),
                                    lev_r[0, t + 1].astype(cdt), out)
                out = jnp.where(s_sum < zero, -out, out)
            else:
                out = jnp.full((NT, B), lev_r[0, 0].astype(cdt), cdt)
                for t in range(nthr):
                    out = jnp.where(s_sum >= thr_r[0, t].astype(cdt),
                                    lev_r[0, t + 1].astype(cdt), out)
            if has_tie:
                tie_src = vals[op_operands[-1]]
                tie = jnp.where(tie_src < 0, tlo_r[0, 0].astype(cdt),
                                thi_r[0, 0].astype(cdt))
                out = jnp.where(s_sum == zero, tie, out)
            vals.append(out)
        out_i = vals[-1]
        scr_out[buf, i_out] = out_i.astype(out_dtype)
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

    for d in _out_dmas(o_ref, scr_out, sem_out, Z, NT, dv, j, zt, buf):
        d.start()

    @pl.when(st == nsteps - 1)
    def _():
        for d in _out_dmas(o_ref, scr_out, sem_out, Z, NT, dv, j, zt, buf):
            d.wait()
        if nsteps > 1:
            pst = st - 1
            for d in _out_dmas(o_ref, scr_out, sem_out, Z, NT, dv,
                               pst // nzt, pst % nzt, 1 - buf):
                d.wait()


def vn_qc_pass(m_cn, cha, plan, Z, nb, nvp, struct, prm, use_tot,
               flags=None):
    """m_cn (dc, nchk_pad, B), cha (nvar_pad, B) int16 values ->
    (m_vn (dv, nvp, B), bits (nb*Z, B) uint8, unan (B,) bool).

    prm: per-op dict with thr (nthr,), levels (nthr+1,), tie_lo, tie_hi
    for ONE iteration (sliced by the caller / scanned as xs); for
    symmetric ops the caller passes the magnitude thresholds/levels in the
    same slots.  flags: per-op static dicts (sym, has_tie) from
    ArithLUTDecoder._op_flags; None means full chains with ties."""
    dc, ncp, B = m_cn.shape
    dv = max(e[0] for e in plan) + 1
    NT = _pick_nt(Z, B, dv + 1)
    kj_plan = [[None] * dv for _ in range(nb)]
    for k, j, l, i, s in plan:
        kj_plan[j][k] = (l, i, s)
    kj_plan = tuple(tuple(row) for row in kj_plan)
    if flags is None:
        flags = [dict(sym=False, has_tie=True) for _ in struct.ops]
    ops_static = tuple(
        (tuple(int(x) for x in op.operands), int(prm[oi]["thr"].shape[-1]),
         bool(flags[oi]["sym"]), bool(flags[oi]["has_tie"]))
        for oi, op in enumerate(struct.ops)
    )
    # native int16 compute is exact when every op's accumulation stays in
    # range: 2-operand ops (partial = one table value <= 32600, final
    # validated at build) and the total-minus-self shortcut for <= 4 leaf
    # operands (leaf tables <= 32000/4 by the int16 scale in arith.py)
    is_int = m_cn.dtype == jnp.int16
    ops_ok = all(
        len(opnds) <= 2 or (oi == 0 and use_tot)
        for oi, (opnds, *_rest) in enumerate(ops_static)
    )
    # v5e Mosaic lacks packed i16 vector compares; force the f32 path
    int_compute = False and bool(
        is_int and ops_ok and (not use_tot or dv <= 4)
    )
    nzt = Z // NT
    grid = (nb, nzt)
    kern = functools.partial(
        _vn_qc_kernel, kj_plan=kj_plan, Z=Z, NT=NT, dv=dv, ops=ops_static,
        use_tot=bool(use_tot), out_dtype=m_cn.dtype,
        int_compute=int_compute,
    )
    prm_dtype = jnp.int32 if is_int else jnp.float32
    param_args = []
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    for oi in range(len(struct.ops)):
        p = prm[oi]
        for key in ("thr", "levels", "tie_lo", "tie_hi"):
            a = jnp.asarray(p[key], prm_dtype).reshape(1, -1)
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
            pltpu.VMEM((2, dv, NT + 8, B), m_cn.dtype),
            pltpu.VMEM((dv, NT, B), m_cn.dtype),
            pltpu.VMEM((2, NT, B), m_cn.dtype),
            pltpu.VMEM((2, dv, NT, B), m_cn.dtype),
            pltpu.SemaphoreType.DMA((2, _SEMS_PER_SLOT * dv)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, dv)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(m_cn, cha, *param_args)
    bits = bits.astype(jnp.uint8)
    return out, bits, unan.reshape(-1, 8, B)[:, 0].min(axis=0) != 0
