"""Fused Pallas TPU kernels for quasi-cyclic LUT decoding — regular AND
irregular codes.

For a QC graph the v2c/c2v message permutations decompose into
per-circulant cyclic shifts with compile-time constants
(fast_layout.GroupedLayout.qc_plan).  These kernels fuse the shifts into
the CN / VN passes as static-size HBM->VMEM DMAs (a wrapped roll is at
most two contiguous copies), so one decode iteration touches HBM exactly
four times (CN read+write, VN read+write) instead of paying a separate
DMA-issue-bound row gather per direction — and, just as important on this
environment's tunneled TPU, one iteration is exactly TWO kernel launches
(the tunnel penalizes op count brutally; see BASELINE.md).

Message state lives in the FLAT slot-major padded edge arrays of
fast_layout.GroupedLayout — the same (E, B) layout the XLA path uses —
extended by NT scratch rows at the tail where slots of
lower-than-maximum-degree blocks park their unused output DMAs:

- ``cn_qc_pass``: reads each check block's dc input windows from the
  VN-grouped array with the v2c rolls applied during the DMA, computes
  the min-LUT CN update (two-min + sign parity, value-identical to
  chk_update_minsum, /root/reference/src/LDPC_Code_LUT.cpp:355-402),
  writes the CN-grouped rows, and emits per-tile syndrome indicators of
  the INPUT signs (the early-exit syndrome check, LDPC_Code_LUT.cpp:327).
  Check blocks of lower degree than the maximum pad their remaining
  slots with +INF in VMEM — sign-positive and never the min, so the
  two-min/parity compute is uniform across degree classes.
- ``vn_qc_pass``: reads each variable block's dv windows from the
  CN-grouped array with the c2v rolls applied, evaluates that block's
  degree class's per-iteration leave-one-out VN threshold trees (the
  arithmetic value-domain form validated by decoder/arith.py), writes
  the next VN-grouped rows plus hard-decision bits and per-tile sign
  unanimity.  Compute is unrolled once per degree class; DMA issue once
  per (block, z-subtile) as in the CN pass.

Tiling: the grid runs over (block, z-subtile) with the LANE dimension
kept whole, so every DMA moves fully contiguous (rows x B) chunks at HBM
stream bandwidth; (block, subtile) pairs are unrolled into pl.when
branches because the wrap split of each roll is a compile-time constant
per (block, subtile, slot).  Output drains ride dynamic offsets from an
SMEM base table (the descriptors of a step issued two steps ago belong
to a different branch).  Shifts are ARBITRARY: each roll DMA reads an
8-row-enlarged window at the sublane-tile-aligned offset below the
requested one, and a static sublane-offset VMEM slice (r = lo mod 8,
constant across subtiles because NT % 8 == 0) realigns it.

Exactness: values are int16 (|v| <= 32600) or float32; compute is
float32 (exact on the int16 grid: integer arithmetic below 2^24),
emission uses the validated select-chain form (bit-identical to the int
delta form), and the CN min1/min2 first-argmin formulation equals the
prefix/suffix form value-for-value.  ArithLUTDecoder asserts
bit-identicality against the scalar golden model in the
decoder-equivalence suites.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cn_qc_pass", "vn_qc_pass", "qc_kernels_supported", "pick_nt"]

_VMEM_LIMIT = 110 * 1024 * 1024


def _interpret() -> bool:
    """Pallas interpret mode: runs the kernels on CPU for tests
    (LUT_LDPC_PALLAS_INTERPRET=1) — same dataflow, no Mosaic."""
    import os

    return bool(os.environ.get("LUT_LDPC_PALLAS_INTERPRET"))


def qc_kernels_supported() -> bool:
    import os

    if os.environ.get("LUT_LDPC_NO_PALLAS"):
        return False
    if _interpret():
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def pick_nt(Z: int, B: int, nslots: int, itemsize: int,
            budget: int = 80 << 20) -> int:
    """Largest z-subtile NT (multiple of 8, dividing Z) whose scratch +
    f32 temps fit the VMEM budget: double-buffered in/out windows +
    realign copy + channel (5*nslots + 4 rows of `itemsize`) + f32 temps
    (~nslots + 6 rows)."""
    per_row = ((5 * nslots + 4) * itemsize + (nslots + 6) * 4) * B
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


def _in_dmas(m_ref, scr_in, sem_in, srcs, Z, z0, NT, buf, invert=False):
    """Window-read DMA descriptors for one (block, z-subtile) step into
    double buffer `buf`; srcs = ((flat_base, shift), ...) per slot;
    pieces/sizes are compile-time constants."""
    dmas = []
    for l, (base, s) in enumerate(srcs):
        if invert:
            s = (Z - s) % Z
        for pi, (so, do, n) in enumerate(_window_pieces(s, Z, z0, NT)):
            dmas.append(pltpu.make_async_copy(
                m_ref.at[pl.ds(base + so, n)],
                scr_in.at[buf, l, pl.ds(do, n)],
                sem_in.at[buf, _SEMS_PER_SLOT * l + pi],
            ))
    return dmas


def _out_dmas(o_ref, scr_out, sem_out, dst_tbl, NT, nslots, row, zt, buf):
    """Output DMA descriptors for step (row, zt) from double buffer `buf`,
    for the step's `nslots` REAL slots only.  Irregular codes: a block of
    degree d < max degree starts d descriptors — dummy full-tile writes to
    the scratch tail cost real HBM bandwidth (~4x write amplification on
    the dv{2,3,9,17} profile whose mean degree is 4.3 vs max 17).  Starts
    AND drains are emitted from the static per-(block, subtile) branch
    nest, so `row`/`zt` are Python ints and the drain of the step issued
    two steps ago reconstructs the same descriptors statically
    (destinations ride an SMEM base table in 8-row units so Mosaic can
    prove sublane-tile alignment)."""
    return [
        pltpu.make_async_copy(
            scr_out.at[buf, l],
            o_ref.at[pl.ds(dst_tbl[row, l] * 8 + zt * NT, NT)],
            sem_out.at[buf, l],
        )
        for l in range(nslots)
    ]


# ---------------------------------------------------------------------------
# CN pass
# ---------------------------------------------------------------------------


def _cn_qc_kernel(dst_tbl, m_ref, o_ref, synd_ref, scr_in, scr_al, scr_out,
                  sem_in, sem_out, *, rows, Z, NT, max_dc, out_dtype):
    """rows: per grid block (class_idx, ((vn_base, shift), ...), dc)."""
    i = pl.program_id(0)
    zt = pl.program_id(1)
    nzt = Z // NT
    nrows = len(rows)
    nsteps = nrows * nzt
    st = i * nzt + zt
    buf = st % 2

    # --- double-buffered input windows: issue step st+1's DMAs before
    # waiting on step st's (issued at step st-1), so the next subtile's
    # HBM reads overlap this subtile's compute + writeback
    for ci in range(nrows):
        for czt in range(nzt):
            cst = ci * nzt + czt
            @pl.when((i == ci) & (zt == czt))
            def _(ci=ci, czt=czt, cst=cst):
                if cst == 0:
                    for d in _in_dmas(m_ref, scr_in, sem_in, rows[ci][1],
                                      Z, czt * NT, NT, 0):
                        d.start()
                if cst + 1 < nsteps:
                    nci, nczt = divmod(cst + 1, nzt)
                    for d in _in_dmas(m_ref, scr_in, sem_in, rows[nci][1],
                                      Z, nczt * NT, NT, (cst + 1) % 2):
                        d.start()
                for d in _in_dmas(m_ref, scr_in, sem_in, rows[ci][1],
                                  Z, czt * NT, NT, cst % 2):
                    d.wait()

    # drain the output DMAs issued two steps ago from this buffer parity
    # (before compute overwrites scr_out[buf]); per-(block, prev-block)
    # cases with STATIC previous-block index => static REAL slot count
    # (see the VN kernel for the case derivation)
    for ci in range(nrows):
        if nzt == 1:
            cases = [(ci - 2, st >= 2, zt)]
        else:
            cases = [(ci, zt >= 2, zt - 2), (ci - 1, (st >= 2) & (zt < 2),
                                             zt - 2 + nzt)]
        for pci, cond, pzt in cases:
            if pci < 0 or (nzt == 2 and pci == ci):
                continue  # statically unreachable
            @pl.when((i == ci) & cond)
            def _(pci=pci, pzt=pzt):
                for d in _out_dmas(o_ref, scr_out, sem_out, dst_tbl, NT,
                                   rows[pci][2], pci, pzt, buf):
                    d.wait()

    # realign: window row r = lo mod 8 is the first wanted row; r depends
    # only on the slot's shift (NT % 8 == 0), so one branch per block.
    # Slots beyond a block's degree hold +INF: sign-positive and never
    # min1/min2, so the two-min + parity below is class-uniform.
    B = scr_al.shape[-1]
    INF_S = jnp.asarray(
        np.iinfo(np.int16).max if scr_al.dtype == jnp.int16 else np.inf,
        scr_al.dtype,
    )
    for ci in range(nrows):
        @pl.when(i == ci)
        def _(ci=ci):
            srcs = rows[ci][1]
            for l in range(len(srcs)):
                r = (-srcs[l][1]) % 8
                scr_al[l] = scr_in[buf, l, pl.ds(r, NT)]
            for l in range(len(srcs), max_dc):
                scr_al[l] = jnp.full((NT, B), INF_S, scr_al.dtype)

    # two-min + parity over slots (f32 compute, exact on int16 values;
    # +INF pad slots are identity for both)
    cdt = jnp.float32
    INF = jnp.asarray(np.inf, cdt)
    x0 = scr_al[0].astype(cdt)
    neg_par = x0 < 0
    min1, min2 = jnp.abs(x0), jnp.full((NT, B), INF, cdt)
    for l in range(1, max_dc):
        xl = scr_al[l].astype(cdt)
        neg_par = neg_par ^ (xl < 0)
        mag = jnp.abs(xl)
        min2 = jnp.minimum(min2, jnp.maximum(min1, mag))
        min1 = jnp.minimum(min1, mag)
    for l in range(max_dc):
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

    # issue this step's writeback (REAL slots only); it drains two steps
    # later in the drain nest above, or in the final-step epilogue here.
    # One branch per BLOCK: the subtile index enters the destinations as a
    # traced scalar (zt*NT is a multiple of 8 => sublane-tile aligned)
    for ci in range(nrows):
        @pl.when(i == ci)
        def _(ci=ci):
            for d in _out_dmas(o_ref, scr_out, sem_out, dst_tbl, NT,
                               rows[ci][2], ci, zt, buf):
                d.start()
            if ci == nrows - 1:
                @pl.when(zt == nzt - 1)
                def _():
                    for d in _out_dmas(o_ref, scr_out, sem_out, dst_tbl, NT,
                                       rows[ci][2], ci, zt, buf):
                        d.wait()
                    if nsteps > 1:
                        pci, pczt = divmod(nsteps - 2, nzt)
                        for d in _out_dmas(o_ref, scr_out, sem_out, dst_tbl,
                                           NT, rows[pci][2], pci, pczt,
                                           (nsteps - 2) % 2):
                            d.wait()


def cn_qc_pass(m_flat, plan, E_cn):
    """m_flat (E_vn [+NT], B) int16/f32 VN-grouped -> (m_cn (E_cn + NT, B),
    synd_ok (B,) bool).

    plan: fast_layout.QCPlan.  The output carries Z scratch rows at the
    tail, kept for shape compatibility with carries that cross batch
    widths; only REAL slot planes are ever written (lower-degree blocks
    start fewer output DMAs — dummy full-tile writes would cost ~4x HBM
    write amplification on the irregular dv{2,3,9,17} profile), so tail
    rows are uninitialized and consumers must index real rows only (they
    do: all reductions mask by block ranges)."""
    B = m_flat.shape[1]
    Z = plan.Z
    max_dc = max(plan.cn_degrees)
    NT = pick_nt(Z, B, max_dc, np.dtype(m_flat.dtype).itemsize)
    rows = tuple(
        (ci, src, len(src)) for ci, src, dst in plan.cn_rows
    )
    dst_tbl = np.full((len(plan.cn_rows), max_dc), E_cn, dtype=np.int64)
    for r, (ci, src, dst) in enumerate(plan.cn_rows):
        dst_tbl[r, : len(dst)] = dst
    if np.any(dst_tbl % 8):
        raise ValueError("cn_qc_pass: destinations must be 8-row aligned")
    dst_tbl = (dst_tbl // 8).astype(np.int32)
    nzt = Z // NT
    grid = (len(rows), nzt)
    kern = functools.partial(
        _cn_qc_kernel, rows=rows, Z=Z, NT=NT, max_dc=max_dc,
        out_dtype=m_flat.dtype,
    )
    out, synd = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((E_cn + Z, B), m_flat.dtype),
            jax.ShapeDtypeStruct((len(rows) * nzt * 8, B), jnp.int8),
        ],
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((8, B), lambda i, zt: (i * nzt + zt, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, max_dc, NT + 8, B), m_flat.dtype),
            pltpu.VMEM((max_dc, NT, B), m_flat.dtype),
            pltpu.VMEM((2, max_dc, NT, B), m_flat.dtype),
            pltpu.SemaphoreType.DMA((2, _SEMS_PER_SLOT * max_dc)),
            pltpu.SemaphoreType.DMA((2, max_dc)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(jnp.asarray(dst_tbl), m_flat)
    synd_ok = jnp.min(synd.reshape(-1, 8, B)[:, 0], axis=0) != 0
    return out, synd_ok


# ---------------------------------------------------------------------------
# VN pass
# ---------------------------------------------------------------------------


def _vn_class_compute(scr_al, scr_cha, scr_out, buf, dv, ops, prm, use_tot,
                      out_dtype, NT, B):
    """LOO threshold-tree update for one degree class; returns
    (neg0 (NT, B) bool, agree (NT, B) bool).

    Shared-sweep leave-one-out (arith.loo_msg_spans): the output excluding
    message i assigns tree position j the message j (j < i) or j+1
    (j >= i), so sub-trees fully below/at-or-above the boundary come from
    TWO shared bottom-up sweeps (identity / shift-by-one) and only the
    straddle path re-evaluates per output: 2*(d-1) + ~d*log(d) op evals
    instead of d*(d-1) — the dv=17 class drops ~2.7x of its VPU work.
    Values are identical op-for-op, so outputs stay bit-identical."""
    cdt = jnp.float32
    zero = jnp.zeros((), cdt)
    cha = scr_cha[buf].astype(cdt)
    msg = [scr_al[k].astype(cdt) for k in range(dv)]
    n_in = dv  # d-1 message positions + the channel leaf (DFS-last)
    nops = len(ops)
    spans = [op[4] for op in ops]
    tot = None
    if use_tot:
        tot = msg[0]
        for k in range(1, dv):
            tot = tot + msg[k]

    def emit_op(oi, s_sum, tie_src):
        op_operands, nthr, sym, has_tie, _span = ops[oi]
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
            tie = jnp.where(tie_src < 0, tlo_r[0, 0].astype(cdt),
                            thi_r[0, 0].astype(cdt))
            out = jnp.where(s_sum == zero, tie, out)
        return out

    def sweep(shift):
        vals = [msg[j + shift] for j in range(dv - 1)] + [cha]
        for oi, op in enumerate(ops):
            s_sum = vals[op[0][0]]
            for sl in op[0][1:]:
                s_sum = s_sum + vals[sl]
            vals.append(emit_op(oi, s_sum, vals[op[0][-1]]))
        return vals[n_in:]

    id_out = sweep(0)
    s1_out = sweep(1) if dv >= 2 else id_out

    neg0 = None
    agree = None
    for i_out in range(dv):
        if i_out == dv - 1:
            out_i = id_out[-1]
        elif i_out == 0:
            out_i = s1_out[-1]
        else:
            cache = {}

            def val(x, i_out=i_out, cache=cache):
                if x < n_in - 1:
                    return msg[x] if x < i_out else msg[x + 1]
                if x == n_in - 1:
                    return cha
                k = x - n_in
                sp = spans[k]
                if sp is None or sp[1] < i_out:
                    return id_out[k]
                if sp[0] >= i_out:
                    return s1_out[k]
                if k not in cache:
                    operands = ops[k][0]
                    if k == 0 and tot is not None:
                        s_sum = tot - msg[i_out]
                    else:
                        s_sum = val(operands[0])
                        for sl in operands[1:]:
                            s_sum = s_sum + val(sl)
                    cache[k] = emit_op(k, s_sum, val(operands[-1]))
                return cache[k]

            out_i = val(n_in + nops - 1)
        scr_out[buf, i_out] = out_i.astype(out_dtype)
        ni = out_i < 0
        if neg0 is None:
            neg0 = ni
        else:
            a = ni == neg0
            agree = a if agree is None else (agree & a)
    if agree is None:  # degree-1 class: single edge, trivially unanimous
        agree = jnp.ones((NT, B), bool)
    return neg0, agree


def _vn_qc_kernel(*refs, cols, class_of, Z, NT, max_dv, ops_by_class,
                  use_tot_by_class, nops_by_class, out_dtype):
    """cols: per grid block (class_idx, node_base, ((cn_base, shift), ...));
    class params arrive as 4 SMEM refs per (class, op), concatenated in
    class order."""
    nclasses = len(ops_by_class)
    nprm = sum(nops_by_class)
    (dst_tbl, node_tbl, m_ref, cha_ref) = refs[:4]
    prm_flat = refs[4 : 4 + 4 * nprm]
    o_ref, bits_ref, unan_ref = refs[4 + 4 * nprm : 7 + 4 * nprm]
    (scr_in, scr_al, scr_cha, scr_bits, scr_out,
     sem_in, sem_cha, sem_bits, sem_out) = refs[7 + 4 * nprm:]
    prm_by_class = []
    off = 0
    for c in range(nclasses):
        prm_by_class.append([
            prm_flat[4 * (off + oi) : 4 * (off + oi) + 4]
            for oi in range(nops_by_class[c])
        ])
        off += nops_by_class[c]

    j = pl.program_id(0)
    zt = pl.program_id(1)
    nzt = Z // NT
    ncols = len(cols)
    nsteps = ncols * nzt
    st = j * nzt + zt
    buf = st % 2

    # channel tile: double-buffered with fully dynamic offsets from the
    # SMEM node-base table (contiguous single-piece reads)
    def cha_dma(step, b):
        return pltpu.make_async_copy(
            cha_ref.at[pl.ds(node_tbl[step // nzt] * 8 + (step % nzt) * NT, NT)],
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
    for cj in range(ncols):
        for czt in range(nzt):
            cst = cj * nzt + czt
            @pl.when((j == cj) & (zt == czt))
            def _(cj=cj, czt=czt, cst=cst):
                if cst == 0:
                    for d in _in_dmas(m_ref, scr_in, sem_in, cols[cj][2],
                                      Z, czt * NT, NT, 0, invert=True):
                        d.start()
                if cst + 1 < nsteps:
                    ncj, nczt = divmod(cst + 1, nzt)
                    for d in _in_dmas(m_ref, scr_in, sem_in, cols[ncj][2],
                                      Z, nczt * NT, NT, (cst + 1) % 2,
                                      invert=True):
                        d.start()
                for d in _in_dmas(m_ref, scr_in, sem_in, cols[cj][2],
                                  Z, czt * NT, NT, cst % 2, invert=True):
                    d.wait()

    # drain the output + bits DMAs issued two steps ago from this buffer
    # parity (before compute overwrites scr_out[buf]).  One branch per
    # (block, two-steps-back block) case — at most two cases per block,
    # each with a STATIC previous-block index (hence static REAL slot
    # count); the previous subtile index and buffer parity enter the
    # reconstructed descriptors as traced scalars.
    def _drain_prev(pcj, pzt, b):
        for d in _out_dmas(o_ref, scr_out, sem_out, dst_tbl, NT,
                           len(cols[pcj][2]), pcj, pzt, b):
            d.wait()
        pltpu.make_async_copy(
            scr_bits.at[b],
            bits_ref.at[pl.ds(node_tbl[pcj] * 8 + pzt * NT, NT)],
            sem_bits.at[b],
        ).wait()

    for cj in range(ncols):
        # cases (prev block, guard, prev subtile): nzt == 1 -> always two
        # blocks back; otherwise same block (zt >= 2) or one back (zt < 2)
        if nzt == 1:
            cases = [(cj - 2, st >= 2, zt)]
        else:
            cases = [(cj, zt >= 2, zt - 2), (cj - 1, (st >= 2) & (zt < 2),
                                             zt - 2 + nzt)]
        for pcj, cond, pzt in cases:
            if pcj < 0 or (nzt >= 2 and nzt < 3 and pcj == cj):
                continue  # unreachable statically (nzt==2 has no zt>=2)
            @pl.when((j == cj) & cond)
            def _(pcj=pcj, pzt=pzt):
                _drain_prev(pcj, pzt, buf)
    for cj in range(ncols):
        @pl.when(j == cj)
        def _(cj=cj):
            srcs = cols[cj][2]
            for k in range(len(srcs)):
                r = srcs[k][1] % 8  # (-inv) % 8 == s % 8
                scr_al[k] = scr_in[buf, k, pl.ds(r, NT)]
    cha_dma(st, buf).wait()

    B = scr_cha.shape[-1]
    # compute is unrolled once per degree CLASS (not per block): blocks of
    # a class share tree structure and per-iteration parameters
    class_lo = []
    lo = 0
    for c in range(nclasses):
        n_c = sum(1 for cid in class_of if cid == c)
        class_lo.append((lo, lo + n_c))
        lo += n_c
    for c in range(nclasses):
        lo_c, hi_c = class_lo[c]
        if lo_c == hi_c:
            continue
        @pl.when((j >= lo_c) & (j < hi_c))
        def _(c=c, lo_c=lo_c, hi_c=hi_c):
            # degree of this class = slot count of any of its blocks
            dvc = next(len(cols[b][2]) for b in range(lo_c, hi_c))
            neg0, agree = _vn_class_compute(
                scr_al, scr_cha, scr_out, buf, dvc, ops_by_class[c],
                prm_by_class[c], use_tot_by_class[c], out_dtype, NT, B,
            )
            scr_bits[buf] = neg0.astype(jnp.int8)
            unan_ref[...] = jnp.broadcast_to(
                jnp.min(agree.astype(jnp.int32), axis=0, keepdims=True),
                (8, B),
            ).astype(jnp.int8)
            # slots dvc..max_dv DMA stale scratch to the tail scratch rows

    # issue this step's writeback (REAL slots only) + bits tile; drains
    # happen two steps later in the input nest, or in the final-step
    # epilogue here.  One branch per BLOCK (not per step): the z-subtile
    # index enters the destination offsets as a traced scalar (zt*NT is a
    # multiple of 8, so Mosaic can still prove sublane-tile alignment),
    # which keeps the unrolled kernel small enough for the compile path.
    def bits_dma(cj, czt, b):
        return pltpu.make_async_copy(
            scr_bits.at[b],
            bits_ref.at[pl.ds(node_tbl[cj] * 8 + czt * NT, NT)],
            sem_bits.at[b],
        )

    for cj in range(ncols):
        @pl.when(j == cj)
        def _(cj=cj):
            for d in _out_dmas(o_ref, scr_out, sem_out, dst_tbl, NT,
                               len(cols[cj][2]), cj, zt, buf):
                d.start()
            bits_dma(cj, zt, buf).start()
            if cj == ncols - 1:
                @pl.when(zt == nzt - 1)
                def _():
                    for d in _out_dmas(o_ref, scr_out, sem_out, dst_tbl, NT,
                                       len(cols[cj][2]), cj, zt, buf):
                        d.wait()
                    bits_dma(cj, zt, buf).wait()
                    if nsteps > 1:
                        pcj, pczt = divmod(nsteps - 2, nzt)
                        for d in _out_dmas(o_ref, scr_out, sem_out, dst_tbl,
                                           NT, len(cols[pcj][2]), pcj, pczt,
                                           (nsteps - 2) % 2):
                            d.wait()
                        bits_dma(pcj, pczt, (nsteps - 2) % 2).wait()


def vn_qc_pass(m_cn, cha, plan, nvar_pad, E_vn, structs, prm_by_class,
               use_tot_by_class, flags_by_class, out_rows=None):
    """m_cn (E_cn [+NT], B), cha (nvar_pad, B) values ->
    (m_vn (out_rows, B), bits (nvar_pad, B) uint8, unan (B,) bool).
    out_rows defaults to E_vn + Z (the DMA tail must hold a dummy slot
    write at any subtile: E_vn + zt*NT + NT <= E_vn + Z); it is explicit
    so callers that carry m_vn across batch widths (the survivor
    funnel) fix the carry shape.

    structs / prm_by_class / use_tot_by_class / flags_by_class: per VN
    degree class (layout block order): the ArithTreeSpec structure, the
    per-op {thr, levels, tie_lo, tie_hi} dict for ONE iteration (sliced by
    the caller / scanned as xs; symmetric ops pass magnitude
    thresholds/levels in the same slots), the total-minus-self flag, and
    the per-op static dicts (sym, has_tie).  Rows of `bits` not covered
    by a variable block (inter-block padding) are uninitialized; every
    consumer reads real rows only."""
    B = m_cn.shape[1]
    Z = plan.Z
    max_dv = max(plan.vn_degrees)
    itemsize = np.dtype(m_cn.dtype).itemsize
    NT = pick_nt(Z, B, max_dv + 1, itemsize)
    cols = tuple((ci, nb, src) for ci, nb, src, dst in plan.vn_cols)
    class_of = tuple(ci for ci, _, _, _ in plan.vn_cols)
    dst_tbl = np.full((len(cols), max_dv), E_vn, dtype=np.int64)
    node_tbl = np.zeros((len(cols),), dtype=np.int64)
    for r, (ci, nb, src, dst) in enumerate(plan.vn_cols):
        dst_tbl[r, : len(dst)] = dst
        node_tbl[r] = nb
    if np.any(dst_tbl % 8) or np.any(node_tbl % 8):
        raise ValueError("vn_qc_pass: destinations must be 8-row aligned")
    dst_tbl = (dst_tbl // 8).astype(np.int32)
    node_tbl = (node_tbl // 8).astype(np.int32)
    nzt = Z // NT
    grid = (len(cols), nzt)

    ops_by_class = []
    nops_by_class = []
    prm_args = []
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    # f32 params uniformly: int16-grid values (<= 32600) are exact in f32,
    # and float_params ops (center-pair-repaired, arith.py) carry genuinely
    # fractional thresholds that an int cast would corrupt
    prm_dtype = jnp.float32
    from .arith import loo_msg_spans

    for c, struct in enumerate(structs):
        flags = flags_by_class[c]
        spans = loo_msg_spans(struct)
        ops_static = tuple(
            (tuple(int(x) for x in op.operands),
             int(prm_by_class[c][oi]["thr"].shape[-1]),
             bool(flags[oi]["sym"]), bool(flags[oi]["has_tie"]),
             spans[oi])
            for oi, op in enumerate(struct.ops)
        )
        ops_by_class.append(ops_static)
        nops_by_class.append(len(struct.ops))
        for oi in range(len(struct.ops)):
            p = prm_by_class[c][oi]
            for key in ("thr", "levels", "tie_lo", "tie_hi"):
                a = jnp.asarray(p[key], prm_dtype).reshape(1, -1)
                prm_args.append(a)
                in_specs.append(
                    pl.BlockSpec(a.shape, lambda j, zt: (0, 0),
                                 memory_space=pltpu.SMEM)
                )

    if out_rows is None:
        out_rows = E_vn + Z
    if out_rows < E_vn + Z:
        raise ValueError("vn_qc_pass: out_rows must cover the DMA tail")
    kern = functools.partial(
        _vn_qc_kernel, cols=cols, class_of=class_of, Z=Z, NT=NT,
        max_dv=max_dv, ops_by_class=tuple(ops_by_class),
        use_tot_by_class=tuple(bool(x) for x in use_tot_by_class),
        nops_by_class=tuple(nops_by_class), out_dtype=m_cn.dtype,
    )
    out, bits, unan = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, B), m_cn.dtype),
            jax.ShapeDtypeStruct((nvar_pad, B), jnp.int8),
            jax.ShapeDtypeStruct((len(cols) * nzt * 8, B), jnp.int8),
        ],
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((8, B), lambda j, zt: (j * nzt + zt, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, max_dv, NT + 8, B), m_cn.dtype),
            pltpu.VMEM((max_dv, NT, B), m_cn.dtype),
            pltpu.VMEM((2, NT, B), m_cn.dtype),
            pltpu.VMEM((2, NT, B), jnp.int8),
            pltpu.VMEM((2, max_dv, NT, B), m_cn.dtype),
            pltpu.SemaphoreType.DMA((2, _SEMS_PER_SLOT * max_dv)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, max_dv)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(jnp.asarray(dst_tbl), jnp.asarray(node_tbl), m_cn, cha, *prm_args)
    # bits stay int8 (0/1): casting to uint8 here would add a full
    # (nvar_pad, B) pass per iteration; callers cast once after the loop
    return (out, bits,
            unan.reshape(-1, 8, B)[:, 0].min(axis=0) != 0)
