"""Fused Pallas TPU kernels for quasi-cyclic LUT decoding — regular AND
irregular codes.

For a QC graph the v2c/c2v message permutations decompose into
per-circulant cyclic shifts with compile-time constants
(fast_layout.GroupedLayout.qc_plan).  These kernels fuse the shifts into
the CN / VN passes as HBM->VMEM window DMAs, so one decode iteration
touches HBM exactly four times (CN read+write, VN read+write) instead of
paying a separate DMA-issue-bound row gather per direction — and, just as
important on this environment's tunneled TPU, one iteration is exactly
TWO kernel launches.

Dataflow (the round-4 redesign; the round-3 kernels unrolled one branch
per (block, z-subtile) — 450 cases at DVB-S2 scale — which made Mosaic
compile times explode and left the passes DMA-choreography-bound at
~87 GB/s.  This version keeps the whole schedule DYNAMIC and is
bandwidth-bound):

- Message state lives in HALO-PLANE layout: each circulant plane (one
  (block, slot) Z-row segment of the slot-major grouped edge array of
  fast_layout.GroupedLayout) is stored with H extra tail rows duplicating
  its first H rows.  Any rolled window read then is ONE contiguous
  static-size DMA at a dynamic 8-aligned offset (Mosaic hard-requires
  sublane-tile-aligned HBM slice offsets, so exact-offset reads are not
  an option).  Planes are numbered PRODUCER-major (plane_index), so a
  step's whole writeback — d slots' main windows, and the halo mirror on
  low subtiles — is ONE 3-D (d, NT, B) DMA each into the
  (n_planes, Z + H, B) output.  ``plane_index``/``std_to_kernel_rows``
  define the mapping; callers convert at decode entry/exit with static
  slice+concat lists (stream-bandwidth copies, not gathers).
- The grid is (rows, z-subtiles); all step-dependent DMA parameters
  (plane bases, shifts) come from SMEM tables indexed by the row id plus
  scalar arithmetic, so the kernel body is O(#degree-classes) static
  branches — 1-4 in practice — independent of the code's size.
- The sub-8-row misalignment of an arbitrary shift (r = shift mod 8) is
  repaired in VMEM with an 8-way scalar-predicated STATIC-slice copy of
  the (NT+8)-row window (only the taken branch executes: one (NT, B)
  copy per slot in the storage dtype; a dynamic rotate would need a
  widen to 32-bit on v5e and costs ~5x).  Plans whose shifts are all
  multiples of 8 (``QCGeom.aligned``) skip the realign and the 8 extra
  window rows.
- Double buffering: step st issues step st+1's input windows before
  waiting on its own, and output DMAs drain two steps later, so HBM
  reads/writes overlap compute.  Compute is unrolled over the STATIC
  buffer parity (and per degree class): dynamic scratch indices inside
  the select-chain tree cost ~2x VPU throughput (and a 100x+ cliff at
  large tiles), measured on v5e.
- NT defaults to a measured-constant 24 rows per z-subtile (pick_nt):
  small tiles keep the select-chain temporaries register/VMEM-local,
  shrink the halo planes (mirror-write amplification is NT/Z), and
  still amortize DMA issue; measured optimum across all three plan
  scales (see pick_nt).
- The z-subtile size NT is free (no Z-divisibility): the last subtile is
  clamped to z0 = Z - NT and recomputes up to NT-8 overlap rows with
  identical values (frames are independent, outputs idempotent).

Kernels:

- ``cn_qc_pass``: reads each check block's dc input windows from the
  VN-grouped halo array with the v2c rolls applied during the DMA,
  computes the min-LUT CN update (two-min + sign parity, value-identical
  to chk_update_minsum, /root/reference/src/LDPC_Code_LUT.cpp:355-402),
  writes the CN-grouped halo rows, and emits per-tile syndrome
  indicators of the INPUT signs (the early-exit syndrome check,
  LDPC_Code_LUT.cpp:327).
- ``vn_qc_pass``: reads each variable block's dv windows from the
  CN-grouped halo array with the c2v rolls applied, evaluates that
  block's degree class's per-iteration leave-one-out VN threshold trees
  (the arithmetic value-domain form validated by decoder/arith.py),
  writes the next VN-grouped halo rows plus hard-decision bits and
  per-tile sign unanimity.

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
import os
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "QCGeom", "qc_geometry", "plane_index",
    "cn_qc_pass", "vn_qc_pass", "qc_kernels_supported", "pick_nt",
    "cn_std_pass", "vn_std_pass",
]

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
            budget: int = 95 << 20, nrows: int = 1,
            which: str = "") -> int:
    """z-subtile size NT (multiple of 8, <= Z).

    Measured optimum on v5e is a CONSTANT NT = 24 rows across radically
    different plans — small tiles keep the select-chain temporaries close
    to the compute units, shrink the halo planes (mirror-write
    amplification is NT/Z, and the state arrays are n_planes*(Z+NT)
    rows), and still amortize the per-step DMA issue:

    - N=10000 (3,6) int16 B=8192:  8.1 ms/iter @24 vs 13.5 @56, 9.2 @8
    - N=64800 dv17 QC int16 B=1024: 13.2 ms/iter @24 vs 31.9 @304 (the
      round-4 default — its measurement predates the halo-plane mirror
      accounting), 34.1 @88; the asymmetric CN=24/VN=304 split is also
      worse (27.9)
    - DVB-S2 Z=360 f32 B=1024: 63.4 Mbit/s end-to-end @24 vs 54.3 @16,
      38.7 @8, 50.4 @88, 35.6 @360

    Clamped to [8, Z] and to an accurately-counted hard VMEM bound
    (per_row_hard: ~(5*nslots+3) storage rows of scratch + f32
    temporaries) against the Mosaic limit.  LUT_QC_NT (both passes) or
    LUT_QC_NT_CN / LUT_QC_NT_VN override for profiling
    (examples/profile_qc_kernels.py scans)."""
    force = (os.environ.get(f"LUT_QC_NT_{which.upper()}") if which
             else None) or os.environ.get("LUT_QC_NT")
    if force:
        return min(Z, max(8, int(force) // 8 * 8))
    per_row_hard = ((5 * nslots + 3) * itemsize + 2
                    + (2 * nslots + 6) * 4) * B
    nt_hard = (_VMEM_LIMIT - (2 << 20)) // per_row_hard // 8 * 8
    return min(Z, max(8, min(24, nt_hard)))


@dataclass(frozen=True)
class QCGeom:
    """Static geometry shared by both passes of one (plan, batch, dtype)
    combination.  m_vn planes carry halo_vn tail rows (duplicating each
    plane's first rows, read by the CN pass); m_cn planes carry halo_cn
    (read by the VN pass)."""

    Z: int
    nt_cn: int      # CN pass z-subtile rows
    nt_vn: int      # VN pass z-subtile rows
    halo_vn: int    # tail rows per m_vn plane (>= window need of CN pass)
    halo_cn: int    # tail rows per m_cn plane (>= window need of VN pass)
    n_planes_vn: int
    n_planes_cn: int
    aligned: bool   # every shift ≡ 0 (mod 8): no realign roll, W == NT

    @property
    def rows_vn(self) -> int:  # m_vn array rows in halo layout
        return self.n_planes_vn * (self.Z + self.halo_vn)

    @property
    def rows_cn(self) -> int:
        return self.n_planes_cn * (self.Z + self.halo_cn)


def _z0s(Z: int, NT: int) -> list:
    """Clamped z-subtile schedule: z0 = zt*NT, last clamped to Z - NT
    (overlap rows are recomputed with identical values)."""
    nzt = -(-Z // NT)
    return [min(zt * NT, Z - NT) for zt in range(nzt)]


def _halo_alloc(Z: int, NT: int, need: int) -> int:
    """Rows to allocate per plane so every halo-writing subtile (z0 <
    need) fits its full (NT)-row mirror write at [Z + z0, Z + z0 + NT)."""
    zs = [z0 for z0 in _z0s(Z, NT) if z0 < need]
    return max((z0 + NT for z0 in zs), default=0)


def qc_geometry(plan, B: int, itemsize: int) -> QCGeom:
    """Compute both passes' subtile sizes and halo allocations.  The
    window a pass reads is NT + 8 rows (NT when the plan is 8-aligned),
    starting at an 8-aligned offset <= Z - 8, so the producing pass must
    mirror `NT_consumer [+ 8 - 8]` rows; allocation rounds up to whole
    producer subtiles."""
    Z = plan.Z
    max_dc = max(plan.cn_degrees)
    max_dv = max(plan.vn_degrees)
    nt_cn = pick_nt(Z, B, max_dc, itemsize, nrows=len(plan.cn_rows),
                    which="cn")
    nt_vn = pick_nt(Z, B, max_dv + 1, itemsize,
                    nrows=len(plan.vn_cols), which="vn")
    aligned = all(
        s % 8 == 0 for _, src, _ in plan.cn_rows for _, s in src
    )
    # consumer window [lo8, lo8 + W), lo8 <= Z - 8, W = NT + 8 (NT if
    # aligned): needs mirrored rows up to (Z - 8) + W - 1 - Z = W - 9
    need_vn = nt_cn + (0 if aligned else 8) - 8  # CN pass reads m_vn
    need_cn = nt_vn + (0 if aligned else 8) - 8  # VN pass reads m_cn
    n_planes_vn = sum(len(src) for _, _, src, _ in plan.vn_cols)
    n_planes_cn = sum(len(src) for _, src, _ in plan.cn_rows)
    return QCGeom(
        Z=Z, nt_cn=nt_cn, nt_vn=nt_vn,
        halo_vn=_halo_alloc(Z, nt_vn, need_vn),
        halo_cn=_halo_alloc(Z, nt_cn, need_cn),
        n_planes_vn=n_planes_vn, n_planes_cn=n_planes_cn,
        aligned=aligned,
    )


def kernel_op_keys(op_flags):
    """Per (block, op) source-key tuple for the kernel's 4 param slots
    (thr, levels, tie_lo, tie_hi): sym ops ride magnitude params, and
    delta-validated ops (kdelta) ride [lev0, dlev...] in the levels
    slot.  Shared by the decoder and the profiling scripts."""
    # kdelta (masked-add emission) measured SLOWER than the select chain
    # on v5e once NT is tuned (9.9 vs 8.1 ms/iter at B=8192/NT=24): the
    # extra adds outweigh the broken dependence chain.  Off by default;
    # LUT_QC_KDELTA=1 re-enables for A/B profiling.
    use_kd = bool(os.environ.get("LUT_QC_KDELTA"))
    return [
        [
            (("sthr" if f["sym"] else "thr"),
             ("kdelta" if (f.get("kdelta") and use_kd) else
              ("smag" if f["sym"] else "levels")),
             "tie_lo", "tie_hi")
            for f in flags
        ]
        for flags in op_flags
    ]


def plane_index(plan):
    """Canonical circulant-plane numbering for the kernels' halo layout:
    (vn_plane_of_base, cn_plane_of_base) dicts mapping each plane's flat
    base row in the STANDARD grouped layout (fast_layout; bases appear in
    both the src and dst views of the plan) to its plane index.  The
    standard layout may pad between planes (align), so kernel row ==
    plane_idx * (Z + halo) + z, NOT a reshape of the standard rows.

    Numbering is PRODUCER-MAJOR: the d planes a grid step writes (the
    VN pass's vn_cols[j].dst, the CN pass's cn_rows[i].dst, in slot
    order) get consecutive indices, so each step's whole writeback —
    main window and halo mirror — is ONE 3-D DMA (d, NT, B) into the
    (n_planes, Z + halo, B) view instead of d separate descriptors.
    Consumers read single planes at dynamic offsets either way."""
    vn_bases = [b for _, _, _, dst in plan.vn_cols for b in dst]
    cn_bases = [b for _, src, dst in plan.cn_rows for b in dst]
    return ({b: i for i, b in enumerate(vn_bases)},
            {b: i for i, b in enumerate(cn_bases)})


def std_to_kernel_rows(plan, geom: QCGeom, which: str, e_std: int):
    """np.int64 (e_std,) kernel-layout row of each STANDARD grouped row
    (-1 at std padding rows).  For tests/profiles comparing kernel
    outputs against the XLA reference layout."""
    vn_pl, cn_pl = plane_index(plan)
    pl_of, stride = ((vn_pl, plan.Z + geom.halo_vn) if which == "vn"
                     else (cn_pl, plan.Z + geom.halo_cn))
    out = np.full(e_std, -1, np.int64)
    for b, p in pl_of.items():
        out[b : b + plan.Z] = p * stride + np.arange(plan.Z)
    return out


def _class_ranges(class_of):
    """Contiguous (lo, hi, class_idx) row ranges; rows must be sorted by
    class (fast_layout emits them that way)."""
    ranges = []
    lo = 0
    for i in range(1, len(class_of) + 1):
        if i == len(class_of) or class_of[i] != class_of[lo]:
            ranges.append((lo, i, class_of[lo]))
            lo = i
    return ranges


def _in_class(row, lo, hi):
    return (row >= lo) & (row < hi)


def _smem_i32(a):
    return jnp.asarray(np.asarray(a, dtype=np.int32))


class _Chor:
    """Shared DMA choreography for both kernels: dynamic-offset window
    reads with halo planes, double buffering, and 2-step-lagged output
    drains.  All per-step parameters come from SMEM tables indexed by the
    row id; the only static unrolling is one branch per degree class."""

    def __init__(self, Z, NT, z0s, in_stride, out_stride, halo_need,
                 ranges_d, aligned):
        self.Z = Z
        self.NT = NT
        self.W = NT if aligned else NT + 8
        self.z0s = z0s
        self.nzt = len(z0s)
        self.in_stride = in_stride    # rows per input plane (Z + halo_in)
        self.out_stride = out_stride  # rows per output plane
        self.halo_need = halo_need    # mirror rows required on outputs
        self.ranges_d = ranges_d      # ((lo, hi, degree), ...) row ranges
        self.aligned = aligned

    # -- scalar helpers ------------------------------------------------
    def z0_of(self, zt):
        NT, Z = self.NT, self.Z
        z0 = jnp.minimum(zt * NT, Z - NT)
        return pl.multiple_of(z0, 8)

    def rowzt(self, st):
        row = jax.lax.div(st, self.nzt)
        zt = jax.lax.rem(st, self.nzt)
        return row, zt

    # -- input windows ---------------------------------------------------
    def start_in(self, m_ref, scr_in, sem_in, base8, sp, row, zt, buf, d):
        """Issue the d window DMAs of (row, zt) into double buffer buf."""
        Z, W = self.Z, self.W
        z0 = self.z0_of(zt)
        for k in range(d):
            lo = jax.lax.rem(z0 + sp[row, k], Z)
            lo8 = pl.multiple_of((lo // 8) * 8, 8)
            src = pl.multiple_of(base8[row, k] * 8, 8) + lo8
            pltpu.make_async_copy(
                m_ref.at[pl.ds(src, W)], scr_in.at[buf, k], sem_in.at[buf, k]
            ).start()

    def wait_in(self, scr_in, sem_in, buf, d):
        for k in range(d):
            pltpu.make_async_copy(
                scr_in.at[buf, k], scr_in.at[buf, k], sem_in.at[buf, k]
            ).wait()

    def realign(self, scr_in, scr_al, sp, row, buf, d):
        """Copy the d input windows' rows [r_k, r_k + NT) into scr_al
        (r_k = shift mod 8): an 8-way scalar-predicated branch per slot,
        each a STATIC-slice VMEM copy in the storage dtype — only the
        taken branch executes, so this costs one (NT, B) copy per slot.
        (A dynamic pltpu.roll costs a widen-to-f32 plus a full rotate:
        v5e only rotates 32-bit data, and the rotate itself is ~5x the
        copy.)  No-op when the plan is 8-aligned (windows arrive exact)."""
        if self.aligned:
            return
        for k in range(d):
            r = jax.lax.rem(sp[row, k], 8)
            for rv in range(8):
                @pl.when(r == rv)
                def _(k=k, rv=rv):
                    scr_al[k] = scr_in[buf, k, rv : rv + self.NT]

    def window(self, scr_in, scr_al, buf, k, cdt=None):
        """Realigned (NT, B) view of input slot k in compute dtype."""
        w = scr_in[buf, k] if self.aligned else scr_al[k]
        return w if cdt is None else w.astype(cdt)

    # -- outputs -----------------------------------------------------------
    def out_dmas(self, o_ref, scr_out, sem_out, sem_halo, outp, row, zt,
                 buf, d):
        """Main + halo-mirror output DMA descriptors for (row, zt).

        Producer-major plane numbering (plane_index) makes the step's d
        output planes consecutive, so the whole writeback is ONE 3-D
        (d, NT, B) DMA into the (n_planes, stride, B) output view (and
        one more for the halo mirror) instead of d descriptors each —
        the DMA-issue scalar work per step drops ~3x."""
        NT = self.NT
        z0 = self.z0_of(zt)
        p0 = outp[row]
        src = scr_out.at[buf, pl.ds(0, d)]
        main = pltpu.make_async_copy(
            src, o_ref.at[pl.ds(p0, d), pl.ds(z0, NT)], sem_out.at[buf])
        halo = pltpu.make_async_copy(
            src, o_ref.at[pl.ds(p0, d), pl.ds(self.Z + z0, NT)],
            sem_halo.at[buf])
        return main, halo

    def start_out(self, o_ref, scr_out, sem_out, sem_halo, outp, row, zt,
                  buf, d):
        main, halo = self.out_dmas(o_ref, scr_out, sem_out, sem_halo, outp,
                                   row, zt, buf, d)
        main.start()
        if self.halo_need > 0:
            @pl.when(self.z0_of(zt) < self.halo_need)
            def _():
                halo.start()

    def drain_out(self, o_ref, scr_out, sem_out, sem_halo, outp, row, zt,
                  buf, d):
        main, halo = self.out_dmas(o_ref, scr_out, sem_out, sem_halo, outp,
                                   row, zt, buf, d)
        main.wait()
        if self.halo_need > 0:
            @pl.when(self.z0_of(zt) < self.halo_need)
            def _():
                halo.wait()


def _static_parity(ranges_d) -> bool:
    """Unroll compute over the two buffer parities (static scratch
    indices) only when the per-class compute code is small: measured on
    v5e, static parity is 1.7x faster on the (3,6) N=10000 kernels (one
    degree class; a dynamic index even hits a 100x Mosaic cliff on long
    select chains at B=8192) but 1.5x SLOWER on the 4-class dv<=17
    N=64800 kernels, where 2x-unrolling the LOO tree code bloats the
    program past what the core schedules well.  Sum of class degrees is
    a cheap proxy for compute-code size."""
    if _interpret() or os.environ.get("LUT_QC_DYNBUF"):
        return False
    return sum(d for _, _, d in ranges_d) <= 8


def _for_class(ranges_d, row, body):
    """Run body(d) under a pl.when for each degree-class row range."""
    for lo, hi, d in ranges_d:
        @pl.when(_in_class(row, lo, hi))
        def _(d=d):
            body(d)


def _for_class_std(ranges_d, row, body):
    """STD-kernel variant: ranges carry (lo, hi, degree, ntb)."""
    for lo, hi, d, ntb in ranges_d:
        @pl.when(_in_class(row, lo, hi))
        def _(d=d, ntb=ntb):
            body(d, ntb)


# ---------------------------------------------------------------------------
# CN pass
# ---------------------------------------------------------------------------


def _cn_qc_kernel(base8, sp, outp, m_ref, o_ref, synd_ref, scr_in, scr_al,
                  scr_out, sem_in, sem_out, sem_halo, *, chor, out_dtype):
    ch = chor
    i = pl.program_id(0)
    zt = pl.program_id(1)
    nzt = ch.nzt
    nrows = pl.num_programs(0)
    nsteps = nrows * nzt
    st = i * nzt + zt
    buf = jax.lax.rem(st, 2)

    # double-buffered input windows: issue step st+1's DMAs before waiting
    # on step st's (issued at st-1), so HBM reads overlap compute
    @pl.when(st == 0)
    def _():
        _for_class(ch.ranges_d, i,
                   lambda d: ch.start_in(m_ref, scr_in, sem_in, base8, sp,
                                         i, zt, buf, d))
    @pl.when(st + 1 < nsteps)
    def _():
        rn, ztn = ch.rowzt(st + 1)
        _for_class(ch.ranges_d, rn,
                   lambda d: ch.start_in(m_ref, scr_in, sem_in, base8, sp,
                                         rn, ztn, 1 - buf, d))
    _for_class(ch.ranges_d, i,
               lambda d: ch.wait_in(scr_in, sem_in, buf, d))

    # drain the output DMAs issued two steps ago from this buffer parity
    # (before compute overwrites scr_out[buf])
    @pl.when(st >= 2)
    def _():
        rp, ztp = ch.rowzt(st - 2)
        _for_class(ch.ranges_d, rp,
                   lambda d: ch.drain_out(o_ref, scr_out, sem_out, sem_halo,
                                          outp, rp, ztp, buf, d))

    # two-min + parity over slots (f32 compute, exact on int16 values);
    # one static branch per degree class
    B = scr_out.shape[-1]
    NT = ch.NT
    cdt = jnp.float32
    INF = jnp.asarray(np.inf, cdt)

    def compute(d, bufc):
        ch.realign(scr_in, scr_al, sp, i, bufc, d)
        x = [ch.window(scr_in, scr_al, bufc, k, cdt) for k in range(d)]
        neg_par = x[0] < 0
        min1, min2 = jnp.abs(x[0]), jnp.full((NT, B), INF, cdt)
        for k in range(1, d):
            neg_par = neg_par ^ (x[k] < 0)
            mag = jnp.abs(x[k])
            min2 = jnp.minimum(min2, jnp.maximum(min1, mag))
            min1 = jnp.minimum(min1, mag)
        for k in range(d):
            # where |x_k| == min1 the min over the OTHERS is min2 — for a
            # unique minimum by definition, for duplicated minima
            # min2 == min1 so the branches agree; no argmin bookkeeping
            # (value-identical to chk_update_minsum)
            tmp = jnp.where(jnp.abs(x[k]) == min1, min2, min1)
            flip = neg_par ^ (x[k] < 0)
            scr_out[bufc, k] = jnp.where(flip, -tmp, tmp).astype(out_dtype)
        # per-tile syndrome indicator of the INPUT signs
        synd_ref[...] = jnp.broadcast_to(
            jnp.min((~neg_par).astype(jnp.int32), axis=0, keepdims=True),
            (8, B),
        ).astype(jnp.int8)

    # static buffer parity (see the VN kernel note); interpret mode keeps
    # the dynamic index — same values, half the trace cost for the suite
    if not _static_parity(ch.ranges_d):
        _for_class(ch.ranges_d, i, lambda d: compute(d, buf))
    else:
        for lo_r, hi_r, d_r in ch.ranges_d:
            for bufc in range(2):
                @pl.when(_in_class(i, lo_r, hi_r) & (buf == bufc))
                def _(d_r=d_r, bufc=bufc):
                    compute(d_r, bufc)

    # issue this step's writeback; it drains two steps later, or in the
    # final-step epilogue here
    _for_class(ch.ranges_d, i,
               lambda d: ch.start_out(o_ref, scr_out, sem_out, sem_halo,
                                      outp, i, zt, buf, d))
    @pl.when(st == nsteps - 1)
    def _():
        _for_class(ch.ranges_d, i,
                   lambda d: ch.drain_out(o_ref, scr_out, sem_out, sem_halo,
                                          outp, i, zt, buf, d))
        @pl.when(nsteps >= 2)
        def _():
            rp, ztp = ch.rowzt(st - 1)
            _for_class(ch.ranges_d, rp,
                       lambda d: ch.drain_out(o_ref, scr_out, sem_out,
                                              sem_halo, outp, rp, ztp,
                                              1 - buf, d))


def cn_qc_pass(m_vn, plan, geom: QCGeom):
    """m_vn (geom.rows_vn, B) int16/f32 VN-grouped HALO layout ->
    (m_cn (geom.rows_cn, B) halo layout, synd_ok (B,) bool).

    plan: fast_layout.QCPlan; geom: qc_geometry(plan, B0, itemsize) — the
    geometry must be computed once per decode build (funnel stages reuse
    the widest batch's geometry so carry shapes stay fixed)."""
    B = m_vn.shape[1]
    Z = plan.Z
    max_dc = max(plan.cn_degrees)
    NT = geom.nt_cn
    in_stride = Z + geom.halo_vn
    out_stride = Z + geom.halo_cn

    vn_pl, cn_pl = plane_index(plan)
    nrows = len(plan.cn_rows)
    base8 = np.zeros((nrows, max_dc), np.int64)
    sp = np.zeros((nrows, max_dc), np.int64)
    outp = np.zeros((nrows,), np.int64)
    class_of = []
    for r, (ci, src, dst) in enumerate(plan.cn_rows):
        class_of.append(ci)
        for k, (vbase, s) in enumerate(src):
            # m_cn[dst + z'] = m_vn[src + (z' - s) % Z]: window offset for
            # subtile z0 is lo = (z0 - s) mod Z = (z0 + (Z - s)) mod Z
            base8[r, k] = vn_pl[vbase] * in_stride // 8
            sp[r, k] = (Z - s) % Z
        outp[r] = cn_pl[dst[0]]
        # producer-major numbering: the row's output planes are contiguous
        assert all(cn_pl[b] == outp[r] + k for k, b in enumerate(dst))
    ranges = tuple(
        (lo, hi, plan.cn_degrees[ci]) for lo, hi, ci in _class_ranges(class_of)
    )
    chor = _Chor(Z, NT, tuple(_z0s(Z, NT)), in_stride, out_stride,
                 max(0, geom.nt_vn + (0 if geom.aligned else 8) - 8),
                 ranges, geom.aligned)
    nzt = chor.nzt
    kern = functools.partial(_cn_qc_kernel, chor=chor, out_dtype=m_vn.dtype)
    out, synd = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct(
                (geom.n_planes_cn, out_stride, B), m_vn.dtype),
            jax.ShapeDtypeStruct((nrows * nzt * 8, B), jnp.int8),
        ],
        grid=(nrows, nzt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, B), lambda i, zt: (i * nzt + zt, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, max_dc, chor.W, B), m_vn.dtype),
            pltpu.VMEM((max_dc, NT, B), m_vn.dtype),
            pltpu.VMEM((2, max_dc, NT, B), m_vn.dtype),
            pltpu.SemaphoreType.DMA((2, max_dc)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(_smem_i32(base8), _smem_i32(sp), _smem_i32(outp), m_vn)
    synd_ok = jnp.min(synd.reshape(-1, 8, B)[:, 0], axis=0) != 0
    return out.reshape(geom.rows_cn, B), synd_ok


# ---------------------------------------------------------------------------
# VN pass
# ---------------------------------------------------------------------------


def _vn_class_compute(msg, cha, scr_out, buf, dv, ops, prm, use_tot,
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
    n_in = dv  # d-1 message positions + the channel leaf (DFS-last)
    nops = len(ops)
    spans = [op[5] for op in ops]
    tot = None
    if use_tot:
        tot = msg[0]
        for k in range(1, dv):
            tot = tot + msg[k]

    def emit_op(oi, s_sum, tie_src):
        op_operands, nthr, sym, has_tie, kdelta, _span = ops[oi]
        thr_r, lev_r, tlo_r, thi_r = prm[oi]
        # sym: sign x magnitude factorization (arith.py sym_thr) —
        # half-depth chain on |s|, sign applied once; validated
        # exhaustively at build time against the integer LUT.
        # kdelta: lev_r carries [lev0, dlev...] and the emission is
        # lev0 + sum_k [x >= thr_k] * dlev_k — independent masked adds
        # instead of a dependent select chain (~2x VPU throughput),
        # bit-exact by the build-time sequential-f32 check.
        x = jnp.abs(s_sum) if sym else s_sum
        if kdelta:
            out = jnp.full((NT, B), lev_r[0, 0].astype(cdt), cdt)
            for t in range(nthr):
                out = out + jnp.where(x >= thr_r[0, t].astype(cdt),
                                      lev_r[0, t + 1].astype(cdt), zero)
        else:
            out = jnp.full((NT, B), lev_r[0, 0].astype(cdt), cdt)
            for t in range(nthr):
                out = jnp.where(x >= thr_r[0, t].astype(cdt),
                                lev_r[0, t + 1].astype(cdt), out)
        if sym:
            out = jnp.where(s_sum < zero, -out, out)
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


def _vn_qc_kernel(*refs, chor, ops_by_class, use_tot_by_class,
                  nops_by_class, out_dtype):
    ch = chor
    nclasses = len(ops_by_class)
    nprm = sum(nops_by_class)
    (base8, sp, outp, node8, m_ref, cha_ref) = refs[:6]
    prm_flat = refs[6 : 6 + 4 * nprm]
    o_ref, bits_ref, unan_ref = refs[6 + 4 * nprm : 9 + 4 * nprm]
    (scr_in, scr_al, scr_cha, scr_bits, scr_out,
     sem_in, sem_cha, sem_bits, sem_out, sem_halo) = refs[9 + 4 * nprm:]
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
    nzt = ch.nzt
    nrows = pl.num_programs(0)
    nsteps = nrows * nzt
    st = j * nzt + zt
    buf = jax.lax.rem(st, 2)
    NT = ch.NT
    B = scr_cha.shape[-1]

    # channel tile: double-buffered, dynamic offsets from the node table
    def cha_dma(row, ztc, b):
        return pltpu.make_async_copy(
            cha_ref.at[pl.ds(pl.multiple_of(node8[row] * 8, 8)
                             + ch.z0_of(ztc), NT)],
            scr_cha.at[b], sem_cha.at[b],
        )

    @pl.when(st == 0)
    def _():
        cha_dma(j, zt, buf).start()
        _for_class(ch.ranges_d, j,
                   lambda d: ch.start_in(m_ref, scr_in, sem_in, base8, sp,
                                         j, zt, buf, d))
    @pl.when(st + 1 < nsteps)
    def _():
        rn, ztn = ch.rowzt(st + 1)
        cha_dma(rn, ztn, 1 - buf).start()
        _for_class(ch.ranges_d, rn,
                   lambda d: ch.start_in(m_ref, scr_in, sem_in, base8, sp,
                                         rn, ztn, 1 - buf, d))
    _for_class(ch.ranges_d, j,
               lambda d: ch.wait_in(scr_in, sem_in, buf, d))
    cha_dma(j, zt, buf).wait()

    # drain outputs + bits issued two steps ago from this buffer parity
    def bits_dma(row, ztc, b):
        return pltpu.make_async_copy(
            scr_bits.at[b],
            bits_ref.at[pl.ds(pl.multiple_of(node8[row] * 8, 8)
                              + ch.z0_of(ztc), NT)],
            sem_bits.at[b],
        )

    def drain_step(row, ztc, b):
        _for_class(ch.ranges_d, row,
                   lambda d: ch.drain_out(o_ref, scr_out, sem_out, sem_halo,
                                          outp, row, ztc, b, d))
        bits_dma(row, ztc, b).wait()

    @pl.when(st >= 2)
    def _():
        rp, ztp = ch.rowzt(st - 2)
        drain_step(rp, ztp, buf)

    # compute: one static branch per degree class x buffer parity (the
    # STATIC buffer index lets Mosaic keep the whole select-chain tree in
    # registers; a dynamic scratch index here costs ~2x VPU throughput)
    import os as _os
    _passthru = bool(_os.environ.get("LUT_QC_VN_PASSTHROUGH"))
    if _passthru:
        import warnings

        warnings.warn(
            "LUT_QC_VN_PASSTHROUGH is set: the VN kernel SKIPS the "
            "threshold trees and produces WRONG decodes — profiling "
            "experiment only (examples/profile_qc_kernels.py)",
            stacklevel=2)

    def compute(d, c, bufc):
        ch.realign(scr_in, scr_al, sp, j, bufc, d)
        msg = [ch.window(scr_in, scr_al, bufc, k, jnp.float32)
               for k in range(d)]
        cha = scr_cha[bufc].astype(jnp.float32)
        if _passthru:  # timing experiment: skip the threshold trees
            for k in range(d):
                scr_out[bufc, k] = msg[k].astype(out_dtype)
            scr_bits[bufc] = (cha < 0).astype(jnp.int8)
            unan_ref[...] = jnp.zeros((8, scr_cha.shape[-1]), jnp.int8)
            return
        neg0, agree = _vn_class_compute(
            msg, cha, scr_out, bufc, d, ops_by_class[c], prm_by_class[c],
            use_tot_by_class[c], out_dtype, NT, B,
        )
        scr_bits[bufc] = neg0.astype(jnp.int8)
        unan_ref[...] = jnp.broadcast_to(
            jnp.min(agree.astype(jnp.int32), axis=0, keepdims=True),
            (8, B),
        ).astype(jnp.int8)

    if not _static_parity(ch.ranges_d):
        for ci_r, (lo, hi, d) in enumerate(ch.ranges_d):
            @pl.when(_in_class(j, lo, hi))
            def _(d=d, ci_r=ci_r):
                compute(d, ci_r, buf)
    else:
        for ci_r, (lo, hi, d) in enumerate(ch.ranges_d):
            for bufc in range(2):
                @pl.when(_in_class(j, lo, hi) & (buf == bufc))
                def _(d=d, ci_r=ci_r, bufc=bufc):
                    compute(d, ci_r, bufc)

    # issue this step's writeback + bits tile; drains happen two steps
    # later, or in the final-step epilogue here
    _for_class(ch.ranges_d, j,
               lambda d: ch.start_out(o_ref, scr_out, sem_out, sem_halo,
                                      outp, j, zt, buf, d))
    bits_dma(j, zt, buf).start()
    @pl.when(st == nsteps - 1)
    def _():
        drain_step(j, zt, buf)
        @pl.when(nsteps >= 2)
        def _():
            rp, ztp = ch.rowzt(st - 1)
            drain_step(rp, ztp, 1 - buf)


def vn_qc_pass(m_cn, cha, plan, geom: QCGeom, nvar_pad, structs,
               prm_by_class, use_tot_by_class, flags_by_class):
    """m_cn (geom.rows_cn, B) halo layout, cha (nvar_pad, B) values ->
    (m_vn (geom.rows_vn, B) halo layout, bits (nvar_pad, B) int8,
    unan (B,) bool).

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
    NT = geom.nt_vn
    in_stride = Z + geom.halo_cn
    out_stride = Z + geom.halo_vn

    vn_pl, cn_pl = plane_index(plan)
    nrows = len(plan.vn_cols)
    base8 = np.zeros((nrows, max_dv), np.int64)
    sp = np.zeros((nrows, max_dv), np.int64)
    outp = np.zeros((nrows,), np.int64)
    node8 = np.zeros((nrows,), np.int64)
    class_of = []
    for r, (ci, nb, src, dst) in enumerate(plan.vn_cols):
        class_of.append(ci)
        node8[r] = nb // 8
        for k, (cbase, s) in enumerate(src):
            # c2v: m_vn[dst + z'] = m_cn[src + (z' + s) % Z]: window offset
            # lo = (z0 + s) mod Z
            base8[r, k] = cn_pl[cbase] * in_stride // 8
            sp[r, k] = s % Z
        outp[r] = vn_pl[dst[0]]
        # producer-major numbering: the row's output planes are contiguous
        assert all(vn_pl[b] == outp[r] + k for k, b in enumerate(dst))
    ranges = tuple(
        (lo, hi, plan.vn_degrees[ci]) for lo, hi, ci in _class_ranges(class_of)
    )
    class_order = tuple(ci for _, _, ci in _class_ranges(class_of))
    chor = _Chor(Z, NT, tuple(_z0s(Z, NT)), in_stride, out_stride,
                 max(0, geom.nt_cn + (0 if geom.aligned else 8) - 8),
                 ranges, geom.aligned)
    nzt = chor.nzt

    ops_by_class = []
    nops_by_class = []
    prm_args = []
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 4 + [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    # f32 params uniformly: int16-grid values (<= 32600) are exact in f32,
    # and float_params ops (center-pair-repaired, arith.py) carry genuinely
    # fractional thresholds that an int cast would corrupt
    prm_dtype = jnp.float32
    from .arith import loo_msg_spans

    for c in class_order:
        struct = structs[c]
        flags = flags_by_class[c]
        spans = loo_msg_spans(struct)
        ops_static = tuple(
            (tuple(int(x) for x in op.operands),
             int(prm_by_class[c][oi]["thr"].shape[-1]),
             bool(flags[oi]["sym"]), bool(flags[oi]["has_tie"]),
             bool(flags[oi].get("kdelta", False))
             and bool(os.environ.get("LUT_QC_KDELTA")),
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

    kern = functools.partial(
        _vn_qc_kernel, chor=chor, ops_by_class=tuple(ops_by_class),
        use_tot_by_class=tuple(
            bool(use_tot_by_class[c]) for c in class_order),
        nops_by_class=tuple(nops_by_class), out_dtype=m_cn.dtype,
    )
    out, bits, unan = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct(
                (geom.n_planes_vn, out_stride, B), m_cn.dtype),
            jax.ShapeDtypeStruct((nvar_pad, B), jnp.int8),
            jax.ShapeDtypeStruct((nrows * nzt * 8, B), jnp.int8),
        ],
        grid=(nrows, nzt),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, B), lambda j, zt: (j * nzt + zt, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, max_dv, chor.W, B), m_cn.dtype),
            pltpu.VMEM((max_dv, NT, B), m_cn.dtype),
            pltpu.VMEM((2, NT, B), m_cn.dtype),
            pltpu.VMEM((2, NT, B), jnp.int8),
            pltpu.VMEM((2, max_dv, NT, B), m_cn.dtype),
            pltpu.SemaphoreType.DMA((2, max_dv)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(_smem_i32(base8), _smem_i32(sp), _smem_i32(outp), _smem_i32(node8),
      m_cn, cha, *prm_args)
    # bits stay int8 (0/1): casting to uint8 here would add a full
    # (nvar_pad, B) pass per iteration; callers cast once after the loop
    return (out.reshape(geom.rows_vn, B), bits,
            unan.reshape(-1, 8, B)[:, 0].min(axis=0) != 0)


# ---------------------------------------------------------------------------
# STD-layout kernels: arbitrary (non-QC) graphs
# ---------------------------------------------------------------------------
#
# For unstructured alists (the reference's PEG codes and any matrix with
# no circulant factorization) the message permutation stays an XLA row
# gather, but the COMPUTE — which dominates the gather path ~4:1 (BASELINE
# r01 profile) — runs in these kernels instead of XLA elementwise fusion:
# the same shared-sweep leave-one-out threshold trees and two-min CN
# update as the fused QC kernels, reading/writing CONTIGUOUS slot planes
# of the standard slot-major grouped layout (fast_layout.GroupedLayout,
# align=16 so every tile offset is 8-aligned).  No shifts, no halo
# planes, no realign — each grid step DMAs d exact (NT, B) slabs in,
# computes, and DMAs d slabs back to the SAME rows.  Per-step parameters
# (slot bases, channel base, real-row count for pad masking) come from
# SMEM tables exactly like the QC choreography.

def _std_nt(B: int, d: int, itemsize: int) -> int:
    """Tile rows for the std kernels: the same measured-24 default and
    accurate VMEM hard bound as pick_nt (no halo here, but the compute
    locality argument is identical).  LUT_STD_NT overrides for scans —
    experimental: values above the default can exceed the schedulable
    VMEM of the dv=17 select-chain tree at DVB-S2 scale and fault at
    run time (the hard bound counts scratch buffers, not the sweeps'
    live temporaries); the default is measured-optimal AND safe."""
    force = os.environ.get("LUT_STD_NT")
    per_row_hard = ((5 * d + 3) * itemsize + 2 + (2 * d + 6) * 4) * B
    nt_hard = (_VMEM_LIMIT - (2 << 20)) // per_row_hard // 8 * 8
    if force:
        return max(8, min(int(force) // 8 * 8, nt_hard))
    return max(8, min(24, nt_hard))


def _std_schedule(blocks, nt):
    """Flat step tables for a grouped-block side.

    Each degree class tiles its own n_pad with ntb = min(nt, n_pad) rows
    (always a multiple of 8 since align=16 pads every block), so small
    classes never read or write past their planes; the scratch is sized
    for the LARGEST ntb and per-class branches copy/compute static
    [0:ntb) slices.  Returns (ranges_d with (lo, hi, degree, ntb),
    class_order, base (nrows, max_d) row starts per slot, node0 (nrows,)
    node-row starts, nreal (nrows,) real rows in tile, NT_max)."""
    rows = []
    class_of = []
    ntb_of_class = {}
    for ci, blk in enumerate(blocks):
        d, n_pad = blk.degree, blk.n_pad
        ntb = max(8, min(nt(d), n_pad) // 8 * 8)
        ntb_of_class[ci] = ntb
        t0s = [min(t * ntb, n_pad - ntb) for t in range(-(-n_pad // ntb))]
        for t0 in t0s:
            base = [blk.edge_start + k * n_pad + t0 for k in range(d)]
            nreal = max(0, min(blk.num_nodes - t0, ntb))
            rows.append((base, blk.node_start + t0, nreal))
            class_of.append(ci)
    max_d = max(blk.degree for blk in blocks)
    nrows = len(rows)
    base = np.zeros((nrows, max_d), np.int64)
    node0 = np.zeros((nrows,), np.int64)
    nreal = np.zeros((nrows,), np.int64)
    for r, (b, n0, nr) in enumerate(rows):
        base[r, : len(b)] = b
        node0[r] = n0
        nreal[r] = nr
    ranges = tuple((lo, hi, blocks[ci].degree, ntb_of_class[ci])
                   for lo, hi, ci in _class_ranges(class_of))
    class_order = tuple(ci for _, _, ci in _class_ranges(class_of))
    return (ranges, class_order, base, node0, nreal,
            max(ntb_of_class.values()))


class _StdChor:
    """Double-buffered contiguous-slab choreography (no halo/realign).
    Per-class tile length ntb <= NT: copies move static [0:ntb) slices
    of the NT-sized scratch (tail rows hold stale garbage, never
    consumed: compute results there are masked / not written back)."""

    def __init__(self, NT, ranges_d):
        self.NT = NT
        self.ranges_d = ranges_d

    def start_in(self, m_ref, scr_in, sem_in, base8, row, buf, d, ntb):
        # base8 is TRANSPOSED (max_d, nrows): SMEM pads the minor dim to
        # 128 lanes, so (nrows, max_d) tables would blow the 1 MB SMEM
        # at DVB-S2-scale row counts
        for k in range(d):
            pltpu.make_async_copy(
                m_ref.at[pl.ds(pl.multiple_of(base8[k, row] * 8, 8), ntb)],
                scr_in.at[buf, k, pl.ds(0, ntb)], sem_in.at[buf, k],
            ).start()

    def wait_in(self, scr_in, sem_in, buf, d, ntb):
        # the wait's byte count must match the ntb-sliced copy: a
        # full-buffer wait deadlocks/faults when classes mix tile sizes
        for k in range(d):
            pltpu.make_async_copy(
                scr_in.at[buf, k, pl.ds(0, ntb)],
                scr_in.at[buf, k, pl.ds(0, ntb)], sem_in.at[buf, k]
            ).wait()

    def out_dma(self, o_ref, scr_out, sem_out, base8, row, buf, k, ntb):
        return pltpu.make_async_copy(
            scr_out.at[buf, k, pl.ds(0, ntb)],
            o_ref.at[pl.ds(pl.multiple_of(base8[k, row] * 8, 8), ntb)],
            sem_out.at[buf, k],
        )

    def start_out(self, o_ref, scr_out, sem_out, base8, row, buf, d, ntb):
        for k in range(d):
            self.out_dma(o_ref, scr_out, sem_out, base8, row, buf, k,
                         ntb).start()

    def drain_out(self, o_ref, scr_out, sem_out, base8, row, buf, d, ntb):
        for k in range(d):
            self.out_dma(o_ref, scr_out, sem_out, base8, row, buf, k,
                         ntb).wait()


def _cn_std_kernel(base8, nreal, m_ref, o_ref, synd_ref, scr_in, scr_out,
                   sem_in, sem_out, *, chor, out_dtype):
    ch = chor
    st = pl.program_id(0)
    nsteps = pl.num_programs(0)
    buf = jax.lax.rem(st, 2)

    @pl.when(st == 0)
    def _():
        _for_class_std(ch.ranges_d, st,
                       lambda d, nt: ch.start_in(m_ref, scr_in, sem_in,
                                                 base8, st, buf, d, nt))
    @pl.when(st + 1 < nsteps)
    def _():
        _for_class_std(ch.ranges_d, st + 1,
                       lambda d, nt: ch.start_in(m_ref, scr_in, sem_in,
                                                 base8, st + 1, 1 - buf,
                                                 d, nt))
    _for_class_std(ch.ranges_d, st,
                   lambda d, nt: ch.wait_in(scr_in, sem_in, buf, d, nt))

    @pl.when(st >= 2)
    def _():
        _for_class_std(ch.ranges_d, st - 2,
                       lambda d, nt: ch.drain_out(o_ref, scr_out, sem_out,
                                                  base8, st - 2, buf, d,
                                                  nt))

    B = scr_out.shape[-1]
    NT = ch.NT
    cdt = jnp.float32
    INF = jnp.asarray(np.inf, cdt)

    def compute(d, bufc):
        x = [scr_in[bufc, k].astype(cdt) for k in range(d)]
        neg_par = x[0] < 0
        min1, min2 = jnp.abs(x[0]), jnp.full((NT, B), INF, cdt)
        for k in range(1, d):
            neg_par = neg_par ^ (x[k] < 0)
            mag = jnp.abs(x[k])
            min2 = jnp.minimum(min2, jnp.maximum(min1, mag))
            min1 = jnp.minimum(min1, mag)
        for k in range(d):
            tmp = jnp.where(jnp.abs(x[k]) == min1, min2, min1)
            flip = neg_par ^ (x[k] < 0)
            scr_out[bufc, k] = jnp.where(flip, -tmp, tmp).astype(out_dtype)
        # per-tile syndrome of the INPUT signs, pad rows forced ok
        pad_ok = (jax.lax.broadcasted_iota(jnp.int32, (NT, B), 0)
                  >= nreal[st])
        synd_ref[...] = jnp.broadcast_to(
            jnp.min((pad_ok | ~neg_par).astype(jnp.int32), axis=0,
                    keepdims=True),
            (8, B),
        ).astype(jnp.int8)

    ranges3 = tuple((lo, hi, d) for lo, hi, d, _ in ch.ranges_d)
    if not _static_parity(ranges3):
        _for_class_std(ch.ranges_d, st, lambda d, nt: compute(d, buf))
    else:
        for lo_r, hi_r, d_r, _nt in ch.ranges_d:
            for bufc in range(2):
                @pl.when(_in_class(st, lo_r, hi_r) & (buf == bufc))
                def _(d_r=d_r, bufc=bufc):
                    compute(d_r, bufc)

    _for_class_std(ch.ranges_d, st,
                   lambda d, nt: ch.start_out(o_ref, scr_out, sem_out,
                                              base8, st, buf, d, nt))
    @pl.when(st == nsteps - 1)
    def _():
        _for_class_std(ch.ranges_d, st,
                       lambda d, nt: ch.drain_out(o_ref, scr_out, sem_out,
                                                  base8, st, buf, d, nt))
        @pl.when(nsteps >= 2)
        def _():
            _for_class_std(ch.ranges_d, st - 1,
                           lambda d, nt: ch.drain_out(o_ref, scr_out,
                                                      sem_out, base8,
                                                      st - 1, 1 - buf, d,
                                                      nt))


def cn_std_pass(m_cn, cn_blocks, dtype=None):
    """Min-LUT CN update on the std CN-grouped slot-major array.

    m_cn (E_cn_pad, B) values -> (same-layout outputs, synd_ok (B,))."""
    B = m_cn.shape[1]
    ranges, class_order, base, node0, nreal, NT = _std_schedule(
        cn_blocks, lambda d: _std_nt(B, d, m_cn.dtype.itemsize))
    max_d = max(blk.degree for blk in cn_blocks)
    chor = _StdChor(NT, ranges)
    nrows = base.shape[0]
    kern = functools.partial(_cn_std_kernel, chor=chor, out_dtype=m_cn.dtype)
    out, synd = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct(m_cn.shape, m_cn.dtype),
            jax.ShapeDtypeStruct((nrows * 8, B), jnp.int8),
        ],
        grid=(nrows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, max_d, NT, B), m_cn.dtype),
            pltpu.VMEM((2, max_d, NT, B), m_cn.dtype),
            pltpu.SemaphoreType.DMA((2, max_d)),
            pltpu.SemaphoreType.DMA((2, max_d)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(_smem_i32(base.T // 8), _smem_i32(nreal), m_cn)
    synd_ok = jnp.min(synd.reshape(-1, 8, B)[:, 0], axis=0) != 0
    return out, synd_ok


def _vn_std_kernel(*refs, chor, ops_by_class, use_tot_by_class,
                   nops_by_class, out_dtype):
    ch = chor
    nclasses = len(ops_by_class)
    nprm = sum(nops_by_class)
    (base8, node8, nreal, m_ref, cha_ref) = refs[:5]
    prm_flat = refs[5 : 5 + 4 * nprm]
    o_ref, bits_ref, unan_ref = refs[5 + 4 * nprm : 8 + 4 * nprm]
    (scr_in, scr_cha, scr_bits, scr_out,
     sem_in, sem_cha, sem_bits, sem_out) = refs[8 + 4 * nprm:]
    prm_by_class = []
    off = 0
    for c in range(nclasses):
        prm_by_class.append([
            prm_flat[4 * (off + oi) : 4 * (off + oi) + 4]
            for oi in range(nops_by_class[c])
        ])
        off += nops_by_class[c]

    st = pl.program_id(0)
    nsteps = pl.num_programs(0)
    buf = jax.lax.rem(st, 2)
    NT = ch.NT
    B = scr_cha.shape[-1]

    def cha_dma(row, b, ntb):
        return pltpu.make_async_copy(
            cha_ref.at[pl.ds(pl.multiple_of(node8[row] * 8, 8), ntb)],
            scr_cha.at[b, pl.ds(0, ntb)], sem_cha.at[b],
        )

    def bits_dma(row, b, ntb):
        return pltpu.make_async_copy(
            scr_bits.at[b, pl.ds(0, ntb)],
            bits_ref.at[pl.ds(pl.multiple_of(node8[row] * 8, 8), ntb)],
            sem_bits.at[b],
        )

    @pl.when(st == 0)
    def _():
        def start(d, nt):
            cha_dma(st, buf, nt).start()
            ch.start_in(m_ref, scr_in, sem_in, base8, st, buf, d, nt)
        _for_class_std(ch.ranges_d, st, start)
    @pl.when(st + 1 < nsteps)
    def _():
        def start(d, nt):
            cha_dma(st + 1, 1 - buf, nt).start()
            ch.start_in(m_ref, scr_in, sem_in, base8, st + 1, 1 - buf, d,
                        nt)
        _for_class_std(ch.ranges_d, st + 1, start)
    _for_class_std(ch.ranges_d, st,
                   lambda d, nt: ch.wait_in(scr_in, sem_in, buf, d, nt))
    _for_class_std(ch.ranges_d, st,
                   lambda d, nt: cha_dma(st, buf, nt).wait())

    def drain_step(row, b):
        def dr(d, nt):
            ch.drain_out(o_ref, scr_out, sem_out, base8, row, b, d, nt)
            bits_dma(row, b, nt).wait()
        _for_class_std(ch.ranges_d, row, dr)

    @pl.when(st >= 2)
    def _():
        drain_step(st - 2, buf)

    def compute(d, c, bufc):
        msg = [scr_in[bufc, k].astype(jnp.float32) for k in range(d)]
        cha = scr_cha[bufc].astype(jnp.float32)
        neg0, agree = _vn_class_compute(
            msg, cha, scr_out, bufc, d, ops_by_class[c], prm_by_class[c],
            use_tot_by_class[c], out_dtype, NT, B,
        )
        scr_bits[bufc] = neg0.astype(jnp.int8)
        pad_ok = (jax.lax.broadcasted_iota(jnp.int32, (NT, B), 0)
                  >= nreal[st])
        unan_ref[...] = jnp.broadcast_to(
            jnp.min((pad_ok | agree).astype(jnp.int32), axis=0,
                    keepdims=True),
            (8, B),
        ).astype(jnp.int8)

    ranges3 = tuple((lo, hi, d) for lo, hi, d, _ in ch.ranges_d)
    if not _static_parity(ranges3):
        for ci_r, (lo, hi, d, _nt) in enumerate(ch.ranges_d):
            @pl.when(_in_class(st, lo, hi))
            def _(d=d, ci_r=ci_r):
                compute(d, ci_r, buf)
    else:
        for ci_r, (lo, hi, d, _nt) in enumerate(ch.ranges_d):
            for bufc in range(2):
                @pl.when(_in_class(st, lo, hi) & (buf == bufc))
                def _(d=d, ci_r=ci_r, bufc=bufc):
                    compute(d, ci_r, bufc)

    def finish(d, nt):
        ch.start_out(o_ref, scr_out, sem_out, base8, st, buf, d, nt)
        bits_dma(st, buf, nt).start()
    _for_class_std(ch.ranges_d, st, finish)
    @pl.when(st == nsteps - 1)
    def _():
        drain_step(st, buf)
        @pl.when(nsteps >= 2)
        def _():
            drain_step(st - 1, 1 - buf)


def vn_std_pass(m_c2v, cha, vn_blocks, nvar_pad, structs, prm_by_class,
                use_tot_by_class, flags_by_class):
    """VN threshold-tree update on the std VN-grouped slot-major array.

    m_c2v (E_vn_pad, B) c2v values, cha (nvar_pad, B) channel values ->
    (v2c values same layout, bits (nvar_pad, B) int8, unan (B,) bool).
    structs/prm/use_tot/flags per VN block (ascending-degree order), one
    iteration's params — same contracts as vn_qc_pass."""
    B = m_c2v.shape[1]
    ranges, class_order, base, node0, nreal, NT = _std_schedule(
        vn_blocks, lambda d: _std_nt(B, d + 1, m_c2v.dtype.itemsize))
    max_d = max(blk.degree for blk in vn_blocks)
    chor = _StdChor(NT, ranges)
    nrows = base.shape[0]

    ops_by_class = []
    nops_by_class = []
    prm_args = []
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3 + [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    prm_dtype = jnp.float32
    from .arith import loo_msg_spans

    for c in class_order:
        struct = structs[c]
        flags = flags_by_class[c]
        spans = loo_msg_spans(struct)
        ops_static = tuple(
            (tuple(int(x) for x in op.operands),
             int(prm_by_class[c][oi]["thr"].shape[-1]),
             bool(flags[oi]["sym"]), bool(flags[oi]["has_tie"]),
             False, spans[oi])
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
                    pl.BlockSpec(a.shape, lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
                )

    kern = functools.partial(
        _vn_std_kernel, chor=chor, ops_by_class=tuple(ops_by_class),
        use_tot_by_class=tuple(
            bool(use_tot_by_class[c]) for c in class_order),
        nops_by_class=tuple(nops_by_class), out_dtype=m_c2v.dtype,
    )
    out, bits, unan = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct(m_c2v.shape, m_c2v.dtype),
            jax.ShapeDtypeStruct((nvar_pad, B), jnp.int8),
            jax.ShapeDtypeStruct((nrows * 8, B), jnp.int8),
        ],
        grid=(nrows,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, max_d, NT, B), m_c2v.dtype),
            pltpu.VMEM((2, NT, B), m_c2v.dtype),
            pltpu.VMEM((2, NT, B), jnp.int8),
            pltpu.VMEM((2, max_d, NT, B), m_c2v.dtype),
            pltpu.SemaphoreType.DMA((2, max_d)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, max_d)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(_smem_i32(base.T // 8), _smem_i32(node0 // 8), _smem_i32(nreal),
      m_c2v, cha, *prm_args)
    return out, bits, unan.reshape(-1, 8, B)[:, 0].min(axis=0) != 0
