"""Value-domain LUT decoder: pure vector arithmetic, zero mid-loop gathers.

The third and fastest decoder implementation (after lut_decoder's unrolled
reference form and fast_decoder's table form), built on the validated
arithmetic representation of decoder/arith.py:

- messages are value arrays in an (E, B) layout — edge-major with the
  frame batch in the lane dimension, so the two per-iteration permutation
  gathers move full 128-lane rows and their address cost amortizes over B;
- the min-LUT CN update runs directly on values (sign parity + two-min on
  magnitudes), bit-identical to the label form by the validated
  monotone/symmetric value<->label correspondence;
- a VN tree node is add + threshold-count + piecewise-constant emission —
  pure VPU work, no tables;
- `lax.scan` over iterations with per-iteration thresholds as xs; the
  unanimity/syndrome early-exit latch reads signs of tensors the iteration
  already produces.

TPU-performance notes (measured on v5e, N=10000 (3,6) q4, B=4096):

- integer specs emit levels as ``lev0 + sum_k [s >= thr_k] * dlev_k``
  (exact in int16: levels are strictly monotone so the partial sums are
  bounded by the level table itself, and the count-of-thresholds form is
  literally how arith.py validates the representation) instead of a
  15-deep dependent select chain — 2.4x faster, bit-identical;
- VN leave-one-out uses total-minus-self for the all-messages first op
  (exact for integer values) and evaluates per output edge on (n, B)
  slices instead of materializing stacked (d, n, B) leaf arrays;
- converged frames are NOT frozen: outputs (bits/ok/iters) latch at first
  convergence and the state free-runs afterwards, which saves a full
  (E, B) select per iteration and is output-identical by construction.

Bit-exact to LUTDecoder/FastLUTDecoder (asserted in tests); built via
make_decoder, which falls back when build_arith_spec cannot prove
exactness.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .arith import ArithSpec, build_arith_spec
from .codec import LUTCodec
from .fast_layout import GroupedLayout

__all__ = ["ArithLUTDecoder"]


class ArithLUTDecoder:
    """Full decoder when built from a complete spec; with a prefix spec
    (dec_trees None) it decodes only the first spec.num_iters iterations
    and reports per-frame convergence — the fast first stage of
    StagedLUTDecoder."""

    def __init__(self, codec: LUTCodec, early_exit: bool = True,
                 spec: ArithSpec | None = None):
        self.codec = codec
        self.early_exit = early_exit
        self.spec = spec if spec is not None else build_arith_spec(codec)
        self.is_prefix = self.spec.dec_trees is None
        if self.is_prefix and not early_exit:
            raise ValueError("a prefix decoder requires early_exit")
        self.T = codec.max_iters
        self.S = self.spec.num_iters  # VN iterations covered by the scan
        self.nvar = codec.graph.nvar
        self._dtype_np = np.dtype(self.spec.dtype)
        self._dtype = jnp.dtype(self._dtype_np)
        self._is_int = np.issubdtype(self._dtype_np, np.integer)
        # align=16: every per-slot plane starts on an int16 (16, 128) tile
        # boundary, so the (E, B) <-> (d, n_pad, B) block reshapes are free
        # bitcasts on TPU; padded rows carry garbage and all reductions in
        # convergence() mask them out
        self.layout = GroupedLayout(codec.graph, slot_major=True, align=16)
        # spec rows by degree: the spec may carry EXTRA degrees beyond the
        # graph's blocks (phantom-completed graphs: the codec designs trees
        # for the TRUE degree profile, e.g. the DVB-S2 staircase-wrap
        # dv=1 column that the completed graph holds as a dv=2 block)
        try:
            self._spec_di = [self.spec.degrees.index(blk.degree)
                             for blk in self.layout.vn_blocks]
        except ValueError:
            raise ValueError("arith spec degrees do not match graph blocks")
        self._build_phantoms()
        self._qcp = None
        self._qc_copies = None
        qc = getattr(codec.graph, "qc", None)
        if qc is not None:
            # roll-decomposed permutation (validated exact in qc_plan):
            # contiguous copies instead of a row gather — the gather is
            # DMA-issue-bound, rolls run at HBM stream bandwidth.  The
            # QCPlan supports any degree mix (irregular QC); its copies
            # drive the XLA scan permutes, its cn_rows/vn_cols the fused
            # Pallas kernels.
            qcp = self.layout.qc_plan(qc)
            self._qcp = qcp
            self._qc_copies = qcp.copies if qcp is not None else None
            self._qc = qc
        self._build_constants()
        self._decode = jax.jit(self._build_qc_pallas()
                               or self._build_std_kernels()
                               or self._build())

    def _use_qc_kernels(self) -> bool:
        """Fused Pallas path: QC graph (arbitrary shifts, any degree mix),
        int16 or float32 values, running on a real TPU."""
        from .qc_kernels import qc_kernels_supported

        if self._qcp is None:
            return False
        if self._dtype_np not in (np.dtype(np.int16), np.dtype(np.float32)):
            return False
        if self._qc.Z % 8:
            return False
        return qc_kernels_supported()

    # ------------------------------------------------------------------
    def _build_phantoms(self):
        """Static bookkeeping for phantom completion edges (core/qc.py).

        Semantics (golden definition: decode_ref, decoder/codec.py): the
        phantom v2c value is pinned to the strongest positive level at
        every CN pass — min-sum is neutral to a max-magnitude positive
        input, so the completed check's outputs, sign parity, and
        syndrome equal the TRUE check's exactly — and the phantom node
        updates with its TRUE-degree trees over its real sockets, the
        phantom sockets mirroring the first real output so the unanimity
        sweep needs no masking.  The kernel path instead copies the real
        c2v input over the phantom input row before the VN kernel (the
        node's in-kernel outputs then agree identically, making its
        unanimity lane trivially true as the true degree-1 semantics
        require) and overwrites its output rows after."""
        from .arith import ArithBuildError

        lay = self.layout
        self._ph = []
        phantoms = self.codec.graph.phantoms
        if not phantoms:
            return
        by_var: dict = {}
        for p in phantoms:
            by_var.setdefault(p["var"], []).append(p)
        vn_node_pos = np.asarray(lay.vn_node_pos)
        perm_c2v = np.asarray(lay.perm_c2v)
        for v, plist in sorted(by_var.items()):
            node_row = int(vn_node_pos[v])
            bi = next(
                i for i, blk in enumerate(lay.vn_blocks)
                if blk.node_start <= node_row < blk.node_start + blk.n_pad
            )
            blk = lay.vn_blocks[bi]
            d = blk.degree
            off = node_row - blk.node_start
            rows = [blk.edge_start + k * blk.n_pad + off for k in range(d)]
            ph_slots = sorted(p["var_slot"] for p in plist)
            real_slots = [k for k in range(d) if k not in ph_slots]
            td = len(real_slots)
            if td < 1:
                raise ArithBuildError("phantom node with no real socket")
            try:
                di = self.spec.degrees.index(td)
            except ValueError:
                raise ArithBuildError(
                    f"spec lacks the true degree-{td} trees of a phantom "
                    "node (design the codec on the phantom graph)")
            self._ph.append(dict(
                v=v, bi=bi, off=off, d=d, td=td, di=di, node_row=node_row,
                rows_ph=[rows[k] for k in ph_slots],
                rows_real=[rows[k] for k in real_slots],
                cn_rows_ph=[int(perm_c2v[rows[k]]) for k in ph_slots],
                cn_rows_real=[int(perm_c2v[rows[k]]) for k in real_slots],
            ))
        self._pin = (
            np.asarray(32767, self._dtype_np) if self._is_int
            else np.asarray(np.finfo(self._dtype_np).max, self._dtype_np)
        )

    def _ph_pin_cn(self, m_cn):
        """Pin phantom v2c rows (CN-grouped layout) to the strongest
        positive value — before the syndrome read and the CN update."""
        if not self._ph:
            return m_cn
        rows = jnp.asarray([r for p in self._ph for r in p["cn_rows_ph"]])
        return m_cn.at[rows].set(jnp.asarray(self._pin, m_cn.dtype))

    def _ph_node_outputs(self, p, msgs, cha_row, var_prm):
        """TRUE-degree leave-one-out outputs of one phantom node.

        msgs: list of td real c2v value rows (slot order), cha_row the
        node's channel value row; var_prm the iteration-sliced op params
        of the true-degree spec row.  Returns td output rows (storage
        dtype)."""
        di = p["di"]
        struct = self._var_struct[di]
        fp = self._fp_block[di]
        outs = []
        for i in range(p["td"]):
            x_vals = [msgs[j] for j in range(p["td"]) if j != i] + [cha_row]
            o = self._eval_tree(struct, x_vals, var_prm, fp=fp)
            outs.append(o.astype(self._dtype) if fp else o)
        return outs

    def _ph_dec_fix(self, dec_bits, m_fin, cha_blocks):
        """True-degree decision-tree output for phantom nodes (m_fin: the
        final c2v values in the VN-grouped standard layout)."""
        for p in self._ph:
            spec = self._dec_specs[p["di"]]
            x_vals = ([m_fin[r] for r in p["rows_real"]]
                      + [cha_blocks[p["bi"]][p["off"]]])
            prm, fp = self._dec_prm(spec)
            out = self._eval_tree(spec, x_vals, prm, fp=fp)
            dec_bits = dec_bits.at[p["node_row"]].set(
                (out < 0).astype(dec_bits.dtype))
        return dec_bits

    def _ph_zero_edge_bits(self, edge_bits):
        """Phantom (var, check) pairs contribute nothing to the bit-level
        syndrome of the TRUE matrix."""
        if not self._ph:
            return edge_bits
        rows = jnp.asarray([r for p in self._ph for r in p["cn_rows_ph"]])
        return edge_bits.at[rows].set(0)

    def _build_constants(self):
        lay = self.layout
        self._perm_v2c = jnp.asarray(lay.perm_v2c)
        self._perm_c2v = jnp.asarray(lay.perm_c2v)
        self._vn_nodes = jnp.asarray(lay.vn_nodes)
        self._vn_node_pos = jnp.asarray(lay.vn_node_pos)
        self._cn_var_pos = jnp.asarray(lay.cn_var_pos)
        self._leaf_msg0 = jnp.asarray(self.spec.leaf_msg0)
        self._leaf_cha = jnp.asarray(self.spec.leaf_cha)
        # per-block pad masks: True at PADDED node rows (masked out of every
        # unanimity / syndrome reduction)
        self._vn_padmask = [
            jnp.asarray(np.arange(blk.n_pad) >= blk.num_nodes)
            for blk in lay.vn_blocks
        ]
        self._cn_padmask = [
            jnp.asarray(np.arange(blk.n_pad) >= blk.num_nodes)
            for blk in lay.cn_blocks
        ]

        # stacked per-iteration op parameters: per block, per op:
        # thr (S, K-1), levels (S, K) [+ lev0/dlev for integer specs,
        # sthr/smag for symmetric emission]; static per-op flags (sym,
        # has_tie, fp) live in _op_flags, outside the scanned pytrees.
        # Blocks with any float_params op (center-pair-repaired interior
        # tables inside an int16 spec) evaluate their whole tree in f32 —
        # exact on the int16 grid (all values/sums < 2^24) — with float
        # select-chain emission; message STORAGE stays int16.
        # indexed per SPEC ROW (== per layout block for ordinary graphs;
        # phantom-completed graphs carry extra true-degree rows, mapped
        # through self._spec_di)
        self._var_xs = []
        self._var_struct = []  # per spec row: ArithTreeSpec (structure only)
        self._op_flags = []  # per spec row: list of per-op static flag dicts
        self._fp_block = []  # per spec row: tree evaluates in f32
        S = self.S
        dt = self._dtype_np
        for bi in range(len(self.spec.degrees)):
            tree0 = self.spec.var_trees[0][bi] if S > 0 else None
            self._var_struct.append(tree0)
            ops_xs = []
            flags = []
            fp_block = False
            if S > 0:
                for oi in range(len(tree0.ops)):
                    specs_oi = [self.spec.var_trees[ii][bi].ops[oi]
                                for ii in range(S)]
                    fp = any(sp.float_params for sp in specs_oi)
                    fp_block = fp_block or fp
                    thr = np.stack(
                        [np.asarray(sp.thresholds, np.float32 if fp else None)
                         for sp in specs_oi]
                    )
                    levels = np.stack(
                        [np.asarray(sp.levels, np.float32 if fp else None)
                         for sp in specs_oi]
                    )
                    tie_lo = np.array([sp.tie_lo for sp in specs_oi],
                                      dtype=np.float32 if fp else dt)
                    tie_hi = np.array([sp.tie_hi for sp in specs_oi],
                                      dtype=np.float32 if fp else dt)
                    prm = dict(thr=jnp.asarray(thr), levels=jnp.asarray(levels),
                               tie_lo=jnp.asarray(tie_lo), tie_hi=jnp.asarray(tie_hi))
                    if self._is_int and not fp:
                        # delta-emission parameters (see module docstring)
                        prm["lev0"] = jnp.asarray(levels[:, 0].astype(dt))
                        prm["dlev"] = jnp.asarray(
                            np.diff(levels.astype(np.int64), axis=1).astype(dt)
                        )
                    if all(sp.sym_thr is not None for sp in specs_oi):
                        # symmetric sign x magnitude emission (arith.py):
                        # half the thresholds, validated per iteration
                        prm["sthr"] = jnp.asarray(
                            np.stack([np.asarray(sp.sym_thr,
                                                 np.float32 if fp else None)
                                      for sp in specs_oi]))
                        prm["smag"] = jnp.asarray(
                            np.stack([np.asarray(sp.sym_levels,
                                                 np.float32 if fp else None)
                                      for sp in specs_oi]))
                    sym_all = all(sp.sym_thr is not None for sp in specs_oi)
                    # f32 delta emission for the QC kernels: emit as
                    # lev0 + sum_k [s >= thr_k] * dlev_k (independent
                    # masked adds — ~2x the VPU throughput of the
                    # dependent select chain) whenever the sequential-f32
                    # partial sums reproduce every level bit-exactly;
                    # validated here per op over all iterations
                    def _delta_pack(levels_np):
                        lv = np.asarray(levels_np, np.float32)
                        d_ = np.diff(lv, axis=-1)
                        acc = lv[..., 0].copy()
                        for k in range(d_.shape[-1]):
                            acc = (acc + d_[..., k]).astype(np.float32)
                            if not np.array_equal(acc, lv[..., k + 1]):
                                return None
                            acc = lv[..., k + 1].copy()  # == acc (exact)
                        return np.concatenate([lv[..., :1], d_], axis=-1)

                    if sym_all:
                        packed = _delta_pack(
                            np.stack([np.asarray(sp.sym_levels, np.float32)
                                      for sp in specs_oi]))
                    else:
                        packed = _delta_pack(np.asarray(levels, np.float32))
                    if packed is not None:
                        prm["kdelta"] = jnp.asarray(packed)
                    flags.append(dict(
                        sym=sym_all,
                        has_tie=any(sp.has_zero for sp in specs_oi),
                        fp=fp,
                        kdelta=packed is not None,
                    ))
                    ops_xs.append(prm)
            self._var_xs.append(ops_xs)
            self._op_flags.append(flags)
            self._fp_block.append(fp_block)
        self._dec_specs = self.spec.dec_trees

    # ------------------------------------------------------------------
    def _scan_copies(self, m, srcs, dsts, shifts, out_rows):
        """Apply the roll-copy plan as ONE lax.scan op: per step, slice a
        (Z, B) segment, roll it by the step's shift (double + dynamic
        slice), and write it at the destination offset.

        A single scan keeps the permute at one kernel launch — on this
        environment's tunneled TPU every launch costs ~40 ms, so the
        naive concat-of-rolls form (~2 ops per circulant) is latency-dead
        even though it moves the same bytes.  Unwritten (pad) rows stay
        zero (masked out of every reduction)."""
        Z, B = self._qc.Z, m.shape[1]
        out = jnp.zeros((out_rows, B), m.dtype)

        def body(out, x):
            src, dst, s = x
            seg = jax.lax.dynamic_slice(m, (src, 0), (Z, B))
            seg2 = jnp.concatenate([seg, seg], axis=0)
            rolled = jax.lax.dynamic_slice(seg2, (s, 0), (Z, B))
            return jax.lax.dynamic_update_slice(out, rolled, (dst, 0)), None

        out, _ = jax.lax.scan(body, out, (srcs, dsts, shifts))
        return out

    def _permute_v2c(self, m):
        """VN-grouped (E, B) -> CN-grouped (E, B); roll copies when QC.

        Pad rows of the output are filled with zeros (they are masked out
        of every reduction; the gather path fills them with row 0's values
        instead — equally arbitrary)."""
        if self._qc_copies is None:
            return jnp.take(m, self._perm_v2c, axis=0)
        Z = self._qc.Z
        vs, cs, s = (np.array(x, dtype=np.int32)
                     for x in zip(*self._qc_copies))
        # m_cn[dst + z'] = m_vn[src + (z'-s) % Z] = rolled-by-s segment,
        # i.e. slice the doubled segment at offset Z - s
        return self._scan_copies(m, jnp.asarray(vs), jnp.asarray(cs),
                                 jnp.asarray((Z - s) % Z),
                                 self.layout.num_edges_cn)

    def _permute_c2v(self, m):
        """CN-grouped (E, B) -> VN-grouped (E, B); inverse roll copies."""
        if self._qc_copies is None:
            return jnp.take(m, self._perm_c2v, axis=0)
        vs, cs, s = (np.array(x, dtype=np.int32)
                     for x in zip(*self._qc_copies))
        return self._scan_copies(m, jnp.asarray(cs), jnp.asarray(vs),
                                 jnp.asarray(s),
                                 self.layout.num_edges_vn)

    # ------------------------------------------------------------------
    def _vn_blocks_of(self, m):
        # slot-major: block range reshapes to (d, n_pad, B), contiguous slots
        out = []
        for blk in self.layout.vn_blocks:
            d, n, e0 = blk.degree, blk.n_pad, blk.edge_start
            out.append(m[e0 : e0 + n * d].reshape(d, n, -1))
        return out

    def _cn_blocks_of(self, m):
        out = []
        for blk in self.layout.cn_blocks:
            d, n, e0 = blk.degree, blk.n_pad, blk.edge_start
            out.append(m[e0 : e0 + n * d].reshape(d, n, -1))
        return out

    @staticmethod
    def _cn_minsum_values(m):
        """Min-LUT CN update on values; m (d, n, B), slot-major.

        out_i = (sign parity excluding i) * min_{j != i} |m_j| via
        prefix/suffix mins over contiguous slot slices — value-identical to
        the reference's min1/min2/argmin formulation (chk_update_minsum,
        LDPC_Code_LUT.cpp:355: for i = argmin the min of the others IS
        min2, elsewhere min1; duplicated minima give the same value either
        way) without the costly argmin/one-hot."""
        d = m.shape[0]
        neg = m < 0
        mag = jnp.abs(m)
        INF = jnp.asarray(
            np.iinfo(m.dtype).max if jnp.issubdtype(m.dtype, jnp.integer)
            else np.inf,
            m.dtype,
        )
        pre = [jnp.full(m.shape[1:], INF, m.dtype)]
        for j in range(d - 1):
            pre.append(jnp.minimum(pre[-1], mag[j]))
        suf = [jnp.full(m.shape[1:], INF, m.dtype)]
        for j in range(d - 1, 0, -1):
            suf.append(jnp.minimum(suf[-1], mag[j]))
        suf = suf[::-1]
        tmp = jnp.stack([jnp.minimum(pre[j], suf[j]) for j in range(d)], axis=0)
        sign_prod = (jnp.sum(neg, axis=0, keepdims=True) & 1).astype(bool)
        return jnp.where(sign_prod ^ neg, -tmp, tmp)

    # ------------------------------------------------------------------
    def _emit(self, s, prm, tie_ref, flags=None, dt=None):
        """Piecewise-constant emission for one op at one iteration.

        Symmetric specs (sthr/smag present): sign x magnitude chain over
        HALF the thresholds (validated exhaustively at build, arith.py).
        Integer specs: exact threshold-count delta form (module docstring).
        Float specs — and float_params ops inside integer specs (fp blocks
        pass dt=float32): the validated sequential select chain
        (rounding-exact by construction).  Zero sums emit the explicit tie
        outputs selected by the sign of the most-significant operand; ops
        with no reachable zero sum (has_tie False) skip the tie select
        entirely."""
        use_int = self._is_int and dt is None
        dt = self._dtype if dt is None else dt
        if "sthr" in prm:
            nthr = prm["sthr"].shape[-1]
            m = jnp.abs(s)
            out = jnp.broadcast_to(prm["smag"][..., 0], s.shape).astype(dt)
            for k in range(nthr):
                out = jnp.where(m >= prm["sthr"][..., k],
                                prm["smag"][..., k + 1], out)
            out = jnp.where(s < 0, -out, out)
        elif use_int:
            nthr = prm["thr"].shape[-1]
            acc = jnp.broadcast_to(prm["lev0"], s.shape).astype(dt)
            zero = jnp.zeros((), dt)
            for k in range(nthr):
                acc = acc + jnp.where(s >= prm["thr"][..., k],
                                      prm["dlev"][..., k], zero)
            out = acc
        else:
            nthr = prm["thr"].shape[-1]
            out = jnp.broadcast_to(prm["levels"][..., 0], s.shape).astype(dt)
            for k in range(nthr):
                out = jnp.where(s >= prm["thr"][..., k],
                                prm["levels"][..., k + 1], out)
        if flags is not None and not flags["has_tie"]:
            return out
        tie = jnp.where(tie_ref < 0, prm["tie_lo"], prm["tie_hi"])
        return jnp.where(s == 0, tie.astype(dt), out)

    def _eval_tree(self, struct, x_vals, op_params, fp=False):
        """x_vals: list of leaf value arrays (DFS order), each (..., B).
        op_params: per-op dict for ONE iteration (already sliced).  Returns
        root output values (f32 when fp: trees containing float_params ops
        evaluate wholly in f32 — exact on the int16 grid)."""
        cdt = jnp.float32 if fp else None
        vals = [v.astype(jnp.float32) for v in x_vals] if fp else list(x_vals)
        for op, prm in zip(struct.ops, op_params):
            s = vals[op.operands[0]]
            for sl in op.operands[1:]:
                s = s + vals[sl]
            vals.append(self._emit(s, prm, vals[op.operands[-1]], dt=cdt))
        return vals[-1]

    def _dec_prm(self, spec):
        """Per-op param dicts for a decision tree + the tree's fp flag."""
        fp = any(op.float_params for op in spec.ops)
        prm = []
        for op in spec.ops:
            cast = np.float32 if fp else None
            p = dict(thr=jnp.asarray(np.asarray(op.thresholds, cast)),
                     levels=jnp.asarray(np.asarray(op.levels, cast)),
                     tie_lo=jnp.asarray(np.asarray(
                         op.tie_lo, np.float32 if fp else self._dtype_np)),
                     tie_hi=jnp.asarray(np.asarray(
                         op.tie_hi, np.float32 if fp else self._dtype_np)))
            if self._is_int and not fp:
                lv = np.asarray(op.levels, np.int64)
                p["lev0"] = jnp.asarray(lv[0].astype(self._dtype_np))
                p["dlev"] = jnp.asarray(np.diff(lv).astype(self._dtype_np))
            prm.append(p)
        return prm, fp

    def _vn_block_update(self, bi, blk, m, cha_b, prm):
        """All d leave-one-out outputs of one degree block.

        m (d, n, B) message values, cha_b (n, B) channel values, prm per-op
        iteration-sliced params.  Evaluates per output edge on (n, B)
        slices (no stacked (d, n, B) leaf materialization); when the first
        op consumes all message leaves and values are integers, its sum is
        total-minus-self (exact).  Returns (d, n, B)."""
        d = blk.degree
        di = self._spec_di[bi]
        struct = self._var_struct[di]
        fp = self._fp_block[di]
        cdt = jnp.float32 if fp else None
        if fp:
            # f32 tree evaluation (exact on the int16 grid): required by
            # float_params ops, bit-identical for the integer ops too
            m = m.astype(jnp.float32)
            cha_b = cha_b.astype(jnp.float32)
        from .arith import loo_msg_spans

        spans = loo_msg_spans(struct)
        n_in = struct.num_inputs  # d: d-1 message positions + cha (last)
        nops = len(struct.ops)
        all_msgs = struct.ops[0].operands == tuple(range(d - 1)) and d >= 3
        tot = None
        if all_msgs and self._is_int:
            tot = m[0]
            for j in range(1, d):
                tot = tot + m[j]

        def emit_op(oi, s, tie_src):
            return self._emit(s, prm[oi], tie_src,
                              self._op_flags[di][oi], dt=cdt)

        def sweep(shift):
            # full bottom-up evaluation under one leaf assignment:
            # position j -> m[j + shift]; shared across the LOO outputs
            vals = [m[j + shift] for j in range(d - 1)] + [cha_b]
            for oi, op in enumerate(struct.ops):
                s = vals[op.operands[0]]
                for sl in op.operands[1:]:
                    s = s + vals[sl]
                vals.append(emit_op(oi, s, vals[op.operands[-1]]))
            return vals[n_in:]

        id_out = sweep(0)  # identity: positions 0..d-2 -> m_0..m_{d-2}
        s1_out = sweep(1) if d >= 2 else id_out  # shift1 -> m_1..m_{d-1}

        outs = []
        for i in range(d):
            if i == d - 1:
                outs.append(id_out[-1])
                continue
            if i == 0:
                outs.append(s1_out[-1])
                continue
            cache: dict = {}

            def val(x, i=i, cache=cache):
                if x < n_in - 1:  # message at position x
                    return m[x] if x < i else m[x + 1]
                if x == n_in - 1:
                    return cha_b
                k = x - n_in
                sp = spans[k]
                if sp is None or sp[1] < i:
                    return id_out[k]
                if sp[0] >= i:
                    return s1_out[k]
                if k not in cache:
                    op = struct.ops[k]
                    if k == 0 and tot is not None:
                        s = tot - m[i]
                    else:
                        s = val(op.operands[0])
                        for sl in op.operands[1:]:
                            s = s + val(sl)
                    cache[k] = emit_op(k, s, val(op.operands[-1]))
                return cache[k]

            outs.append(val(n_in + nops - 1))
        out = jnp.stack(outs, axis=0)
        return out.astype(self._dtype) if fp else out

    def _select_values(self, labels, table):
        """labels (..., ) int32 -> values via dense 16-way select."""
        v = jnp.zeros(labels.shape, self._dtype)
        for k in range(table.shape[0]):
            v = jnp.where(labels == k, table[k], v)
        return v

    # ------------------------------------------------------------------
    def _raw_carry_fn(self):
        """Unjitted (llr_cha, llr_msg) -> (m_vn values (E_pad, B)
        slot-major, done, latched, iters) at loop exit, BEFORE the
        post-loop convergence check — the hand-off point for
        HybridLUTDecoder's label-domain continuation tail."""
        if not self.early_exit:
            raise ValueError("raw carry requires early_exit")
        return (self._build_qc_pallas(raw=True)
                or self._build_std_kernels(raw=True)
                or self._build(raw=True))

    # ------------------------------------------------------------------
    def _build(self, raw: bool = False):
        lay = self.layout
        T = self.T
        early_exit = self.early_exit

        def convergence(m_vn, m_cn):
            bits, unan = [], None
            for bi, m in enumerate(self._vn_blocks_of(m_vn)):  # (d, n_pad, B)
                neg = m < 0
                agreen = jnp.all(neg == neg[:1], axis=0)  # (n_pad, B)
                agree = jnp.all(
                    agreen | self._vn_padmask[bi][:, None], axis=0
                )  # (B,)
                unan = agree if unan is None else (unan & agree)
                bits.append(neg[0].astype(jnp.uint8))  # (n_pad, B)
            bits = jnp.concatenate(bits, axis=0)  # (nvar_pad, B)
            synd = None
            for bi, m in enumerate(self._cn_blocks_of(m_cn)):
                s = jnp.sum((m < 0).astype(jnp.int32), axis=0) & 1  # (n_pad, B)
                ok = jnp.all(
                    (s == 0) | self._cn_padmask[bi][:, None], axis=0
                )
                synd = ok if synd is None else (synd & ok)
            return bits, unan & synd

        def decode(llr_cha, llr_msg):
            # inputs (B, nvar) int32 labels -> grouped (nvar_pad, B) values
            B = llr_cha.shape[0]
            cha_lab = llr_cha[:, self._vn_nodes].T  # (nvar_pad, B) grouped
            msg_lab = llr_msg[:, self._vn_nodes].T
            vcha = self._select_values(cha_lab, self._leaf_cha)
            v0 = self._select_values(msg_lab, self._leaf_msg0)

            cha_blocks = [
                vcha[blk.node_start : blk.node_start + blk.n_pad]
                for blk in lay.vn_blocks
            ]
            parts = []
            for blk in lay.vn_blocks:
                seg = v0[blk.node_start : blk.node_start + blk.n_pad]
                parts.append(
                    jnp.broadcast_to(seg[None], (blk.degree, blk.n_pad, B))
                    .reshape(-1, B)
                )
            m_vn = jnp.concatenate(parts, axis=0)  # (E_vn_pad, B), slot-major

            done = jnp.zeros((B,), dtype=bool)
            latched = jnp.zeros((lay.nvar_pad, B), dtype=jnp.uint8)
            iters = jnp.full((B,), T, dtype=jnp.int32)

            xs = dict(it=jnp.arange(self.S, dtype=jnp.int32))
            xs["var"] = self._var_xs

            def body(carry, x, cha_blocks_s):
                m_vn, done, latched, iters = carry
                W = m_vn.shape[-1]
                it = x["it"]
                m_cn = self._ph_pin_cn(self._permute_v2c(m_vn))
                if early_exit:
                    bits, conv = convergence(m_vn, m_cn)
                    conv = conv & (it >= 1) & ~done
                    latched = jnp.where(conv[None, :], bits, latched)
                    iters = jnp.where(conv, it, iters)
                    done = done | conv
                outs = []
                for m in self._cn_blocks_of(m_cn):
                    outs.append(self._cn_minsum_values(m).reshape(-1, W))
                m_cn = jnp.concatenate(outs, axis=0)
                m_new = self._permute_c2v(m_cn)
                outs = []
                for bi, blk in enumerate(lay.vn_blocks):
                    d, n, e0 = blk.degree, blk.n_pad, blk.edge_start
                    m = m_new[e0 : e0 + n * d].reshape(d, n, W)
                    out = self._vn_block_update(bi, blk, m, cha_blocks_s[bi],
                                                x["var"][self._spec_di[bi]])
                    outs.append(out.reshape(-1, W))
                m_vn = jnp.concatenate(outs, axis=0)
                # phantom nodes: true-degree update over the real sockets,
                # phantom sockets mirror output 0 (unanimity-transparent)
                for p in self._ph:
                    msgs = [m_new[r] for r in p["rows_real"]]
                    cha_row = cha_blocks_s[p["bi"]][p["off"]]
                    po = self._ph_node_outputs(p, msgs, cha_row,
                                               x["var"][p["di"]])
                    for r, o in zip(p["rows_real"], po):
                        m_vn = m_vn.at[r].set(o)
                    for r in p["rows_ph"]:
                        m_vn = m_vn.at[r].set(po[0])
                # converged frames are not frozen; their outputs are latched
                # above and later state is never read (output-identical)
                return (m_vn, done, latched, iters), None

            if early_exit and self.S > 0:
                # true early exit with survivor compaction — the same
                # funnel as _build_qc_pallas (see the comment there): each
                # stage's while_loop stops when the undecided count drops
                # to the next stage's width, survivors are gathered into a
                # narrower batch, and outputs stay bit-identical (frames
                # are independent; finished frames latch before shrinking)
                S = self.S

                def make_loop(cha_blocks_s, stop_live):
                    def wbody(carry):
                        it, m_vn, done, latched, iters = carry
                        x = dict(
                            it=it,
                            var=jax.tree_util.tree_map(
                                lambda a: a[it], self._var_xs
                            ),
                        )
                        (m_vn, done, latched, iters), _ = body(
                            (m_vn, done, latched, iters), x, cha_blocks_s
                        )
                        return (it + 1, m_vn, done, latched, iters)

                    def wcond(carry):
                        live = jnp.sum(~carry[2])
                        return (carry[0] < S) & (live > stop_live)

                    return wcond, wbody

                widths = self._funnel_widths(B)
                it = jnp.zeros((), jnp.int32)
                cha_s = cha_blocks
                stack = []
                for si, Wc in enumerate(widths):
                    nxt = widths[si + 1] if si + 1 < len(widths) else 0
                    wcond, wbody = make_loop(cha_s, nxt)
                    it, m_vn, done, latched, iters = jax.lax.while_loop(
                        wcond, wbody, (it, m_vn, done, latched, iters)
                    )
                    if nxt:
                        idx = jnp.argsort(done)[:nxt]
                        stack.append((idx, (m_vn, done, latched, iters)))
                        m_vn = m_vn[:, idx]
                        done = done[idx]
                        latched = latched[:, idx]
                        iters = iters[idx]
                        cha_s = [c[:, idx] for c in cha_s]
                for idx, full in reversed(stack):
                    fm, fd, fl, fi = full
                    m_vn = fm.at[:, idx].set(m_vn)
                    done = fd.at[idx].set(done)
                    latched = fl.at[:, idx].set(latched)
                    iters = fi.at[idx].set(iters)
            else:
                (m_vn, done, latched, iters), _ = jax.lax.scan(
                    functools.partial(body, cha_blocks_s=cha_blocks),
                    (m_vn, done, latched, iters), xs
                )

            if raw:
                return m_vn, done, latched, iters

            m_cn = self._ph_pin_cn(self._permute_v2c(m_vn))
            if early_exit and self.S >= 1:
                # covers the VN output of the last loop step
                bits, conv = convergence(m_vn, m_cn)
                conv = conv & ~done
                latched = jnp.where(conv[None, :], bits, latched)
                iters = jnp.where(conv, self.S, iters)
                done = done | conv

            if self.is_prefix:
                bits = jnp.take(latched, self._vn_node_pos, axis=0).T
                return bits, done, iters
            outs = []
            for m in self._cn_blocks_of(m_cn):
                outs.append(self._cn_minsum_values(m).reshape(-1, B))
            m_cn = jnp.concatenate(outs, axis=0)
            m_fin = self._permute_c2v(m_cn)

            dec_bits = []
            for bi, blk in enumerate(lay.vn_blocks):
                d, n, e0 = blk.degree, blk.n_pad, blk.edge_start
                m = m_fin[e0 : e0 + n * d].reshape(d, n, B)
                spec = self._dec_specs[self._spec_di[bi]]
                x_vals = [m[j] for j in range(d)] + [cha_blocks[bi]]
                prm, fp = self._dec_prm(spec)
                out = self._eval_tree(spec, x_vals, prm, fp=fp)  # (n_pad, B)
                dec_bits.append((out < 0).astype(jnp.uint8))
            dec_bits = jnp.concatenate(dec_bits, axis=0)  # (nvar_pad, B)
            dec_bits = self._ph_dec_fix(dec_bits, m_fin, cha_blocks)

            bits_grp = jnp.where(done[None, :], latched, dec_bits)
            edge_bits = jnp.take(bits_grp, self._cn_var_pos, axis=0)
            edge_bits = self._ph_zero_edge_bits(edge_bits)
            s_ok = None
            pos = 0
            for bi, blk in enumerate(lay.cn_blocks):
                d, n = blk.degree, blk.n_pad
                s = jnp.sum(
                    edge_bits[pos : pos + n * d].reshape(d, n, B).astype(jnp.int32),
                    axis=0,
                ) & 1
                ok = jnp.all((s == 0) | self._cn_padmask[bi][:, None], axis=0)
                s_ok = ok if s_ok is None else (s_ok & ok)
                pos += n * d
            ok = done | s_ok
            bits = jnp.take(bits_grp, self._vn_node_pos, axis=0).T  # (B, nvar)
            return bits, ok, iters

        return decode

    # ------------------------------------------------------------------
    @staticmethod
    def _funnel_widths(B: int) -> list:
        """Stage widths for survivor compaction: [B, B/4, B/16], floored
        at 512 lanes (below that the kernels lose lane efficiency and the
        gather overhead dominates).  LUT_FUNNEL overrides: "0"/"off"
        disables, else comma-separated divisors (e.g. "4,16")."""
        import os

        env = os.environ.get("LUT_FUNNEL", "")
        if env.lower() in ("0", "off", "none"):
            return [B]
        divs = [4, 16]
        if env:
            divs = [int(x) for x in env.split(",") if x.strip()]
        floor = int(os.environ.get("LUT_FUNNEL_MIN", "512"))
        widths = [B]
        for d in divs:
            w = B // d
            if w >= floor and w < widths[-1]:
                widths.append(w)
        return widths

    # ------------------------------------------------------------------
    def _use_std_kernels(self) -> bool:
        """STD-layout Pallas compute kernels for arbitrary (non-QC)
        graphs: the permutation stays an XLA row gather, the CN/VN
        compute runs in qc_kernels.cn_std_pass / vn_std_pass."""
        import os

        from .qc_kernels import qc_kernels_supported

        if os.environ.get("LUT_LDPC_NO_STD_KERNELS"):
            return False
        if self._dtype_np not in (np.dtype(np.int16), np.dtype(np.float32)):
            return False
        return qc_kernels_supported()

    def _build_std_kernels(self, raw: bool = False, cont_from=None):
        """Gather-permutation decode loop with kernel compute.

        The same early-exit carry structure as _build_qc_pallas (bits_p /
        unan_p from the previous VN pass, synd from the CN pass's input
        signs), bit-identical to _build() / the scalar golden model; the
        funnel, phantom pinned-edge semantics, and XLA decision tail are
        shared contracts.  ~4x the XLA elementwise path's compute speed
        on the PEG N=64800 code (the r01 profile's compute:gather ratio
        bound the gather path at ~11 Mbit/s).

        cont_from=k: CONTINUATION segment for the mixed-precision hybrid
        (same contract as _build_qc_pallas's cont_from, with v0_edges
        already in this path's native std grouped layout)."""
        if not self._use_std_kernels():
            return None
        if cont_from is not None and not self.early_exit:
            raise ValueError("cont_from requires early-exit mode")
        if self._ph and any(p["td"] != 1 for p in self._ph):
            return None  # input-copy unanimity trick covers true degree 1
        if self._ph and cont_from is not None:
            return None  # mixed seam not phantom-aware
        from . import qc_kernels as qk

        lay = self.layout
        T = self.T
        early_exit = self.early_exit
        nvp = lay.nvar_pad
        structs = [self._var_struct[di] for di in self._spec_di]
        flags_blk = [self._op_flags[di] for di in self._spec_di]
        use_tots = [
            st.ops[0].operands == tuple(range(blk.degree - 1))
            and blk.degree >= 3 and self._is_int
            for st, blk in zip(structs, lay.vn_blocks)
        ]
        op_keys = qk.kernel_op_keys(flags_blk)
        KSLOTS = ("thr", "levels", "tie_lo", "tie_hi")

        xla_fallback = None

        def decode(llr_cha, *state):
            B = llr_cha.shape[0]
            if B < 128 and not qk._interpret() and cont_from is None:
                # narrower than one lane tile (see _build_qc_pallas)
                nonlocal xla_fallback
                if xla_fallback is None:
                    xla_fallback = self._build(raw=raw)
                return xla_fallback(llr_cha, *state)
            cha_lab = llr_cha[:, self._vn_nodes].T
            vcha = self._select_values(cha_lab, self._leaf_cha)
            pin = (jnp.asarray(self._pin, self._dtype) if self._ph
                   else None)
            if cont_from is None:
                llr_msg, = state
                msg_lab = llr_msg[:, self._vn_nodes].T
                v0 = self._select_values(msg_lab, self._leaf_msg0)
                parts = []
                for blk in lay.vn_blocks:
                    seg = v0[blk.node_start : blk.node_start + blk.n_pad]
                    parts.append(
                        jnp.broadcast_to(seg[None],
                                         (blk.degree, blk.n_pad, B))
                        .reshape(-1, B))
                m_vn = jnp.concatenate(parts, axis=0)  # (E_vn_pad, B)
                for p in self._ph:
                    m_vn = m_vn.at[jnp.asarray(p["rows_ph"])].set(pin)

                bits_p = jnp.zeros((nvp, B), dtype=jnp.int8)
                unan_p = jnp.zeros((B,), dtype=bool)
                done = jnp.zeros((B,), dtype=bool)
                latched = jnp.zeros((nvp, B), dtype=jnp.int8)
                iters = jnp.full((B,), T, dtype=jnp.int32)
            else:
                v0_edges, bits_p, unan_p, done, latched, iters = state
                m_vn = jnp.asarray(v0_edges, self._dtype)
                bits_p = jnp.asarray(bits_p, jnp.int8)
                latched = jnp.asarray(latched, jnp.int8)

            def body(carry, x, vcha_s):
                m_vn, bits_p, unan_p, done, latched, iters = carry
                it = x["it"]
                m_cn = self._ph_pin_cn(self._permute_v2c(m_vn))
                m_cn, synd = qk.cn_std_pass(m_cn, lay.cn_blocks)
                if early_exit:
                    conv = unan_p & synd & (it >= 1) & ~done
                    latched = jnp.where(conv[None, :], bits_p, latched)
                    iters = jnp.where(conv, it, iters)
                    done = done | conv
                m_new = self._permute_c2v(m_cn)
                # phantom nodes: equalize inputs (in-kernel unanimity
                # trivially true — exact for true degree 1)
                for p in self._ph:
                    m_new = m_new.at[jnp.asarray(p["rows_ph"])].set(
                        m_new[p["rows_real"][0]])
                prm_it = [
                    [
                        {ks: op[k] for ks, k in zip(KSLOTS, keys)}
                        for op, keys in zip(x["var"][self._spec_di[bi]],
                                            op_keys[bi])
                    ]
                    for bi in range(len(structs))
                ]
                m_vn, bits_p, unan_p = qk.vn_std_pass(
                    m_new, vcha_s, lay.vn_blocks, nvp, structs, prm_it,
                    use_tots, flags_blk)
                for p in self._ph:
                    po = self._ph_node_outputs(
                        p, [m_new[r] for r in p["rows_real"]],
                        vcha_s[p["node_row"]], x["var"][p["di"]])
                    for r, o in zip(p["rows_real"], po):
                        m_vn = m_vn.at[r].set(o)
                    m_vn = m_vn.at[jnp.asarray(p["rows_ph"])].set(pin)
                    bits_p = bits_p.at[p["node_row"]].set(
                        (po[0] < 0).astype(bits_p.dtype))
                return (m_vn, bits_p, unan_p, done, latched, iters), None

            xs = dict(it=jnp.arange(self.S, dtype=jnp.int32),
                      var=self._var_xs)
            if early_exit and self.S > 0:
                S = self.S

                def make_loop(vcha_s, stop_live):
                    def wbody(carry):
                        it = carry[0]
                        x = dict(
                            it=it,
                            var=jax.tree_util.tree_map(
                                lambda a: a[it], self._var_xs),
                        )
                        new_carry, _ = body(carry[1:], x, vcha_s)
                        return (it + 1,) + new_carry

                    def wcond(carry):
                        live = jnp.sum(~carry[4])
                        return (carry[0] < S) & (live > stop_live)

                    return wcond, wbody

                widths = self._funnel_widths(B)
                it = jnp.full((), 0 if cont_from is None else cont_from,
                              jnp.int32)
                vcha_s = vcha
                stack = []
                for si, W in enumerate(widths):
                    nxt = widths[si + 1] if si + 1 < len(widths) else 0
                    wcond, wbody = make_loop(vcha_s, nxt)
                    (it, m_vn, bits_p, unan_p, done, latched,
                     iters) = jax.lax.while_loop(
                        wcond, wbody,
                        (it, m_vn, bits_p, unan_p, done, latched, iters),
                    )
                    if nxt:
                        idx = jnp.argsort(done)[:nxt]
                        stack.append(
                            (idx, (m_vn, bits_p, unan_p, done, latched,
                                   iters)))
                        m_vn = m_vn[:, idx]
                        bits_p = bits_p[:, idx]
                        unan_p = unan_p[idx]
                        done = done[idx]
                        latched = latched[:, idx]
                        iters = iters[idx]
                        vcha_s = vcha_s[:, idx]
                for idx, full in reversed(stack):
                    fm, fb, fu, fd, fl, fi = full
                    m_vn = fm.at[:, idx].set(m_vn)
                    bits_p = fb.at[:, idx].set(bits_p)
                    unan_p = fu.at[idx].set(unan_p)
                    done = fd.at[idx].set(done)
                    latched = fl.at[:, idx].set(latched)
                    iters = fi.at[idx].set(iters)
            else:
                (m_vn, bits_p, unan_p, done, latched, iters), _ = (
                    jax.lax.scan(
                        functools.partial(body, vcha_s=vcha),
                        (m_vn, bits_p, unan_p, done, latched, iters), xs))

            if raw:
                return m_vn, done, latched.astype(jnp.uint8), iters

            m_cn = self._ph_pin_cn(self._permute_v2c(m_vn))
            m_cn_out, synd = qk.cn_std_pass(m_cn, lay.cn_blocks)
            if early_exit and self.S >= 1:
                conv = unan_p & synd & ~done
                latched = jnp.where(conv[None, :], bits_p, latched)
                iters = jnp.where(conv, self.S, iters)
                done = done | conv

            if self.is_prefix:
                bits = jnp.take(latched, self._vn_node_pos, axis=0).T
                return bits.astype(jnp.uint8), done, iters

            m_fin = self._permute_c2v(m_cn_out)
            dec_bits = []
            cha_blocks = [vcha[blk.node_start : blk.node_start + blk.n_pad]
                          for blk in lay.vn_blocks]
            for bi, blk in enumerate(lay.vn_blocks):
                d, n, e0 = blk.degree, blk.n_pad, blk.edge_start
                m = m_fin[e0 : e0 + n * d].reshape(d, n, B)
                spec = self._dec_specs[self._spec_di[bi]]
                x_vals = [m[j] for j in range(d)] + [cha_blocks[bi]]
                prm, fp = self._dec_prm(spec)
                out = self._eval_tree(spec, x_vals, prm, fp=fp)
                dec_bits.append((out < 0).astype(jnp.int8))
            dec_bits = jnp.concatenate(dec_bits, axis=0)
            dec_bits = self._ph_dec_fix(dec_bits, m_fin, cha_blocks)

            bits_grp = jnp.where(done[None, :], latched, dec_bits)
            edge_bits = jnp.take(bits_grp, self._cn_var_pos, axis=0)
            edge_bits = self._ph_zero_edge_bits(edge_bits)
            s_ok = None
            pos = 0
            for bi, blk in enumerate(lay.cn_blocks):
                d, n = blk.degree, blk.n_pad
                s = jnp.sum(
                    edge_bits[pos : pos + n * d].reshape(d, n, B)
                    .astype(jnp.int32),
                    axis=0,
                ) & 1
                ok = jnp.all((s == 0) | self._cn_padmask[bi][:, None],
                             axis=0)
                s_ok = ok if s_ok is None else (s_ok & ok)
                pos += n * d
            ok = done | s_ok
            bits = jnp.take(bits_grp, self._vn_node_pos, axis=0).T
            return bits.astype(jnp.uint8), ok, iters

        return decode

    # ------------------------------------------------------------------
    def _build_qc_pallas(self, raw: bool = False, cont_from=None):
        """Fused-kernel decode loop for the QC case (qc_kernels.py): one
        CN kernel (v2c rolls + two-min + syndrome) and one VN kernel
        (c2v rolls + per-class threshold trees + bits/unanimity) per
        iteration — four HBM passes and TWO kernel launches total.
        Handles any mix of degree classes (irregular QC) in int16 or
        float32.  Returns None when unsupported; outputs are bit-identical
        to _build() (enforced by the equivalence suites).

        cont_from=k (requires early_exit): CONTINUATION segment for
        the mixed-precision hybrid — the returned function has signature
        (llr_cha, v0_edges, bits_p, unan_p, done, latched, iters) and
        runs iterations [k, S) from per-EDGE message values v0_edges
        ((num_edges_vn, B) std grouped layout, this spec's value domain,
        i.e. this spec's iteration-k input table entries) plus the
        early-exit state at the segment boundary.  bits_p/unan_p must be
        the previous segment's final VN outputs' sign data so the first
        iteration's convergence latch matches the single-decoder
        semantics exactly."""
        if not self._use_qc_kernels():
            return None
        if cont_from is not None and not self.early_exit:
            raise ValueError("cont_from requires early-exit mode")
        if self._ph and (cont_from is not None
                         or any(p["td"] != 1 for p in self._ph)):
            # the in-kernel unanimity trick (all inputs of the phantom
            # node equalized => its lane trivially agrees, matching the
            # true degree-1 semantics) only covers true-degree-1 nodes;
            # the mixed-precision continuation is not phantom-aware
            return None
        from . import qc_kernels as qk

        lay = self.layout
        qcp = self._qcp
        Z = qcp.Z
        T = self.T
        early_exit = self.early_exit
        E_vn, E_cn = lay.num_edges_vn, lay.num_edges_cn
        nvp = lay.nvar_pad
        itemsize = self._dtype_np.itemsize
        # per-LAYOUT-BLOCK views of the per-spec-row structures (identical
        # for ordinary graphs; phantom graphs carry extra spec rows)
        structs = [self._var_struct[di] for di in self._spec_di]
        flags_blk = [self._op_flags[di] for di in self._spec_di]
        # total-minus-self is exact for integer values only (float rounding
        # makes (a+b+c)-c != a+b) — same gate as _vn_block_update
        use_tots = [
            st.ops[0].operands == tuple(range(blk.degree - 1))
            and blk.degree >= 3 and self._is_int
            for st, blk in zip(structs, lay.vn_blocks)
        ]
        # kernel param slots: (thresholds, levels, tie_lo, tie_hi) — sym
        # ops ride the magnitude thresholds/levels in the same slots, and
        # delta-validated ops (kdelta) ride [lev0, dlev...] in the levels
        # slot (masked-add emission, bit-exact by the build-time check)
        op_keys = qk.kernel_op_keys(flags_blk)
        KSLOTS = ("thr", "levels", "tie_lo", "tie_hi")

        xla_fallback = None

        def decode(llr_cha, *state):
            B = llr_cha.shape[0]
            if B < 128 and not qk._interpret():
                # narrower than one lane tile: Mosaic rejects the DMA
                # shapes — delegate to the XLA path (same outputs; B is
                # static at trace time so this is a compile-time branch)
                nonlocal xla_fallback
                if xla_fallback is None:
                    xla_fallback = (self._build(raw=raw) if cont_from is None
                                    else None)
                if xla_fallback is not None:
                    return xla_fallback(llr_cha, *state)
            # geometry is fixed by the WIDEST batch (this trace's B): the
            # funnel's narrower stages reuse it so carry shapes stay fixed
            geom = qk.qc_geometry(qcp, B, itemsize)
            vn_pl, cn_pl = qk.plane_index(qcp)
            stride_vn = Z + geom.halo_vn

            # phantom fixup rows in KERNEL halo layout (all td == 1 here;
            # checked above).  A written row's halo mirror (kernel row
            # + Z, present when z < halo) must be kept coherent.
            ph_k = []
            if self._ph:
                k_vn = qk.std_to_kernel_rows(qcp, geom, "vn", E_vn)
                k_cn = qk.std_to_kernel_rows(qcp, geom, "cn", E_cn)

                def with_mirror(kr, stride, halo):
                    kr = int(kr)
                    assert kr >= 0
                    return [kr] + ([kr + Z] if kr % stride < halo else [])

                stride_cn = Z + geom.halo_cn
                for p in self._ph:
                    ph_k.append(dict(
                        p=p,
                        vn_real=jnp.asarray(with_mirror(
                            k_vn[p["rows_real"][0]], stride_vn,
                            geom.halo_vn)),
                        vn_ph=jnp.asarray([
                            r for rr in p["rows_ph"]
                            for r in with_mirror(k_vn[rr], stride_vn,
                                                 geom.halo_vn)]),
                        cn_dst=jnp.asarray([
                            r for rr in p["cn_rows_ph"]
                            for r in with_mirror(k_cn[rr], stride_cn,
                                                 geom.halo_cn)]),
                        cn_src=int(k_cn[p["cn_rows_real"][0]]),
                    ))
            pin = jnp.asarray(self._pin, self._dtype) if self._ph else None
            # kernel halo-plane layout <-> standard grouped layout, as
            # STATIC slice+concat lists (stream-bandwidth copies; a row
            # gather here would be DMA-issue-bound).  Plane numbering is
            # PRODUCER-major (qk.plane_index), NOT sorted by std base:
            # vn_planes below iterates in std-base order for the
            # std-layout direction, vn_planes_k in plane order for the
            # kernel-layout concatenation.
            node_of_base = {}
            for ci_, nbase, src_, dst_ in qcp.vn_cols:
                for b in dst_:
                    node_of_base[b] = nbase
            # (std_base, plane_idx): std-base order for the std-layout
            # direction, plane order for the kernel-layout concatenation
            # (producer-major numbering != sorted-base order)
            vn_planes = sorted(vn_pl.items())
            vn_planes_k = sorted(vn_pl.items(), key=lambda kv: kv[1])

            def vn_to_kernel(v):  # per-node (nvp, B) -> halo planes
                parts = []
                for b, p in vn_planes_k:
                    nb_ = node_of_base[b]
                    parts.append(v[nb_ : nb_ + Z])
                    h = geom.halo_vn
                    while h > 0:  # mirror the plane head into the tail
                        parts.append(v[nb_ : nb_ + min(h, Z)])
                        h -= Z
                return jnp.concatenate(parts, axis=0)

            def vn_from_kernel(m):  # halo planes -> std grouped (E_vn, B)
                pieces = []
                pos = 0
                for b, p in vn_planes:
                    if b > pos:  # std inter-plane padding rows
                        pieces.append(jnp.zeros((b - pos, B), m.dtype))
                    pieces.append(m[p * stride_vn : p * stride_vn + Z])
                    pos = b + Z
                if pos < E_vn:
                    pieces.append(jnp.zeros((E_vn - pos, B), m.dtype))
                return jnp.concatenate(pieces, axis=0)

            def vn_edges_to_kernel(v):  # std grouped (E_vn, B) -> planes
                parts = []
                for b, p in vn_planes_k:
                    parts.append(v[b : b + Z])
                    h = geom.halo_vn
                    while h > 0:  # mirror the plane head into the tail
                        parts.append(v[b : b + min(h, Z)])
                        h -= Z
                return jnp.concatenate(parts, axis=0)

            cha_lab = llr_cha[:, self._vn_nodes].T  # (nvp, B) grouped
            vcha = self._select_values(cha_lab, self._leaf_cha)
            if cont_from is None:
                llr_msg, = state
                msg_lab = llr_msg[:, self._vn_nodes].T
                v0 = self._select_values(msg_lab, self._leaf_msg0)
                # initial messages directly in halo-plane layout
                m_vn = vn_to_kernel(v0)  # (geom.rows_vn, B)
                for pk in ph_k:  # phantom v2c rows start pinned
                    m_vn = m_vn.at[pk["vn_ph"]].set(pin)

                # int8 end-to-end in the loop (the kernel emits int8 sign
                # bits; a uint8 cast would cost a full pass per iteration)
                bits_p = jnp.zeros((nvp, B), dtype=jnp.int8)
                unan_p = jnp.zeros((B,), dtype=bool)
                done = jnp.zeros((B,), dtype=bool)
                latched = jnp.zeros((nvp, B), dtype=jnp.int8)
                iters = jnp.full((B,), T, dtype=jnp.int32)
            else:
                v0_edges, bits_p, unan_p, done, latched, iters = state
                m_vn = vn_edges_to_kernel(
                    jnp.asarray(v0_edges, self._dtype))
                bits_p = jnp.asarray(bits_p, jnp.int8)
                latched = jnp.asarray(latched, jnp.int8)

            xs = dict(it=jnp.arange(self.S, dtype=jnp.int32),
                      var=self._var_xs)

            def body(carry, x, vcha_s):
                m_vn, bits_p, unan_p, done, latched, iters = carry
                it = x["it"]
                m_cn, synd = qk.cn_qc_pass(m_vn, qcp, geom)
                if early_exit:
                    conv = unan_p & synd & (it >= 1) & ~done
                    latched = jnp.where(conv[None, :], bits_p, latched)
                    iters = jnp.where(conv, it, iters)
                    done = done | conv
                # phantom nodes: equalize every input row with the single
                # real c2v input, so the node's in-kernel leave-one-out
                # outputs are identical and its unanimity lane is
                # trivially true — the true degree-1 semantics
                for pk in ph_k:
                    m_cn = m_cn.at[pk["cn_dst"]].set(m_cn[pk["cn_src"]])
                prm_it = [
                    [
                        {ks: op[k] for ks, k in zip(KSLOTS, keys)}
                        for op, keys in zip(x["var"][self._spec_di[bi]],
                                            op_keys[bi])
                    ]
                    for bi in range(len(structs))
                ]
                m_vn, bits_p, unan_p = qk.vn_qc_pass(
                    m_cn, vcha_s, qcp, geom, nvp, structs, prm_it,
                    use_tots, flags_blk)
                # phantom nodes: true degree-1 update (channel-only tree),
                # phantom v2c rows re-pinned for the next CN pass
                for pk in ph_k:
                    p = pk["p"]
                    out0 = self._ph_node_outputs(
                        p, [], vcha_s[p["node_row"]], x["var"][p["di"]])[0]
                    m_vn = m_vn.at[pk["vn_real"]].set(out0)
                    m_vn = m_vn.at[pk["vn_ph"]].set(pin)
                    bits_p = bits_p.at[p["node_row"]].set(
                        (out0 < 0).astype(bits_p.dtype))
                return (m_vn, bits_p, unan_p, done, latched, iters), None

            if early_exit and self.S > 0:
                # true early exit with survivor compaction ("funnel"):
                # each stage is a while_loop that stops when the number of
                # undecided frames drops to the next stage's width (or the
                # budget S runs out); the survivors are then gathered into
                # a narrower batch and the loop continues there, so late
                # iterations (few live frames) stop paying full-batch
                # kernel time.  Frames are independent and deterministic,
                # so outputs are bit-identical to the single-width loop:
                # finished frames' outputs are latched before compaction,
                # and a stage's gather provably contains every undecided
                # frame (the stage cond enforces live <= next width at
                # exit; a budget exhaustion exit makes every later stage a
                # zero-iteration no-op).  State of finished filler columns
                # free-runs, as in the single-width loop.
                S = self.S

                def make_loop(vcha_s, stop_live):
                    def wbody(carry):
                        it = carry[0]
                        x = dict(
                            it=it,
                            var=[
                                [{k: op[k][it] for k in op} for op in ops]
                                for ops in self._var_xs
                            ],
                        )
                        new_carry, _ = body(carry[1:], x, vcha_s)
                        return (it + 1,) + new_carry

                    def wcond(carry):
                        live = jnp.sum(~carry[4])
                        return (carry[0] < S) & (live > stop_live)

                    return wcond, wbody

                widths = self._funnel_widths(B)
                it = jnp.full((), 0 if cont_from is None else cont_from,
                              jnp.int32)
                vcha_s = vcha
                stack = []  # per shrink: (survivor idx, full-width state)
                for si, W in enumerate(widths):
                    nxt = widths[si + 1] if si + 1 < len(widths) else 0
                    wcond, wbody = make_loop(vcha_s, nxt)
                    (it, m_vn, bits_p, unan_p, done, latched,
                     iters) = jax.lax.while_loop(
                        wcond, wbody,
                        (it, m_vn, bits_p, unan_p, done, latched, iters),
                    )
                    if nxt:
                        # stable ascending sort of done: the first `nxt`
                        # columns contain every undecided frame, padded
                        # with finished ones
                        idx = jnp.argsort(done)[:nxt]
                        stack.append(
                            (idx, (m_vn, bits_p, unan_p, done, latched,
                                   iters)))
                        m_vn = m_vn[:, idx]
                        bits_p = bits_p[:, idx]
                        unan_p = unan_p[idx]
                        done = done[idx]
                        latched = latched[:, idx]
                        iters = iters[idx]
                        vcha_s = vcha_s[:, idx]
                for idx, full in reversed(stack):
                    fm, fb, fu, fd, fl, fi = full
                    m_vn = fm.at[:, idx].set(m_vn)
                    bits_p = fb.at[:, idx].set(bits_p)
                    unan_p = fu.at[idx].set(unan_p)
                    done = fd.at[idx].set(done)
                    latched = fl.at[:, idx].set(latched)
                    iters = fi.at[idx].set(iters)
            else:
                (m_vn, bits_p, unan_p, done, latched, iters), _ = jax.lax.scan(
                    functools.partial(body, vcha_s=vcha),
                    (m_vn, bits_p, unan_p, done, latched, iters), xs
                )

            if raw:
                # standard grouped layout for the hybrid bridge (std pad
                # rows zero-filled — garbage by design, masked downstream
                # exactly as in the XLA path)
                return (vn_from_kernel(m_vn), done,
                        latched.astype(jnp.uint8), iters)

            m_cn, synd = qk.cn_qc_pass(m_vn, qcp, geom)
            if early_exit and self.S >= 1:
                conv = unan_p & synd & ~done
                latched = jnp.where(conv[None, :], bits_p, latched)
                iters = jnp.where(conv, self.S, iters)
                done = done | conv

            if self.is_prefix:
                bits = jnp.take(latched, self._vn_node_pos, axis=0).T
                return bits.astype(jnp.uint8), done, iters

            # XLA tail (once per decode): c2v of the kernel's CN-updated
            # messages (read straight from the halo-plane layout with
            # plane-adjusted roll-copy sources), then the DECTREE pass
            vs_, cs_, s_ = (np.array(x, dtype=np.int64)
                            for x in zip(*self._qc_copies))
            cs_k = np.array([cn_pl[int(c)] * (Z + geom.halo_cn) for c in cs_],
                            dtype=np.int32)
            m_fin = self._scan_copies(
                m_cn, jnp.asarray(cs_k), jnp.asarray(vs_, jnp.int32),
                jnp.asarray(s_ % Z, jnp.int32), lay.num_edges_vn)
            dec_bits = []
            cha_blocks = [vcha[blk.node_start : blk.node_start + blk.n_pad]
                          for blk in lay.vn_blocks]
            for bi, blk in enumerate(lay.vn_blocks):
                d, n, e0 = blk.degree, blk.n_pad, blk.edge_start
                m = m_fin[e0 : e0 + n * d].reshape(d, n, B)
                spec = self._dec_specs[self._spec_di[bi]]
                x_vals = [m[j2] for j2 in range(d)] + [cha_blocks[bi]]
                prm, fp = self._dec_prm(spec)
                out = self._eval_tree(spec, x_vals, prm, fp=fp)  # (n_pad, B)
                dec_bits.append((out < 0).astype(jnp.int8))
            dec_bits = jnp.concatenate(dec_bits, axis=0)  # (nvar_pad, B)
            dec_bits = self._ph_dec_fix(dec_bits, m_fin, cha_blocks)

            bits_grp = jnp.where(done[None, :], latched, dec_bits)
            edge_bits = jnp.take(bits_grp, self._cn_var_pos, axis=0)
            edge_bits = self._ph_zero_edge_bits(edge_bits)
            s_ok = None
            pos = 0
            for bi, blk in enumerate(lay.cn_blocks):
                d, n = blk.degree, blk.n_pad
                s = jnp.sum(
                    edge_bits[pos : pos + n * d].reshape(d, n, B)
                    .astype(jnp.int32),
                    axis=0,
                ) & 1
                ok = jnp.all((s == 0) | self._cn_padmask[bi][:, None], axis=0)
                s_ok = ok if s_ok is None else (s_ok & ok)
                pos += n * d
            ok = done | s_ok
            bits = jnp.take(bits_grp, self._vn_node_pos, axis=0).T
            return bits.astype(jnp.uint8), ok, iters

        return decode

    # ------------------------------------------------------------------
    def __call__(self, llr_cha, llr_msg):
        return self._decode(
            jnp.asarray(llr_cha, dtype=jnp.int32), jnp.asarray(llr_msg, dtype=jnp.int32)
        )


def _loo(d: int) -> np.ndarray:
    """(d, d) leave-one-out over d+1 inputs: row i = [0..d] minus {i}."""
    from .layout import leave_one_out_idx

    return leave_one_out_idx(d + 1, d)
