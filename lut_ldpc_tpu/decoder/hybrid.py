"""Hybrid decoder: arithmetic value-domain prefix + label-domain tail.

Late DE iterations of a near-converged design can be degenerate — the LUTs
stop being representable as threshold functions of value sums (arith.py),
so the arithmetic decoder only validates a PREFIX of the iteration budget
(e.g. 32 of 50 on the N=10000 benchmark codec).  StagedLUTDecoder worked
around this with host-side survivor re-decoding, which costs device-host
round trips per stage (expensive over a tunneled TPU) and cannot run under
jit/shard_map.

This decoder composes the two exact representations inside ONE jit:

1. the arithmetic prefix runs as a lax.while_loop that stops as soon as
   every frame in the batch has latched (true early exit — cost tracks the
   batch max iteration count);
2. a lax.cond then either returns the latched outputs directly (the common
   case at operating SNR: all frames converge within the prefix, the tail
   costs nothing) or bridges the message state into the label domain and
   CONTINUES with FastLUTDecoder's table scan for the remaining
   iterations + decision pass — not a re-decode.

The bridge is exact: message values are entries of the iteration-S leaf
value table (strictly monotone, antisymmetric — enforced at build time),
so label = #(table thresholds crossed); the edge/node index maps between
the padded slot-major arithmetic layout and the unpadded node-major table
layout are static permutations.  Bit-identicality to the scalar golden
model (decode_ref, /root/reference/src/LDPC_Code_LUT.cpp:259-353) is
enforced by the decoder-equivalence suites.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .arith import ArithBuildError, build_arith_prefix_spec, build_arith_spec
from .arith_decoder import ArithLUTDecoder
from .codec import LUTCodec
from .fast_decoder import FastLUTDecoder

__all__ = ["HybridLUTDecoder"]


class HybridLUTDecoder:
    """Full-budget early-exit decoder for codecs whose arithmetic form
    only covers a prefix of the iterations.  Raises ArithBuildError when
    no arithmetic prefix exists, ValueError when the table tail cannot be
    built (callers fall back)."""

    def __init__(self, codec: LUTCodec, early_exit: bool = True):
        if not early_exit:
            raise ValueError("hybrid decoding requires early exit")
        self.codec = codec
        self.early_exit = True
        # prefer int16 values (half the traffic); fall back to float32 when
        # it validates a longer prefix (same policy as StagedLUTDecoder)
        spec = None
        try:
            spec = build_arith_prefix_spec(codec, dtype=np.int16)
        except ArithBuildError:
            pass
        if spec is None or spec.num_iters < codec.max_iters - 1:
            try:
                spec32 = build_arith_prefix_spec(codec, dtype=np.float32)
                if spec is None or spec32.num_iters > spec.num_iters:
                    spec = spec32
            except ArithBuildError:
                pass
        if spec is None:
            raise ArithBuildError("no valid arithmetic prefix")
        self.pre = ArithLUTDecoder(codec, early_exit=True, spec=spec)
        self.fast = FastLUTDecoder(codec, early_exit=True)
        self.S = self.pre.S
        self.T = codec.max_iters

        # ---- bridge constants -------------------------------------------
        # message value table entering iteration S = output levels of any
        # iteration-(S-1) root op (a single shared table across degrees)
        table = np.asarray(spec.var_trees[self.S - 1][0].ops[-1].levels)
        if not np.all(np.diff(table.astype(np.float64)) > 0):
            raise ArithBuildError(
                "iteration-S value table not strictly monotone; cannot "
                "invert values to labels"
            )
        self._msg_table_S = table
        lay_a, lay_f = self.pre.layout, self.fast.layout
        inv_a = np.zeros(codec.graph.num_edges, dtype=np.int64)
        real = lay_a.vn_edge_orig >= 0
        inv_a[lay_a.vn_edge_orig[real]] = np.nonzero(real)[0]
        self._f2a_edge = inv_a[lay_f.vn_edge_orig].astype(np.int32)
        self._f2a_node = lay_a.vn_node_pos[lay_f.vn_nodes].astype(np.int32)

        self._decode = jax.jit(self._build())

    # ------------------------------------------------------------------
    def _build(self):
        pre_raw = self.pre._raw_carry_fn()
        tail = self.fast._make_tail(self.S)
        K = len(self._msg_table_S)
        levels = jnp.asarray(self._msg_table_S)
        f2a_e = jnp.asarray(self._f2a_edge)
        f2a_n = jnp.asarray(self._f2a_node)
        node_pos_a = jnp.asarray(self.pre.layout.vn_node_pos)
        msg_dtype = self.fast.msg_dtype

        def decode(llr_cha, llr_msg):
            m_vals, done, latched_a, iters = pre_raw(llr_cha, llr_msg)
            bits_pre = jnp.take(latched_a, node_pos_a, axis=0).T

            def no_tail(_):
                return bits_pre, done, iters

            def run_tail(_):
                lab = jnp.zeros(m_vals.shape, jnp.int32)
                for k in range(1, K):
                    lab = lab + (m_vals >= levels[k]).astype(jnp.int32)
                m_f = jnp.take(lab, f2a_e, axis=0).T.astype(msg_dtype)
                latched_f = jnp.take(latched_a, f2a_n, axis=0).T
                cha_blocks = self.fast._cha_blocks(llr_cha)
                return tail(m_f, cha_blocks, done, latched_f, iters)

            # scalar predicate: the tail branch executes ONLY when some
            # frame is still undecided after the prefix
            return jax.lax.cond(jnp.all(done), no_tail, run_tail, None)

        return decode

    # ------------------------------------------------------------------
    def __call__(self, llr_cha, llr_msg):
        return self._decode(
            jnp.asarray(llr_cha, dtype=jnp.int32),
            jnp.asarray(llr_msg, dtype=jnp.int32),
        )
