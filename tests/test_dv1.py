"""Degree-1 variable nodes (the DVB-S2 accumulator tail).

The standard DVB-S2 rate-1/2 matrix (codes/rate0.50_irreg_dvbs2_N64800.alist)
has exactly one degree-1 VN and one degree-6 CN from its accumulator
structure.  The reference cannot design LUTs for such codes at all —
LUT_Tree.cpp:202/242/274 assert num_leaves >= 2, so design_luts on the
code's empirical ensemble (LDPC_BER_Sim.cpp:488) aborts.  Here a degree-1
VN tree is a ROOT over the channel leaf alone; its LUT degenerates to the
MI-optimal requantization of the channel pmf and everything downstream
(DE, layouts, all decoder implementations) treats it like any other degree
group.  These tests pin that extension end-to-end on a small code.
"""

import numpy as np
import pytest

from util_codes import random_regular_H

from lut_ldpc_tpu.core.tanner import TannerGraph
from lut_ldpc_tpu.core.trees import CHA, DECTREE, ROOT, VARTREE, LUTTree
from lut_ldpc_tpu.decoder import LUTCodec
from lut_ldpc_tpu.ops.pmf import snr2sig


def dv1_graph(seed=2):
    """Small (3,6)-regular code with one column stripped to degree 1."""
    H = random_regular_H(60, 3, 6, seed=seed)
    col = H[:, 0].nonzero()[0]
    H[col[1:], 0] = 0
    return TannerGraph.from_dense(H)


@pytest.mark.parametrize("mode", ["auto_bin_balanced", "auto_bin_high", "root_only"])
def test_auto_tree_degree1(mode):
    t = LUTTree.auto(1, VARTREE, mode)
    assert t.num_leaves == 1
    assert t.root.type == ROOT
    assert [c.type for c in t.root.children] == [CHA]
    # decision tree for a degree-1 VN has 2 leaves (1 message + channel)
    d = LUTTree.auto(2, DECTREE, mode)
    assert d.num_leaves == 2


@pytest.fixture(scope="module")
def dv1_codec():
    return LUTCodec.design(dv1_graph(), 0.85**2, max_iters=6, Nq_Cha=16,
                           Nq_Msg=16)


def test_design_includes_degree1(dv1_codec):
    assert 1 in dv1_codec.var_tree_degrees
    # the degree-1 var tree's serialization round-trips like any other
    t = dv1_codec.var_tree(0, 1)
    assert LUTTree.deserialize(t.serialize()).serialize() == t.serialize()
    # its root LUT is a requantization of the 16-level channel alphabet
    assert len(t.root.Q) == dv1_codec.Nq_Cha // 2


def test_decoders_bit_identical_with_degree1(dv1_codec):
    import jax.numpy as jnp

    from lut_ldpc_tpu.decoder import FastLUTDecoder, LUTDecoder
    from lut_ldpc_tpu.decoder.staged import make_staged_decoder

    codec = dv1_codec
    rng = np.random.default_rng(0)
    B = 48
    sig = float(snr2sig(0.5, 2.0))
    y = 1.0 + sig * rng.standard_normal((B, codec.nvar))
    llr = 2.0 * y / sig**2
    llr_cha, llr_msg = codec.quantize_channel(llr)
    want_bits = np.stack(
        [codec.decode_ref(llr_cha[b], llr_msg[b], psc=True)[0] for b in range(B)]
    )
    ca = jnp.asarray(llr_cha, jnp.int32)
    ma = jnp.asarray(llr_msg, jnp.int32)
    for dec in (LUTDecoder(codec, early_exit=True),
                FastLUTDecoder(codec, early_exit=True),
                make_staged_decoder(codec, early_exit=True)):
        bits = np.asarray(dec(ca, ma)[0])
        assert np.array_equal(bits, want_bits), type(dec).__name__


def test_dvbs2_alist_profile():
    """The imported standard matrix keeps the accumulator degree profile."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "codes",
                        "rate0.50_irreg_dvbs2_N64800.alist")
    g = TannerGraph.from_alist(path)
    assert (g.nvar, g.nchk) == (64800, 32400)
    counts = {int(d): len(g.vn_node_idx[int(d)]) for d in g.vn_degrees}
    assert counts == {1: 1, 2: 32399, 3: 19440, 8: 12960}
    chk_counts = {int(d): len(g.cn_node_idx[int(d)]) for d in g.cn_degrees}
    assert chk_counts == {6: 1, 7: 32399}
