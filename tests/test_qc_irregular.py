"""Irregular quasi-cyclic construction + multi-degree-block roll plan.

The QC family (core/qc.py) extends to arbitrary ensembles: node-perspective
degree distributions quantized to Z-column blocks, circulants in distinct
check blocks per variable block, girth-conditioned shifts.  The decoder's
roll decomposition (fast_layout.GroupedLayout.qc_plan) must validate on the
multi-block layout and the roll-based decode must stay bit-identical to the
scalar golden model (decode_ref, /root/reference/src/LDPC_Code_LUT.cpp:259).
"""

import numpy as np
import pytest

from lut_ldpc_tpu.core.ensemble import LDPCEnsemble
from lut_ldpc_tpu.core.qc import qc_expand, qc_generate_irregular
from lut_ldpc_tpu.decoder import LUTCodec
from lut_ldpc_tpu.decoder.arith_decoder import ArithLUTDecoder
from lut_ldpc_tpu.decoder.fast_decoder import FastLUTDecoder
from lut_ldpc_tpu.ops.pmf import snr2sig

ENS = "ensembles/rate0.50_dv02-17_dc08-09_lut_q4.ens"


@pytest.fixture(scope="module")
def qc_irr():
    e = LDPCEnsemble.read(ENS)
    return qc_generate_irregular(e, Z=24, nb=60, seed=1)


@pytest.fixture(scope="module")
def codec_irr(qc_irr):
    return LUTCodec.design(qc_expand(qc_irr), 0.90**2, max_iters=10,
                           Nq_Cha=16, Nq_Msg=16)


def test_construction_matches_ensemble(qc_irr):
    e = LDPCEnsemble.read(ENS)
    g = qc_expand(qc_irr)
    # block-quantized node fractions: within 1/nb of the ensemble's
    nb, Z = qc_irr.nb, qc_irr.Z
    lam_node = dict(zip(e.degree_lam.tolist(), e.Lam_node()))
    for d in g.vn_degrees:
        frac = len(g.vn_node_idx[int(d)]) / (nb * Z)
        assert abs(frac - lam_node[int(d)]) <= 1.0 / nb
    # column blocks are degree-uniform and circulants hit distinct rows
    col_deg = (qc_irr.base >= 0).sum(axis=0)
    for j in range(nb):
        dv = g.dv_vec[j * Z : (j + 1) * Z]
        assert np.all(dv == dv[0]) and dv[0] == col_deg[j]
    # row degrees exactly match the assigned check-block degrees
    row_deg = (qc_irr.base >= 0).sum(axis=1)
    for i in range(qc_irr.mb):
        dc = g.dc_vec[i * Z : (i + 1) * Z]
        assert np.all(dc == row_deg[i])
    # edge balance
    assert int(col_deg.sum()) == int(row_deg.sum())


def test_no_four_cycles(qc_irr):
    g = qc_expand(qc_irr)
    H = np.zeros((g.nchk, g.nvar), np.int32)
    for d in g.cn_degrees:
        for c, vars_ in zip(g.cn_node_idx[int(d)], g.cn_var_idx[int(d)]):
            H[c, vars_] = 1
    M = H @ H.T
    np.fill_diagonal(M, 0)
    assert M.max() <= 1  # two checks share at most one variable


def test_qc_plan_validates_multiblock(codec_irr, qc_irr):
    from lut_ldpc_tpu.decoder.fast_layout import GroupedLayout

    lay = GroupedLayout(codec_irr.graph, slot_major=True, align=16)
    plan = lay.qc_plan(qc_irr)
    assert plan is not None
    # full coverage of the real CN rows, one descriptor per circulant
    assert len(plan.copies) == len(qc_irr.circulants())
    # kernel tables cover every grid block with consistent degrees
    assert len(plan.cn_rows) == qc_irr.mb and len(plan.vn_cols) == qc_irr.nb
    for ci, src, dst in plan.cn_rows:
        assert len(src) == len(dst) == plan.cn_degrees[ci]
    for ci, node_base, src, dst in plan.vn_cols:
        assert len(src) == len(dst) == plan.vn_degrees[ci]
    # node-major layouts are rejected
    assert GroupedLayout(codec_irr.graph, slot_major=False).qc_plan(qc_irr) \
        is None


def test_roll_decode_bit_identical(codec_irr):
    codec = codec_irr
    dec = ArithLUTDecoder(codec, early_exit=True)
    assert dec._qc_copies is not None  # rolls active, not gathers
    fast = FastLUTDecoder(codec, early_exit=True)
    rng = np.random.default_rng(5)
    sig = float(snr2sig(0.5, 2.0))
    y = 1.0 + sig * rng.standard_normal((48, codec.nvar))
    llr = 2.0 * y / sig**2
    lc, lm = codec.quantize_channel(llr)
    b1, ok1, it1 = [np.asarray(a) for a in dec(lc, lm)]
    b2, ok2, it2 = [np.asarray(a) for a in fast(lc, lm)]
    assert np.array_equal(b1, b2)
    assert np.array_equal(ok1, ok2)
    assert np.array_equal(it1, it2)
    for f in range(6):
        b_ref, it_ref = codec.decode_ref(np.asarray(lc)[f], np.asarray(lm)[f])
        itr = it_ref if it_ref > 0 else codec.max_iters
        assert np.array_equal(np.asarray(b_ref), b1[f])
        assert itr == it1[f]


def test_pallas_kernels_interpret_bit_identical(codec_irr, monkeypatch):
    """The fused multi-class Pallas kernels (interpret mode on CPU: same
    dataflow, no Mosaic) must decode bit-identically to the table decoder
    and the scalar golden model."""
    monkeypatch.setenv("LUT_LDPC_PALLAS_INTERPRET", "1")
    codec = codec_irr
    dec = ArithLUTDecoder(codec, early_exit=True)
    assert dec._use_qc_kernels()  # kernel path active
    fast = FastLUTDecoder(codec, early_exit=True)
    rng = np.random.default_rng(9)
    sig = float(snr2sig(0.5, 1.8))
    y = 1.0 + sig * rng.standard_normal((16, codec.nvar))
    llr = 2.0 * y / sig**2
    lc, lm = codec.quantize_channel(llr)
    r1 = [np.asarray(a) for a in dec(lc, lm)]
    r2 = [np.asarray(a) for a in fast(lc, lm)]
    for a, b in zip(r1, r2):
        assert np.array_equal(a, b)
    b_ref, it_ref = codec.decode_ref(np.asarray(lc)[0], np.asarray(lm)[0])
    assert np.array_equal(np.asarray(b_ref), r1[0][0])


def test_mb_override_sets_rate():
    e = LDPCEnsemble.read(ENS)
    qc = qc_generate_irregular(e, Z=24, nb=60, seed=2, mb=30)
    assert qc.mb == 30  # rate-1/2 block grid, edge sum repaired in-degree
    g = qc_expand(qc)
    assert g.nchk * 2 == g.nvar
