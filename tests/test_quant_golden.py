"""Golden-vector tests for the quantizer core and LUT-tree design.

The main fixture is the worked example in the reference's trees/README.md:
building the degree-8 variable-node tree 'riim/im/m///iim/m//im/m////c//'
with specific Gaussian leaf pmfs and checking the exact serialized LUT
output (every table entry of every node).
"""

import math

import numpy as np
import pytest

from lut_ldpc_tpu.core.trees import LUTTree, VARTREE
from lut_ldpc_tpu.ops.pmf import (
    get_chk_product_pmf,
    get_gaussian_pmf,
    get_mi_bcpmf_sym,
    get_var_product_pmf,
    pmf_join,
    pmf_minus,
    pmf_plus,
    signed_to_unsigned_map,
)
from lut_ldpc_tpu.ops.quant import quant_mi_sym, quant_nonlin, sym_llr_sort_unique

# exact serialized output of the reference program in trees/README.md
GOLDEN_TREE_OUTPUT = """0 8
2
1 128 16
0 0 1 2 3 3 4 5 5 6 7 8 9 11 13 15 0 1 2 3 4 5 6 7 7 7 9 10 11 12 14 15 0 1 2 3 4 5 6 7 7 8 9 10 11 12 14 15 0 1 2 3 4 5 6 7 7 8 9 10 11 12 14 15 0 1 2 3 4 5 6 7 7 8 9 10 11 12 14 15 0 1 2 3 4 5 7 7 7 8 9 10 11 12 14 15 0 1 2 4 4 5 7 7 7 8 9 10 11 13 14 15 0 1 2 4 4 5 7 7 8 8 9 11 11 13 14 15
2
0 128 16
0 0 0 0 0 0 0 0 0 0 1 1 1 2 2 4 0 0 0 0 0 0 1 1 1 1 2 2 2 4 5 8 0 0 0 1 1 1 2 2 2 2 3 4 5 6 9 11 0 1 1 1 2 2 3 3 3 4 5 6 8 10 11 13 0 1 1 2 2 2 3 4 4 5 6 7 9 10 11 13 0 1 1 2 2 3 4 4 5 5 7 9 10 11 12 13 1 1 2 3 3 4 5 6 6 7 9 10 11 12 13 14 1 2 2 3 4 5 6 7 8 9 10 11 12 13 13 14
2
0 128 16
0 1 1 1 1 1 1 1 1 2 2 2 2 2 2 4 1 2 3 3 3 3 3 3 3 3 4 4 4 4 4 6 1 3 3 3 3 3 4 4 4 4 4 4 5 5 5 7 2 3 3 4 4 4 4 4 4 5 5 5 5 5 5 8 2 4 4 4 4 4 5 5 5 5 5 5 5 5 6 9 3 5 5 5 5 5 5 6 6 6 6 6 6 7 7 10 3 5 6 6 6 6 6 6 6 7 7 7 8 8 8 10 4 6 6 6 6 7 7 7 8 8 8 8 9 9 9 11
0
2 0 16
2
0 128 16
0 1 1 1 1 2 2 2 2 3 3 3 4 4 4 7 1 4 5 5 5 5 5 5 6 6 6 6 7 7 7 11 1 5 5 5 5 5 5 6 6 6 6 7 7 7 8 11 1 5 5 5 5 5 6 6 6 6 7 7 7 8 8 11 1 5 5 5 5 6 6 6 6 7 7 7 8 8 9 12 2 5 5 5 6 6 6 6 7 7 7 8 8 9 9 12 2 5 5 6 6 6 6 7 7 7 8 8 9 9 9 12 2 5 6 6 6 6 7 7 7 8 8 9 9 9 9 13
0
2 0 16
0
2 0 16
2
0 128 16
0 1 1 1 1 1 2 2 2 2 2 3 4 4 5 7 1 1 2 2 2 2 3 3 3 4 5 6 6 6 7 10 1 2 2 2 2 3 3 4 4 5 5 6 6 7 9 11 1 2 2 2 2 3 4 5 5 5 6 7 7 9 9 11 1 2 2 2 3 3 4 5 5 5 6 7 8 9 9 12 1 2 3 3 3 5 5 6 6 6 7 9 9 10 10 13 2 3 3 4 4 5 6 6 6 7 9 10 10 10 11 13 2 3 4 5 5 6 6 7 7 9 9 10 10 11 12 13
2
0 128 16
0 1 1 1 1 2 2 2 2 3 3 3 4 4 4 7 1 4 5 5 5 5 5 5 6 6 6 6 7 7 7 11 1 5 5 5 5 5 5 6 6 6 6 7 7 7 8 11 1 5 5 5 5 5 5 6 6 6 6 7 7 7 8 11 1 5 5 5 5 5 6 6 6 6 7 7 7 8 8 11 1 5 5 5 5 6 6 6 6 7 7 7 8 8 9 12 2 5 5 5 6 6 6 6 7 7 7 8 8 9 9 12 2 5 5 6 6 6 6 7 7 7 8 8 9 9 9 12 2 5 6 6 6 6 7 7 7 8 8 9 9 9 9 13
0
2 0 16
0
2 0 16
2
0 128 16
0 1 1 1 1 2 2 2 2 3 3 3 4 4 4 7 1 4 5 5 5 5 5 5 6 6 6 6 7 7 7 11 1 5 5 5 5 5 5 6 6 6 6 7 7 7 8 11 1 5 5 5 5 5 6 6 6 6 7 7 7 8 8 11 1 5 5 5 5 6 6 6 6 7 7 7 8 8 9 12 2 5 5 5 6 6 6 6 7 7 7 8 8 9 9 12 2 5 5 6 6 6 6 7 7 7 8 8 9 9 9 12 2 5 6 6 6 6 7 7 7 8 8 9 9 9 9 13
0
2 0 16
0
2 0 16
0
3 0 16
"""


def test_tree_readme_golden():
    """Reproduce trees/README.md's exact designed LUTs (validates the whole
    design stack: gaussian pmf, var product, quant_mi_sym, serialization).

    Known defect in the published golden output: LUT line 24 contains 144
    entries although its own header declares an input resolution of 128 —
    it is line 14 with one 16-entry row duplicated (a copy-paste error in
    the README; the tree has three structurally identical (m,m) nodes whose
    LUTs must be equal, and lines 14 and 31 are).  We assert byte-equality
    everywhere except that line, where our (self-consistent, 128-entry)
    output must equal line 14.
    """
    t8 = LUTTree.from_template("riim/im/m///iim/m//im/m////c//", VARTREE)
    m1, m2 = 3.0, 2.0
    p_msg = get_gaussian_pmf(m1, math.sqrt(2 * m1), 16, math.sqrt(2 * m1) / 20)
    p_cha = get_gaussian_pmf(m2, math.sqrt(2 * m2), 16, math.sqrt(2 * m2) / 20)
    t8.set_resolution(16, 16, 16)
    t8.set_leaves(p_msg, p_cha)
    t8.update()
    mine = t8.serialize().splitlines()
    gold = GOLDEN_TREE_OUTPUT.splitlines()
    assert len(mine) == len(gold)
    # document the defect in the published golden data itself
    assert gold[14] == gold[31] and gold[24] != gold[14]
    assert len(gold[24].split()) == 144 and len(gold[14].split()) == 128
    for i, (a, b) in enumerate(zip(mine, gold)):
        if i == 24:
            assert a == gold[14], "line 24 must match the self-consistent siblings"
        else:
            assert a == b, f"line {i} differs from golden"


def test_tree_roundtrip_serialization():
    # repair the known README defect before parsing (line 24 -> line 14)
    lines = GOLDEN_TREE_OUTPUT.splitlines()
    lines[24] = lines[14]
    repaired = "\n".join(lines) + "\n"
    tree = LUTTree.deserialize(repaired)
    assert tree.serialize() == repaired
    assert tree.num_leaves == 8
    assert tree.template_string() == "riim/im/m///iim/m//im/m////c//"


def test_quant_mi_sym_basic_invariants():
    rng = np.random.default_rng(0)
    for M, K in [(16, 4), (64, 8), (256, 16), (30, 6)]:
        p = rng.random(M)
        p = p / p.sum()
        mi, p_out, Q = quant_mi_sym(p, K)
        # symmetry of the label map
        assert np.all(Q + Q[::-1] == K - 1)
        # output pmf is consistent with the map
        p_chk = np.zeros(K)
        np.add.at(p_chk, Q, p)
        assert np.allclose(p_chk, p_out)
        # data processing: quantized MI <= input MI, and mi matches output pmf MI
        assert mi <= get_mi_bcpmf_sym(p) + 1e-12
        assert abs(mi - get_mi_bcpmf_sym(p_out)) < 1e-9


def test_quant_mi_sym_trivial_case():
    rng = np.random.default_rng(1)
    p = rng.random(8)
    p = p / p.sum()
    mi, p_out, Q = quant_mi_sym(p, 16)
    assert np.all(Q + Q[::-1] == 15)
    assert abs(p_out.sum() - 1) < 1e-12
    assert mi == pytest.approx(get_mi_bcpmf_sym(p))


def test_quant_mi_sym_sorted_matches_bruteforce():
    """Check DP optimality against brute-force boundary search on small cases."""
    from itertools import combinations

    rng = np.random.default_rng(2)
    M, K = 12, 4
    # build an LLR-sorted symmetric pmf
    raw = np.sort(rng.random(M // 2))
    upper = raw / raw.sum() * 0.7
    lower = (raw / raw.sum() * 0.3)[::-1]
    # enforce increasing LLR: lower half mirrors upper; use a monotone construction
    p = np.concatenate([lower, upper])
    # make LLR sorted by construction: llr[m]=log p[m]-log p[M-1-m]
    llr = np.log(p) - np.log(p[::-1])
    order = np.argsort(llr, kind="stable")
    p = p[order]
    if not np.all(np.argsort(np.log(p) - np.log(p[::-1]), kind="stable") == np.arange(M)):
        pytest.skip("construction failed to produce sorted llr")

    mi, _, _ = quant_mi_sym(p, K, is_sorted=True)

    def interval_mi(lo, hi):
        pp = p[M // 2 + lo : M // 2 + hi].sum()
        pm = p[M // 2 - hi : M // 2 - lo].sum()
        t = 0.0
        if pp > 0:
            t += pp * np.log2(2 * pp / (pp + pm))
        if pm > 0:
            t += pm * np.log2(2 * pm / (pp + pm))
        return t

    best = -1.0
    H = M // 2
    for bnds in combinations(range(1, H), K // 2 - 1):
        edges = (0,) + bnds + (H,)
        tot = sum(interval_mi(edges[i], edges[i + 1]) for i in range(K // 2))
        best = max(best, tot)
    assert mi == pytest.approx(best, abs=1e-12)


def test_sym_llr_sort_unique_merges_duplicates():
    p = np.array([0.1, 0.2, 0.2, 0.1, 0.15, 0.25])
    p = p / p.sum()
    p_sorted, idx_in, idx_sorted = sym_llr_sort_unique(p)
    assert abs(p_sorted.sum() - 1) < 1e-12
    # symmetric permutation property
    assert np.all(idx_in + idx_in[::-1] == len(p) - 1)
    # merged pmf stays symmetric in mass pairing
    M = len(p_sorted)
    assert M % 2 == 0


def test_chk_product_pmf_two_inputs_parity():
    """Degree-3 CN (2 inputs): output label sign = XOR of input signs."""
    rng = np.random.default_rng(3)
    K = 4
    a = rng.random(K)
    a /= a.sum()
    b = rng.random(K)
    b /= b.sum()
    out = get_chk_product_pmf([a, b])
    assert len(out) == 2 * (K // 2) ** 2
    assert out.sum() == pytest.approx(1.0)
    # brute force: enumerate signed labels
    brute = np.zeros(len(out))
    for la in range(K):
        for lb in range(K):
            sa, ma = (0, la - K // 2) if la >= K // 2 else (1, K // 2 - 1 - la)
            sb, mb = (0, lb - K // 2) if lb >= K // 2 else (1, K // 2 - 1 - lb)
            s = sa ^ sb
            mag = ma + (K // 2) * mb  # input 0 least significant
            idx = mag if s == 1 else len(out) - 1 - mag
            brute[idx] += a[la] * b[lb]
    assert np.allclose(out, brute)


def test_var_product_label_order():
    a = np.array([0.5, 0.5])
    b = np.array([0.25, 0.75])
    prod = get_var_product_pmf([a, b])
    # input 0 least significant: index = l0 + 2*l1
    assert prod[0] == pytest.approx(a[0] * b[0])
    assert prod[1] == pytest.approx(a[1] * b[0])
    assert prod[2] == pytest.approx(a[0] * b[1])
    assert prod[3] == pytest.approx(a[1] * b[1])


def test_pmf_plus_minus_join_roundtrip():
    rng = np.random.default_rng(4)
    p = rng.random(16)
    p /= p.sum()
    assert np.allclose(pmf_join(pmf_plus(p), pmf_minus(p)), p)


def test_signed_to_unsigned_map_bijection():
    inres = np.array([4, 6, 4])
    m = signed_to_unsigned_map(inres)
    # every output index hit exactly prod(inres)/out_max... not a bijection but onto
    out_max = 2 * np.prod(inres // 2)
    assert m.min() == 0 and m.max() == out_max - 1


def test_quant_nonlin():
    b = np.array([-1.0, 0.0, 1.0])
    x = np.array([-5.0, -1.0, -0.5, 0.0, 0.5, 1.0, 7.0])
    assert np.all(quant_nonlin(x, b) == np.array([0, 0, 1, 1, 2, 2, 3]))
