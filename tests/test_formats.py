"""Tests for ensemble/.ens, alist, GF2, and Tanner-graph layout against the
reference's shipped data assets."""

import os

import numpy as np
import pytest

from lut_ldpc_tpu.core.alist import read_alist, read_alist_cols, write_alist
from lut_ldpc_tpu.core.ensemble import LDPCEnsemble, empirical_ensemble
from lut_ldpc_tpu.core.gf2 import gf2_rank, make_systematic_generator, pack_rows, unpack_rows
from lut_ldpc_tpu.core.tanner import TannerGraph

REF = "/root/reference"
HAVE_REF = os.path.isdir(REF)


@pytest.mark.skipif(not HAVE_REF, reason="reference assets not mounted")
def test_ensemble_read_reference():
    ens = LDPCEnsemble.read(f"{REF}/ensembles/rate0.50_dv02-17_dc08-09_lut_q4.ens")
    assert list(ens.degree_lam) == [2, 3, 9, 17]
    assert list(ens.degree_rho) == [8, 9]
    assert ens.rate() == pytest.approx(0.5, abs=1e-3)
    assert ens.lam.sum() == pytest.approx(1.0)


@pytest.mark.skipif(not HAVE_REF, reason="reference assets not mounted")
def test_ensemble_regular():
    ens = LDPCEnsemble.read(f"{REF}/ensembles/rate0.50_dv03_dc06.ens")
    assert list(ens.degree_lam) == [3] and list(ens.degree_rho) == [6]
    assert ens.rate() == pytest.approx(0.5)


def test_ensemble_roundtrip(tmp_path):
    ens = LDPCEnsemble(np.array([2, 3]), np.array([0.4, 0.6]), np.array([6]), np.array([1.0]))
    p = tmp_path / "x.ens"
    ens.write(str(p))
    ens2 = LDPCEnsemble.read(str(p))
    assert np.allclose(ens.lam, ens2.lam) and np.all(ens.degree_lam == ens2.degree_lam)


def test_ensemble_normalization_tolerance():
    # slightly off-normalized is accepted and renormalized (tolerance 1e-2)
    ens = LDPCEnsemble(np.array([3]), np.array([1.005]), np.array([6]), np.array([1.0]))
    assert ens.lam.sum() == pytest.approx(1.0)
    with pytest.raises(ValueError):
        LDPCEnsemble(np.array([3]), np.array([1.5]), np.array([6]), np.array([1.4]))


@pytest.mark.skipif(not HAVE_REF, reason="reference assets not mounted")
def test_alist_read_reference_regular():
    H = read_alist(f"{REF}/codes/rate0.50_dv03_dc06_N1000.alist")
    assert H.shape == (500, 1000)
    assert np.all(H.sum(axis=0) == 3)
    assert np.all(H.sum(axis=1) == 6)


@pytest.mark.skipif(not HAVE_REF, reason="reference assets not mounted")
def test_alist_read_reference_irregular():
    cols, n, m = read_alist_cols(f"{REF}/codes/rate0.50_dv02-17_dc08-09_lut_q4_N500.alist")
    assert (n, m) == (500, 250)
    ens = empirical_ensemble(
        np.array([len(c) for c in cols]),
        np.bincount(np.concatenate(cols), minlength=m),
    )
    assert set(ens.degree_lam).issubset({2, 3, 9, 17})


def test_alist_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    H = (rng.random((20, 40)) < 0.15).astype(np.uint8)
    # ensure no empty rows/cols
    H[np.arange(20), rng.integers(0, 40, 20)] = 1
    H[rng.integers(0, 20, 40), np.arange(40)] = 1
    p = tmp_path / "h.alist"
    write_alist(str(p), H)
    H2 = read_alist(str(p))
    assert np.array_equal(H, H2)


def test_gf2_pack_unpack():
    rng = np.random.default_rng(1)
    M = (rng.random((7, 130)) < 0.5).astype(np.uint8)
    assert np.array_equal(unpack_rows(pack_rows(M), 130), M)


def test_gf2_rank_small():
    M = np.array([[1, 0, 1], [0, 1, 1], [1, 1, 0]], dtype=np.uint8)
    assert gf2_rank(M) == 2  # row3 = row1 + row2


def test_systematic_generator_produces_codewords():
    rng = np.random.default_rng(2)
    m, n = 30, 60
    H = (rng.random((m, n)) < 0.2).astype(np.uint8)
    H[np.arange(m), rng.integers(0, n, m)] = 1
    perm, gen_T, rank = make_systematic_generator(H)
    k = n - rank
    Hp = H[:, perm]
    for _ in range(5):
        u = rng.integers(0, 2, k).astype(np.uint8)
        parity = (u @ gen_T) % 2
        x = np.concatenate([u, parity])
        syndrome = (Hp @ x) % 2
        assert not syndrome.any()


@pytest.mark.skipif(not HAVE_REF, reason="reference assets not mounted")
def test_systematic_generator_reference_code():
    H = read_alist(f"{REF}/codes/rate0.50_dv03_dc06_N1000.alist")
    perm, gen_T, rank = make_systematic_generator(H)
    assert rank <= 500
    k = 1000 - rank
    rng = np.random.default_rng(3)
    u = rng.integers(0, 2, k).astype(np.uint8)
    x = np.concatenate([u, (u @ gen_T) % 2])
    assert not ((H[:, perm] @ x) % 2).any()


@pytest.mark.skipif(not HAVE_REF, reason="reference assets not mounted")
def test_tanner_graph_layout():
    g = TannerGraph.from_alist(f"{REF}/codes/rate0.50_dv03_dc06_N1000.alist")
    assert g.nvar == 1000 and g.nchk == 500 and g.num_edges == 3000
    assert list(g.vn_degrees) == [3] and list(g.cn_degrees) == [6]
    # every edge appears exactly once in VN grouping and once in CN grouping
    vn_all = np.sort(np.concatenate([v.ravel() for v in g.vn_edge_idx.values()]))
    cn_all = np.sort(np.concatenate([v.ravel() for v in g.cn_edge_idx.values()]))
    assert np.array_equal(vn_all, np.arange(3000))
    assert np.array_equal(cn_all, np.arange(3000))
    # cn_var_idx consistent with edge ownership
    owner = g.var_llr_edge_expand()
    for d in g.cn_degrees:
        assert np.array_equal(owner[g.cn_edge_idx[int(d)]], g.cn_var_idx[int(d)])


def test_tanner_graph_irregular_groups():
    H = np.array(
        [
            [1, 1, 1, 0, 0, 1],
            [0, 1, 1, 1, 1, 0],
            [1, 0, 1, 1, 0, 1],
        ],
        dtype=np.uint8,
    )
    g = TannerGraph.from_dense(H)
    assert g.num_edges == int(H.sum())
    assert set(int(d) for d in g.vn_degrees) == {1, 2, 3}
    total = sum(len(g.vn_node_idx[int(d)]) for d in g.vn_degrees)
    assert total == 6


def test_dv02_08_n64800_asset_matches_ensemble():
    """The generated dv02-08/dc07-08 N=64800 PEG code (the reference's
    second shipped N=64800 LUT design point, codes/README.md) matches its
    ensemble's degree support and dimensions."""
    import os

    path = "codes/rate0.50_dv02-08_dc07-08_lut_q4_N64800.alist"
    if not os.path.exists(path):
        import pytest

        pytest.skip("asset not generated (examples/make_assets.py --big)")
    from lut_ldpc_tpu.core.tanner import TannerGraph

    g = TannerGraph.from_alist(path)
    assert g.nvar == 64800 and g.nchk == 32400
    assert set(int(d) for d in g.vn_degrees) == {2, 3, 8}
    # PEG concentrates check degrees around the mean with +-1 spill; the
    # reference's shipped file has the same {7, 8, 9} support (5 stray 9s)
    assert set(int(d) for d in g.cn_degrees) <= {6, 7, 8, 9}


def test_tree_example_assets():
    """trees/example.tikz must exist and encode the reference's degree-8
    example template (trees/README.md); the PNG rendering rides along."""
    import os

    assert os.path.exists("trees/example.tikz")
    assert os.path.exists("trees/example.png")
    src = open("trees/example.tikz").read()
    # 7 message leaves + 1 channel leaf, reference style macros
    assert src.count("child") == 14
    assert "\\begin{tikzpicture}" in src
