"""PEG code construction: degree realization, graph validity, girth, and a
decode smoke test on a generated code."""

import numpy as np
import pytest

from lut_ldpc_tpu.core.ensemble import LDPCEnsemble
from lut_ldpc_tpu.core.peg import (
    degree_sequence_from_ensemble,
    peg_code_from_ensemble,
    peg_construct,
)


@pytest.fixture(scope="module")
def ens36():
    return LDPCEnsemble(np.array([3]), np.array([1.0]), np.array([6]), np.array([1.0]))


def test_degree_sequence(ens36):
    seq = degree_sequence_from_ensemble(ens36, 100)
    assert len(seq) == 100 and (seq == 3).all()
    ens_irr = LDPCEnsemble(
        np.array([2, 3]), np.array([0.4, 0.6]), np.array([6]), np.array([1.0])
    )
    seq = degree_sequence_from_ensemble(ens_irr, 100)
    assert len(seq) == 100
    assert seq.sum() == pytest.approx(
        100 * (ens_irr.Lam_node() * ens_irr.degree_lam).sum(), abs=3
    )
    assert (np.diff(seq) >= 0).all()


def test_peg_regular_graph(ens36):
    N, M = 512, 256
    graph, lg = peg_code_from_ensemble(ens36, M, N, seed=7)
    assert graph.nvar == N and graph.nchk == M
    assert (graph.dv_vec == 3).all()
    # greedy PEG at this size: no 4-cycles (girth >= 6)
    finite = lg[lg > 0]
    assert len(finite) == 0 or finite.min() >= 6
    # no duplicate edges by construction (from_cols would tolerate; verify)
    for d in graph.vn_degrees:
        idx = graph.cn_var_idx  # noqa: just ensure structure built
    H = np.zeros((M, N), dtype=np.uint8)
    for d in graph.cn_degrees:
        d = int(d)
        H[graph.cn_node_idx[d][:, None], graph.cn_var_idx[d]] = 1
    assert H.sum() == graph.num_edges


def test_peg_no_four_cycles(ens36):
    N, M = 256, 128
    graph, _ = peg_code_from_ensemble(ens36, M, N, seed=3)
    H = np.zeros((M, N), dtype=np.int32)
    for d in graph.cn_degrees:
        d = int(d)
        H[graph.cn_node_idx[d][:, None], graph.cn_var_idx[d]] = 1
    # 4-cycle <=> two rows share >= 2 columns
    overlap = H @ H.T
    np.fill_diagonal(overlap, 0)
    assert overlap.max() <= 1


def test_peg_concentrated_degrees(ens36):
    N, M = 240, 120
    seq = degree_sequence_from_ensemble(ens36, N)
    cols, _ = peg_construct(M, N, seq, sgl_concent=0, seed=5)
    dc = np.zeros(M, dtype=np.int64)
    for c in cols:
        dc[c] += 1
    assert dc.max() - dc.min() <= 1  # concentrated check degrees


def test_peg_code_decodes(ens36):
    from lut_ldpc_tpu.decoder import LUTCodec, make_decoder
    from lut_ldpc_tpu.ops.pmf import snr2sig

    graph, _ = peg_code_from_ensemble(ens36, 64, 128, seed=11)
    sig = float(snr2sig(0.5, 2.0))
    codec = LUTCodec.design(graph, sig**2, max_iters=6)
    dec = make_decoder(codec)
    rng = np.random.default_rng(0)
    s2 = float(snr2sig(0.5, 4.0))
    y = 1.0 + s2 * rng.standard_normal((32, graph.nvar))
    bits, ok, _ = dec(*codec.quantize_channel(2.0 * y / s2**2))
    assert np.asarray(ok).mean() > 0.9
    assert np.asarray(bits).mean() < (y < 0).mean()


def test_peg_gen_cli(tmp_path, ens36):
    from lut_ldpc_tpu.cli.peg_gen import main
    from lut_ldpc_tpu.core.alist import read_alist

    ens_path = tmp_path / "e.ens"
    ens36.write(str(ens_path))
    out = tmp_path / "code.alist"
    assert main(["64", "128", str(out), str(ens_path), "--seed", "3"]) == 0
    H = read_alist(str(out))
    assert H.shape == (64, 128)
    assert (H.sum(axis=0) == 3).all()


def test_dat2alist_cli(tmp_path):
    from lut_ldpc_tpu.cli.dat2alist import main
    from lut_ldpc_tpu.core.alist import read_alist

    dat = tmp_path / "h.dat"
    # 4 vars, 2 checks: check0 = {1,2}, check1 = {3,4} (1-based), padded
    dat.write_text("4\n2\n3\n1 2 0\n3 4 0\n")
    out = tmp_path / "h.alist"
    assert main([str(dat), str(out)]) == 0
    H = read_alist(str(out))
    assert H.tolist() == [[1, 1, 0, 0], [0, 0, 1, 1]]
