"""Decoder-layer tests: tree programs vs scalar tree eval, batched JAX
decoder vs the scalar golden model, codec persistence and integrity."""

import numpy as np
import pytest

from lut_ldpc_tpu.core.tanner import TannerGraph
from lut_ldpc_tpu.core.trees import CHKTREE, DECTREE, VARTREE, LUTTree
from lut_ldpc_tpu.decoder import LUTCodec, LUTDecoder, leave_one_out_idx, tree_program
from lut_ldpc_tpu.ops.pmf import get_gaussian_pmf, snr2sig

from util_codes import random_regular_H


def _designed_tree(tree_type, num_leaves, Nq_in=8, Nq_out=8, Nq_cha=8, sig=0.8):
    mode = "auto_bin_balanced"
    t = LUTTree.auto(num_leaves, tree_type, mode)
    t.set_resolution(Nq_in, Nq_out, Nq_cha)
    delta = 2 * 25.0 / 2000
    pmf_fine = get_gaussian_pmf(2 / sig**2, 2 / sig, 2000, delta)
    from lut_ldpc_tpu.ops.quant import quant_mi_sym

    _, p_msg, _ = quant_mi_sym(pmf_fine, Nq_in, is_sorted=True)
    p_cha = None
    if Nq_cha:
        _, p_cha, _ = quant_mi_sym(pmf_fine, Nq_cha, is_sorted=True)
    t.set_leaves(p_msg, p_cha)
    t.update()
    return t


@pytest.mark.parametrize("tree_type,num_leaves", [(VARTREE, 3), (VARTREE, 5), (DECTREE, 4)])
def test_program_matches_var_eval(tree_type, num_leaves):
    Nq_out = 2 if tree_type == DECTREE else 8
    t = _designed_tree(tree_type, num_leaves, Nq_out=Nq_out)
    prog = tree_program(t)
    assert prog.num_inputs == num_leaves
    rng = np.random.default_rng(0)
    for _ in range(50):
        # leaf resolutions in DFS order: MSG leaves are 8, CHA leaf is 8
        labels = rng.integers(0, 8, size=num_leaves)
        got = prog.eval_np(labels[None, :])[0]
        want = t.root.var_eval(list(int(x) for x in labels))
        assert got == want


@pytest.mark.parametrize("num_leaves", [2, 3, 5])
def test_program_matches_chk_eval(num_leaves):
    t = _designed_tree(CHKTREE, num_leaves, Nq_cha=0)
    prog = tree_program(t)
    rng = np.random.default_rng(1)
    for _ in range(50):
        labels = rng.integers(0, 8, size=num_leaves)
        got = prog.eval_np(labels[None, :])[0]
        want = t.root.chk_eval(list(int(x) for x in labels))
        assert got == want


def test_leave_one_out_idx():
    loo = leave_one_out_idx(4, 3)
    assert loo.shape == (3, 3)
    assert loo.tolist() == [[1, 2, 3], [0, 2, 3], [0, 1, 3]]


# ---------------------------------------------------------------------------
# end-to-end codec
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def small_codec():
    H = random_regular_H(48, 3, 6, seed=3)
    graph = TannerGraph.from_dense(H)
    sig = snr2sig(0.5, 2.0)
    return LUTCodec.design(
        graph, float(sig) ** 2, max_iters=5, Nq_Cha=16, Nq_Msg=16,
        min_lut=True, build_generator=True,
    )


@pytest.fixture(scope="module")
def small_codec_fulllut():
    H = random_regular_H(48, 3, 6, seed=3)
    graph = TannerGraph.from_dense(H)
    sig = snr2sig(0.5, 2.0)
    return LUTCodec.design(
        graph, float(sig) ** 2, max_iters=4, Nq_Cha=16, Nq_Msg=16, min_lut=False,
    )


def _random_llr(codec, B, seed, snr_db=2.0):
    rng = np.random.default_rng(seed)
    sig = float(snr2sig(codec.rate(), snr_db))
    x = 1.0 - 2.0 * rng.integers(0, 2, size=(B, codec.nvar)) * 0  # all-zero cw
    y = x + sig * rng.standard_normal((B, codec.nvar))
    return 2.0 * y / sig**2


@pytest.mark.parametrize("early_exit", [True, False])
def test_batched_matches_scalar_minlut(small_codec, early_exit):
    codec = small_codec
    dec = LUTDecoder(codec, early_exit=early_exit)
    llr = _random_llr(codec, 12, seed=7)
    llr_cha, llr_msg = codec.quantize_channel(llr)
    bits, ok, iters = dec(llr_cha, llr_msg)
    bits, ok, iters = np.asarray(bits), np.asarray(ok), np.asarray(iters)
    for b in range(12):
        want_bits, want_it = codec.decode_ref(llr_cha[b], llr_msg[b], psc=early_exit)
        assert np.array_equal(bits[b], want_bits), f"frame {b} mismatch"
        if early_exit:
            assert iters[b] == abs(want_it)
            assert ok[b] == (want_it > 0)


def test_batched_matches_scalar_fulllut(small_codec_fulllut):
    codec = small_codec_fulllut
    dec = LUTDecoder(codec, early_exit=True)
    llr = _random_llr(codec, 8, seed=11)
    llr_cha, llr_msg = codec.quantize_channel(llr)
    bits, ok, iters = dec(llr_cha, llr_msg)
    bits, iters = np.asarray(bits), np.asarray(iters)
    for b in range(8):
        want_bits, want_it = codec.decode_ref(llr_cha[b], llr_msg[b])
        assert np.array_equal(bits[b], want_bits), f"frame {b} mismatch"
        assert iters[b] == abs(want_it)


def test_decodes_allzero_high_snr(small_codec):
    codec = small_codec
    dec = LUTDecoder(codec)
    llr = _random_llr(codec, 16, seed=5, snr_db=6.0)
    llr_cha, llr_msg = codec.quantize_channel(llr)
    bits, ok, _ = dec(llr_cha, llr_msg)
    assert np.asarray(ok).all()
    assert np.asarray(bits).sum() == 0


def test_codec_roundtrip(tmp_path, small_codec):
    codec = small_codec
    p = str(tmp_path / "codec.npz")
    codec.save(p)
    codec2 = LUTCodec.load(p)
    assert codec2.nvar == codec.nvar and codec2.max_iters == codec.max_iters
    np.testing.assert_allclose(codec2.qb_Cha, codec.qb_Cha)
    np.testing.assert_array_equal(codec2.cha2msg_map, codec.cha2msg_map)
    llr = _random_llr(codec, 6, seed=13)
    llr_cha, llr_msg = codec.quantize_channel(llr)
    b1, _, i1 = LUTDecoder(codec)(llr_cha, llr_msg)
    b2, _, i2 = LUTDecoder(codec2)(llr_cha, llr_msg)
    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    assert np.array_equal(np.asarray(i1), np.asarray(i2))


def test_generator_integrity(small_codec):
    codec = small_codec
    assert codec.gen_T is not None
    assert codec.integrity_check()
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, size=(4, codec.k)).astype(np.uint8)
    x = codec.encode(u)
    H = codec._dense_H()
    assert ((H @ x.T) % 2 == 0).all()
    # systematic bits come first
    assert np.array_equal(x[:, : codec.k], u)


def test_encode_decode_roundtrip(small_codec):
    """Encode random data, add mild noise, decode, recover info bits."""
    codec = small_codec
    dec = LUTDecoder(codec)
    rng = np.random.default_rng(42)
    B = 8
    u = rng.integers(0, 2, size=(B, codec.k)).astype(np.uint8)
    x = codec.encode(u)
    sig = float(snr2sig(codec.rate(), 6.0))
    y = (1.0 - 2.0 * x) + sig * rng.standard_normal(x.shape)
    llr = 2.0 * y / sig**2
    llr_cha, llr_msg = codec.quantize_channel(llr)
    bits, ok, _ = dec(llr_cha, llr_msg)
    bits = np.asarray(bits)
    assert np.asarray(ok).all()
    assert np.array_equal(bits[:, : codec.k], u)


def test_initial_message_mode_qcha(small_codec):
    """QCHA initial messages (channel labels relabeled through the MI map)
    decode correctly and match the scalar golden model."""
    import copy

    codec = copy.copy(small_codec)
    codec.initial_message_mode = "qcha"
    from lut_ldpc_tpu.decoder import make_decoder

    dec = make_decoder(codec)
    llr = _random_llr(codec, 8, seed=21, snr_db=4.0)
    llr_cha, llr_msg = codec.quantize_channel(llr)
    # qcha: llr_msg derives from llr_cha through the map
    assert np.array_equal(llr_msg, codec.cha2msg_map[llr_cha])
    bits, ok, iters = dec(llr_cha, llr_msg)
    for b in range(4):
        want, want_it = codec.decode_ref(llr_cha[b], llr_msg[b])
        assert np.array_equal(np.asarray(bits)[b], want)
        assert int(np.asarray(iters)[b]) == abs(want_it)
