"""Fast scan decoder must match the validated general decoder bit-for-bit."""

import numpy as np
import pytest

from lut_ldpc_tpu.core.tanner import TannerGraph
from lut_ldpc_tpu.decoder import FastLUTDecoder, LUTCodec, LUTDecoder, make_decoder
from lut_ldpc_tpu.ops.pmf import snr2sig

from util_codes import random_regular_H


def _mixed_H(seed=0):
    """Small irregular H with VN degrees {2,3} and CN degrees {4,5}."""
    rng = np.random.default_rng(seed)
    nvar, nchk = 60, 30
    while True:
        H = np.zeros((nchk, nvar), dtype=np.uint8)
        for v in range(nvar):
            dv = 2 if v < nvar // 2 else 3
            H[rng.choice(nchk, dv, replace=False), v] = 1
        dc = H.sum(axis=1)
        if dc.min() >= 2:
            return H


@pytest.fixture(scope="module")
def codec_reg():
    graph = TannerGraph.from_dense(random_regular_H(96, 3, 6, seed=3))
    sig = float(snr2sig(0.5, 2.0))
    return LUTCodec.design(graph, sig**2, max_iters=6)


@pytest.fixture(scope="module")
def codec_irreg():
    graph = TannerGraph.from_dense(_mixed_H())
    sig = float(snr2sig(0.5, 3.0))
    return LUTCodec.design(graph, sig**2, max_iters=5)


@pytest.fixture(scope="module")
def codec_fulllut():
    graph = TannerGraph.from_dense(random_regular_H(48, 3, 6, seed=5))
    sig = float(snr2sig(0.5, 2.0))
    return LUTCodec.design(graph, sig**2, max_iters=4, min_lut=False)


def _llrs(codec, B, seed, snr=2.5):
    rng = np.random.default_rng(seed)
    sig = float(snr2sig(codec.rate(), snr))
    y = 1.0 + sig * rng.standard_normal((B, codec.nvar))
    return codec.quantize_channel(2.0 * y / sig**2)


@pytest.mark.parametrize("early_exit", [True, False])
def test_fast_matches_general_regular(codec_reg, early_exit):
    llr_cha, llr_msg = _llrs(codec_reg, 32, 0)
    b1, ok1, it1 = LUTDecoder(codec_reg, early_exit=early_exit)(llr_cha, llr_msg)
    b2, ok2, it2 = FastLUTDecoder(codec_reg, early_exit=early_exit)(llr_cha, llr_msg)
    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    assert np.array_equal(np.asarray(ok1), np.asarray(ok2))
    if early_exit:
        assert np.array_equal(np.asarray(it1), np.asarray(it2))


def test_fast_matches_general_irregular(codec_irreg):
    llr_cha, llr_msg = _llrs(codec_irreg, 32, 1, snr=4.0)
    b1, ok1, it1 = LUTDecoder(codec_irreg)(llr_cha, llr_msg)
    b2, ok2, it2 = FastLUTDecoder(codec_irreg)(llr_cha, llr_msg)
    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    assert np.array_equal(np.asarray(it1), np.asarray(it2))


def test_fast_matches_general_fulllut(codec_fulllut):
    llr_cha, llr_msg = _llrs(codec_fulllut, 24, 2)
    b1, ok1, it1 = LUTDecoder(codec_fulllut)(llr_cha, llr_msg)
    b2, ok2, it2 = FastLUTDecoder(codec_fulllut)(llr_cha, llr_msg)
    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    assert np.array_equal(np.asarray(it1), np.asarray(it2))


def test_make_decoder_selects_accelerated(codec_reg):
    from lut_ldpc_tpu.decoder import ArithLUTDecoder
    from lut_ldpc_tpu.decoder.lut_decoder import LUTDecoder

    dec = make_decoder(codec_reg)
    assert isinstance(dec, (ArithLUTDecoder, FastLUTDecoder))
    assert not isinstance(dec, LUTDecoder)


def test_fast_program_path_matches_composed(codec_reg):
    """Force the per-op program path (shrink the composed-table budget) and
    check it agrees with the composed path."""
    import lut_ldpc_tpu.decoder.fast_layout as fl

    llr_cha, llr_msg = _llrs(codec_reg, 16, 3)
    b1, _, it1 = FastLUTDecoder(codec_reg)(llr_cha, llr_msg)
    old = fl.MAX_COMPOSED_ENTRIES
    try:
        fl.MAX_COMPOSED_ENTRIES = 1  # force program path everywhere
        b2, _, it2 = FastLUTDecoder(codec_reg)(llr_cha, llr_msg)
    finally:
        fl.MAX_COMPOSED_ENTRIES = old
    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    assert np.array_equal(np.asarray(it1), np.asarray(it2))
