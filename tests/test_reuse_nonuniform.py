"""End-to-end coverage for LUT reuse vectors and non-uniform per-iteration
message resolutions (the Nq_msg_vec surface)."""

import numpy as np
import pytest

from lut_ldpc_tpu.core.tanner import TannerGraph
from lut_ldpc_tpu.decoder import LUTCodec, make_decoder, make_staged_decoder
from lut_ldpc_tpu.decoder.lut_decoder import LUTDecoder
from lut_ldpc_tpu.ops.pmf import snr2sig

from util_codes import random_regular_H


def _llrs(codec, B, seed, snr=2.5):
    rng = np.random.default_rng(seed)
    sig = float(snr2sig(codec.rate(), snr))
    y = 1.0 + sig * rng.standard_normal((B, codec.nvar))
    return codec.quantize_channel(2.0 * y / sig**2)


@pytest.fixture(scope="module")
def graph():
    return TannerGraph.from_dense(random_regular_H(96, 3, 6, seed=3))


def test_reuse_vec_decoding(graph):
    """A codec designed with LUT reuse decodes identically across
    implementations and against the scalar golden model."""
    sig = float(snr2sig(0.5, 2.0))
    reuse = np.array([0, 0, 1, 0, 1, 0, 0, 0], dtype=bool)
    codec = LUTCodec.design(graph, sig**2, max_iters=8, reuse_vec=reuse)
    # reuse bookkeeping: stored tree rows = non-reused iterations
    assert len(codec.var_trees) == int((~reuse).sum())
    assert codec.var_tree(2, 3) is codec.var_tree(1, 3)  # reused iteration
    dec = make_decoder(codec)
    staged = make_staged_decoder(codec)
    llr_cha, llr_msg = _llrs(codec, 24, 0)
    b1, _, i1 = dec(llr_cha, llr_msg)
    b2, _, i2 = staged(llr_cha, llr_msg)
    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    want, want_it = codec.decode_ref(llr_cha[0], llr_msg[0])
    assert np.array_equal(np.asarray(b1)[0], want)
    assert int(np.asarray(i1)[0]) == abs(want_it)


def test_nonuniform_nq_msg(graph):
    """Per-iteration resolutions (e.g. 16,16,8,8,8) run through the general
    decoder and match the scalar golden model."""
    sig = float(snr2sig(0.5, 2.0))
    nq = np.array([16, 16, 8, 8, 8])
    codec = LUTCodec.design(graph, sig**2, max_iters=5, Nq_Msg=nq)
    assert list(codec.Nq_Msg) == list(nq)
    dec = make_decoder(codec)
    assert isinstance(dec, LUTDecoder)  # fast paths need uniform Nq
    llr_cha, llr_msg = _llrs(codec, 16, 1, snr=4.0)
    bits, ok, iters = dec(llr_cha, llr_msg)
    for b in range(6):
        want, want_it = codec.decode_ref(llr_cha[b], llr_msg[b])
        assert np.array_equal(np.asarray(bits)[b], want)
        assert int(np.asarray(iters)[b]) == abs(want_it)
    assert np.asarray(ok).mean() > 0.8
