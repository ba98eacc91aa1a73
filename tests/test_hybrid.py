"""HybridLUTDecoder: arithmetic prefix + label-domain continuation tail.

The hybrid must be bit-identical (bits, ok, iters) to the full table
decoder in every regime: tail never taken (all frames converge within the
prefix), tail taken with mixed convergence, and tail taken with
non-converging frames.
"""

import numpy as np
import pytest

from lut_ldpc_tpu.core.qc import qc_expand, qc_generate_regular
from lut_ldpc_tpu.decoder import LUTCodec
from lut_ldpc_tpu.decoder.fast_decoder import FastLUTDecoder, make_decoder
from lut_ldpc_tpu.decoder.hybrid import HybridLUTDecoder
from lut_ldpc_tpu.ops.pmf import snr2sig


@pytest.fixture(scope="module")
def codec_degenerate():
    """Codec designed near threshold with enough iterations that the late
    LUTs degenerate: the arithmetic form validates only a strict prefix,
    which is exactly the case the hybrid exists for."""
    qc = qc_generate_regular(3, 6, Z=40, nb=12, seed=3)
    return LUTCodec.design(qc_expand(qc), 0.85**2, max_iters=40,
                           Nq_Cha=16, Nq_Msg=16)


def test_hybrid_selected_and_prefix_strict(codec_degenerate):
    dec = make_decoder(codec_degenerate, early_exit=True)
    assert isinstance(dec, HybridLUTDecoder)
    assert 1 <= dec.S < dec.T - 1  # genuinely a prefix, tail non-trivial


@pytest.mark.parametrize("snr", [0.0, 1.5, 2.5, 4.0])
def test_hybrid_matches_table_decoder(codec_degenerate, snr):
    codec = codec_degenerate
    hyb = HybridLUTDecoder(codec)
    full = FastLUTDecoder(codec, early_exit=True)
    rng = np.random.default_rng(int(snr * 10) + 1)
    sig = float(snr2sig(0.5, snr))
    y = 1.0 + sig * rng.standard_normal((64, codec.nvar))
    llr = 2.0 * y / sig**2
    lc, lm = codec.quantize_channel(llr)
    b1, ok1, it1 = [np.asarray(a) for a in hyb(lc, lm)]
    b2, ok2, it2 = [np.asarray(a) for a in full(lc, lm)]
    assert np.array_equal(b1, b2)
    assert np.array_equal(ok1, ok2)
    assert np.array_equal(it1, it2)


def test_hybrid_golden_scalar(codec_degenerate):
    """Pin a few frames to the scalar reference decoder across regimes."""
    codec = codec_degenerate
    hyb = HybridLUTDecoder(codec)
    rng = np.random.default_rng(7)
    sig = float(snr2sig(0.5, 1.5))  # mixed convergence: tail fires
    y = 1.0 + sig * rng.standard_normal((16, codec.nvar))
    llr = 2.0 * y / sig**2
    lc, lm = codec.quantize_channel(llr)
    bits, ok, iters = [np.asarray(a) for a in hyb(lc, lm)]
    for f in range(6):
        b_ref, it_ref = codec.decode_ref(np.asarray(lc)[f], np.asarray(lm)[f])
        assert np.array_equal(np.asarray(b_ref), bits[f])
        itr = it_ref if it_ref > 0 else codec.max_iters
        assert itr == iters[f]
