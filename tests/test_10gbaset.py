"""10GBase-T (6,32) N=2048 regression (VERDICT item 4).

The reference's second flagship config: rate-0.84 regular (6,32) code,
8-iteration min-LUT decoder, 4-bit channel / 3-bit messages, designed at
SNR 3.9 dB with the 6_32_wide tree template, quantized-channel initial
messages (/root/reference/params/ber.ini.regular.example:10,52,81-113,
README.md:237-239).  dc=32 stresses the high-degree CN path and the
mixed q4/q3 resolution path; these tests pin the designed LUTs and the
decode behavior.
"""

import hashlib
import os

import numpy as np
import pytest

from lut_ldpc_tpu.core.alist import read_alist
from lut_ldpc_tpu.core.tanner import TannerGraph
from lut_ldpc_tpu.decoder import LUTCodec, make_decoder
from lut_ldpc_tpu.ops.pmf import snr2sig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# fingerprint of the full designed decoder (all per-iteration VN/DEC tree
# serializations + channel/message quantizer boundaries); changes to the
# quantizer DP, tree-file parsing, or DE pmf updates that alter ANY
# designed LUT flip this hash
DESIGN_SHA256 = "3097243e5eb1b62747e1082b4a401252132b94f575ef4f3a4fd18df081ff5067"


@pytest.fixture(scope="module")
def codec632():
    H = read_alist(os.path.join(REPO, "codes", "rate0.84_reg_v6c32_N2048.alist"))
    graph = TannerGraph.from_dense(H)
    ens = graph.empirical_ensemble()
    sig = float(snr2sig(ens.rate(), 3.9))
    codec = LUTCodec.design(
        graph, sig * sig, max_iters=8, Nq_Cha=16, Nq_Msg=8,
        tree_method="filename=" + os.path.join(REPO, "trees", "6_32_wide.ini"),
        min_lut=True,
    )
    codec.initial_message_mode = "qcha"
    return codec


def test_designed_luts_pinned(codec632):
    codec = codec632
    assert int(codec.Nq_Cha) == 16
    assert all(int(x) == 8 for x in codec.Nq_Msg)
    hs = hashlib.sha256()
    for ii in range(codec.max_iters):
        for d in codec.var_tree_degrees:
            hs.update(codec.var_tree(ii, int(d)).serialize().encode())
    hs.update(np.asarray(codec.qb_Cha, np.float64).tobytes())
    hs.update(np.asarray(codec.qb_Msg, np.float64).tobytes())
    assert hs.hexdigest() == DESIGN_SHA256


def test_high_degree_decode_corrects(codec632):
    """dc=32 CN blocks + q4->q3 mixed resolution decode end-to-end; at
    SNR 4.5 dB (the code's operating region) the decoder must clean up
    the channel; golden scalar equivalence on a few frames."""
    codec = codec632
    dec = make_decoder(codec, early_exit=True)
    rng = np.random.default_rng(3)
    ens_rate = codec.k / codec.nvar
    sig = float(snr2sig(ens_rate, 4.5))
    y = 1.0 + sig * rng.standard_normal((48, codec.nvar))
    llr = 2.0 * y / sig**2
    lc, lm = codec.quantize_channel(llr)
    bits, ok, iters = [np.asarray(a) for a in dec(lc, lm)]
    uncoded = (y < 0).mean()
    assert bits.mean() < uncoded / 10
    assert ok.mean() > 0.9
    for f in range(3):
        b_ref, _ = codec.decode_ref(np.asarray(lc)[f], np.asarray(lm)[f])
        assert np.array_equal(np.asarray(b_ref), bits[f])
