"""Reference-format codec artifacts (.it) and the stimuli dump."""

import io

import numpy as np
import pytest

from lut_ldpc_tpu.core.tanner import TannerGraph
from lut_ldpc_tpu.decoder import LUTCodec, make_decoder
from lut_ldpc_tpu.ops.pmf import snr2sig

from util_codes import random_regular_H


@pytest.fixture(scope="module")
def codec():
    graph = TannerGraph.from_dense(random_regular_H(48, 3, 6, seed=3))
    sig = float(snr2sig(0.5, 2.0))
    return LUTCodec.design(graph, sig**2, max_iters=5)


def test_codec_itfile_roundtrip(tmp_path, codec):
    p = str(tmp_path / "lut_codec.it")
    codec.save_itfile(p)
    codec2 = LUTCodec.load_itfile(p)
    assert codec2.nvar == codec.nvar and codec2.nchk == codec.nchk
    assert codec2.max_iters == codec.max_iters
    assert codec2.min_lut == codec.min_lut
    np.testing.assert_allclose(codec2.qb_Cha, codec.qb_Cha)
    np.testing.assert_array_equal(codec2.cha2msg_map, codec.cha2msg_map)
    np.testing.assert_array_equal(codec2.graph.dv_vec, codec.graph.dv_vec)
    # decoding behavior identical (graph + trees survived)
    rng = np.random.default_rng(0)
    sig = float(snr2sig(0.5, 2.5))
    y = 1.0 + sig * rng.standard_normal((8, codec.nvar))
    lc, lm = codec.quantize_channel(2.0 * y / sig**2)
    b1, _, i1 = make_decoder(codec)(lc, lm)
    # reloaded codec lacks pmf snapshots -> table decoder; still identical
    b2, _, i2 = make_decoder(codec2)(lc, lm)
    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    assert np.array_equal(np.asarray(i1), np.asarray(i2))


def test_codec_itfile_schema(tmp_path, codec):
    from lut_ldpc_tpu.utils.itfile import itload

    p = str(tmp_path / "c.it")
    codec.save_itfile(p)
    z = itload(p)
    for key in ("Fileversion", "nvar", "nchk", "dv_vec", "dc_vec",
                "chk_equ_idx", "cn_msg_idx", "Nq_Cha", "Nq_Msg",
                "Nq_Cha_2_Nq_Msg_map", "qb_Cha", "qb_Msg", "reuse_vec",
                "minLUT", "max_iters", "var_tree_string", "chk_tree_string"):
        assert key in z, key
    assert len(z["cn_msg_idx"]) == codec.graph.num_edges
    assert len(z["chk_equ_idx"]) == codec.nchk
    # cn_msg_idx is a permutation of the edge ids
    assert sorted(z["cn_msg_idx"].tolist()) == list(range(codec.graph.num_edges))


def test_stimuli_dump(codec):
    rng = np.random.default_rng(1)
    sig = float(snr2sig(0.5, 4.0))
    y = 1.0 + sig * rng.standard_normal(codec.nvar)
    lc, lm = codec.quantize_channel(2.0 * y / sig**2)
    buf = io.StringIO()
    bits, it = codec.decode_ref(lc, lm, verbosity=3, out=buf)
    text = buf.getvalue()
    assert "Stimuli Pair" in text
    assert "Initial VN-to-CN messages" in text
    assert "CN-to-VN messages after CN update at iteration 0" in text
    # the stimuli line holds nvar hex words of width 8
    stim_line = text.split("binary format): \n")[1].splitlines()[0]
    words = stim_line.split()
    assert len(words) == codec.nvar and all(len(w) == 8 for w in words)
    out_line = text.split("binary format): \n")[1].splitlines()[1]
    assert np.array_equal(
        np.array([int(x) for x in out_line.split()], dtype=np.uint8), bits
    )


def test_dump_stimuli_cli(tmp_path, codec):
    from lut_ldpc_tpu.cli.dump_stimuli import main

    p = str(tmp_path / "c.it")
    codec.save_itfile(p)
    out = str(tmp_path / "stim.txt")
    assert main([p, "--snr", "4.0", "--frames", "3", "--verbosity", "2",
                 "-o", out]) == 0
    text = open(out).read()
    assert text.count("Stimuli Pair") == 3
    assert "Initial VN-to-CN messages" in text


def test_decode_ref_pisc(codec):
    """pisc returns 0 iterations when the channel hard decision is already
    a codeword (all-zero at high SNR)."""
    rng = np.random.default_rng(0)
    y = 1.0 + 0.3 * rng.standard_normal(codec.nvar)  # very high SNR
    lc, lm = codec.quantize_channel(2.0 * y / 0.09)
    bits, it = codec.decode_ref(lc, lm, pisc=True)
    assert it == 0 and bits.sum() == 0
