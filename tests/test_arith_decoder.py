"""The arithmetic value-domain decoder must be bit-identical to the
table-based decoders (which are themselves validated against the scalar
golden model)."""

import numpy as np
import pytest

from lut_ldpc_tpu.core.tanner import TannerGraph
from lut_ldpc_tpu.decoder import (
    ArithLUTDecoder,
    FastLUTDecoder,
    LUTCodec,
    build_arith_spec,
    make_decoder,
)
from lut_ldpc_tpu.decoder.arith import nudged_llr
from lut_ldpc_tpu.ops.pmf import snr2sig

from util_codes import random_regular_H


@pytest.fixture(scope="module")
def codec_reg():
    graph = TannerGraph.from_dense(random_regular_H(96, 3, 6, seed=3))
    sig = float(snr2sig(0.5, 2.0))
    return LUTCodec.design(graph, sig**2, max_iters=6)


def _llrs(codec, B, seed, snr=2.5):
    rng = np.random.default_rng(seed)
    sig = float(snr2sig(codec.rate(), snr))
    y = 1.0 + sig * rng.standard_normal((B, codec.nvar))
    return codec.quantize_channel(2.0 * y / sig**2)


def test_nudged_llr_properties():
    p = np.array([0.05, 0.1, 0.15, 0.2, 0.2, 0.15, 0.1, 0.05])
    v = nudged_llr(p)
    assert np.array_equal(v, -v[::-1])
    p2 = np.array([0.4, 0.0, 0.0, 0.1, 0.1, 0.0, 0.0, 0.4])
    v2 = nudged_llr(p2)
    assert np.all(np.isfinite(v2))
    assert np.array_equal(v2, -v2[::-1])
    assert np.all(v2[:4] < 0) and np.all(v2[4:] > 0)


def test_spec_builds(codec_reg):
    spec = build_arith_spec(codec_reg)
    assert len(spec.var_trees) == codec_reg.max_iters - 1
    assert len(spec.dec_trees) == 1
    # every var op reproduces its LUT by construction (validated in builder)


@pytest.mark.parametrize("early_exit", [True, False])
def test_arith_matches_fast(codec_reg, early_exit):
    llr_cha, llr_msg = _llrs(codec_reg, 48, 0)
    b1, ok1, it1 = FastLUTDecoder(codec_reg, early_exit=early_exit)(llr_cha, llr_msg)
    b2, ok2, it2 = ArithLUTDecoder(codec_reg, early_exit=early_exit)(llr_cha, llr_msg)
    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    assert np.array_equal(np.asarray(ok1), np.asarray(ok2))
    if early_exit:
        assert np.array_equal(np.asarray(it1), np.asarray(it2))


@pytest.mark.parametrize("snr", [1.0, 2.0, 3.5, 6.0])
def test_arith_matches_fast_across_snr(codec_reg, snr):
    llr_cha, llr_msg = _llrs(codec_reg, 32, 11, snr=snr)
    b1, _, it1 = FastLUTDecoder(codec_reg)(llr_cha, llr_msg)
    b2, _, it2 = ArithLUTDecoder(codec_reg)(llr_cha, llr_msg)
    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    assert np.array_equal(np.asarray(it1), np.asarray(it2))


def test_arith_irregular():
    rng = np.random.default_rng(7)
    nvar, nchk = 60, 30
    while True:
        H = np.zeros((nchk, nvar), dtype=np.uint8)
        for v in range(nvar):
            dv = 2 if v < nvar // 2 else 3
            H[rng.choice(nchk, dv, replace=False), v] = 1
        if H.sum(axis=1).min() >= 2:
            break
    graph = TannerGraph.from_dense(H)
    sig = float(snr2sig(0.5, 3.0))
    codec = LUTCodec.design(graph, sig**2, max_iters=5)
    llr_cha, llr_msg = _llrs(codec, 32, 2, snr=4.0)
    b1, _, it1 = FastLUTDecoder(codec)(llr_cha, llr_msg)
    b2, _, it2 = ArithLUTDecoder(codec)(llr_cha, llr_msg)
    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    assert np.array_equal(np.asarray(it1), np.asarray(it2))


def test_make_decoder_prefers_arith(codec_reg):
    assert isinstance(make_decoder(codec_reg), ArithLUTDecoder)


def test_arith_roundtrip_artifact(tmp_path, codec_reg):
    """Design pmf snapshots survive save/load; decoders agree afterwards."""
    p = str(tmp_path / "c.npz")
    codec_reg.save(p)
    codec2 = LUTCodec.load(p)
    assert codec2.pmf_cha_design is not None
    llr_cha, llr_msg = _llrs(codec_reg, 16, 5)
    b1, _, _ = ArithLUTDecoder(codec_reg)(llr_cha, llr_msg)
    b2, _, _ = ArithLUTDecoder(codec2)(llr_cha, llr_msg)
    assert np.array_equal(np.asarray(b1), np.asarray(b2))


def test_int16_matches_float32(codec_reg):
    """The scaled-integer representation is bit-identical when it builds."""
    spec16 = build_arith_spec(codec_reg, dtype=np.int16)
    spec32 = build_arith_spec(codec_reg, dtype=np.float32)
    assert spec16.dtype == np.int16
    d16 = ArithLUTDecoder(codec_reg, spec=spec16)
    d32 = ArithLUTDecoder(codec_reg, spec=spec32)
    for snr in (1.0, 2.5, 5.0):
        llr_cha, llr_msg = _llrs(codec_reg, 32, 7, snr=snr)
        b1, ok1, i1 = d16(llr_cha, llr_msg)
        b2, ok2, i2 = d32(llr_cha, llr_msg)
        assert np.array_equal(np.asarray(b1), np.asarray(b2))
        assert np.array_equal(np.asarray(i1), np.asarray(i2))
        assert np.array_equal(np.asarray(ok1), np.asarray(ok2))


def test_int16_matches_table_decoder(codec_reg):
    spec16 = build_arith_spec(codec_reg, dtype=np.int16)
    d16 = ArithLUTDecoder(codec_reg, spec=spec16)
    full = FastLUTDecoder(codec_reg)
    llr_cha, llr_msg = _llrs(codec_reg, 48, 9, snr=2.0)
    b1, _, i1 = d16(llr_cha, llr_msg)
    b2, _, i2 = full(llr_cha, llr_msg)
    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    assert np.array_equal(np.asarray(i1), np.asarray(i2))


def test_sym_factorization_validates(codec_reg):
    """The symmetric sign x magnitude emission (ArithOpSpec.sym_thr) must
    validate on ordinary designed codecs — it is the fast kernel path, so
    a silent universal fallback would be a large perf regression.  (The
    factorization itself is validated exhaustively over reachable sums at
    build time; end-to-end correctness is pinned by the bit-identicality
    suites in this file.)"""
    for dtype in (np.float32, np.int16):
        spec = build_arith_spec(codec_reg, dtype=dtype)
        tot = sym = 0
        for row in spec.var_trees:
            for tree in row:
                for op in tree.ops:
                    tot += 1
                    if op.sym_thr is None:
                        continue
                    sym += 1
                    K = len(op.levels)
                    assert op.sym_thr.shape == (K // 2 - 1,)
                    assert np.array_equal(op.sym_levels, op.levels[K // 2:])
                    assert np.array_equal(
                        op.sym_thr, op.thresholds[K // 2:])
        assert sym >= tot // 2, f"sym validated on only {sym}/{tot} ops"


def test_funnel_bit_identical(codec_reg, monkeypatch):
    """Survivor compaction (the funnel) must not change any output: decode
    a batch with compaction forced at tiny widths and with it disabled;
    bits/ok/iters must match exactly (also vs the table decoder)."""
    spec = build_arith_spec(codec_reg, dtype=np.int16)
    llr_cha, llr_msg = _llrs(codec_reg, 64, 11, snr=2.0)

    monkeypatch.setenv("LUT_FUNNEL", "off")
    d_off = ArithLUTDecoder(codec_reg, early_exit=True, spec=spec)
    b0, ok0, i0 = [np.asarray(a) for a in d_off(llr_cha, llr_msg)]

    monkeypatch.setenv("LUT_FUNNEL", "2,4,8")
    monkeypatch.setenv("LUT_FUNNEL_MIN", "8")
    d_fun = ArithLUTDecoder(codec_reg, early_exit=True, spec=spec)
    assert d_fun._funnel_widths(64) == [64, 32, 16, 8]
    b1, ok1, i1 = [np.asarray(a) for a in d_fun(llr_cha, llr_msg)]

    assert np.array_equal(b0, b1)
    assert np.array_equal(ok0, ok1)
    assert np.array_equal(i0, i1)

    full = FastLUTDecoder(codec_reg, early_exit=True)
    b2, ok2, i2 = [np.asarray(a) for a in full(llr_cha, llr_msg)]
    assert np.array_equal(b1, b2)
    assert np.array_equal(i1, i2)
