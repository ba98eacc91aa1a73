"""IT++ .it file I/O round-trips and the analysis module."""

import numpy as np
import pytest

from lut_ldpc_tpu.sim.analysis import ber_limit_curve, c_awgn, c_biawgn
from lut_ldpc_tpu.sim.results import BERSimResults
from lut_ldpc_tpu.utils.itfile import itload, itsave


def test_itfile_roundtrip(tmp_path):
    p = str(tmp_path / "x.it")
    vars_in = {
        "dv": np.array([1.5, -2.25, 1e-9]),
        "iv": np.array([3, -7, 123456], dtype=np.int32),
        "bv": np.array([0, 1, 1, 0], dtype=np.uint8),
        "dm": np.arange(6, dtype=np.float64).reshape(2, 3),
        "im_": np.arange(6, dtype=np.int64).reshape(3, 2) + 5,
        "s": "hello world",
        "x_int": 42,
        "x_float": 3.14159,
    }
    itsave(p, vars_in)
    out = itload(p)
    np.testing.assert_allclose(out["dv"], vars_in["dv"])
    np.testing.assert_array_equal(out["iv"], vars_in["iv"])
    np.testing.assert_array_equal(out["bv"], vars_in["bv"])
    np.testing.assert_allclose(out["dm"], vars_in["dm"])
    np.testing.assert_array_equal(out["im_"], vars_in["im_"])
    assert out["s"] == "hello world"
    assert int(out["x_int"]) == 42
    assert float(out["x_float"]) == pytest.approx(3.14159)


def test_itfile_binary_layout(tmp_path):
    """Byte-level check against the documented v3 layout (itload.m)."""
    p = str(tmp_path / "y.it")
    itsave(p, {"v": np.array([1.0, 2.0])})
    raw = open(p, "rb").read()
    assert raw[:4] == b"IT++" and raw[4] == 3
    import struct

    hdr, data, block = struct.unpack("<QQQ", raw[5:29])
    assert block == hdr + data
    assert raw[29 : 29 + 2] == b"v\x00"
    assert raw[31 : 31 + 5] == b"dvec\x00"
    (n,) = struct.unpack("<Q", raw[5 + hdr : 5 + hdr + 8])
    assert n == 2


def test_results_itfile_roundtrip(tmp_path):
    r = BERSimResults(
        snr_db=np.array([1.0, 2.0]), nvar=100, nchk=50, rate=0.5,
        frames=np.array([10, 20]), data_bits=np.array([500, 1000]),
        uncoded_bits=np.array([1000, 2000]),
        frame_errors=np.array([3, 1]), data_bit_errors=np.array([17, 4]),
        uncoded_bit_errors=np.array([99, 80]),
        runtime=1.5, gitversion="abc",
    )
    p = str(tmp_path / "res.it")
    r.save_itfile(p)
    r2 = BERSimResults.load_itfile(p)
    assert r2.frames.tolist() == [10, 20]
    assert r2.data_bit_errors.tolist() == [17, 4]
    assert r2.rate == pytest.approx(0.5)
    assert r2.gitversion == "abc"
    np.testing.assert_allclose(r2.ber(), r.ber())


def test_capacity_functions():
    # BIAWGN capacity < AWGN capacity, both decreasing in sigma
    assert c_biawgn(0.5) < c_awgn(0.5)
    assert c_biawgn(0.8) > c_biawgn(1.2)
    # rate-1/2 threshold sigma ~0.979 (Shannon limit ~0.187 dB for BIAWGN)
    assert c_biawgn(0.978) == pytest.approx(0.5, abs=2e-3)


def test_ber_limit_curve():
    snr, pb = ber_limit_curve(0.5, npoints=30)
    assert len(snr) == 30
    assert (np.diff(pb[:-1]) <= 1e-12).all()  # non-increasing
    assert pb[0] > 1e-3


def test_analyze_plot(tmp_path):
    from lut_ldpc_tpu.sim.analysis import analyze_results

    r = BERSimResults(
        snr_db=np.array([1.0, 2.0]), nvar=100, nchk=50, rate=0.5,
        frames=np.array([10, 20]), data_bits=np.array([500, 1000]),
        uncoded_bits=np.array([1000, 2000]),
        frame_errors=np.array([3, 1]), data_bit_errors=np.array([17, 4]),
        uncoded_bit_errors=np.array([99, 80]),
    )
    out = str(tmp_path / "curves.png")
    merged = analyze_results([r], plot_file=out, verbose=False)
    assert len(merged) == 1
    import os

    assert os.path.getsize(out) > 1000
