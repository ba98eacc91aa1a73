"""Sim-harness tests: BP baselines, MC counters, early-exit policy, results
persistence/aggregation, INI config parsing, and data-parallel sharding on
the emulated 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from lut_ldpc_tpu.core.tanner import TannerGraph
from lut_ldpc_tpu.decoder import BPDecoder, LUTCodec
from lut_ldpc_tpu.ops.pmf import snr2sig
from lut_ldpc_tpu.sim import (
    BERSim,
    BERSimConfig,
    BERSimResults,
    LDPCConfig,
    SimConfig,
    aggregate,
    parse_ini,
)
from lut_ldpc_tpu.parallel import dp_mesh

from util_codes import random_regular_H


@pytest.fixture(scope="module")
def graph96():
    return TannerGraph.from_dense(random_regular_H(96, 3, 6, seed=1))


@pytest.fixture(scope="module")
def codec96(graph96):
    sig = float(snr2sig(0.5, 2.0))
    return LUTCodec.design(graph96, sig**2, max_iters=6, Nq_Cha=16, Nq_Msg=16)


def test_bp_decoder_corrects(graph96):
    dec = BPDecoder(graph96, max_iters=30, algorithm="spa")
    rng = np.random.default_rng(0)
    sig = float(snr2sig(0.5, 3.0))
    y = 1.0 + sig * rng.standard_normal((32, graph96.nvar))
    llr = 2.0 * y / sig**2
    bits, ok, iters = dec(llr)
    uncoded = (y < 0).mean()
    coded = np.asarray(bits).mean()
    assert coded < uncoded / 3
    assert np.asarray(ok).mean() > 0.8


@pytest.mark.parametrize("alg", ["minsum", "nms", "oms"])
def test_bp_variants_run(graph96, alg):
    dec = BPDecoder(graph96, max_iters=15, algorithm=alg)
    rng = np.random.default_rng(1)
    sig = float(snr2sig(0.5, 3.5))
    y = 1.0 + sig * rng.standard_normal((16, graph96.nvar))
    bits, ok, _ = dec(2.0 * y / sig**2)
    assert np.asarray(bits).mean() < (y < 0).mean()


def _cfg(snrs, nframes=256, batch=64, **sim_kw):
    return BERSimConfig(
        sim=SimConfig(SNRdB=np.asarray(snrs, dtype=float), Nframes=nframes,
                      Nfers=10**9, batch_size=batch, **sim_kw),
        ldpc=LDPCConfig(zero_codeword=True),
    )


def test_bersim_lut_counts(codec96):
    cfg = _cfg([2.0, 3.0])
    sim = BERSim(cfg, codec96.graph, codec=codec96)
    res = sim.run(seed=0, verbose=False)
    assert res.frames.tolist() == [256, 256]
    assert res.data_bits.tolist() == [256 * codec96.k] * 2
    # BER decreases with SNR and is below uncoded
    assert res.ber()[1] <= res.ber()[0]
    assert res.ber()[0] < res.uncoded_ber()[0]


def test_bersim_determinism(codec96):
    cfg = _cfg([2.5])
    r1 = BERSim(cfg, codec96.graph, codec=codec96).run(seed=7, verbose=False)
    r2 = BERSim(cfg, codec96.graph, codec=codec96).run(seed=7, verbose=False)
    r3 = BERSim(cfg, codec96.graph, codec=codec96).run(seed=8, verbose=False)
    assert r1.data_bit_errors.tolist() == r2.data_bit_errors.tolist()
    assert r1.data_bit_errors.tolist() != r3.data_bit_errors.tolist()


def test_bersim_skip_policy(codec96):
    # very high SNR first point -> ber under ber_min -> later points padded
    cfg = _cfg([8.0, 9.0, 10.0], nframes=128)
    cfg.sim.ber_min = 1e-2
    sim = BERSim(cfg, codec96.graph, codec=codec96)
    res = sim.run(seed=0, verbose=False)
    assert res.frames[0] > 0
    assert res.frames[1] == 0 and res.frames[2] == 0


def test_results_roundtrip_and_aggregate(tmp_path, codec96):
    cfg = _cfg([2.0], nframes=128)
    p1, p2 = str(tmp_path / "r1.npz"), str(tmp_path / "r2.npz")
    r1 = BERSim(cfg, codec96.graph, codec=codec96).run(seed=0, verbose=False)
    r2 = BERSim(cfg, codec96.graph, codec=codec96).run(seed=1, verbose=False)
    r1.save(p1)
    r2.save(p2)
    r1b = BERSimResults.load(p1)
    assert r1b.data_bit_errors.tolist() == r1.data_bit_errors.tolist()
    agg = aggregate([p1, p2])
    assert agg.frames[0] == r1.frames[0] + r2.frames[0]
    assert agg.data_bit_errors[0] == r1.data_bit_errors[0] + r2.data_bit_errors[0]


def test_bersim_nonzero_codeword():
    H = random_regular_H(96, 3, 6, seed=2)
    graph = TannerGraph.from_dense(H)
    sig = float(snr2sig(0.5, 2.0))
    codec = LUTCodec.design(graph, sig**2, max_iters=6, build_generator=True)
    cfg = _cfg([4.0], nframes=64)
    cfg.ldpc.zero_codeword = False
    sim = BERSim(cfg, codec.graph, codec=codec)
    res = sim.run(seed=0, verbose=False)
    assert res.frames[0] == 64
    assert res.ber()[0] < res.uncoded_ber()[0]


def test_bersim_dp_mesh(codec96):
    """Data-parallel over the emulated 8-device CPU mesh: counters match the
    expected totals and stay deterministic."""
    mesh = dp_mesh()
    assert mesh.devices.size == 8
    cfg = _cfg([2.5], nframes=8 * 32, batch=32)
    sim = BERSim(cfg, codec96.graph, codec=codec96, mesh=mesh)
    res = sim.run(seed=0, verbose=False)
    assert res.frames[0] == 8 * 32
    r2 = BERSim(cfg, codec96.graph, codec=codec96, mesh=mesh).run(seed=0, verbose=False)
    assert res.data_bit_errors.tolist() == r2.data_bit_errors.tolist()
    assert 0 < res.ber()[0] < res.uncoded_ber()[0]


def test_parse_ini_reference_example(tmp_path):
    ini = tmp_path / "ber.ini"
    ini.write_text(
        """
[Sim]
SNRdB = 0:.5:2
Nframes = 100
Nfers = 20
results_prefix = RES
rand_seed_offset = 3

[LDPC]
parity_filename = rate0.50_dv03_dc06_N1000
zero_codeword = 1

[LUT]
max_iter = 8
design_thr = 0.88
qbits_channel = 4
qbits_message_uniform = 4
min_lut = 1
tree_mode = auto_bin_balanced
"""
    )
    cfg = parse_ini(str(ini))
    assert cfg.codec_type == "LUT"
    assert np.allclose(cfg.sim.SNRdB, [0, 0.5, 1.0, 1.5, 2.0])
    assert cfg.sim.Nframes == 100 and cfg.sim.rand_seed_offset == 3
    assert cfg.lut.design_thr == 0.88 and cfg.lut.qbits_channel == 4
    assert cfg.ldpc.parity_filename == "rate0.50_dv03_dc06_N1000"


def test_parse_ini_bp(tmp_path):
    ini = tmp_path / "bp.ini"
    ini.write_text("[Sim]\nSNRdB = 1 2 3\n\n[BP]\nmax_iter = 30\nalgorithm = nms\n")
    cfg = parse_ini(str(ini))
    assert cfg.codec_type == "BP"
    assert cfg.bp.max_iter == 30 and cfg.bp.algorithm == "nms"


def test_bp_qllr_decoder(graph96):
    """Fixed-point QLLR BP corrects errors; coarse precision degrades
    gracefully toward min-sum-like behavior."""
    from lut_ldpc_tpu.decoder.bp import BPDecoder

    rng = np.random.default_rng(3)
    sig = float(snr2sig(0.5, 3.0))
    y = 1.0 + sig * rng.standard_normal((32, graph96.nvar))
    llr = 2.0 * y / sig**2
    dec = BPDecoder(graph96, max_iters=30, algorithm="qllr")
    bits, ok, _ = dec(llr)
    uncoded = (y < 0).mean()
    assert np.asarray(bits).mean() < uncoded / 3
    assert np.asarray(ok).mean() > 0.8
    # fine-precision QLLR ~ float SPA performance on the same noise
    ref = BPDecoder(graph96, max_iters=30, algorithm="spa")
    bref, _, _ = ref(llr)
    assert abs(float(np.asarray(bits).mean()) - float(np.asarray(bref).mean())) < 0.01
    # table_size=0 -> quantized min-sum still works
    dec_ms = BPDecoder(graph96, max_iters=30, algorithm="qllr", qllr_table_size=0)
    bits_ms, _, _ = dec_ms(llr)
    assert np.asarray(bits_ms).mean() < uncoded


def test_bp_config_mapping(graph96):
    from lut_ldpc_tpu.decoder.bp import make_bp_decoder
    from lut_ldpc_tpu.sim.config import BPConfig

    dec = make_bp_decoder(graph96, BPConfig(max_iter=12, qllr_total_bits=16,
                                            qllr_frac_bits=8))
    assert dec.algorithm == "qllr" and dec.max_iters == 12
    assert dec.q_max == (1 << 15) - 1


def test_qbits_messages_ini(tmp_path, graph96):
    """LUT.qbits_messages (LDPC_BER_Sim.cpp:398): per-iteration message
    resolutions flow from the INI through design into the codec."""
    from lut_ldpc_tpu.core.alist import write_alist
    from lut_ldpc_tpu.sim.ber_sim import run_from_config

    (tmp_path / "codes").mkdir()
    write_alist(str(tmp_path / "codes" / "c96.alist"), graph96.to_dense())
    ini = tmp_path / "ber.ini"
    ini.write_text(
        """
[Sim]
SNRdB = 3
Nframes = 16
Nfers = 1000
batch_size = 16

[LDPC]
parity_filename = c96

[LUT]
max_iter = 4
design_thr = 0.88
qbits_channel = 4
qbits_messages = 4 4 3 3
"""
    )
    cfg = parse_ini(str(ini))
    assert cfg.lut.qbits_messages == "4 4 3 3"
    res, sim = run_from_config(cfg, codes_root=str(tmp_path), verbose=False)
    assert list(sim.codec.Nq_Msg) == [16, 16, 8, 8]
    # wrong length is a config error
    cfg.lut.qbits_messages = "4 4"
    with pytest.raises(ValueError):
        run_from_config(cfg, codes_root=str(tmp_path), verbose=False)
