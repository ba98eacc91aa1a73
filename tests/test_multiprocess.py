"""Multi-process distributed mesh: 2 CPU processes, gloo collectives.

Exercises the path the single-process suite cannot: jax.distributed
initialization, a global mesh spanning processes, psum across the process
boundary (the DCN/ICI stand-in), and per-process RNG disjointness.  The
2-process global counters must equal a single-process run on a 2-virtual-
device mesh (same mesh size -> same fold_in keys -> bit-identical MC).

Mirrors the reference's operational scale-out (one binary per seed per
host, offline counter merge: /root/reference/README.md:54,
scripts/aggregate_results.m) as one SPMD program.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # one device per process
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mp_worker.py"),
             str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    res = [json.load(open(tmp_path / f"proc{i}.json")) for i in range(2)]
    # both processes saw the same psum-reduced global counters
    assert res[0]["global_counters"] == res[1]["global_counters"]
    g = res[0]["global_counters"]
    assert g["frames"] == 32

    # per-process RNG streams are disjoint and additive under psum
    l0, l1 = res[0]["local"], res[1]["local"]
    assert l0 != l1
    assert (l0["uncoded_bit_errors"] + l1["uncoded_bit_errors"]
            == g["uncoded_bit_errors"])
    assert (l0["data_bit_errors"] + l1["data_bit_errors"]
            == g["data_bit_errors"])
    assert (l0["frame_errors"] + l1["frame_errors"] == g["frame_errors"])

    # single-process reference on a 2-virtual-device mesh: identical keys,
    # identical counters
    sys.path.insert(0, HERE)
    from util_codes import random_regular_H

    from lut_ldpc_tpu.core.tanner import TannerGraph
    from lut_ldpc_tpu.decoder import LUTCodec
    from lut_ldpc_tpu.ops.pmf import snr2sig
    from lut_ldpc_tpu.parallel import dp_mesh
    from lut_ldpc_tpu.sim.ber_sim import BERSim, BERSimConfig
    from lut_ldpc_tpu.sim.config import LDPCConfig, SimConfig

    graph = TannerGraph.from_dense(random_regular_H(96, 3, 6, seed=1))
    sig = float(snr2sig(0.5, 2.0))
    codec = LUTCodec.design(graph, sig**2, max_iters=6, Nq_Cha=16, Nq_Msg=16)
    cfg = BERSimConfig(
        sim=SimConfig(SNRdB=np.array([2.5]), Nframes=32, Nfers=10**9,
                      batch_size=16),
        ldpc=LDPCConfig(zero_codeword=True),
    )
    mesh = dp_mesh(2)
    single = BERSim(cfg, graph, codec=codec, mesh=mesh).run(
        seed=0, verbose=False
    )
    assert int(single.frames[0]) == g["frames"]
    assert int(single.frame_errors[0]) == g["frame_errors"]
    assert int(single.data_bit_errors[0]) == g["data_bit_errors"]
    assert int(single.uncoded_bit_errors[0]) == g["uncoded_bit_errors"]


def test_dp_mesh_2d_snr_by_batch():
    """2-D (snr x batch) mesh on the 8-virtual-device backend: two SNR
    rows run concurrently (4-way frame DP each); each row's psum-reduced
    counters must equal a 1-D 4-device run with the same row key."""
    sys.path.insert(0, HERE)
    from util_codes import random_regular_H

    import jax.numpy as jnp

    from lut_ldpc_tpu.core.tanner import TannerGraph
    from lut_ldpc_tpu.decoder import LUTCodec
    from lut_ldpc_tpu.ops.pmf import snr2sig
    from lut_ldpc_tpu.parallel import (
        dp_mesh,
        dp_mesh_2d,
        make_dp_step,
        make_dp_step_2d,
    )
    from lut_ldpc_tpu.sim.ber_sim import BERSim, BERSimConfig
    from lut_ldpc_tpu.sim.config import LDPCConfig, SimConfig

    graph = TannerGraph.from_dense(random_regular_H(96, 3, 6, seed=1))
    sig_d = float(snr2sig(0.5, 2.0))
    codec = LUTCodec.design(graph, sig_d**2, max_iters=6, Nq_Cha=16,
                            Nq_Msg=16)
    cfg = BERSimConfig(
        sim=SimConfig(SNRdB=np.array([2.0, 3.0]), Nframes=64, Nfers=10**9,
                      batch_size=16),
        ldpc=LDPCConfig(zero_codeword=True),
    )
    mesh2d = dp_mesh_2d(2, 8)
    assert mesh2d.devices.shape == (2, 4)
    sim = BERSim(cfg, graph, codec=codec, mesh=dp_mesh(4))
    step2d = make_dp_step_2d(sim._step_raw, mesh2d)

    key = jax.random.PRNGKey(0)
    sigmas = jnp.asarray(
        [float(snr2sig(sim.rate, s)) for s in (2.0, 3.0)], jnp.float32
    )
    out = {k: np.asarray(v)
           for k, v in step2d(key, sigmas, jnp.int32(0)).items()}
    assert out["frames"].shape == (2,)
    assert (out["frames"] == 4 * 16).all()
    # higher SNR -> fewer errors (sanity that rows really differ)
    assert out["data_bit_errors"][1] <= out["data_bit_errors"][0]

    # row r must equal a 1-D 4-device run keyed with fold_in(key, r)
    # (per-device vectors in global-batch order; sum = the row's psum)
    step1d = make_dp_step(sim._step_raw, dp_mesh(4))
    for r in range(2):
        ref = {
            k: int(np.asarray(v).sum())
            for k, v in step1d(
                jax.random.fold_in(key, r), float(sigmas[r]), jnp.int32(0)
            ).items()
        }
        for k in ("frames", "frame_errors", "data_bit_errors",
                  "uncoded_bit_errors"):
            assert ref[k] == int(out[k][r]), (r, k)