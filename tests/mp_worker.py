"""Worker process for the multi-process mesh test (test_multiprocess.py).

Invoked as: python mp_worker.py <process_id> <num_processes> <port> <outdir>

Each process contributes one virtual CPU device to a global 2-device mesh
(jax.distributed + gloo CPU collectives), runs the data-parallel MC step,
and writes both the psum-reduced GLOBAL counters and its UNREDUCED local
counters to <outdir>/proc<id>.json.  The parent asserts the global
counters equal a single-process 2-virtual-device run (same mesh size ->
same fold_in keys -> bit-identical frames) and that the two locals differ
(per-process RNG streams are disjoint).
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # exactly one local device per process

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert len(jax.devices()) == nproc
    assert jax.local_device_count() == 1

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np

    from util_codes import random_regular_H
    from lut_ldpc_tpu.core.tanner import TannerGraph
    from lut_ldpc_tpu.decoder import LUTCodec
    from lut_ldpc_tpu.ops.pmf import snr2sig
    from lut_ldpc_tpu.parallel import dp_mesh, make_dp_step
    from lut_ldpc_tpu.sim.ber_sim import BERSim, BERSimConfig
    from lut_ldpc_tpu.sim.config import LDPCConfig, SimConfig

    graph = TannerGraph.from_dense(random_regular_H(96, 3, 6, seed=1))
    sig = float(snr2sig(0.5, 2.0))
    codec = LUTCodec.design(graph, sig**2, max_iters=6, Nq_Cha=16, Nq_Msg=16)

    cfg = BERSimConfig(
        sim=SimConfig(SNRdB=np.array([2.5]), Nframes=nproc * 16,
                      Nfers=10**9, batch_size=16),
        ldpc=LDPCConfig(zero_codeword=True),
    )
    mesh = dp_mesh()
    assert mesh.devices.size == nproc  # global mesh spans both processes
    sim = BERSim(cfg, graph, codec=codec, mesh=mesh)
    res = sim.run(seed=0, verbose=False)

    # unreduced local counters: replicate THIS device's contribution with an
    # unmeshed simulator step under the same key derivation used by
    # make_dp_step (global-batch keying: fold_in(key_snr, gb) with device
    # pid running global batch pid of group 0); the parent asserts
    # local0 != local1 (disjoint per-batch RNG streams) and
    # local0 + local1 == global (the gather really crossed the process
    # boundary)
    sim_local = BERSim(cfg, graph, codec=codec)
    base = jax.random.PRNGKey(0)
    key_snr = jax.random.fold_in(base, 0)
    dev_key = jax.random.fold_in(key_snr, pid)
    sigma = float(snr2sig(sim.rate, 2.5))
    local = {k: int(v) for k, v in sim_local._step(dev_key, sigma).items()}

    out = dict(
        global_counters=dict(
            frames=int(res.frames[0]),
            frame_errors=int(res.frame_errors[0]),
            data_bit_errors=int(res.data_bit_errors[0]),
            uncoded_bit_errors=int(res.uncoded_bit_errors[0]),
        ),
        local=local,
        process_id=pid,
    )
    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
