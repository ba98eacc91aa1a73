"""Checkpoint/resume: an interrupted + resumed sweep must reproduce an
uninterrupted run counter-for-counter (counter-based RNG keys)."""

import json

import numpy as np
import pytest

from lut_ldpc_tpu.core.tanner import TannerGraph
from lut_ldpc_tpu.decoder import LUTCodec
from lut_ldpc_tpu.ops.pmf import snr2sig
from lut_ldpc_tpu.sim import BERSim, BERSimConfig, BERSimResults, LDPCConfig, SimConfig

from util_codes import random_regular_H


@pytest.fixture(scope="module")
def codec():
    graph = TannerGraph.from_dense(random_regular_H(96, 3, 6, seed=1))
    sig = float(snr2sig(0.5, 2.0))
    return LUTCodec.design(graph, sig**2, max_iters=5)


def _cfg():
    return BERSimConfig(
        sim=SimConfig(SNRdB=np.array([2.0, 3.0]), Nframes=192, Nfers=10**9,
                      batch_size=64),
        ldpc=LDPCConfig(zero_codeword=True),
    )


def test_checkpoint_resume(tmp_path, codec):
    ckpt = str(tmp_path / "ck.npz")
    full = BERSim(_cfg(), codec.graph, codec=codec).run(seed=5, verbose=False)

    # full run with checkpointing enabled (writes state as it goes)
    BERSim(_cfg(), codec.graph, codec=codec).run(
        seed=5, verbose=False, checkpoint_path=ckpt, checkpoint_every=1
    )
    # rewind the checkpoint to mid-run: start of SNR point 1 with point-0
    # counters intact, point-1 counters zeroed
    r = BERSimResults.load(ckpt)
    for name in ("frames", "data_bits", "uncoded_bits", "frame_errors",
                 "data_bit_errors", "uncoded_bit_errors"):
        getattr(r, name)[1] = 0
    r.save(ckpt.removesuffix(".npz"))
    with open(ckpt + ".state", "w") as f:
        json.dump({"ss": 1, "bb": 0}, f)

    resumed = BERSim(_cfg(), codec.graph, codec=codec).run(
        seed=5, verbose=False, checkpoint_path=ckpt
    )
    assert resumed.frames.tolist() == full.frames.tolist()
    assert resumed.data_bit_errors.tolist() == full.data_bit_errors.tolist()
    assert resumed.frame_errors.tolist() == full.frame_errors.tolist()


def test_checkpoint_resume_mid_point(tmp_path, codec):
    """Resume from a mid-SNR-point batch boundary."""
    ckpt = str(tmp_path / "ck2.npz")
    full = BERSim(_cfg(), codec.graph, codec=codec).run(seed=7, verbose=False)

    BERSim(_cfg(), codec.graph, codec=codec).run(
        seed=7, verbose=False, checkpoint_path=ckpt, checkpoint_every=1
    )
    # rewind to (ss=0, bb=2): keep only the first 2 batches of point 0
    probe = BERSim(_cfg(), codec.graph, codec=codec)
    import jax

    base_key = jax.random.PRNGKey(7)
    key_snr = jax.random.fold_in(base_key, 0)
    sigma = float(snr2sig(probe.rate, 2.0))
    r = BERSimResults.load(ckpt)
    for name in ("frames", "data_bits", "uncoded_bits", "frame_errors",
                 "data_bit_errors", "uncoded_bit_errors"):
        arr = getattr(r, name)
        arr[0] = 0
        arr[1] = 0
    for bb in range(2):
        c = probe._step(jax.random.fold_in(key_snr, bb), sigma)
        c = {k: int(v) for k, v in c.items()}
        r.add_counts(0, c["frames"], c["data_bits"], c["uncoded_bits"],
                     c["frame_errors"], c["data_bit_errors"],
                     c["uncoded_bit_errors"])
    r.save(ckpt.removesuffix(".npz"))
    with open(ckpt + ".state", "w") as f:
        json.dump({"ss": 0, "bb": 2}, f)

    resumed = BERSim(_cfg(), codec.graph, codec=codec).run(
        seed=7, verbose=False, checkpoint_path=ckpt
    )
    assert resumed.data_bit_errors.tolist() == full.data_bit_errors.tolist()
    assert resumed.frames.tolist() == full.frames.tolist()


def test_ensemble_str_and_tikz():
    from lut_ldpc_tpu.core.ensemble import LDPCEnsemble
    from lut_ldpc_tpu.core.trees import VARTREE, LUTTree

    ens = LDPCEnsemble(np.array([2, 3]), np.array([0.4, 0.6]),
                       np.array([6]), np.array([1.0]))
    s = str(ens)
    assert "VN degrees" in s and "CN edge pmf" in s and "0.6" in s

    t = LUTTree.from_template("riim/im/m///iim/m//im/m////c//", VARTREE)
    tikz = t.root.tikz_draw()
    assert tikz.startswith("\\tikzset{")
    assert tikz.rstrip().endswith("\\end{tikzpicture}")

    def count_nodes(n):
        return 1 + sum(count_nodes(c) for c in n.children)

    # every non-root node opens one child{...}
    assert tikz.count("child{") == count_nodes(t.root) - 1
    assert tikz.count("\\msgstring}") >= t.num_leaves - 1
