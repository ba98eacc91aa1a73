"""BER waterfall comparison: 4-bit min-LUT vs float sum-product vs
normalized min-sum on the same PEG (3,6) N=1000 code.

The statistical cross-validation of SURVEY.md §4.4: the LUT decoder's
waterfall should sit within a fraction of a dB of float BP (the published
LUT-LDPC result).  Writes results npz/.it files and a plot.

  python examples/ber_waterfall.py [--frames 20000] [--out results/waterfall]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--out", default="results/waterfall")
    ap.add_argument("--snr", default="1.0:0.25:3.5")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from lut_ldpc_tpu.core.tanner import TannerGraph
    from lut_ldpc_tpu.decoder import LUTCodec
    from lut_ldpc_tpu.decoder.bp import BPDecoder
    from lut_ldpc_tpu.sim import BERSim, BERSimConfig, LDPCConfig, SimConfig
    from lut_ldpc_tpu.sim.analysis import analyze_results
    from lut_ldpc_tpu.sim.config import _parse_range

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    graph = TannerGraph.from_alist(
        os.path.join(root, "codes", "rate0.50_dv03_dc06_N1000.alist")
    )
    snr = _parse_range(args.snr)

    def cfg():
        return BERSimConfig(
            sim=SimConfig(SNRdB=snr, Nframes=args.frames, Nfers=200,
                          batch_size=args.batch, ber_min=1e-7),
            ldpc=LDPCConfig(zero_codeword=True),
        )

    os.makedirs(args.out, exist_ok=True)
    runs, labels = [], []

    print("designing 4-bit min-LUT codec (thr 0.85)...")
    codec = LUTCodec.design(graph, 0.85**2, max_iters=50, Nq_Cha=16, Nq_Msg=16)
    sim = BERSim(cfg(), graph, codec=codec)
    res = sim.run(seed=0)
    res.save(os.path.join(args.out, "lut_q4"))
    res.save_itfile(os.path.join(args.out, "lut_q4.it"))
    runs.append(res)
    labels.append("min-LUT q4 (50 it)")

    for alg, label in (("spa", "float BP (50 it)"), ("nms", "norm. min-sum (50 it)")):
        print(f"running {label}...")
        sim = BERSim(cfg(), graph, bp_decoder=BPDecoder(graph, 50, algorithm=alg))
        res = sim.run(seed=0)
        res.save(os.path.join(args.out, alg))
        runs.append(res)
        labels.append(label)

    analyze_results(runs, labels=labels,
                    plot_file=os.path.join(args.out, "waterfall.png"))
    print(f"wrote {args.out}/waterfall.png")

    # headline comparison at 2 dB
    i2 = int(np.argmin(np.abs(snr - 2.0)))
    for label, r in zip(labels, runs):
        print(f"  {label:24s} BER@2dB = {r.ber()[i2]:.3e}  FER = {r.fer()[i2]:.3e}")


if __name__ == "__main__":
    main()
