"""Generate the repo's data assets with the framework's own tools.

Creates ensembles/ (degree distributions), codes/ (PEG-constructed alist
parity matrices) and params/ (example INI configs) — the same asset
categories the reference ships, produced here by our ensemble writer and
native PEG generator rather than copied.

Run from the repo root:  python examples/make_assets.py [--big]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lut_ldpc_tpu.core.alist import write_alist
from lut_ldpc_tpu.core.ensemble import LDPCEnsemble
from lut_ldpc_tpu.core.peg import peg_code_from_ensemble


def graph_to_H(graph):
    return graph.to_dense()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true",
                    help="also build the N=10000 code (slower)")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ens_dir = os.path.join(root, "ensembles")
    codes_dir = os.path.join(root, "codes")
    os.makedirs(ens_dir, exist_ok=True)
    os.makedirs(codes_dir, exist_ok=True)

    # --- ensembles ---------------------------------------------------------
    # regular (3,6), rate 1/2
    ens36 = LDPCEnsemble(np.array([3]), np.array([1.0]),
                         np.array([6]), np.array([1.0]))
    ens36.write(os.path.join(ens_dir, "rate0.50_dv03_dc06.ens"))

    # LUT-optimized irregular rate-1/2 ensemble, dv {2,3,9,17} / dc {8,9}:
    # the published degree distribution of the 4-bit min-LUT design point
    # (Meidlinger & Matz; the reference's worked example, DE threshold
    # sigma* = 0.929193)
    ens_irr = LDPCEnsemble(
        np.array([2, 3, 9, 17]),
        np.array([0.138045, 0.401038, 0.026586, 0.434331]),
        np.array([8, 9]),
        np.array([0.323376, 0.676624]),
    )
    ens_irr.write(os.path.join(ens_dir, "rate0.50_dv02-17_dc08-09_lut_q4.ens"))

    # 10GBase-T style regular (6,32), rate ~0.84
    ens1032 = LDPCEnsemble(np.array([6]), np.array([1.0]),
                           np.array([32]), np.array([1.0]))
    ens1032.write(os.path.join(ens_dir, "rate0.84_dv06_dc32.ens"))

    # --- PEG codes ---------------------------------------------------------
    jobs = [
        (ens36, 500, 1000, "rate0.50_dv03_dc06_N1000.alist"),
        (ens_irr, 250, 500, "rate0.50_dv02-17_dc08-09_lut_q4_N500.alist"),
    ]
    if args.big:
        jobs.append((ens36, 5000, 10000, "rate0.50_dv03_dc06_N10000.alist"))
    for ens, M, N, name in jobs:
        print(f"PEG: {name} ...", flush=True)
        graph, lg = peg_code_from_ensemble(ens, M, N, seed=20260817)
        write_alist(os.path.join(codes_dir, name), graph_to_H(graph))
        finite = lg[lg > 0]
        print(f"  N={N} M={M} edges={graph.num_edges} "
              f"girth={'inf' if not len(finite) else int(finite.min())}")

    print("Assets written to ensembles/ and codes/")


if __name__ == "__main__":
    main()
