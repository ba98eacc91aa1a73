"""Per-kernel performance regression ledger.

Round 3 shipped a silent 4% headline decay plus a 2.2x compile-time
regression because nobody compared kernel timings across rounds.  This
tool makes the comparison mechanical:

  python tools/perf_regress.py record   # measure + append to the ledger
  python tools/perf_regress.py check    # compare HEAD vs last record

The ledger (docs/perf/kernels.json) stores one entry per invocation:
git rev, per-config fused kernel ms/iter, headline decode ms, compile
seconds.  ``check`` exits non-zero when any tracked metric decays more
than --tol (default 5%) against the best of the last 3 records, so a
regression fails loudly in CI / the next round's first bench run.

Metrics (all on the real chip; this tool is a no-op off-TPU):
  n10000_fused_ms    — (3,6) N=10000 q4 fused CN+VN Pallas ms/iter, B=8192
  n64800_fused_ms    — irregular dv02-17 N=64800 fused ms/iter, B=1024
  headline_decode_ms — bench.py end-to-end decode ms at B=8192
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(ROOT, "docs", "perf", "kernels.json")
sys.path.insert(0, ROOT)


def _gitrev() -> str:
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"], cwd=ROOT
        ).decode().strip()
    except Exception:
        return "unknown"


def _on_tpu() -> bool:
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _timeit(fn, *args, reps=3, warmup=2):
    """Min over reps: rejects host-side interference (the tunneled chip
    shares the host with whatever else runs; a mean under load flagged a
    33% phantom regression on an unchanged revision)."""
    import jax
    import numpy as np

    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        # one dependent SCALAR fetch (slice on device first: np.asarray
        # of a full output leaf would drag the whole tensor through the
        # tunnel and time the transfer, not the decode)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best


def _fused_ms(graph, design_thr, B, iters=50, scan_len=16):
    """Fused CN+VN Pallas ms/iter on `graph` (same harness as
    examples/profile_qc_kernels.py)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lut_ldpc_tpu.decoder import LUTCodec
    from lut_ldpc_tpu.decoder.arith import build_arith_prefix_spec, ArithBuildError
    from lut_ldpc_tpu.decoder.arith_decoder import ArithLUTDecoder
    from lut_ldpc_tpu.decoder import qc_kernels as qk

    codec = LUTCodec.design(graph, design_thr**2, max_iters=iters,
                            Nq_Cha=16, Nq_Msg=16)
    try:
        spec = build_arith_prefix_spec(codec, dtype=np.int16)
    except ArithBuildError:
        spec = build_arith_prefix_spec(codec, dtype=np.float32)
    dec = ArithLUTDecoder(codec, early_exit=True, spec=spec)
    qcp, lay = dec._qcp, dec.layout
    dt = dec._dtype_np
    geom = qk.qc_geometry(qcp, B, dt.itemsize)
    rng = np.random.default_rng(0)
    mv = jnp.asarray(rng.integers(-2000, 2000, (geom.rows_vn, B)).astype(dt))
    cha = jnp.asarray(
        rng.integers(-2000, 2000, (lay.nvar_pad, B)).astype(dt))
    KSLOTS = ("thr", "levels", "tie_lo", "tie_hi")
    op_keys = qk.kernel_op_keys(dec._op_flags)
    prm_it = [
        [{ks: jnp.asarray(op[k])[0] for ks, k in zip(KSLOTS, keys)}
         for op, keys in zip(dec._var_xs[bi], op_keys[bi])]
        for bi in range(len(dec._var_xs))
    ]
    use_tots = [
        st.ops[0].operands == tuple(range(blk.degree - 1))
        and blk.degree >= 3 and dec._is_int
        for st, blk in zip(dec._var_struct, lay.vn_blocks)
    ]

    def body(m, _):
        o, s = qk.cn_qc_pass(m, qcp, geom)
        mvn, bits, unan = qk.vn_qc_pass(
            o, cha, qcp, geom, lay.nvar_pad, dec._var_struct, prm_it,
            use_tots, dec._op_flags)
        return mvn, None

    def run(m):
        m, _ = jax.lax.scan(body, m, None, length=scan_len)
        return m[:1, :1]

    t = _timeit(jax.jit(run), mv)
    return t * 1e3 / scan_len


def record() -> dict:
    from lut_ldpc_tpu.core.qc import load_qc, qc_expand

    entry = {"rev": _gitrev(), "ts": time.time()}

    g1 = qc_expand(load_qc(os.path.join(
        ROOT, "codes", "rate0.50_dv03_dc06_N10000_qc.qc.json")))
    entry["n10000_fused_ms"] = round(_fused_ms(g1, 0.85, B=8192), 3)

    g2 = qc_expand(load_qc(os.path.join(
        ROOT, "codes", "rate0.50_dv02-17_dc08-09_N64800_qc.qc.json")))
    entry["n64800_fused_ms"] = round(
        _fused_ms(g2, 0.90, B=1024, scan_len=8), 3)

    # headline end-to-end decode (post-compile), same inputs as bench.py
    import numpy as np
    import jax
    import jax.numpy as jnp

    from bench import build_codec
    from lut_ldpc_tpu.decoder import make_staged_decoder
    from lut_ldpc_tpu.ops.pmf import snr2sig

    codec = build_codec()
    dec = make_staged_decoder(codec, early_exit=True)
    sig = float(snr2sig(0.5, 2.0))
    rng = np.random.default_rng(0)
    y = 1.0 + sig * rng.standard_normal((8192, codec.nvar))
    llr = 2.0 * y / sig**2
    llr_cha, llr_msg = codec.quantize_channel(llr)
    llr_cha = jnp.asarray(llr_cha, jnp.int8)
    llr_msg = jnp.asarray(llr_msg, jnp.int8)
    t0 = time.perf_counter()
    jax.block_until_ready(dec(llr_cha, llr_msg))
    jax.block_until_ready(dec(llr_cha, llr_msg))
    entry["compile_s"] = round(time.perf_counter() - t0, 1)
    entry["headline_decode_ms"] = round(
        _timeit(lambda a, b: dec(a, b), llr_cha, llr_msg, reps=5) * 1e3, 1)

    # end-to-end decode at DVB-S2 scale: the standard ETSI matrix in its
    # QC factorization (fused kernels) and the unstructured PEG alist
    # (STD-layout kernels around XLA gathers); B=1024, SNR 1.6 dB inputs
    # give a deterministic ~full-budget decode on both
    from lut_ldpc_tpu.core.dvbs2 import load_periodic_alist
    from lut_ldpc_tpu.core.tanner import TannerGraph
    from lut_ldpc_tpu.decoder import LUTCodec
    from lut_ldpc_tpu.decoder.arith_decoder import ArithLUTDecoder

    def e2e(graph):
        codec = LUTCodec.design(graph, 0.90 ** 2, max_iters=50,
                                Nq_Cha=16, Nq_Msg=16)
        d = ArithLUTDecoder(codec, early_exit=True)
        sg = float(snr2sig(0.5, 1.6))
        yy = 1.0 + sg * rng.standard_normal((1024, codec.nvar))
        lc, lm = codec.quantize_channel(2.0 * yy / sg ** 2)
        lc = jnp.asarray(lc, jnp.int8)
        lm = jnp.asarray(lm, jnp.int8)
        return round(_timeit(lambda a, b: d(a, b), lc, lm) * 1e3, 1)

    gq, _, _ = load_periodic_alist(
        "/root/reference/codes/rate0.50_irreg_dvbs2_N64800.alist")
    entry["dvbs2_decode_ms"] = e2e(gq)
    entry["peg_decode_ms"] = e2e(TannerGraph.from_alist(os.path.join(
        ROOT, "codes", "rate0.50_dv02-17_dc08-09_lut_q4_N64800.alist")))
    return entry


# compile_s carries a looser implicit tolerance via COMPILE_TOL (compile
# time is noisier than steady-state kernel timing but a 2x jump is
# exactly the r02->r03 regression this tool exists to catch)
# GATED metrics: the end-to-end decodes are stable run-to-run (±9%
# measured same-session).  The isolated kernel scans (n*_fused_ms) stay
# in the records for reference but are NOT gated: their scan-dependency
# hack copies the full halo state every step, so they time copy
# bandwidth as much as the kernels and drift ±15% while the e2e decodes
# of the very same kernels hold still.
METRICS = ("headline_decode_ms", "dvbs2_decode_ms", "peg_decode_ms",
           "compile_s")
# compile time depends on the remote compile cache's state (warm 8.9 s /
# cold 19 s observed same-day, same rev) — gate only on >2x growth, which
# still catches the r02->r03 2.2x regression this tool was built for
COMPILE_TOL = 1.0


def check(tol: float) -> int:
    if not os.path.exists(LEDGER):
        print("perf_regress: no ledger yet — run `record` first")
        return 1
    hist = json.load(open(LEDGER))
    if len(hist) < 2:
        print("perf_regress: single record, nothing to compare")
        return 0
    cur, prev = hist[-1], hist[-4:-1]
    rc = 0
    import statistics

    for m in METRICS:
        vals = [p[m] for p in prev if m in p]
        now = cur.get(m)
        if not vals:
            print(f"{m:22s} no prior records — skipped")
            continue
        # compile: best-of-prior is always the warmest-cache outlier;
        # compare against the median so a single warm run cannot make
        # every later cold compile look like a regression
        best = statistics.median(vals) if m == "compile_s" else min(vals)
        if now is None:
            continue
        m_tol = COMPILE_TOL if m == "compile_s" else tol
        decay = now / best - 1.0
        flag = "REGRESSION" if decay > m_tol else "ok"
        if decay > m_tol:
            rc = 1
        print(f"{m:22s} {now:9.3f} vs best-of-3 {best:9.3f} "
              f"({decay:+.1%}) {flag}")
    return rc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["record", "check"])
    ap.add_argument("--tol", type=float, default=0.12,
                    help="decay tolerance; the tunneled chip shows ~10%% "
                         "session-to-session variance on the kernel scans "
                         "(compile_s doubles run to run), so the default "
                         "brackets the environment noise floor")
    args = ap.parse_args()
    if args.mode == "record":
        if not _on_tpu():
            print("perf_regress: no TPU — refusing to record misleading "
                  "CPU timings")
            return 1
        entry = record()
        os.makedirs(os.path.dirname(LEDGER), exist_ok=True)
        hist = json.load(open(LEDGER)) if os.path.exists(LEDGER) else []
        hist.append(entry)
        json.dump(hist, open(LEDGER, "w"), indent=1)
        print(json.dumps(entry))
        return 0
    return check(args.tol)


if __name__ == "__main__":
    sys.exit(main())
