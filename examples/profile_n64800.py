"""Isolate CN/VN kernel cost on the N=64800 irregular QC codec.

  python examples/profile_n64800.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / reps, out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    S = 8

    from lut_ldpc_tpu.core.qc import load_qc, qc_expand
    from lut_ldpc_tpu.decoder import LUTCodec
    from lut_ldpc_tpu.decoder.arith import build_arith_prefix_spec, ArithBuildError
    from lut_ldpc_tpu.decoder.arith_decoder import ArithLUTDecoder
    from lut_ldpc_tpu.decoder import qc_kernels as qk

    graph = qc_expand(load_qc(os.path.join(
        ROOT, "codes", "rate0.50_dv02-17_dc08-09_N64800_qc.qc.json")))
    codec = LUTCodec.design(graph, 0.90**2, max_iters=50, Nq_Cha=16,
                            Nq_Msg=16)
    for dt in (np.int16, np.float32):
        try:
            sp = build_arith_prefix_spec(codec, dtype=dt)
            print(f"prefix spec {np.dtype(dt).name}: {sp.num_iters}/50 iters")
        except ArithBuildError as e:
            print(f"prefix spec {np.dtype(dt).name}: FAIL {e}")

    spec = build_arith_prefix_spec(codec, dtype=np.float32)
    dec = ArithLUTDecoder(codec, early_exit=True, spec=spec)
    qcp = dec._qcp
    lay = dec.layout
    Z = qcp.Z
    E_vn, E_cn = lay.num_edges_vn, lay.num_edges_cn
    nvp = lay.nvar_pad
    dt = dec._dtype_np
    geom = qk.qc_geometry(qcp, B, dt.itemsize)
    print(f"dtype {dt}, Z={Z}, E_vn={E_vn}, E_cn={E_cn}, "
          f"vn blocks={len(lay.vn_blocks)} cn blocks={len(lay.cn_blocks)}")
    print(f"geom: {geom}")
    rng = np.random.default_rng(0)
    mv = jnp.asarray(rng.integers(-2000, 2000, (geom.rows_vn, B)).astype(dt))
    mc = jnp.asarray(rng.integers(-2000, 2000, (geom.rows_cn, B)).astype(dt))
    cha = jnp.asarray(rng.integers(-2000, 2000, (nvp, B)).astype(dt))

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

    def run_cn(m):
        # isolated pass: thread one element back to order the scan steps
        def body(m2, _):
            o, s = qk.cn_qc_pass(m2, qcp, geom)
            return m2.at[0, :1].set(o[0, :1]), None
        m2, _ = jax.lax.scan(body, m, None, length=S)
        return m2[:1, :1]

    def run_vn(m):
        def body(m2, _):
            o, bits, unan = qk.vn_qc_pass(
                m2, cha, qcp, geom, nvp, dec._var_struct, prm_it, use_tots,
                dec._op_flags)
            return m2.at[0, :1].set(o[0, :1]), None
        m2, _ = jax.lax.scan(body, m, None, length=S)
        return m2[:1, :1]

    def run_both(m):
        def body(m2, _):
            o, s = qk.cn_qc_pass(m2, qcp, geom)
            mvn, bits, unan = qk.vn_qc_pass(
                o, cha, qcp, geom, nvp, dec._var_struct, prm_it, use_tots,
                dec._op_flags)
            return mvn, None
        m2, _ = jax.lax.scan(body, m, None, length=S)
        return m2[:1, :1]

    gbps = lambda t, npass: (E_vn + E_cn) / 2 * B * dt.itemsize * npass / t / 1e9
    t, _ = timeit(jax.jit(run_cn), mv)
    print(f"CN pass {t*1e3/S:7.2f} ms/iter ({gbps(t/S, 2):.0f} GB/s)")
    t, _ = timeit(jax.jit(run_vn), mc)
    print(f"VN pass {t*1e3/S:7.2f} ms/iter ({gbps(t/S, 2):.0f} GB/s)")
    t, _ = timeit(jax.jit(run_both), mv)
    print(f"CN+VN   {t*1e3/S:7.2f} ms/iter ({gbps(t/S, 4):.0f} GB/s)")


if __name__ == "__main__":
    main()
