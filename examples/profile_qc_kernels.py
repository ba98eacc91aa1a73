"""Correctness + speed of the fused QC Pallas kernels (flat multi-class API).

Usage: python examples/profile_qc_kernels.py [B]
(on CPU, set LUT_LDPC_PALLAS_INTERPRET=1 to run the kernels in interpret
mode)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=3, warmup=2):
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    # force one scalar fetch: the tunneled device's block_until_ready is
    # unreliable for timing without a dependent read
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / reps, out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    S = 32
    from bench import build_codec

    codec = build_codec()
    from lut_ldpc_tpu.decoder.arith import build_arith_prefix_spec
    from lut_ldpc_tpu.decoder.arith_decoder import ArithLUTDecoder
    from lut_ldpc_tpu.decoder import qc_kernels as qk

    spec = build_arith_prefix_spec(codec, dtype=np.int16)
    dec = ArithLUTDecoder(codec, early_exit=True, spec=spec)
    qcp = dec._qcp
    assert qcp is not None
    lay = dec.layout
    Z = qcp.Z
    E_vn, E_cn = lay.num_edges_vn, lay.num_edges_cn
    nvp = lay.nvar_pad
    dt = dec._dtype_np
    geom = qk.qc_geometry(qcp, B, dt.itemsize)
    k_vn = qk.std_to_kernel_rows(qcp, geom, "vn", E_vn)
    k_cn = qk.std_to_kernel_rows(qcp, geom, "cn", E_cn)
    rng = np.random.default_rng(0)
    # random values in KERNEL halo layout with consistent halo mirrors
    def rand_kernel(rows, stride):
        m = rng.integers(-2000, 2000, (rows, B)).astype(dt)
        m3 = m.reshape(-1, stride, B)
        h = stride - Z
        if h > 0:
            m3[:, Z:] = np.concatenate([m3[:, :Z]] * (-(-h // Z)), 1)[:, :h]
        return jnp.asarray(m3.reshape(rows, B))
    mv = rand_kernel(geom.rows_vn, Z + geom.halo_vn)
    cha = jnp.asarray(rng.integers(-2000, 2000, (nvp, B)).astype(dt))

    real_cn = np.zeros(E_cn, bool)
    for blk in lay.cn_blocks:
        for l in range(blk.degree):
            st = blk.edge_start + l * blk.n_pad
            real_cn[st : st + blk.num_nodes] = True
    real_vn = np.zeros(E_vn, bool)
    for blk in lay.vn_blocks:
        for l in range(blk.degree):
            st = blk.edge_start + l * blk.n_pad
            real_vn[st : st + blk.num_nodes] = True

    # ---------- CN correctness vs XLA reference ----------
    def cn_ref(m):
        mc = dec._permute_v2c(m[:E_vn])
        outs, synds = [], None
        for bi, mb in enumerate(dec._cn_blocks_of(mc)):
            outs.append(dec._cn_minsum_values(mb).reshape(-1, B))
            s = jnp.sum((mb < 0).astype(jnp.int32), axis=0) & 1
            ok = jnp.all((s == 0) | dec._cn_padmask[bi][:, None], axis=0)
            synds = ok if synds is None else (synds & ok)
        return jnp.concatenate(outs, axis=0), synds

    cn_pal = jax.jit(lambda m: qk.cn_qc_pass(m, qcp, geom))
    mv_std = np.zeros((E_vn, B), dt)
    mv_std[k_vn >= 0] = np.asarray(mv)[k_vn[k_vn >= 0]]
    (o_r, s_r) = jax.jit(cn_ref)(jnp.asarray(mv_std))
    (o_p, s_p) = cn_pal(mv)
    o_p_std = np.zeros((E_cn, B), dt)
    o_p_std[k_cn >= 0] = np.asarray(o_p)[k_cn[k_cn >= 0]]
    eq = bool(np.all(np.asarray(o_r)[real_cn] == o_p_std[real_cn]))
    seq = bool(jnp.all(s_r == s_p))
    print(f"CN fused: values match={eq} synd match={seq}")

    # ---------- VN correctness ----------
    mc = rand_kernel(geom.rows_cn, Z + geom.halo_cn)
    mc_std = np.zeros((E_cn, B), dt)
    mc_std[k_cn >= 0] = np.asarray(mc)[k_cn[k_cn >= 0]]
    KSLOTS = ("thr", "levels", "tie_lo", "tie_hi")
    op_keys = qk.kernel_op_keys(dec._op_flags)
    prm_it = [
        [{ks: jnp.asarray(op[k])[0] for ks, k in zip(KSLOTS, keys)}
         for op, keys in zip(dec._var_xs[bi], op_keys[bi])]
        for bi in range(len(dec._var_xs))
    ]
    xs0 = [
        [{k: jnp.asarray(v)[0] for k, v in op.items()} for op in ops]
        for ops in dec._var_xs
    ]
    use_tots = [
        st.ops[0].operands == tuple(range(blk.degree - 1))
        and blk.degree >= 3 and dec._is_int
        for st, blk in zip(dec._var_struct, lay.vn_blocks)
    ]

    def vn_ref(m, c):
        mvn = dec._permute_c2v(m[:E_cn])
        outs = []
        for bi, blk in enumerate(lay.vn_blocks):
            d, n, e0 = blk.degree, blk.n_pad, blk.edge_start
            mb = mvn[e0 : e0 + n * d].reshape(d, n, B)
            cb = c[blk.node_start : blk.node_start + blk.n_pad]
            outs.append(
                dec._vn_block_update(bi, blk, mb, cb, xs0[bi]).reshape(-1, B)
            )
        return jnp.concatenate(outs, axis=0)

    vn_pal = jax.jit(lambda m, c: qk.vn_qc_pass(
        m, c, qcp, geom, nvp, dec._var_struct, prm_it, use_tots,
        dec._op_flags))
    vo_r = jax.jit(vn_ref)(jnp.asarray(mc_std), cha)
    (vo_p, b_p, a_p) = vn_pal(mc, cha)
    vo_p_std = np.zeros((E_vn, B), dt)
    vo_p_std[k_vn >= 0] = np.asarray(vo_p)[k_vn[k_vn >= 0]]
    veq = bool(np.all(np.asarray(vo_r)[real_vn] == vo_p_std[real_vn]))
    print(f"VN fused: values match={veq}")

    # ---------- in-scan speed ----------
    def body_full(m, _):
        o, s = qk.cn_qc_pass(m, qcp, geom)
        mvn, bits, unan = qk.vn_qc_pass(
            o, cha, qcp, geom, nvp, dec._var_struct, prm_it, use_tots,
            dec._op_flags)
        return mvn, None

    def run(m):
        m, _ = jax.lax.scan(body_full, m, None, length=S)
        return m[:1, :1]

    t, _ = timeit(jax.jit(run), mv)
    nbytes = (E_vn + E_cn) * B * dt.itemsize * 2
    print(f"CN + VN kernels  {t*1e3/S:6.2f} ms/iter "
          f"({nbytes/ (t/S) / 1e9:.0f} GB/s effective)")


if __name__ == "__main__":
    main()
