"""Correctness + speed of the fused QC Pallas kernels.

Usage: python examples/profile_qc_kernels.py [B]
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
    plan = dec._qc_plan
    assert plan is not None
    qc = dec._qc
    lay = dec.layout
    vb, cb = lay.vn_blocks[0], lay.cn_blocks[0]
    Z = qc.Z
    rng = np.random.default_rng(0)
    mv3 = jnp.asarray(
        rng.integers(-2000, 2000, (vb.degree, vb.n_pad, B)).astype(np.int16))
    cha = jnp.asarray(
        rng.integers(-2000, 2000, (vb.n_pad, B)).astype(np.int16))

    # ---------- CN correctness vs XLA reference ----------
    def cn_ref(m3):
        flat = m3.reshape(-1, B)
        mc = dec._permute_v2c(flat)
        mc3 = mc.reshape(cb.degree, cb.n_pad, B)
        out = dec._cn_minsum_values(mc3)
        s = jnp.sum((mc3 < 0).astype(jnp.int32), axis=0) & 1
        synd = jnp.all((s == 0) | dec._cn_padmask[0][:, None], axis=0)
        return out, synd

    cn_pal = jax.jit(lambda m: qk.cn_qc_pass(m, plan, Z, qc.mb, cb.n_pad))
    cn_r = jax.jit(cn_ref)
    (o_r, s_r) = cn_r(mv3)
    (o_p, s_p) = cn_pal(mv3)
    nreal = cb.num_nodes
    eq = bool(jnp.all(o_r[:, :nreal] == o_p[:, :nreal]))
    seq = bool(jnp.all(s_r == s_p))
    print(f"CN fused: values match={eq} synd match={seq}")

    # ---------- VN correctness ----------
    mc3 = jnp.asarray(
        rng.integers(-2000, 2000, (cb.degree, cb.n_pad, B)).astype(np.int16))
    struct = dec._var_struct[0]
    use_tot = struct.ops[0].operands == tuple(range(vb.degree - 1)) \
        and vb.degree >= 3
    prm0 = [{k: np.asarray(v)[0] for k, v in op.items()}
            for op in dec._var_xs[0]]
    prm0j = [{k: jnp.asarray(v) for k, v in p.items()} for p in prm0]

    def vn_ref(m3, c):
        flat = m3.reshape(-1, B)
        mv = dec._permute_c2v(flat).reshape(vb.degree, vb.n_pad, B)
        out = dec._vn_block_update(0, vb, mv, c, prm0j)
        neg = out < 0
        bits = neg[0].astype(jnp.uint8)
        agree = jnp.all(
            jnp.all(neg == neg[:1], axis=0) | dec._vn_padmask[0][:, None],
            axis=0)
        return out, bits, agree

    vn_pal = jax.jit(lambda m, c: qk.vn_qc_pass(
        m, c, plan, Z, qc.nb, vb.n_pad, struct, prm0, use_tot))
    vn_r = jax.jit(vn_ref)
    (vo_r, b_r, a_r) = vn_r(mc3, cha)
    (vo_p, b_p, a_p) = vn_pal(mc3, cha)
    nrealv = vb.num_nodes
    veq = bool(jnp.all(vo_r[:, :nrealv] == vo_p[:, :nrealv]))
    beq = bool(jnp.all(b_r[:nrealv] == b_p[:nrealv]))
    aeq = bool(jnp.all(a_r == a_p))
    print(f"VN fused: values match={veq} bits={beq} unan={aeq}")

    # ---------- in-scan speed ----------
    def scan_of(body, init):
        def run(m):
            m, _ = jax.lax.scan(body, m, None, length=S)
            return m
        return jax.jit(run), init

    def body_cn(m, _):
        o, s = qk.cn_qc_pass(m, plan, Z, qc.mb, cb.n_pad)
        # feed back via c2v rolls (XLA) to keep shapes
        mv = dec._permute_c2v(o.reshape(-1, B)).reshape(vb.degree, vb.n_pad, B)
        return mv, None

    def body_full(m, _):
        o, s = qk.cn_qc_pass(m, plan, Z, qc.mb, cb.n_pad)
        mv, bits, unan = qk.vn_qc_pass(
            o, cha, plan, Z, qc.nb, vb.n_pad, struct, prm0, use_tot)
        return mv, None

    for name, (fn, init) in {
        "CN kernel + XLA c2v": scan_of(body_cn, mv3),
        "CN + VN kernels": scan_of(body_full, mv3),
    }.items():
        t, _ = timeit(fn, init)
        print(f"{name:22s} {t*1e3/S:6.2f} ms/iter")


if __name__ == "__main__":
    main()
