"""3-D-carry decode body: (d, n_pad, B) tensors end-to-end, QC rolls
plane-to-plane, no flat (E, B) reshapes.

Usage: python examples/profile_qc3d.py [B]
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

    spec = build_arith_prefix_spec(codec, dtype=np.int16)
    dec = ArithLUTDecoder(codec, early_exit=True, spec=spec)
    plan = dec._qc_plan
    assert plan is not None
    qc = dec._qc
    lay = dec.layout
    vb, cb = lay.vn_blocks[0], lay.cn_blocks[0]
    Z = qc.Z
    rng = np.random.default_rng(0)
    mv0 = jnp.asarray(
        rng.integers(-2000, 2000, (vb.degree, vb.n_pad, B)).astype(np.int16))
    cha = jnp.asarray(
        rng.integers(-2000, 2000, (vb.n_pad, B)).astype(np.int16))
    by_li = {(l, i): (k, j, s) for k, j, l, i, s in plan}
    by_kj = {(k, j): (l, i, s) for k, j, l, i, s in plan}
    pad_c = cb.n_pad - cb.num_nodes
    pad_v = vb.n_pad - vb.num_nodes

    def v2c(m3):
        planes = []
        for l in range(cb.degree):
            parts = []
            for i in range(qc.mb):
                k, j, s = by_li[(l, i)]
                parts.append(jnp.roll(m3[k, j * Z:(j + 1) * Z], s, axis=0))
            if pad_c:
                parts.append(jnp.zeros((pad_c, B), m3.dtype))
            planes.append(jnp.concatenate(parts, axis=0))
        return jnp.stack(planes, axis=0)

    def c2v(m3):
        planes = []
        for k in range(vb.degree):
            parts = []
            for j in range(qc.nb):
                l, i, s = by_kj[(k, j)]
                parts.append(jnp.roll(m3[l, i * Z:(i + 1) * Z], -s, axis=0))
            if pad_v:
                parts.append(jnp.zeros((pad_v, B), m3.dtype))
            planes.append(jnp.concatenate(parts, axis=0))
        return jnp.stack(planes, axis=0)

    prm0 = dec._var_xs[0]
    prm0_it = [
        {kk: vv[0] for kk, vv in op.items()} for op in prm0
    ]

    def vn(m3):
        return dec._vn_block_update(0, vb, m3, cha, prm0_it)

    def conv(m_vn3, m_cn3):
        neg = m_vn3 < 0
        agreen = jnp.all(neg == neg[:1], axis=0)
        unan = jnp.all(agreen | dec._vn_padmask[0][:, None], axis=0)
        s = jnp.sum((m_cn3 < 0).astype(jnp.int32), axis=0) & 1
        synd = jnp.all((s == 0) | dec._cn_padmask[0][:, None], axis=0)
        return neg[0].astype(jnp.uint8), unan & synd

    variants = {}

    def scan_of(body):
        def run(m):
            m, _ = jax.lax.scan(body, m, None, length=S)
            return m
        return jax.jit(run)

    def body_perm(m, _):
        mc = v2c(m)
        return c2v(mc + jnp.int16(1)), None
    variants["rolls3d+add"] = scan_of(body_perm)

    def body_cn(m, _):
        mc = v2c(m)
        mc = dec._cn_minsum_values(mc)
        return c2v(mc), None
    variants["rolls3d+CN"] = scan_of(body_cn)

    def body_cnvn(m, _):
        mc = v2c(m)
        mc = dec._cn_minsum_values(mc)
        return vn(c2v(mc)), None
    variants["rolls3d+CN+VN"] = scan_of(body_cnvn)

    def body_full(m, _):
        mc = v2c(m)
        bits, ok = conv(m, mc)
        mc = dec._cn_minsum_values(mc)
        return vn(c2v(mc)), (ok,)
    variants["full3d body"] = scan_of(body_full)

    print(f"B={B} S={S}")
    for name, fn in variants.items():
        t, _ = timeit(fn, mv0)
        print(f"{name:18s} {t*1e3/S:6.2f} ms/iter")


if __name__ == "__main__":
    main()
