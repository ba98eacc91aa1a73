"""Apportion per-iteration decode cost via 32-step scans of partial bodies.

Each variant runs the same lax.scan skeleton with pieces of the iteration
body disabled, so one device dispatch covers 32 iterations and the tunnel
round-trip amortizes away.  Differences between variants estimate the cost
of each component at the bench shapes.

Usage: python examples/profile_scan.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5, warmup=2):
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
    lay = dec.layout
    E = dec.layout.num_edges_vn
    rng = np.random.default_rng(0)
    m0 = jnp.asarray(rng.integers(-2000, 2000, size=(E, B)).astype(np.int16))
    cha = jnp.asarray(
        rng.integers(-2000, 2000, size=(dec.layout.nvar_pad, B)).astype(np.int16))
    cha_blocks = [
        cha[blk.node_start : blk.node_start + blk.n_pad]
        for blk in lay.vn_blocks
    ]
    xs = dict(it=jnp.arange(S, dtype=jnp.int32), var=dec._var_xs)

    def cn_pass(m_cn):
        outs = []
        for m in dec._cn_blocks_of(m_cn):
            outs.append(dec._cn_minsum_values(m).reshape(-1, B))
        return jnp.concatenate(outs, axis=0)

    def vn_pass(m_new, x):
        outs = []
        for bi, blk in enumerate(lay.vn_blocks):
            d, n, e0 = blk.degree, blk.n_pad, blk.edge_start
            m = m_new[e0 : e0 + n * d].reshape(d, n, B)
            out = dec._vn_block_update(bi, blk, m, cha_blocks[bi], x["var"][bi])
            outs.append(out.reshape(-1, B))
        return jnp.concatenate(outs, axis=0)

    def conv_check(m_vn, m_cn):
        bits, unan = [], None
        for m in dec._vn_blocks_of(m_vn):
            neg = m < 0
            agree = jnp.all(neg == neg[:1], axis=(0, 1))
            unan = agree if unan is None else (unan & agree)
            bits.append(neg[0].astype(jnp.uint8))
        bits = jnp.concatenate(bits, axis=0)
        synd = None
        for m in dec._cn_blocks_of(m_cn):
            s = jnp.sum((m < 0).astype(jnp.int32), axis=0) & 1
            ok = jnp.all(s == 0, axis=0)
            synd = ok if synd is None else (synd & ok)
        return bits, unan & synd

    variants = {}

    def scan_of(body):
        def run(m):
            (m, _), _ = jax.lax.scan(body, (m, jnp.zeros((B,), bool)), xs)
            return m
        return jax.jit(run)

    # gathers only (plus a trivial op to defeat DCE of the permute pair)
    def body_g(c, x):
        m, d = c
        mc = dec._permute_v2c(m)
        mn = dec._permute_c2v(mc)
        return (mn, d), None
    variants["gathers only"] = scan_of(body_g)

    def body_gc(c, x):
        m, d = c
        mc = dec._permute_v2c(m)
        mc = cn_pass(mc)
        mn = dec._permute_c2v(mc)
        return (mn, d), None
    variants["gathers+CN"] = scan_of(body_gc)

    def body_gcv(c, x):
        m, d = c
        mc = dec._permute_v2c(m)
        mc = cn_pass(mc)
        mn = dec._permute_c2v(mc)
        return (vn_pass(mn, x), d), None
    variants["gathers+CN+VN"] = scan_of(body_gcv)

    def body_full(c, x):
        m, d = c
        mc = dec._permute_v2c(m)
        _, conv = conv_check(m, mc)
        d = d | conv
        mc = cn_pass(mc)
        mn = dec._permute_c2v(mc)
        return (vn_pass(mn, x), d), None
    variants["full body"] = scan_of(body_full)

    print(f"B={B} S={S} E={E}")
    prev = 0.0
    for name, fn in variants.items():
        t, _ = timeit(fn, m0)
        print(f"{name:16s} {t*1e3:8.1f} ms  {t*1e3/S:6.2f} ms/iter"
              f"  (+{(t*1e3-prev)/S:5.2f})")
        prev = t * 1e3


if __name__ == "__main__":
    main()
