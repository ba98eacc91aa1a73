"""Isolate QC roll-permute cost vs gather on the bench codec.

Usage: python examples/profile_qc.py [B]
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
    assert dec._qc_plan is not None
    lay = dec.layout
    E = lay.num_edges_vn
    Ec = lay.num_edges_cn
    rng = np.random.default_rng(0)
    m0 = jnp.asarray(rng.integers(-2000, 2000, size=(E, B)).astype(np.int16))
    mc0 = jnp.asarray(rng.integers(-2000, 2000, size=(Ec, B)).astype(np.int16))

    def scan_of(body, init):
        def run(m):
            m, _ = jax.lax.scan(body, m, None, length=S)
            return m
        return jax.jit(run), init

    # roll v2c then c2v with a +1 in between (defeats identity folding)
    def body_rolls(m, _):
        mc = dec._permute_v2c(m)
        mc = mc + jnp.int16(1)
        return dec._permute_c2v(mc), None

    # gather equivalent
    def body_takes(m, _):
        mc = jnp.take(m, dec._perm_v2c, axis=0)
        mc = mc + jnp.int16(1)
        return jnp.take(mc, dec._perm_c2v, axis=0), None

    # single roll direction, carry stays CN-grouped: c2v then v2c
    def body_roll_cn(m, _):
        mv = dec._permute_c2v(m)
        mv = mv + jnp.int16(1)
        return dec._permute_v2c(mv), None

    def cn_pass(m_cn):
        outs = []
        for m in dec._cn_blocks_of(m_cn):
            outs.append(dec._cn_minsum_values(m).reshape(-1, B))
        return jnp.concatenate(outs, axis=0)

    # CN only on CN-grouped carry (no permutes at all)
    def body_cn_only(m, _):
        return cn_pass(m), None

    # rolls + CN
    def body_rolls_cn(m, _):
        mc = dec._permute_v2c(m)
        mc = cn_pass(mc)
        return dec._permute_c2v(mc), None

    for name, (fn, init) in {
        "rolls+add": scan_of(body_rolls, m0),
        "takes+add": scan_of(body_takes, m0),
        "CN only (cn-grouped)": scan_of(body_cn_only, mc0),
        "rolls+CN": scan_of(body_rolls_cn, m0),
    }.items():
        t, _ = timeit(fn, init)
        print(f"{name:24s} {t*1e3/S:6.2f} ms/iter")


if __name__ == "__main__":
    main()
