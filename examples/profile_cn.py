"""Isolate the CN two-min cost and test codegen variants.

Scans 32 iterations of gather+CN+gather with the CN pass computed in
different dtypes / formulations to find what XLA compiles well on TPU.

Usage: python examples/profile_cn.py [B]
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


def two_min(mag, d, INF):
    pre = [None]
    for j in range(d - 1):
        pre.append(mag[j] if pre[-1] is None else jnp.minimum(pre[-1], mag[j]))
    suf = [None]
    for j in range(d - 1, 0, -1):
        suf.append(mag[j] if suf[-1] is None else jnp.minimum(suf[-1], mag[j]))
    suf = suf[::-1]
    outs = []
    for j in range(d):
        p, s = pre[j], suf[j]
        outs.append(s if p is None else (p if s is None else jnp.minimum(p, s)))
    return jnp.stack(outs, axis=0)


def cn_generic(m, compute_dtype):
    d = m.shape[0]
    x = m.astype(compute_dtype) if compute_dtype is not None else m
    neg = x < 0
    mag = jnp.abs(x)
    INF = None
    tmp = two_min(mag, d, INF)
    sign_prod = (jnp.sum(neg, axis=0, keepdims=True) & 1).astype(bool)
    out = jnp.where(sign_prod ^ neg, -tmp, tmp)
    return out.astype(m.dtype)


def cn_min12(m, compute_dtype):
    """min1/min2 formulation: two reductions + equality mask."""
    d = m.shape[0]
    x = m.astype(compute_dtype) if compute_dtype is not None else m
    neg = x < 0
    mag = jnp.abs(x)
    min1 = jnp.min(mag, axis=0, keepdims=True)
    big = jnp.asarray(np.iinfo(x.dtype).max if jnp.issubdtype(
        x.dtype, jnp.integer) else np.inf, x.dtype)
    is_min = mag == min1
    # knock out ONE argmin occurrence (the first slot attaining the min)
    first = jnp.cumsum(is_min.astype(jnp.int32), axis=0) == 1
    first = first & is_min
    min2 = jnp.min(jnp.where(first, big, mag), axis=0, keepdims=True)
    tmp = jnp.where(first, min2, min1)
    sign_prod = (jnp.sum(neg, axis=0, keepdims=True) & 1).astype(bool)
    out = jnp.where(sign_prod ^ neg, -tmp, tmp)
    return out.astype(m.dtype)


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
    E = codec.graph.num_edges
    rng = np.random.default_rng(0)
    m0 = jnp.asarray(rng.integers(-2000, 2000, size=(E, B)).astype(np.int16))

    def scan_cn(cn_fn):
        def body(m, _):
            mc = jnp.take(m, dec._perm_v2c, axis=0)
            outs = []
            for blk in lay.cn_blocks:
                d, n, e0 = blk.degree, blk.num_nodes, blk.edge_start
                mb = mc[e0 : e0 + n * d].reshape(d, n, B)
                outs.append(cn_fn(mb).reshape(-1, B))
            mc = jnp.concatenate(outs, axis=0)
            return jnp.take(mc, dec._perm_c2v, axis=0), None
        def run(m):
            m, _ = jax.lax.scan(body, m, None, length=S)
            return m
        return jax.jit(run)

    base = timeit(scan_cn(lambda mb: mb), m0)[0]
    print(f"B={B}: gathers only       {base*1e3/S:6.2f} ms/iter")
    ref_out = None
    for name, fn in [
        ("current int16", lambda mb: cn_generic(mb, None)),
        ("compute int32", lambda mb: cn_generic(mb, jnp.int32)),
        ("compute f32", lambda mb: cn_generic(mb, jnp.float32)),
        ("min12 int16", lambda mb: cn_min12(mb, None)),
        ("min12 int32", lambda mb: cn_min12(mb, jnp.int32)),
        ("min12 f32", lambda mb: cn_min12(mb, jnp.float32)),
    ]:
        t, out = timeit(scan_cn(fn), m0)
        if ref_out is None:
            ref_out = out
            eq = True
        else:
            eq = bool(jnp.all(out == ref_out))
        print(f"B={B}: {name:18s} {t*1e3/S:6.2f} ms/iter (+{(t-base)*1e3/S:5.2f})  match={eq}")


if __name__ == "__main__":
    main()


def cn_barrier(m):
    """Compute shared reductions once, barrier them, then expand."""
    d = m.shape[0]
    neg = m < 0
    mag = jnp.abs(m)
    min1 = jnp.min(mag, axis=0)
    big = jnp.asarray(np.iinfo(np.int16).max, m.dtype)
    is_min = mag == min1[None]
    first = (jnp.cumsum(is_min.astype(jnp.int32), axis=0) == 1) & is_min
    min2 = jnp.min(jnp.where(first, big, mag), axis=0)
    par = (jnp.sum(neg, axis=0) & 1).astype(jnp.int16)
    min1, min2, par = jax.lax.optimization_barrier((min1, min2, par))
    parb = par.astype(bool)
    outs = []
    cnt = None
    for j in range(d):
        eq = mag[j] == min1
        prev = cnt if cnt is not None else jnp.zeros(eq.shape, jnp.int32)
        firstj = eq & (prev == 0)
        cnt = prev + eq.astype(jnp.int32)
        tmp = jnp.where(firstj, min2, min1)
        flip = parb ^ neg[j]
        outs.append(jnp.where(flip, -tmp, tmp))
    return jnp.stack(outs, axis=0)


def extra():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    S = 32
    from bench import build_codec
    codec = build_codec()
    from lut_ldpc_tpu.decoder.arith import build_arith_prefix_spec
    from lut_ldpc_tpu.decoder.arith_decoder import ArithLUTDecoder
    spec = build_arith_prefix_spec(codec, dtype=np.int16)
    dec = ArithLUTDecoder(codec, early_exit=True, spec=spec)
    lay = dec.layout
    E = codec.graph.num_edges
    rng = np.random.default_rng(0)
    m0 = jnp.asarray(rng.integers(-2000, 2000, size=(E, B)).astype(np.int16))

    def scan_cn(cn_fn):
        def body(m, _):
            mc = jnp.take(m, dec._perm_v2c, axis=0)
            outs = []
            for blk in lay.cn_blocks:
                d, n, e0 = blk.degree, blk.num_nodes, blk.edge_start
                mb = mc[e0 : e0 + n * d].reshape(d, n, B)
                outs.append(cn_fn(mb).reshape(-1, B))
            mc = jnp.concatenate(outs, axis=0)
            return jnp.take(mc, dec._perm_c2v, axis=0), None
        def run(m):
            m, _ = jax.lax.scan(body, m, None, length=S)
            return m
        return jax.jit(run)

    t0, ref = timeit(scan_cn(lambda mb: cn_generic(mb, None)), m0)
    t1, out = timeit(scan_cn(cn_barrier), m0)
    print(f"current int16  {t0*1e3/S:6.2f} ms/iter")
    print(f"barrier int16  {t1*1e3/S:6.2f} ms/iter  match={bool(jnp.all(out == ref))}")


if __name__ == "__main__":
    extra()
