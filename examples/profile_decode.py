"""Profile the decode hot loop component-by-component on the real device.

Times, at the bench shapes (N=10000 (3,6), B=4096, int16 values):
- the two permutation row-gathers
- the CN two-min pass
- the VN tree pass (current sequential-select emission)
- VN variants: delta-sum emission, total-minus-self leave-one-out
- a fully fused iteration

Usage: python examples/profile_decode.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps, out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from bench import build_codec

    codec = build_codec()
    from lut_ldpc_tpu.decoder.arith import build_arith_prefix_spec
    from lut_ldpc_tpu.decoder.arith_decoder import ArithLUTDecoder

    spec = build_arith_prefix_spec(codec, dtype=np.int16)
    dec = ArithLUTDecoder(codec, early_exit=True, spec=spec)
    print(f"spec iters {spec.num_iters} dtype {spec.dtype}", file=sys.stderr)

    lay = dec.layout
    E = codec.graph.num_edges
    rng = np.random.default_rng(0)
    m = jnp.asarray(
        rng.integers(-2000, 2000, size=(E, B)).astype(np.int16))
    perm_v2c = dec._perm_v2c
    perm_c2v = dec._perm_c2v

    g = jax.jit(lambda x: jnp.take(x, perm_v2c, axis=0))
    t, _ = timeit(g, m)
    print(f"gather v2c      {t*1e3:8.2f} ms")
    g2 = jax.jit(lambda x: jnp.take(x, perm_c2v, axis=0))
    t, _ = timeit(g2, m)
    print(f"gather c2v      {t*1e3:8.2f} ms")

    # CN two-min over blocks
    def cn(mm):
        outs = []
        for bi, blk in enumerate(lay.cn_blocks):
            d, n, e0 = blk.degree, blk.num_nodes, blk.edge_start
            mb = mm[e0 : e0 + n * d].reshape(d, n, -1)
            outs.append(dec._cn_minsum_values(mb).reshape(-1, B))
        return jnp.concatenate(outs, axis=0)

    t, _ = timeit(jax.jit(cn), m)
    print(f"CN two-min      {t*1e3:8.2f} ms")

    # VN current form (one iteration's params)
    cha = jnp.asarray(rng.integers(-2000, 2000, size=(codec.graph.nvar, B)).astype(np.int16))

    def vn_current(mm, it):
        outs = []
        for bi, blk in enumerate(lay.vn_blocks):
            d, n, e0 = blk.degree, blk.num_nodes, blk.edge_start
            mb = mm[e0 : e0 + n * d].reshape(d, n, B)
            struct = dec._var_struct[bi]
            from lut_ldpc_tpu.decoder.arith_decoder import _loo

            loo = _loo(d)
            x_vals = [
                jnp.stack([mb[int(loo[i, j])] for i in range(d)], axis=0)
                for j in range(d - 1)
            ]
            cb = cha[blk.node_start : blk.node_start + n]
            x_vals.append(jnp.broadcast_to(cb[None], (d, n, B)))
            prm = [
                {k: v[it] for k, v in opx.items()} for opx in dec._var_xs[bi]
            ]
            out = dec._eval_tree(struct, x_vals, prm)
            outs.append(out.reshape(-1, B))
        return jnp.concatenate(outs, axis=0)

    t, _ = timeit(jax.jit(vn_current), m, 3)
    print(f"VN current      {t*1e3:8.2f} ms")

    # VN delta-sum emission + total-minus-self loo (int-exact rewrites)
    def emit_delta(s, thr, dlev, lev0, tie_sign_val, tie_lo, tie_hi):
        acc = jnp.full(s.shape, lev0, jnp.int32)
        for k in range(thr.shape[0]):
            acc = acc + jnp.where(s >= int(thr[k]), int(dlev[k]), 0)
        tie = jnp.where(tie_sign_val < 0, int(tie_lo), int(tie_hi))
        return jnp.where(s == 0, tie, acc)

    def vn_delta(mm, it):
        it = int(it)
        outs = []
        for bi, blk in enumerate(lay.vn_blocks):
            d, n, e0 = blk.degree, blk.num_nodes, blk.edge_start
            mb = mm[e0 : e0 + n * d].reshape(d, n, B).astype(jnp.int32)
            cb = cha[blk.node_start : blk.node_start + n].astype(jnp.int32)
            struct = dec._var_struct[bi]
            ops = struct.ops
            # d=3: leaves [m_loo0, m_loo1, cha]; assume ops=((0,1),(3,2)) form
            tot = mb.sum(axis=0)
            from lut_ldpc_tpu.decoder.arith_decoder import _loo

            loo = _loo(d)
            spec_i = spec.var_trees[it][bi]
            # op1 on the two loo messages
            op1, op2 = spec_i.ops
            thr1 = np.asarray(op1.thresholds, np.int64)
            lev1 = np.asarray(op1.levels, np.int64)
            d1 = np.diff(lev1)
            outs_b = []
            for i in range(d):
                s1 = tot - mb[i]
                tie_ref = mb[int(loo[i, 1])]
                v1 = emit_delta(s1, thr1, d1, int(lev1[0]), tie_ref,
                                op1.tie_lo, op1.tie_hi)
                thr2 = np.asarray(op2.thresholds, np.int64)
                lev2 = np.asarray(op2.levels, np.int64)
                d2 = np.diff(lev2)
                s2 = v1 + cb
                v2 = emit_delta(s2, thr2, d2, int(lev2[0]), cb,
                                op2.tie_lo, op2.tie_hi)
                outs_b.append(v2.astype(jnp.int16))
            outs.append(jnp.stack(outs_b, 0).reshape(-1, B))
        return jnp.concatenate(outs, axis=0)

    t, out_delta = timeit(jax.jit(lambda mm: vn_delta(mm, 3)), m)
    print(f"VN delta/tot    {t*1e3:8.2f} ms")

    # correctness vs current
    ref = jax.jit(vn_current)(m, 3)
    same = bool(jnp.all(ref == out_delta))
    print(f"delta == current: {same}")

    # fused iteration (gather + cn + gather + vn_delta)
    def iter_fused(mm):
        mc = jnp.take(mm, perm_v2c, axis=0)
        mc = cn(mc)
        mn = jnp.take(mc, perm_c2v, axis=0)
        return vn_delta(mn, 3)

    t, _ = timeit(jax.jit(iter_fused), m)
    print(f"full iter       {t*1e3:8.2f} ms")

    # convergence check cost (current form)
    def conv(mm):
        mc = jnp.take(mm, perm_v2c, axis=0)
        return dec._build.__wrapped__ if False else None

    # current full scan body timing via the built decoder on one batch
    rngl = np.random.default_rng(1)
    from lut_ldpc_tpu.ops.pmf import snr2sig

    sig = float(snr2sig(0.5, 2.0))
    y = 1.0 + sig * rngl.standard_normal((B, codec.nvar))
    llr = 2.0 * y / sig**2
    lc, lm = codec.quantize_channel(llr)
    lc = jnp.asarray(lc, jnp.int32)
    lm = jnp.asarray(lm, jnp.int32)
    t, _ = timeit(dec, lc, lm, reps=3)
    print(f"prefix decoder ({spec.num_iters} iters)  {t*1e3:8.2f} ms "
          f"-> {t*1e3/spec.num_iters:.2f} ms/iter")


if __name__ == "__main__":
    main()
