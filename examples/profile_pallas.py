"""Correctness + speed of the Pallas CN/VN kernels vs the XLA formulation.

Usage: python examples/profile_pallas.py [B]
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
    from lut_ldpc_tpu.decoder.arith_decoder import ArithLUTDecoder, _loo
    from lut_ldpc_tpu.decoder import pallas_kernels as pk

    spec = build_arith_prefix_spec(codec, dtype=np.int16)
    dec = ArithLUTDecoder(codec, early_exit=True, spec=spec)
    lay = dec.layout
    rng = np.random.default_rng(0)

    # ---- CN kernel correctness + speed on the (single) CN block ----
    blk = lay.cn_blocks[0]
    d, n_pad = blk.degree, blk.n_pad
    m3 = jnp.asarray(
        rng.integers(-2000, 2000, size=(d, n_pad, B)).astype(np.int16))

    ref_cn = jax.jit(dec._cn_minsum_values)
    pal_cn = jax.jit(lambda m: pk.cn_pass(m, blk.num_nodes))
    t_ref, out_ref = timeit(ref_cn, m3)
    t_pal, (out_pal, synd) = timeit(pal_cn, m3)
    eq = bool(jnp.all(out_ref == out_pal))
    # syndrome reference
    s = jnp.sum((m3 < 0).astype(jnp.int32), axis=0) & 1
    ok_ref = jnp.all((s == 0) | dec._cn_padmask[0][:, None], axis=0)
    synd_eq = bool(jnp.all(ok_ref == synd))
    print(f"CN single call: ref {t_ref*1e3:.2f} ms, pallas {t_pal*1e3:.2f} ms"
          f"  match={eq} synd={synd_eq}")

    # ---- VN kernel correctness + speed on the (single) VN block ----
    vblk = lay.vn_blocks[0]
    dv, nv_pad = vblk.degree, vblk.n_pad
    mv = jnp.asarray(
        rng.integers(-2000, 2000, size=(dv, nv_pad, B)).astype(np.int16))
    cha = jnp.asarray(
        rng.integers(-2000, 2000, size=(nv_pad, B)).astype(np.int16))
    struct = dec._var_struct[0]
    loo = _loo(dv)
    all_msgs = struct.ops[0].operands == tuple(range(dv - 1)) and dv >= 3
    # iteration-0 params
    prm0 = [
        {k: np.asarray(v)[0] for k, v in op.items()}
        for op in dec._var_xs[0]
    ]
    prm0j = [{k: jnp.asarray(v) for k, v in p.items()} for p in prm0]

    ref_vn = jax.jit(lambda m, c: dec._vn_block_update(0, vblk, m, c, prm0j))
    pal_vn = jax.jit(lambda m, c: pk.vn_pass(
        m, c, struct, prm0, loo, all_msgs, vblk.num_nodes))
    t_ref, out_ref = timeit(ref_vn, mv, cha)
    t_pal, (out_pal, bits, unan) = timeit(pal_vn, mv, cha)
    eq = bool(jnp.all(out_ref == out_pal))
    neg = out_ref < 0
    bits_ref = neg[0].astype(jnp.uint8)
    agree = jnp.all(
        jnp.all(neg == neg[:1], axis=0) | dec._vn_padmask[0][:, None], axis=0)
    print(f"VN single call: ref {t_ref*1e3:.2f} ms, pallas {t_pal*1e3:.2f} ms"
          f"  match={eq} bits={bool(jnp.all(bits == bits_ref))}"
          f" unan={bool(jnp.all(unan == agree))}")

    # ---- in-scan cost (amortizes dispatch) ----
    def scan_of(fn, *extra):
        def run(m):
            def body(m, _):
                out = fn(m, *extra)
                out = out[0] if isinstance(out, tuple) else out
                return out, None
            m, _ = jax.lax.scan(body, m, None, length=S)
            return m
        return jax.jit(run)

    t_ref, _ = timeit(scan_of(dec._cn_minsum_values), m3)
    t_pal, _ = timeit(scan_of(lambda m: pk.cn_pass(m, blk.num_nodes)), m3)
    print(f"CN in-scan: ref {t_ref*1e3/S:.2f} ms/iter, pallas {t_pal*1e3/S:.2f} ms/iter")

    t_ref, _ = timeit(scan_of(
        lambda m: dec._vn_block_update(0, vblk, m, cha, prm0j)), mv)
    t_pal, _ = timeit(scan_of(lambda m: pk.vn_pass(
        m, cha, struct, prm0, loo, all_msgs, vblk.num_nodes)), mv)
    print(f"VN in-scan: ref {t_ref*1e3/S:.2f} ms/iter, pallas {t_pal*1e3/S:.2f} ms/iter")


if __name__ == "__main__":
    main()
