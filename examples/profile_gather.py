"""Row-gather microbenchmark: what does a (E, B) permutation really cost?

The decode loop's two permutation gathers dominate (each ~3.3 ms at
E=30000, B=4096 int16 = ~150 GB/s effective vs ~800 peak).  Scans each
formulation 32x so dispatch amortizes.

Usage: python examples/profile_gather.py [B]
"""

import sys
import time

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
    E = 30720  # ~the bench edge count, 1024-aligned
    S = 32
    rng = np.random.default_rng(0)
    perm = rng.permutation(E).astype(np.int32)
    permj = jnp.asarray(perm)
    # sorted-ish permutation: same traffic, high locality
    near = np.argsort(perm + rng.integers(-64, 64, E)).astype(np.int32)
    nearj = jnp.asarray(near)

    bytes_moved = 2 * E * B * 2  # r+w int16

    def scan_of(body):
        def run(m):
            m, _ = jax.lax.scan(body, m, None, length=S)
            return m
        return jax.jit(run)

    def report(name, t):
        gbs = bytes_moved / (t / S) / 1e9
        print(f"{name:28s} {t*1e3/S:7.2f} ms/iter  {gbs:6.0f} GB/s")

    for dt, scale in ((np.int16, 1), (np.int32, 2), (np.float32, 2)):
        m0 = jnp.asarray(rng.integers(-2000, 2000, (E, B)).astype(dt))
        t, _ = timeit(scan_of(lambda m, _: (jnp.take(m, permj, axis=0), None)), m0)
        gbs = scale * bytes_moved / (t / S) / 1e9
        print(f"take axis0 {np.dtype(dt).name:8s}        "
              f"{t*1e3/S:7.2f} ms/iter  {gbs:6.0f} GB/s")

    m0 = jnp.asarray(rng.integers(-2000, 2000, (E, B)).astype(np.int16))

    t, _ = timeit(scan_of(lambda m, _: (m[permj], None)), m0)
    report("fancy-index int16", t)

    t, _ = timeit(scan_of(lambda m, _: (jnp.take(m, nearj, axis=0), None)), m0)
    report("near-sorted perm int16", t)

    # bitcast rows to int32 pairs: halves row count effect? no — widens lanes
    def take_i32view(m, _):
        w = jax.lax.bitcast_convert_type(m.reshape(E, B // 2, 2), jnp.int32)
        return (
            jax.lax.bitcast_convert_type(
                jnp.take(w, permj, axis=0), jnp.int16
            ).reshape(E, B),
            None,
        )
    t, _ = timeit(scan_of(take_i32view), m0)
    report("bitcast-i32 rows", t)

    # gather on the transpose layout (B, E): lanes permuted instead of rows
    mT = jnp.asarray(np.ascontiguousarray(np.asarray(m0).T))
    t, _ = timeit(scan_of(lambda m, _: (jnp.take(m, permj, axis=1), None)), mT)
    report("take axis1 (B, E) int16", t)

    # two independent gathers in one body (the real loop's pattern)
    perm2 = jnp.asarray(rng.permutation(E).astype(np.int32))

    def two(m, _):
        a = jnp.take(m, permj, axis=0)
        a = a + 1  # defeat composition
        return jnp.take(a, perm2, axis=0), None
    t, _ = timeit(scan_of(two), m0)
    print(f"{'two takes + add':28s} {t*1e3/S:7.2f} ms/iter (both)")


if __name__ == "__main__":
    main()
