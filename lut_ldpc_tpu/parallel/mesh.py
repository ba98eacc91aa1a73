"""Device-mesh helpers for data-parallel Monte-Carlo and design sweeps."""

from __future__ import annotations

from functools import partial

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["dp_mesh", "dp_mesh_2d", "make_dp_step", "make_dp_step_2d",
           "multihost_init"]


def dp_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def make_dp_step(step_fn, mesh: Mesh, axis: str = "dp"):
    """SPMD-wrap a per-device MC step.

    step_fn(key, sigma) -> dict of scalar counters.  Each device derives a
    unique key via fold_in(key, axis_index) — the counter-based replacement
    for the reference's per-process seed offsets (LDPC_BER_Sim.cpp:129) —
    and counters are psum-reduced over the mesh, replacing the offline
    result merging of scripts/aggregate_results.m.
    """

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
             check_vma=False)
    def wrapped(key, sigma):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        counts = step_fn(key, sigma)
        return jax.tree.map(lambda x: jax.lax.psum(x, axis), counts)

    return wrapped


def dp_mesh_2d(n_snr: int, n_devices: int | None = None,
               axes: tuple = ("snr", "dp")) -> Mesh:
    """2-D (snr x batch) mesh: SNR points run concurrently on mesh rows,
    frames data-parallel along mesh columns (SURVEY.md section 2's TPU
    mapping of the reference's per-seed x per-SNR shell fan-out)."""
    import numpy as np

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % n_snr:
        raise ValueError(f"{n} devices not divisible by {n_snr} SNR rows")
    return Mesh(np.array(devs).reshape(n_snr, n // n_snr), axes)


def make_dp_step_2d(step_fn, mesh: Mesh, axes: tuple = ("snr", "dp")):
    """SPMD MC step over a 2-D (snr, dp) mesh.

    step_fn(key, sigma) -> dict of scalar counters.  sigmas (n_snr,) is
    sharded over the snr axis (one noise level per mesh row); every device
    derives a unique key via fold_in over BOTH axis indices; counters are
    psum-reduced over the dp axis only, so the wrapped fn returns
    per-SNR-point counter vectors of shape (n_snr,)."""
    snr_ax, dp_ax = axes

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(), P(snr_ax)),
             out_specs=P(snr_ax), check_vma=False)
    def wrapped(key, sigmas):
        key = jax.random.fold_in(key, jax.lax.axis_index(snr_ax))
        key = jax.random.fold_in(key, jax.lax.axis_index(dp_ax))
        counts = step_fn(key, sigmas[0])
        counts = jax.tree.map(lambda x: jax.lax.psum(x, dp_ax), counts)
        return jax.tree.map(lambda x: x[None], counts)

    return wrapped


def multihost_init():
    """Initialize jax.distributed when running under a multi-host launcher;
    no-op (returns False) in single-process runs."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
        return True
    return False
