"""Device-mesh helpers for data-parallel Monte-Carlo and design sweeps."""

from __future__ import annotations

from functools import partial

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["dp_mesh", "make_dp_step", "multihost_init"]


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


def multihost_init():
    """Initialize jax.distributed when running under a multi-host launcher;
    no-op (returns False) in single-process runs."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
        return True
    return False
