"""Multi-chip scale-out: SPMD data parallelism over a jax device mesh.

The reference scales Monte-Carlo BER out by running one statically linked
binary per seed per host and merging result files offline
(/root/reference/README.md:54, scripts/aggregate_results.m).  The TPU-native
equivalent is one SPMD program: frames are sharded over a ('dp',) mesh,
every device simulates its own batch with a device-unique counter-based RNG
key, and the error counters are psum-reduced over ICI in-program.
"""

from .mesh import (
    dp_mesh,
    dp_mesh_2d,
    make_dp_step,
    make_dp_step_2d,
    multihost_init,
)

__all__ = ["dp_mesh", "dp_mesh_2d", "make_dp_step", "make_dp_step_2d",
           "multihost_init"]
