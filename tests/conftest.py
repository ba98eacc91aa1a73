"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; sharding tests use
xla_force_host_platform_device_count to emulate a multi-chip mesh.

The axon sitecustomize registers the TPU-tunnel backend in every interpreter
and forces jax_platforms='axon,cpu' via jax.config (so env vars alone can't
override it); we update the config back to cpu before any backend starts.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
