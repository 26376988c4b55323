"""Test rig: run everything on a virtual 8-device CPU mesh.

The machine's sitecustomize registers the axon TPU plugin and overrides the
``jax_platforms`` config at interpreter start, so setting the env var is not
enough — we must update the config after importing jax (before any backend
is initialized). Sharding tests then exercise real pjit/shard_map
partitioning on host devices; Pallas kernels run in interpreter mode.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU mesh"
