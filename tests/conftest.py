"""Test rig: run everything on a virtual 8-device CPU mesh.

The machine's sitecustomize registers the axon TPU plugin and overrides the
``jax_platforms`` config at interpreter start, so setting the env var is not
enough — we must update the config after importing jax (before any backend
is initialized). Sharding tests then exercise real pjit/shard_map
partitioning on host devices; Pallas kernels run in interpreter mode.
"""

import os
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
# Isolate tests from the shared persistent compilation cache (enabled by the
# processors via utils/jax_setup.enable_cache). The shared dir outlives the
# rig's host machine, and XLA:CPU AOT entries compiled on a different CPU
# generation ABORT the process on execution (observed: cpu_aot_loader
# machine-feature mismatch -> SIGILL-class crash mid-suite). Tests get a
# throwaway per-session dir instead.
os.environ.setdefault(
    "VFX_JAX_CACHE_DIR", tempfile.mkdtemp(prefix="vfx_test_jax_cache_")
)

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU mesh"
