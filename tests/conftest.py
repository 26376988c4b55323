"""Test rig: run everything on a virtual 8-device CPU mesh.

Sharding/multi-chip tests exercise real pjit/shard_map partitioning on host
devices; kernel tests run Pallas in interpreter mode where needed.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
