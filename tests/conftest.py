"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding tests run on a host-platform mesh
(xla_force_host_platform_device_count) so the suite needs no TPU hardware.
Must run before jax initializes its backends, hence the env mutation at
import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
