"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding tests run on a host-platform mesh
(xla_force_host_platform_device_count) so the suite needs no TPU hardware.

NOTE: the environment may pre-register an experimental TPU platform plugin
via sitecustomize and pin `jax_platforms` through jax.config (env-var
JAX_PLATFORMS alone does NOT win against that), so we must override the
config value itself, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from alphagomoku_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
