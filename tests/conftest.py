"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use XLA's host
platform with 8 virtual devices. Must run before jax initializes a backend.
"""

import os

# Force CPU: the ambient environment may preset JAX_PLATFORMS to a remote TPU
# platform, which would route every eager op through the device tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
