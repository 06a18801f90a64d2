"""Test harness: force an 8-device CPU platform.

The sandbox presets JAX_PLATFORMS=axon (remote TPU tunnel); tests must run
on the local CPU backend — per-op dispatch over the tunnel is orders of
magnitude slower and tests need 8 virtual devices for the sharding suite.

Some installed pytest plugin imports jax before this conftest runs, so
setting os.environ alone is not enough: use jax.config.update too (backends
are not initialized until first use, so this still takes effect).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() >= 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)
