"""Test harness: force an 8-device CPU platform before JAX initialises.

Multi-chip sharding is validated on a virtual CPU mesh (the reference has no
parallel components at all, SURVEY.md §2.9; real-pod behavior is compiled-
checked by the driver via __graft_entry__.dryrun_multichip)."""

import os

# The sandbox presets JAX_PLATFORMS=axon (remote TPU tunnel); tests must run
# on the local CPU backend — per-op dispatch over the tunnel is orders of
# magnitude slower and tests need 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
