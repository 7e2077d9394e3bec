"""Test configuration: CPU backend with 8 virtual devices (the standard way
to test pjit/shard_map logic without a pod, SURVEY.md §4), and x64 enabled so
parity tests can compare float64 trajectories against the numpy oracle."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already have been imported by sitecustomize (with JAX_PLATFORMS=axon
# pointing at real hardware), so the env var alone is too late — override the
# live config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
