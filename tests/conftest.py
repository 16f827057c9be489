"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the standard JAX trick for testing pjit/shard_map without a pod
(SURVEY.md §4): force the host platform and fake 8 devices so multi-chip
sharding paths compile and execute in CI.

Note: this environment registers a TPU PJRT plugin at interpreter startup and
overrides ``jax_platforms`` via jax.config, so setting the env var alone is
not enough — we must update the config after import, before any backend is
initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
