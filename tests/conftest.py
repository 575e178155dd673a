"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding paths can be exercised without TPU hardware (the same
trick the driver's dryrun uses). Must run before jax is imported anywhere.

Note: the environment's TPU plugin overrides the JAX_PLATFORMS env var with
a config update at import time, so we must update the config explicitly
after importing jax — the env vars alone are not sufficient here.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
