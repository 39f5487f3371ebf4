"""Test config: run everything on CPU with 8 virtual devices so multi-chip
sharding tests work without TPU hardware (SURVEY.md section 4 test strategy).

NOTE: the environment may pre-import jax and register a TPU backend via
sitecustomize before this file runs, so setting JAX_PLATFORMS in os.environ
is not enough — the config must be updated on the already-imported module.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) >= 8, "tests expect 8 virtual CPU devices"
