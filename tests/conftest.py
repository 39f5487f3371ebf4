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


# ---------------------------------------------------------------------------
# Test tiers: e2e/oracle/GSPMD modules are marked slow at collection, every
# other test is marked fast (see pytest.ini). A test already carrying an
# explicit marker keeps it.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_SLOW_MODULES = {
    "test_frame", "test_parallel", "test_oracle", "test_gi_validate",
    "test_reference_pt", "test_taa", "test_instancing", "test_view_layer",
    "test_rtr_restir", "test_aux",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if any(m.name in ("fast", "slow") for m in item.iter_markers()):
            continue
        item.add_marker(pytest.mark.slow if mod in _SLOW_MODULES
                        else pytest.mark.fast)
