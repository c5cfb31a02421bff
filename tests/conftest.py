"""Test config: force an 8-virtual-device CPU backend so sharding/collective
tests run without TPU hardware, and keep compiles fast & deterministic.

NOTE: under the axon TPU tunnel the JAX_PLATFORMS env var alone is ignored —
``jax.config.update('jax_platforms', ...)`` before first backend use is what
actually pins the CPU backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# parity tests compare against torch fp32; keep MXU-style bf16 matmuls off
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)


# ---------------------------- test tiers ----------------------------
# `pytest -m fast` = CI-style quick gate: pure-function tests with no
# whole-model compiles.  `pytest -m "not e2e"` skips the model-family
# integration tests (the heavy CPU compiles).

_FAST_FILES = {
    "test_geometry.py", "test_nuscenes_infos.py", "test_native_runtime.py",
    "test_aux_ops.py", "test_quant.py", "test_real_configs.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.path.name if hasattr(item, "path") else \
            item.fspath.basename
        if fname in _FAST_FILES:
            item.add_marker(pytest.mark.fast)
        if fname.endswith("_e2e.py") or fname in (
                "test_parallel.py", "test_torch_parity.py"):
            item.add_marker(pytest.mark.e2e)
