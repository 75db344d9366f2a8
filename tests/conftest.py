"""Test config: force an 8-virtual-device CPU mesh before jax import.

Multi-chip sharding logic is validated on a virtual CPU mesh (the
reference had no such rig — it only ever tested DDP by launching real
jobs, SURVEY.md §4).
"""

import os

# unconditional: the ambient env may point JAX at a real accelerator
# (e.g. JAX_PLATFORMS=axon), but the test suite is CPU-mesh only
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The env may pre-select another platform (JAX_PLATFORMS=axon) via a
# partially pre-imported jax whose config already snapshotted the env
# var — override through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# ---------------------------------------------------------------------------
# tier markers: `-m "not slow"` is the fast CI tier (<10 min); the
# detector-compile-heavy modules are auto-marked slow here so each file
# doesn't need its own boilerplate.
# ---------------------------------------------------------------------------

_SLOW_MODULES = {
    "test_model_zoo", "test_det6d_e2e", "test_caddn", "test_iassd",
    "test_pointpillar_e2e", "test_pointrcnn_e2e", "test_pvrcnn_e2e",
    "test_pointmlp", "test_spmd_train", "test_overfit_learns",
    "test_eval_vs_reference", "test_occam", "test_point_head_box6d",
    "test_vectorpool", "test_anchor_head_multi", "test_train_infra",
    "test_sloped_point_heads",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy / long tests (excluded from the "
        "fast tier via -m 'not slow')"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
