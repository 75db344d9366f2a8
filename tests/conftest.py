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
