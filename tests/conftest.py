"""Test bootstrap: force JAX onto CPU with 8 virtual devices so multi-chip sharding
code paths (pjit/shard_map over a Mesh) are exercised without TPU hardware — the
JAX-native analogue of the reference's 2-GPU local smoke scripts
(/root/reference/prj/base_vtp/scripts/local_test/)."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) registers itself programmatically, which wins
# over the env var — force CPU through the config API as well.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def data_dir():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
