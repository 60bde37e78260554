"""Test configuration: hermetic CPU-backend JAX with a virtual 8-device mesh.

Mirrors the reference's hermetic strategy (in-memory GGUF buffers, no model
files, no network — reference BUILD:77-106) and adds the TPU equivalent for
multi-chip testing: ``xla_force_host_platform_device_count=8`` so sharding
tests exercise real collectives without hardware (SURVEY.md §4).
"""

import os

# Must be set before the jax backend initializes anywhere in the session.
# The env var alone is not enough on machines where a TPU PJRT plugin is
# registered (it overrides JAX_PLATFORMS), so also force via jax.config.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect the virtual 8-device CPU mesh"


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(12345)
