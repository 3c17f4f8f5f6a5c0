"""Test configuration: run JAX on CPU with 8 virtual devices so
multi-chip mesh code is exercised without TPU hardware (the TPU-world
'fake backend' — SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: session env pins 'axon' (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The sandbox's sitecustomize force-selects the 'axon' TPU platform; the
# env var alone is not enough — override the config knob directly.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
