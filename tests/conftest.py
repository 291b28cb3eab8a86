"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware (the TPU-native analogue
of a fake distributed backend; see SURVEY.md §4)."""

import os

# Must be set before jax initializes its backends.  The environment pins
# JAX_PLATFORMS to the TPU tunnel (and the axon sitecustomize re-forces it
# via jax.config at interpreter start), so override through jax.config after
# import: tests always run on the 8-virtual-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
