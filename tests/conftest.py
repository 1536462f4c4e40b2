"""Test configuration: run everything on a fake 8-device CPU backend so mesh
and collective code paths execute for real without TPU hardware
(SURVEY.md §4 "Multi-node without a cluster")."""

import os

# Force-override: this environment pins jax_platforms to "axon,cpu" (the
# real-TPU tunnel) at the *config* level, ignoring JAX_PLATFORMS — so the
# override must also go through jax.config, before first backend use.
# Tests run on a fake 8-device CPU backend so mesh/collective code paths
# execute for real (SURVEY.md §4 "Multi-node without a cluster").
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
