"""Test configuration.

Force JAX onto a virtual 8-device CPU backend BEFORE any test touches a
device, so sharding/pjit tests run without TPU hardware (the driver
separately dry-runs the multi-chip path on real meshes).

Note: this environment's sitecustomize force-registers a remote TPU
backend and overrides the JAX_PLATFORMS env var via jax.config, so we must
override at the config level too, not with environment variables.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture()
def tmp_save_dir(tmp_path):
    return str(tmp_path / "outputs")
