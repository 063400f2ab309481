"""Test configuration.

Force JAX onto a virtual 8-device CPU mesh BEFORE jax is imported anywhere,
so sharding/pjit tests run without TPU hardware (the driver separately
dry-runs the multi-chip path).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture()
def tmp_save_dir(tmp_path):
    return str(tmp_path / "outputs")
