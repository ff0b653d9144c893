"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so that multi-chip
sharding paths (mesh/pjit) are exercised without TPU hardware.
"""

import os
import sys
from pathlib import Path

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Exported so SUBPROCESS tests (CLI invocations) also stay on CPU — without
# this they try to initialise the axon TPU backend, which hangs the whole
# suite whenever the tunnel is degraded. Forced (not setdefault): the axon
# sitecustomize pre-sets JAX_PLATFORMS=axon in os.environ at startup.
os.environ["JAX_PLATFORMS"] = "cpu"

# The environment pre-imports jax (sitecustomize), so JAX_PLATFORMS in
# os.environ is too late — switch the already-imported config instead.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = Path("/root/reference")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_model_configs() -> Path:
    path = REFERENCE_ROOT / "tests" / "data" / "model_configs"
    if not path.is_dir():
        pytest.skip("reference model configs not available")
    return path


@pytest.fixture(scope="session")
def reference_pod5_dir() -> Path:
    path = REFERENCE_ROOT / "tests" / "data" / "pod5"
    if not path.is_dir():
        pytest.skip("reference pod5 fixtures not available")
    return path
