"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding paths
(jax.sharding.Mesh over 'data'/'model' axes) are exercised without TPU
hardware. Must be set before jax initializes a backend.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container may pre-register a remote TPU PJRT plugin ("axon") via
# sitecustomize, which pins jax_platforms and costs ~1 min of tunnel
# handshake on first use. Tests must run on the virtual CPU mesh, so deselect
# it before any backend initializes (conftest runs before all test imports).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as _xb  # noqa: E402

if not _xb.backends_are_initialized():
    _xb._backend_factories.pop("axon", None)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"

if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference implementation not mounted"
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def reference_path():
    """Make the reference repo importable (for parity oracles only)."""
    if not has_reference():
        pytest.skip("reference implementation not mounted")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return REFERENCE_ROOT
