"""Test configuration: run everything on a virtual 8-device CPU mesh.

Env vars must be set before the first ``import jax`` anywhere in the test
process; conftest is imported first, so this is the place.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(__file__))  # for ref_loader
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))  # repo root

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU platform at interpreter start;
# override back to the virtual 8-device CPU mesh for tests
jax.config.update("jax_platforms", "cpu")
# parity tests compare against float32 torch; keep matmuls at full precision
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference():
    """The upstream PyTorch package as a numeric oracle, or skip."""
    from ref_loader import load_reference

    ref = load_reference()
    if ref is None:
        pytest.skip("reference tree not available")
    return ref


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
