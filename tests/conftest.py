"""Test configuration.

JAX tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multichip
path).  The environment variables must be set before jax initializes.
"""

import os
import random
import sys

# Force the CPU mesh even when the shell exports JAX_PLATFORMS (the axon
# TPU tunnel makes test runs slow and flaky); set TAMP_TPU_TEST_PLATFORM to
# run the suite against another platform deliberately.  NB: the axon plugin
# ignores the JAX_PLATFORMS *env var*, so the jax.config update below is
# the one that actually takes effect.
_plat = os.environ.get("TAMP_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _plat
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _plat)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_PATH = "/root/reference"


def _load_reference():
    """Import the reference pure-Python ``tamp`` package as a test oracle."""
    if not os.path.isdir(os.path.join(REFERENCE_PATH, "tamp")):
        return None
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import tamp as ref_tamp  # noqa: F401

        return ref_tamp
    except Exception:
        return None
    finally:
        sys.path.remove(REFERENCE_PATH)


_REF = _load_reference()


@pytest.fixture(scope="session")
def ref_tamp():
    """The reference implementation, used only as a differential oracle."""
    if _REF is None:
        pytest.skip("reference tamp package not available")
    return _REF


@pytest.fixture()
def rng():
    return random.Random(0x7A3B9)
