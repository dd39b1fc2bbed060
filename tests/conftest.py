"""Test harness config: CPU backend with 8 virtual devices so multi-chip
sharding tests run anywhere, and 'highest' matmul precision for parity."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU site plugin force-registers itself and overrides the env var;
# config.update after import reliably selects the virtual-8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from voxtral_tpu.config import tiny_config  # noqa: E402
from voxtral_tpu.weights import random_params  # noqa: E402

REFERENCE_DIR = os.environ.get("VOXTRAL_REFERENCE", "/root/reference")
FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module", autouse=True)
def _bound_compile_accumulation():
    """Clear JAX's compiled-executable caches between test modules.

    The suite compiles 200+ CPU programs in one process (8 virtual
    devices, 'highest' precision); past ~120 accumulated executables the
    jaxlib CPU client segfaults/aborts inside backend_compile on this
    image (observed 08-21 at test_quant's pipeline compile after the full
    prefix — deterministic, position-dependent, and gone with any shorter
    prefix). Bounding accumulation per module keeps the suite green at
    the cost of cross-module recompiles."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def tiny_cfg():
    return tiny_config()

@pytest.fixture(scope="session")
def tiny_params(tiny_cfg):
    return random_params(tiny_cfg, seed=1234)


def fixture_path(name: str) -> str:
    return os.path.join(FIXTURES, name)


def load_fixture(name: str):
    path = fixture_path(name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} missing — run tools/gen_goldens.py")
    return np.load(path, allow_pickle=False)
