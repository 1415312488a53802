"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py; unit tests exercise the same jitted
code paths on CPU so they are hermetic and can validate multi-device sharding.

Note: this environment's sitecustomize registers an 'axon' TPU backend and
overrides jax_platforms at interpreter boot, so setting JAX_PLATFORMS in the
environment is NOT enough — we must update jax.config after import (before
any backend is initialized).
"""

import os

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS fallback above

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")
EXAMPLES_DIR = REFERENCE_DIR / "Examples"


@pytest.fixture(scope="session")
def examples_dir():
    if not EXAMPLES_DIR.is_dir():
        pytest.skip("reference Examples corpus not available")
    return EXAMPLES_DIR
