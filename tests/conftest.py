"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py; unit tests exercise the same jitted
code paths on CPU so they are hermetic and can validate multi-device sharding
(8 virtual devices via --xla_force_host_platform_device_count).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")
EXAMPLES_DIR = REFERENCE_DIR / "Examples"


@pytest.fixture(scope="session")
def examples_dir():
    if not EXAMPLES_DIR.is_dir():
        pytest.skip("reference Examples corpus not available")
    return EXAMPLES_DIR
