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

# Persistent compilation cache (keyed by platform, shared with bench.py's
# TPU cache dir): repeat suite runs skip XLA CPU compiles, which both cuts
# minutes of wall time and avoids a rare XLA CPU compiler segfault observed
# under long single-process runs.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")
#: Conformance corpus: prefer the live reference checkout, fall back to the
#: committed copy (tests/vectors/README.md) so CI on a repo-only checkout
#: still exercises the bit-exactness contract instead of skipping.
_CANDIDATE_EXAMPLE_DIRS = (
    REFERENCE_DIR / "Examples",
    pathlib.Path(__file__).parent / "vectors" / "examples",
)
EXAMPLES_DIR = (
    pathlib.Path(os.environ["FLO_TPU_EXAMPLES_DIR"])
    if os.environ.get("FLO_TPU_EXAMPLES_DIR")
    else next(
        (d for d in _CANDIDATE_EXAMPLE_DIRS if d.is_dir()), _CANDIDATE_EXAMPLE_DIRS[0]
    )
)


@pytest.fixture(scope="session")
def examples_dir():
    if not EXAMPLES_DIR.is_dir():
        pytest.skip("conformance corpus not available")
    return EXAMPLES_DIR


@pytest.fixture(autouse=True)
def _reset_spec_caches():
    """Clear the speculative-sizing caches before every test.

    The bulk pipelines learn payload/entry sizes in module-global dicts
    (`blockspread._SPEC_BYTES`, `lossy.encoder._ENTRIES_SPEC`). The values
    are correctness-neutral size hints, but tests that count dispatches
    (tests/test_bulk.py speculative-bucket contracts) depend on a cold
    cache, so isolate every test."""
    from flo_tpu.lossy import encoder as _loe
    from flo_tpu.ops import blockspread as _bs

    _bs.reset_spec_cache()
    _loe.reset_spec_cache()
    yield


@pytest.fixture(scope="module", autouse=True)
def _bound_xla_executable_accumulation():
    """Clear jit caches between test modules.

    A single pytest process compiles ~300 XLA CPU programs; past ~200 the
    XLA CPU compiler has been observed to crash (SIGSEGV in compile /
    SIGABRT in cache serialization). Dropping live executables per module
    bounds that accumulation; the persistent compilation cache makes any
    recompile a cheap deserialization."""
    yield
    import jax as _jax

    _jax.clear_caches()
