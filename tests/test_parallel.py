"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import sys

import jax
import numpy as np
import pytest

from flo_tpu.ops import lpc
from flo_tpu.parallel import pipeline


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    return pipeline.device_mesh()


class TestSharding:
    def test_mesh_spans_devices(self, mesh):
        assert len(mesh.devices.ravel()) == len(jax.devices())

    def test_encode_select_sharded_matches_single(self, mesh):
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        n = len(jax.devices())
        L, S = 4 * n, 512
        lanes, nvalid, coeffs, shifts, orders, fixed, ok, is_lpc = (
            g._example_lossless_inputs(L, S)
        )
        # Unsharded reference result.
        ref = pipeline.encode_select_step(
            lanes, nvalid, coeffs, shifts, orders, fixed, ok, is_lpc
        )
        with mesh:
            sharded_in = pipeline.shard_batch(mesh, lanes, nvalid, coeffs, shifts, orders, fixed, ok)
            out = pipeline.encode_select_step(*sharded_in, is_lpc)
        for a, b in zip(ref, out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dryrun_multichip(self):
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        g.dryrun_multichip(len(jax.devices()))

    def test_entry_compiles(self):
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out[0].shape == (8, 2048)

    def test_sharded_reconstruction_bit_exact(self, mesh):
        rng = np.random.default_rng(0)
        n = len(jax.devices())
        L, S = 2 * n, 300
        residuals = rng.integers(-100, 100, (L, S)).astype(np.int32)
        coeffs = np.zeros((L, lpc.MAX_ORDER), np.int32)
        coeffs[:, 0] = 1 << 10
        shifts = np.full(L, 10, np.int32)
        orders = np.ones(L, np.int32)
        fixed = np.zeros(L, bool)
        ref = np.asarray(lpc.reconstruct(residuals, coeffs, shifts, orders, fixed))
        with mesh:
            args = pipeline.shard_batch(mesh, residuals, coeffs, shifts, orders, fixed)
            out = np.asarray(lpc.reconstruct(*args))
        np.testing.assert_array_equal(out, ref)
