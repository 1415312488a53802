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

    def test_bulk_lossless_pipeline_sharded_bytes_equal(self, mesh):
        """Production encode_many/decode_many under a mesh: byte-identical
        files and sample-identical decodes vs the unsharded path."""
        from flo_tpu.container import reader
        from flo_tpu.lossless import decoder as lld
        from flo_tpu.lossless import encoder as lle

        rng = np.random.default_rng(7)
        rate, C = 800, 2
        clips = [
            (0.3 * np.sin(np.arange(n * C) * 0.01)
             + 0.01 * rng.standard_normal(n * C)).astype(np.float32)
            for n in (2000, 1700, 2400)
        ]
        for analysis in ("exact", "device"):
            ref = lle.encode_many(clips, rate, C, 16, 5, analysis=analysis)
            with pipeline.use_mesh(mesh):
                got = lle.encode_many(clips, rate, C, 16, 5, analysis=analysis)
            assert [bytes(a) for a in got] == [bytes(a) for a in ref], analysis

        ref_dec = lld.decode_many([reader.read(d) for d in ref])
        got_dec = lld.decode_many([reader.read(d) for d in ref], mesh=mesh)
        for a, b in zip(got_dec, ref_dec):
            np.testing.assert_array_equal(a, b)

    def test_bulk_lossy_pipeline_sharded_equivalent(self, mesh):
        """Sharded lossy encode/decode vs unsharded. The f32 FFT stages are
        nondeterministic at the ulp level on this backend (run-to-run, even
        unsharded — buffer-alignment-dependent SIMD), so the contract is
        decode equivalence within one i16 quantization step, not bytes."""
        from flo_tpu.container import reader
        from flo_tpu.lossy import decoder as lod
        from flo_tpu.lossy import encoder as loe

        rng = np.random.default_rng(8)
        rate, C = 8000, 2
        clips = [
            (0.3 * np.sin(np.arange(n * C) * 0.02)
             + 0.01 * rng.standard_normal(n * C)).astype(np.float32)
            for n in (4000, 3000, 5000, 2500, 4500)
        ]
        step = 1.0 / 32767.0
        for transport in (np.float32, "packed"):
            ref = loe.encode_many(clips, rate, C, 0.55, transport_dtype=transport)
            with pipeline.use_mesh(mesh):
                got = loe.encode_many(clips, rate, C, 0.55, transport_dtype=transport)
            ref_out = lod.decode_many([reader.read(d) for d in ref])
            got_out = lod.decode_many([reader.read(d) for d in got])
            for a, b in zip(got_out, ref_out):
                assert a.shape == b.shape
                d = np.abs(a - b)
                assert d.max() <= 1.5 * step, transport
                # rounding flips at .5 boundaries only — vanishingly rare
                assert np.count_nonzero(d) <= max(8, a.size // 1000), transport

        ref_dec = lod.decode_many([reader.read(d) for d in ref])
        got_dec = lod.decode_many([reader.read(d) for d in ref], mesh=mesh)
        for a, b in zip(got_dec, ref_dec):
            assert a.shape == b.shape
            d = np.abs(a - b)
            assert d.max() <= 1.5 * step
            assert np.count_nonzero(d) <= max(8, a.size // 1000)

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
