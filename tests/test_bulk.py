"""Bulk (multi-file) encode paths: one device pass for a whole corpus."""

import numpy as np
import pytest

from flo_tpu.container import reader
from flo_tpu.core.convert import f32_to_i32_np
from flo_tpu.lossless import decoder as lld
from flo_tpu.lossless import encoder as lle
from flo_tpu.lossy import decoder as lod
from flo_tpu.lossy import encoder as loe


@pytest.fixture(scope="module")
def files():
    rng = np.random.default_rng(0)
    rate = 4000
    out = []
    for i in range(3):
        n = rate * (i + 1) + i * 7
        t = np.arange(n) / rate
        l = (0.4 * np.sin(2 * np.pi * (100 + 40 * i) * t)
             + 0.005 * rng.standard_normal(n)).astype(np.float32)
        r = (0.4 * np.sin(2 * np.pi * (150 + 30 * i) * t)).astype(np.float32)
        s = np.empty(2 * n, np.float32)
        s[0::2], s[1::2] = l, r
        out.append(np.clip(s, -1, 1))
    return rate, out


class TestBulkLossless:
    def test_bulk_equals_single_byte_identical(self, files):
        # analysis="exact" is the reference-parity path and byte-identical to
        # the single-file facade; the bulk DEFAULT is analysis="device"
        # (bit-exact round-trips, sizes may drift <= 1 byte — see
        # TestDeviceAnalysis below).
        rate, fs = files
        bulk = lle.encode_many(fs, rate, 2, 16, 5, analysis="exact")
        for i, s in enumerate(fs):
            assert bulk[i] == lle.encode(s, rate, 2, 16, 5)

    def test_bulk_bit_exact(self, files):
        rate, fs = files
        bulk = lle.encode_many(fs, rate, 2, 16, 8)
        for i, s in enumerate(fs):
            got = lld.decode_file_i32(reader.read(bulk[i]))
            np.testing.assert_array_equal(got, f32_to_i32_np(s).reshape(-1, 2))

    def test_bulk_with_silence_and_empty(self, files):
        rate, fs = files
        mixed = [np.zeros(rate, np.float32).repeat(2), fs[0], np.zeros(0, np.float32)]
        out = lle.encode_many(mixed, rate, 2, 16, 5)
        f0 = reader.read(out[0])
        assert all(fr.frame_type == 0 for fr in f0.frames)
        assert reader.read(out[2]).header.total_samples == 0

    def test_half_silent_frame_roundtrip(self, files):
        """A frame silent in its first half exercises interior zero-width
        blocks in the download transport (regression: decoded all-zero; the
        spread's empty-block deferral only handled trailing empties)."""
        rate, fs = files
        rng = np.random.default_rng(5)
        a = (rng.standard_normal(rate * 2) * 0.3).astype(np.float32)
        a[: rate] = 0.0          # first half of the single frame silent
        b = (rng.standard_normal(rate * 2) * 0.3).astype(np.float32)
        b[rate // 2 : rate] = 0.0  # and one with mid-frame silence
        from flo_tpu.core.convert import i32_to_f32_np

        blobs = lle.encode_many([a, b], rate, 2, 16, 5)
        decs = lld.decode_many([reader.read(x) for x in blobs])
        for src, d in zip([a, b], decs):
            np.testing.assert_allclose(
                d, i32_to_f32_np(f32_to_i32_np(src)), atol=1 / 32768 + 1e-6
            )


class TestDeviceAnalysis:
    """analysis='device': zero host analysis, still bit-exact round-trips."""

    def test_bit_exact_and_size_drift(self, files):
        rate, fs = files
        exact = lle.encode_many(fs, rate, 2, 16, 8)
        dev = lle.encode_many(fs, rate, 2, 16, 8, analysis="device")
        for s, e_blob, d_blob in zip(fs, exact, dev):
            ints = lld.decode_file_i32(reader.read(d_blob))
            np.testing.assert_array_equal(ints, f32_to_i32_np(s).reshape(-1, 2))
            assert abs(len(d_blob) - len(e_blob)) <= 0.02 * len(e_blob)

    def test_mono_and_level0(self, files):
        rate, fs = files
        mono = [f[0::2].copy() for f in fs]
        dev = lle.encode_many(mono, rate, 1, 16, 0, analysis="device")
        for s, d in zip(mono, dev):
            ints = lld.decode_file_i32(reader.read(d))
            np.testing.assert_array_equal(ints[:, 0], f32_to_i32_np(s))


class TestBulkLossy:
    def test_bulk_sizes_match_single(self, files):
        rate, fs = files
        bulk = loe.encode_many(fs, rate, 2, 0.55)
        for i, s in enumerate(fs):
            single = loe.encode(s, rate, 2, 0.55)
            # f32 batch rounding may flip ulps; sizes and fidelity must agree.
            assert abs(len(bulk[i]) - len(single)) <= 0.01 * len(single)
            a, b = lod.decode(bulk[i]), lod.decode(single)
            m = min(len(a), len(b))
            # 3.1e-5 = two i16 wire-transport quanta (lossy decode outputs
            # travel x32767-quantized, ~40 dB below codec noise).
            assert np.abs(a[:m] - b[:m]).max() < 3.1e-5

    def test_csr_sparse_pack_byte_identical(self, files, monkeypatch):
        """The collect's native CSR sparse pack (entries -> RLE, no dense
        grid) must emit byte-identical FILES to the dense fallback path
        (flat=None in fin): force the fallback by disabling the native CSR
        encoder and compare whole encoded files."""
        from flo_tpu import native

        rate, fs = files
        csr = loe.encode_many(fs, rate, 2, 0.55)
        monkeypatch.setattr(native, "sparse_encode_entries_csr",
                            lambda *a, **k: None)
        dense = loe.encode_many(fs, rate, 2, 0.55)
        for a, b in zip(csr, dense):
            assert a == b

    def test_bulk_snr(self, files):
        rate, fs = files
        bulk = loe.encode_many(fs, rate, 2, 1.0)
        for s, data in zip(fs, bulk):
            out = lod.decode(data)
            m = min(len(out), len(s))
            snr = 10 * np.log10((s[:m] ** 2).sum() / max(((out[:m] - s[:m]) ** 2).sum(), 1e-30))
            assert snr > 25

    def test_packed_upload_transport(self, files):
        """The block-packed upload (transport_dtype='packed'; 'rice16' is a
        legacy alias) matches the f32 transport in size and fidelity (i16
        rounding is ~two orders below codec noise at every preset)."""
        rate, fs = files
        a = loe.encode_many(fs, rate, 2, 0.35)
        b = loe.encode_many(fs, rate, 2, 0.35, transport_dtype="packed")
        for s, da, db in zip(fs, a, b):
            assert abs(len(da) - len(db)) <= 0.02 * len(da)
            oa, ob = lod.decode(da), lod.decode(db)
            m = min(len(oa), len(ob), len(s))
            snr_a = 10 * np.log10((s[:m] ** 2).sum() / max(((oa[:m] - s[:m]) ** 2).sum(), 1e-30))
            snr_b = 10 * np.log10((s[:m] ** 2).sum() / max(((ob[:m] - s[:m]) ** 2).sum(), 1e-30))
            assert abs(snr_a - snr_b) < 0.5


class TestChunkedFallbackPaths:
    """>=4 files -> two device chunks. Later chunks' sparse-entries assembly
    dispatches SPECULATIVELY at the previous chunk's bucket before their own
    size read (lossy/encoder.py fin); a too-small bucket must redispatch at
    the exact size. Both branches must be byte/fidelity-equivalent to the
    single-file path."""

    def _speculative_calls(self, monkeypatch):
        from flo_tpu.ops import compact as compact_mod

        calls = []
        real = compact_mod.assemble_entries

        def spy(comp, blk_nnz, NE):
            calls.append(NE)
            return real(comp, blk_nnz, NE=NE)

        monkeypatch.setattr(compact_mod, "assemble_entries", spy)
        return calls

    def _quintet(self, quiet_first: bool):
        # 5 files -> 3 chunks (files {0,1}, {2,3}, {4}): the speculative
        # dispatch only arms from the 3rd chunk on (chunk k+1's assembly is
        # dispatched while chunk k's sizes download; ne_spec is None during
        # chunk 0). The lone last file is dense noise (quiet_first) so its
        # ~128k entries overflow the quiet chunks' 65536-entry floor bucket
        # (MISS), or quiet so the noise chunks' bucket covers it (HIT).
        rng = np.random.default_rng(11)
        rate = 8000
        n_q, n_n = rate * 4, rate * 8
        quiet = [
            (0.01 * np.sin(2 * np.pi * 220 * np.arange(2 * n_q) / rate)
             ).astype(np.float32)
            for _ in range(4)
        ]
        noise = [
            np.clip(0.8 * rng.standard_normal(2 * n_n), -1, 1).astype(np.float32)
        ]
        return rate, (quiet + noise) if quiet_first else (noise + noise + quiet[:3])

    @pytest.mark.parametrize("quiet_first", [True, False])
    def test_lossy_speculative_bucket(self, quiet_first, monkeypatch):
        rate, fs = self._quintet(quiet_first)
        calls = self._speculative_calls(monkeypatch)
        bulk = loe.encode_many(fs, rate, 2, 1.0)
        # exact(chunk0) + exact(chunk1) + speculative(chunk2)
        # (+ an exact redispatch when the speculative bucket missed).
        n_calls = len(calls)
        if quiet_first:
            assert n_calls == 4, f"expected speculative MISS path, calls={calls}"
        else:
            assert n_calls == 3, f"expected speculative HIT path, calls={calls}"
        for s, blob in zip(fs, bulk):
            single = loe.encode(s, rate, 2, 1.0)
            assert abs(len(blob) - len(single)) <= max(0.01 * len(single), 64)
            a, b = lod.decode(blob), lod.decode(single)
            m = min(len(a), len(b))
            assert np.abs(a[:m] - b[:m]).max() < 3.1e-5

    def test_decode_worst_bucket_overflow_redispatch(self, files, monkeypatch):
        """Corrupt-stream route: when a block's packed width exceeds the
        static PCM worst-case bucket, decode_many must redispatch the PCM
        pack at the exact entropy bucket (lossless/decoder.py collect).
        Forced here by shrinking PCM_WORST_BITS under real content; the
        decode must stay bit-exact. Rate 4096 keeps the jitted decode step's
        (channels, S) key unique so the patched bound is traced fresh."""
        from flo_tpu.ops import blockpack

        rate = 4096
        rng = np.random.default_rng(3)
        fs = [
            np.clip(0.5 * rng.standard_normal(rate * 2 * (i + 1)), -1, 1).astype(np.float32)
            for i in range(2)
        ]
        blobs = lle.encode_many(fs, rate, 2, 16, 5)
        flos = [reader.read(b) for b in blobs]
        want = lld.decode_many([reader.read(b) for b in blobs])

        # The worst-case NW is baked in at trace time; drop the jit cache so
        # the patched bound is actually traced into the decode step.
        import jax

        jax.clear_caches()
        stage2_nws = []
        real_stage2 = blockpack.pack_rows_stage2

        def spy_stage2(*a, **kw):
            stage2_nws.append(kw.get("NW"))
            return real_stage2(*a, **kw)

        monkeypatch.setattr(blockpack, "pack_rows_stage2", spy_stage2)
        monkeypatch.setattr(blockpack, "PCM_WORST_BITS", 1)
        got = lld.decode_many(flos)
        # One trace-time call from the fused pack (tiny patched bound) plus
        # at least one runtime redispatch at the larger entropy bucket.
        assert len(stage2_nws) >= 2 and max(stage2_nws) > min(stage2_nws), stage2_nws
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


class TestShapeBuckets:
    """use_shape_buckets(): batch axes pad to {1,1.5}x2^k buckets so varied
    geometries hit a bounded compiled-program set; outputs must be unchanged
    (padding rows are the inert nvalid=0 lanes mesh padding already uses)."""

    def test_pad_batch_buckets(self):
        from flo_tpu.parallel import pipeline as pp

        assert pp.pad_batch(5, None) == 5  # off by default
        with pp.use_shape_buckets():
            assert pp.pad_batch(1, None) == 4
            assert pp.pad_batch(5, None) == 6
            assert pp.pad_batch(7, None) == 8
            assert pp.pad_batch(13, None) == 16
            assert pp.pad_batch(0, None) == 0
            assert pp.bucket_count(24) == 24
        assert pp.pad_batch(5, None) == 5

    def test_bucketed_lossless_byte_identical(self, files):
        from flo_tpu.parallel import pipeline as pp

        rate, fs = files
        want = lle.encode_many(fs, rate, 2, 16, 5, analysis="exact")
        with pp.use_shape_buckets():
            got = lle.encode_many(fs, rate, 2, 16, 5, analysis="exact")
        assert got == want

    def test_bucketed_decode_bit_exact(self, files):
        from flo_tpu.parallel import pipeline as pp

        rate, fs = files
        flos = [reader.read(b) for b in lle.encode_many(fs, rate, 2, 16, 5)]
        want = lld.decode_many(flos)
        with pp.use_shape_buckets():
            got = lld.decode_many(flos)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_bucketed_lossy_equivalent(self, files):
        from flo_tpu.parallel import pipeline as pp

        rate, fs = files
        want = loe.encode_many(fs, rate, 2, 0.55)
        with pp.use_shape_buckets():
            got = loe.encode_many(fs, rate, 2, 0.55)
        for s, a, b in zip(fs, want, got):
            assert abs(len(a) - len(b)) <= max(0.01 * len(a), 64)
            oa, ob = lod.decode(a), lod.decode(b)
            m = min(len(oa), len(ob))
            # Same bound as the mesh-sharded equality tests: the f32 FFT
            # stages are ulp-nondeterministic across batch shapes.
            assert np.abs(oa[:m] - ob[:m]).max() < 3.1e-5
