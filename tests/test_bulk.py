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
