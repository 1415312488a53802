"""Top-level API facade + seeking tests (mirrors tests/rust/integration_tests,
seeking_tests, duration_timing_tests, metadata zero-copy tests)."""

import numpy as np
import pytest

import flo_tpu
from flo_tpu.core.analysis import SpectralFingerprint
from flo_tpu.core.metadata import FloMetadata


def sine(freq, rate, seconds, amp=0.5):
    t = np.arange(int(rate * seconds), dtype=np.float64) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture(scope="module")
def encoded():
    rate = 8000
    s = sine(440, rate, 2.5)
    return s, rate, flo_tpu.encode(s, rate, 1)


class TestFacade:
    def test_version(self):
        assert flo_tpu.version() == "1.2"

    def test_encode_decode(self, encoded):
        s, rate, data = encoded
        out = flo_tpu.decode(data)
        assert len(out) == len(s)
        assert np.abs(out - s).max() <= 1 / 32768 + 1e-6

    def test_validate(self, encoded):
        _, _, data = encoded
        assert flo_tpu.validate(data)
        corrupted = bytearray(data)
        corrupted[len(corrupted) // 2] ^= 0xFF
        assert not flo_tpu.validate(bytes(corrupted))

    def test_info(self, encoded):
        s, rate, data = encoded
        i = flo_tpu.info(data)
        assert i.version == "1.2"
        assert i.sample_rate == rate and i.channels == 1 and i.bit_depth == 16
        assert i.total_samples == len(s)
        assert i.duration_secs == pytest.approx(2.5, abs=0.01)
        assert i.crc_valid and not i.is_lossy
        assert i.compression_ratio > 1.0

    def test_auto_analysis_embedded(self, encoded):
        _, rate, data = encoded
        meta = flo_tpu.get_metadata(data)
        assert meta.waveform_data is not None
        assert len(meta.waveform_data.peaks) == 125  # 2.5 s * 50/s
        assert meta.spectrum_fingerprint is not None
        fp = SpectralFingerprint.from_bytes(meta.spectrum_fingerprint)
        assert fp.duration_ms == 2500
        assert meta.loudness_profile and meta.loudness_profile[0].lufs < 0
        assert meta.length_ms == 2500

    def test_encode_lossy_facade(self):
        rate = 44100
        s = sine(440, rate, 1.0)
        data = flo_tpu.encode_lossy(s, rate, 1, quality=2)
        i = flo_tpu.info(data)
        assert i.is_lossy and i.lossy_quality == 2
        out = flo_tpu.decode(data)
        m = min(len(out), len(s))
        snr = 10 * np.log10((s[:m] ** 2).sum() / ((out[:m] - s[:m]) ** 2).sum())
        assert snr > 10
        # duration comes from metadata length_ms, not padded total_samples
        assert i.duration_secs == pytest.approx(1.0, abs=0.01)

    def test_encode_with_bitrate(self):
        rate = 44100
        s = sine(440, rate, 1.0)
        lo = flo_tpu.encode_with_bitrate(s, rate, 1, 32)
        hi = flo_tpu.encode_with_bitrate(s, rate, 1, 800)
        assert flo_tpu.info(lo).lossy_quality < flo_tpu.info(hi).lossy_quality

    def test_format_time(self):
        assert flo_tpu.format_time(0) == "0:00"
        assert flo_tpu.format_time(59.9) == "0:59"
        assert flo_tpu.format_time(61) == "1:01"
        assert flo_tpu.format_time(3661) == "1:01:01"
        assert flo_tpu.format_time(-5) == "0:00"
        assert flo_tpu.format_time(float("nan")) == "0:00"
        assert flo_tpu.format_time_ms(61000) == "1:01"


class TestMetadataZeroCopy:
    def test_update_preserves_audio(self, encoded):
        s, _, data = encoded
        new_meta = flo_tpu.create_metadata("New Title", "New Artist", None)
        updated = flo_tpu.update_metadata_bytes(data, new_meta)
        m = flo_tpu.get_metadata(updated)
        assert m.title == "New Title" and m.artist == "New Artist"
        assert flo_tpu.validate(updated)
        np.testing.assert_array_equal(flo_tpu.decode(updated), flo_tpu.decode(data))

    def test_strip(self, encoded):
        _, _, data = encoded
        stripped = flo_tpu.strip_metadata(data)
        assert not flo_tpu.has_metadata(stripped)
        assert flo_tpu.has_metadata(data)
        assert flo_tpu.get_metadata_bytes(stripped) == b""
        assert flo_tpu.validate(stripped)
        np.testing.assert_array_equal(flo_tpu.decode(stripped), flo_tpu.decode(data))

    def test_update_object(self, encoded):
        _, _, data = encoded
        meta = FloMetadata(title="Obj", year=2026)
        updated = flo_tpu.update_metadata(data, meta)
        assert flo_tpu.get_metadata(updated).year == 2026

    def test_bad_magic(self):
        with pytest.raises(ValueError):
            flo_tpu.update_metadata_bytes(b"NOPE" + b"\x00" * 100, b"")


class TestSeeking:
    def test_toc_monotone(self, encoded):
        _, _, data = encoded
        toc = flo_tpu.get_toc(data)
        assert len(toc) == 3  # 2.5 s at 1 s frames
        ts = [e.timestamp_ms for e in toc]
        assert ts == sorted(ts)
        offs = [e.byte_offset for e in toc]
        assert offs == sorted(offs)

    def test_seek_to_time(self, encoded):
        s, rate, data = encoded
        r = flo_tpu.seek_to_time(data, 1500)
        assert r.frame_index == 1
        assert r.timestamp_ms == 1000
        assert r.sample_offset == rate // 2
        assert r.next_timestamp_ms == 2000
        r0 = flo_tpu.seek_to_time(data, 0)
        assert r0.frame_index == 0 and r0.sample_offset == 0
        # Past the end: clamps to last frame.
        rend = flo_tpu.seek_to_time(data, 10_000_000)
        assert rend.frame_index == 2

    def test_decode_frame_matches_full(self, encoded):
        s, rate, data = encoded
        full = flo_tpu.decode(data)
        for fi in range(3):
            frame = flo_tpu.decode_frame_at(data, fi)
            start = fi * rate
            np.testing.assert_array_equal(frame, full[start : start + len(frame)])

    def test_decode_frame_oob(self, encoded):
        _, _, data = encoded
        with pytest.raises(IndexError):
            flo_tpu.decode_frame_at(data, 99)

    def test_lossy_seek_frame0_preroll(self):
        rate = 44100
        s = sine(330, rate, 0.5)
        data = flo_tpu.encode_lossy(s, rate, 1, 3, analyze=False)
        frame0 = flo_tpu.decode_frame_at(data, 0)
        # Frame 0 is the pre-roll block decoded against a zero overlap buffer.
        assert len(frame0) == 1024

    def test_lossy_seek_matches_full(self):
        rate = 44100
        s = sine(330, rate, 1.0)
        data = flo_tpu.encode_lossy(s, rate, 1, 3, analyze=False)
        full = flo_tpu.decode(data)
        toc = flo_tpu.get_toc(data)
        for fi in (1, 2, len(toc) - 1):
            frame = flo_tpu.decode_frame_at(data, fi)
            start = (fi - 1) * 1024  # full decode drops the pre-roll frame
            np.testing.assert_allclose(
                frame, full[start : start + len(frame)], atol=1e-6
            )

    def test_corpus_seek(self, examples_dir):
        data = (examples_dir / "chord_cmajor_stereo.flo").read_bytes()
        full = flo_tpu.decode(data)
        toc = flo_tpu.get_toc(data)
        r = flo_tpu.seek_to_time(data, toc[-1].timestamp_ms)
        assert r.frame_index == len(toc) - 1
        frame = flo_tpu.decode_frame_at(data, 1)
        i = flo_tpu.info(data)
        start = 1 * i.sample_rate * i.channels
        np.testing.assert_array_equal(frame, full[start : start + len(frame)])
