"""Lossless encoder tests.

Mirrors the reference's test strategy (tests/rust/lossless_encoder_tests.rs,
lossless_decoder_tests.rs:92-107, edge_case_tests.rs): synthetic deterministic
signals, round-trip with quantization-bounded tolerance, compression-ratio
floors, silence handling, frame-boundary edges.
"""

import numpy as np
import pytest

from flo_tpu.container import reader
from flo_tpu.core import crc32
from flo_tpu.core.constants import FrameType
from flo_tpu.core.convert import f32_to_i32_np
from flo_tpu.lossless import decoder, encoder

TOL = 1.0 / 32768.0 + 1e-6


def sine(freq, rate, seconds, amp=0.5):
    t = np.arange(int(rate * seconds), dtype=np.float64) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def stereo_interleave(l, r):
    out = np.empty(2 * len(l), dtype=np.float32)
    out[0::2] = l
    out[1::2] = r
    return out


def roundtrip(samples, rate, channels, level=5):
    data = encoder.encode(samples, rate, channels, 16, level)
    out = decoder.decode(data)
    return data, out


def assert_close(inp, out):
    assert len(out) == len(inp)
    assert np.max(np.abs(out - inp), initial=0.0) <= TOL


class TestRoundTrip:
    def test_sine_mono(self):
        s = sine(440, 8000, 1.0)
        _, out = roundtrip(s, 8000, 1)
        assert_close(s, out)

    def test_sine_stereo_correlated(self):
        l = sine(440, 8000, 1.5)
        r = 0.8 * l
        s = stereo_interleave(l, r)
        data, out = roundtrip(s, 8000, 2)
        assert_close(s, out)
        f = reader.read(data)
        # Correlated stereo should trigger mid/side on at least one frame.
        assert any(fr.flags & 0x01 for fr in f.frames)

    def test_bit_exact_integer_domain(self):
        rng = np.random.default_rng(7)
        l = sine(220, 8000, 1.0) + 0.01 * rng.standard_normal(8000).astype(np.float32)
        r = sine(330, 8000, 1.0) + 0.01 * rng.standard_normal(8000).astype(np.float32)
        s = np.clip(stereo_interleave(l, r), -1.0, 1.0)
        data = encoder.encode(s, 8000, 2, 16, 8)
        ints = decoder.decode_file_i32(reader.read(data))
        expect = f32_to_i32_np(s).reshape(-1, 2)
        np.testing.assert_array_equal(ints, expect)

    @pytest.mark.parametrize("level", [0, 1, 2, 3, 4, 5, 7, 9])
    def test_all_levels(self, level):
        rng = np.random.default_rng(level)
        s = sine(100, 4000, 1.2) + 0.002 * rng.standard_normal(4800).astype(np.float32)
        s = np.clip(s, -1.0, 1.0).astype(np.float32)
        _, out = roundtrip(s, 4000, 1, level)
        assert_close(s, out)

    @pytest.mark.parametrize("n_off", [-1, 0, 1])
    def test_frame_boundary(self, n_off):
        rate = 1000
        n = 2 * rate + n_off
        s = sine(50, rate, n / rate)[:n]
        _, out = roundtrip(s, rate, 1)
        assert_close(s, out)

    @pytest.mark.parametrize("n", [1, 2, 5, 13])
    def test_tiny_inputs(self, n):
        s = (np.linspace(-0.9, 0.9, n)).astype(np.float32)
        _, out = roundtrip(s, 8000, 1)
        assert_close(s, out)

    def test_extremes_and_dc(self):
        s = np.array([1.0, -1.0] * 500 + [0.25] * 500, dtype=np.float32)
        _, out = roundtrip(s, 1000, 1)
        assert_close(s, out)

    def test_noise_stereo(self):
        rng = np.random.default_rng(3)
        s = (0.3 * rng.standard_normal(2 * 4410)).clip(-1, 1).astype(np.float32)
        data = encoder.encode(s, 4410, 2, 16, 5)
        ints = decoder.decode_file_i32(reader.read(data))
        expect = f32_to_i32_np(s).reshape(-1, 2)
        np.testing.assert_array_equal(ints, expect)


class TestFrames:
    def test_silence(self):
        s = np.zeros(44100, dtype=np.float32)
        data = encoder.encode(s, 44100, 1)
        f = reader.read(data)
        assert len(f.frames) == 1
        assert f.frames[0].frame_type == FrameType.SILENCE
        assert len(data) < 200
        out = decoder.decode(data)
        assert len(out) == 44100 and np.all(out == 0)

    def test_mixed_silence_and_tone(self):
        rate = 2000
        s = np.concatenate([np.zeros(rate, np.float32), sine(100, rate, 1.0)])
        data = encoder.encode(s, rate, 1)
        f = reader.read(data)
        assert f.frames[0].frame_type == FrameType.SILENCE
        assert f.frames[1].frame_type != FrameType.SILENCE
        _, out = roundtrip(s, rate, 1)
        assert_close(s, out)

    def test_empty_input(self):
        data = encoder.encode(np.zeros(0, np.float32), 44100, 1)
        f = reader.read(data)
        assert f.header.total_samples == 0
        assert len(f.frames) == 0

    def test_no_corrupt_raw_frames(self):
        """Frames typed Raw must contain true i16 PCM payloads (our fix for
        the reference's fixed-0/raw frame-typing bug)."""
        rng = np.random.default_rng(11)
        # Low-amplitude white noise: fixed-0 tends to beat raw here.
        s = (0.01 * rng.standard_normal(4000)).astype(np.float32)
        data = encoder.encode(s, 4000, 1, 16, 5)
        f = reader.read(data)
        for fr in f.frames:
            if fr.frame_type == FrameType.RAW:
                for ch in fr.channels:
                    assert len(ch.residuals) == 2 * fr.frame_samples
        ints = decoder.decode_file_i32(f)
        np.testing.assert_array_equal(ints[:, 0], f32_to_i32_np(s))


class TestCompression:
    def test_ratio_tonal_stereo(self):
        l = sine(440, 44100, 2.0, amp=0.6)
        r = sine(660, 44100, 2.0, amp=0.6)
        s = stereo_interleave(l, r)
        data = encoder.encode(s, 44100, 2, 16, 5)
        raw_size = len(s) * 2
        assert raw_size / len(data) > 2.0

    def test_higher_level_not_worse(self):
        rng = np.random.default_rng(5)
        s = sine(200, 8000, 2.0) + 0.01 * rng.standard_normal(16000).astype(np.float32)
        s = np.clip(s, -1, 1).astype(np.float32)
        size0 = len(encoder.encode(s, 8000, 1, 16, 0))
        size8 = len(encoder.encode(s, 8000, 1, 16, 8))
        assert size8 <= size0

    def test_crc_and_header(self):
        s = sine(440, 4000, 1.0)
        data = encoder.encode(s, 4000, 1, 16, 5)
        f = reader.read(data)
        ds = 4 + 66 + f.header.toc_size
        assert crc32.compute(data[ds : ds + f.header.data_size]) == f.header.data_crc32
        assert f.header.total_samples == 4000
        assert f.header.sample_rate == 4000
        assert f.header.compression_level == 5
        assert not f.header.is_lossy
