"""Fault-injection and boundary tests (mirrors tests/rust/edge_case_tests.rs:
extremes, truncation, corruption, tiny/odd inputs)."""

import numpy as np
import pytest

import flo_tpu
from flo_tpu.container import reader
from flo_tpu.streaming import StreamingDecoder


def sine(freq, rate, n, amp=0.5):
    t = np.arange(n, dtype=np.float64) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


TOL = 1 / 32768 + 1e-6


class TestExtremes:
    def test_full_scale_alternating(self):
        s = np.tile(np.array([1.0, -1.0], np.float32), 2000)
        out = flo_tpu.decode(flo_tpu.encode(s, 2000, 1, analyze=False))
        assert np.abs(out - s).max() <= TOL

    def test_dc_offset(self):
        s = np.full(3000, 0.7, np.float32)
        out = flo_tpu.decode(flo_tpu.encode(s, 1500, 1, analyze=False))
        assert np.abs(out - s).max() <= TOL

    def test_near_zero(self):
        s = np.full(1000, 5e-7, np.float32)  # above silence threshold
        data = flo_tpu.encode(s, 1000, 1, analyze=False)
        out = flo_tpu.decode(data)
        assert len(out) == 1000

    def test_below_silence_threshold(self):
        s = np.full(1000, 5e-8, np.float32)
        data = flo_tpu.encode(s, 1000, 1, analyze=False)
        f = reader.read(data)
        assert all(fr.frame_type == 0 for fr in f.frames)

    def test_stereo_extremes_mid_overflow(self):
        """Loud correlated stereo: mid = L+R beyond i16, must round-trip."""
        l = np.full(2000, 0.999, np.float32)
        r = np.full(2000, 0.998, np.float32)
        s = np.empty(4000, np.float32)
        s[0::2], s[1::2] = l, r
        out = flo_tpu.decode(flo_tpu.encode(s, 2000, 2, analyze=False))
        assert np.abs(out - s).max() <= TOL


class TestMalformedInput:
    def test_bad_magic_decode(self):
        with pytest.raises(Exception):
            flo_tpu.decode(b"NOPE" + b"\x00" * 100)

    def test_empty_bytes(self):
        with pytest.raises(Exception):
            flo_tpu.decode(b"")
        assert not flo_tpu.validate(b"")

    def test_truncated_everywhere(self):
        s = sine(100, 1000, 1500)
        data = flo_tpu.encode(s, 1000, 1, analyze=False)
        for cut in (3, 10, 69, 71, 90, len(data) // 2):
            chunk = data[:cut]
            try:
                flo_tpu.decode(chunk)
            except Exception:
                pass  # must raise or return, never crash the process
            assert not flo_tpu.validate(chunk) or cut == len(data)

    def test_corrupt_data_chunk_fails_validate_not_decode(self):
        s = sine(100, 1000, 2000)
        data = bytearray(flo_tpu.encode(s, 1000, 1, analyze=False))
        f = reader.read(bytes(data))
        pos = 4 + 66 + f.header.toc_size + f.header.data_size // 2
        data[pos] ^= 0x55
        assert not flo_tpu.validate(bytes(data))
        # decode is best-effort on corrupt payloads (reference zero-fills)
        out = flo_tpu.decode(bytes(data))
        assert len(out) == 2000

    def test_streaming_truncated_stream(self):
        s = sine(100, 1000, 2500)
        data = flo_tpu.encode(s, 1000, 1, analyze=False)
        d = StreamingDecoder()
        d.feed(data[: len(data) // 2])
        n = 0
        while d.next_frame() is not None:
            n += 1
        assert 0 < n < 3  # some but not all frames decodable

    def test_oversized_toc_rejected(self):
        import struct

        s = sine(100, 1000, 1000)
        data = bytearray(flo_tpu.encode(s, 1000, 1, analyze=False))
        struct.pack_into("<I", data, 4 + 66, 200_000)  # TOC count
        with pytest.raises(Exception):
            reader.read(bytes(data))


class TestBoundaries:
    @pytest.mark.parametrize("n", [1, 2, 999, 1000, 1001, 2000, 2001])
    def test_sizes_around_frames(self, n):
        s = sine(50, 1000, n)
        out = flo_tpu.decode(flo_tpu.encode(s, 1000, 1, analyze=False))
        assert len(out) == n
        assert np.abs(out - s).max() <= TOL

    def test_odd_interleave_tail_stereo(self):
        # Odd-length interleaved input: dangling sample ignored (frame math
        # uses len // channels).
        s = sine(50, 1000, 2001)
        data = flo_tpu.encode(s, 1000, 2, analyze=False)
        out = flo_tpu.decode(data)
        assert len(out) == 2000

    def test_max_compression_level_clamped(self):
        s = sine(50, 1000, 1000)
        data = flo_tpu.encode(s, 1000, 1, compression_level=99, analyze=False)
        assert reader.read(data).header.compression_level == 9
