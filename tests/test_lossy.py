"""Lossy codec tests.

Mirrors the reference's lossy test strategy (tests/rust/lossy_mdct_tests.rs,
lossy_transform_tests.rs, lossy_decoder_tests.rs, lossy_psychoacoustic_tests.rs):
window invariants + MDCT oracle, SNR floors, sparse RLE round-trips,
ATH/bark properties — plus cross-implementation conformance on the reference
corpus (decoding reference-encoded lossy files).
"""

import numpy as np
import pytest

from flo_tpu.container import reader
from flo_tpu.lossless import decoder as lossless_decoder
from flo_tpu.lossy import decoder as ldec
from flo_tpu.lossy import encoder as lenc
from flo_tpu.lossy.presets import QualityPreset
from flo_tpu.lossy.sparse import (
    decode_varint,
    deserialize_sparse,
    encode_varint,
    serialize_sparse,
)
from flo_tpu.ops import mdct, psycho


def sine(freq, rate, seconds, amp=0.5):
    t = np.arange(int(rate * seconds), dtype=np.float64) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def snr_db(ref, out):
    m = min(len(ref), len(out))
    noise = out[:m] - ref[:m]
    return 10 * np.log10(np.sum(ref[:m] ** 2) / max(np.sum(noise**2), 1e-30))


class TestMdct:
    def test_windows(self):
        for wname in ("sine", "vorbis", "kbd"):
            for n in (256, 2048):
                w = mdct._WINDOWS[wname](n)
                assert w.shape == (n,)
                assert np.all(w >= 0) and np.all(w <= 1.0 + 1e-6)
                np.testing.assert_allclose(w, w[::-1], atol=2e-6)

    def test_princen_bradley(self):
        for wname in ("sine", "vorbis", "kbd"):
            w = mdct._WINDOWS[wname](2048).astype(np.float64)
            pb = w[:1024] ** 2 + w[1024:] ** 2
            np.testing.assert_allclose(pb, 1.0, atol=1e-4)

    def test_forward_matches_oracle(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 2048)).astype(np.float32)
        got = np.asarray(mdct.forward(x))
        want = mdct.mdct_oracle(x, 2048)
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 1e-5

    def test_perfect_reconstruction(self):
        rng = np.random.default_rng(1)
        sig = (0.5 * rng.standard_normal((1, 8 * 1024))).astype(np.float32)
        blocks = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(sig, 2048, axis=1)[:, ::1024]
        )
        segs = np.asarray(mdct.overlap_add(mdct.inverse(mdct.forward(blocks))))
        out = segs.reshape(-1)
        lo, hi = 1024, 6 * 1024
        assert np.abs(out[lo:hi] - sig[0, lo:hi]).max() < 1e-5


class TestPsycho:
    def test_ath_shape_and_range(self):
        f = np.array([10.0, 20.0, 100.0, 1000.0, 3300.0, 20000.0, 25000.0])
        a = psycho.ath_db(f)
        assert a[0] == 96.0 and a[-1] == 96.0
        assert np.all(a >= -10.0) and np.all(a <= 96.0)
        # ATH has its minimum region near 3-4 kHz.
        assert a[4] < a[2] and a[4] < a[5]

    def test_bark_band_mapping(self):
        assert psycho.freq_to_bark_band(50.0) == 0
        assert psycho.freq_to_bark_band(150.0) == 1
        assert psycho.freq_to_bark_band(21000.0) == 24
        bands = psycho.freq_to_bark_band(np.linspace(0, 22050, 1024))
        assert np.all(np.diff(bands) >= 0)

    def test_bark_monotone(self):
        f = np.linspace(20, 20000, 100)
        b = psycho.freq_to_bark(f)
        assert np.all(np.diff(b) > 0)
        assert b.min() >= 0 and b.max() <= 24

    def test_spreading_matrix(self):
        m = psycho.spreading_matrix_db()
        assert m.shape == (25, 25)
        np.testing.assert_allclose(np.diag(m), 0.0, atol=1e-6)
        # Downward masking unattenuated (reference quirk), upward -25 dB/Bark.
        assert m[10, 5] == 0.0
        np.testing.assert_allclose(m[10, 12], -50.0, atol=1e-3)

    def test_smr_tone_peaks_in_tone_band(self):
        rate = 44100
        sig = sine(1000, rate, 0.1, amp=0.5)
        block = np.zeros((1, 1, 2048), np.float32)
        block[0, 0] = sig[:2048]
        coeffs = np.asarray(mdct.forward(block))
        s = np.asarray(psycho.smr(coeffs, rate, 2048))
        assert s.shape == (1, 1, 1024)
        peak_bin = int(np.abs(coeffs[0, 0]).argmax())
        assert s[0, 0, peak_bin] > 0


class TestSparse:
    def test_varint_roundtrip(self):
        for v in [0, 1, 127, 128, 300, 65535, 2**21, 2**32 - 1]:
            enc = encode_varint(v)
            dec, pos = decode_varint(enc, 0)
            assert dec == v and pos == len(enc)

    @pytest.mark.parametrize(
        "row",
        [
            np.zeros(64, np.int16),
            np.ones(64, np.int16),
            np.array([0, 0, 5, -3, 0, 0, 0, 7] + [0] * 56, np.int16),
            np.arange(-300, 724, dtype=np.int16),
        ],
    )
    def test_sparse_roundtrip(self, row):
        blob = serialize_sparse(row)
        out = deserialize_sparse(blob, len(row))
        np.testing.assert_array_equal(out, row)

    def test_sparse_long_nonzero_run(self):
        rng = np.random.default_rng(0)
        row = rng.integers(1, 100, size=1024).astype(np.int16)
        out = deserialize_sparse(serialize_sparse(row), 1024)
        np.testing.assert_array_equal(out, row)

    def test_sparse_random(self):
        rng = np.random.default_rng(1)
        row = rng.integers(-5, 5, size=1024).astype(np.int16)
        row[rng.random(1024) < 0.7] = 0
        out = deserialize_sparse(serialize_sparse(row), 1024)
        np.testing.assert_array_equal(out, row)


class TestPresets:
    def test_u8_f32_maps(self):
        assert QualityPreset.from_u8(0).as_f32() == 0.0
        assert QualityPreset.from_u8(1).as_f32() == 0.35
        assert QualityPreset.from_u8(4).as_f32() == 1.0
        assert QualityPreset.from_u8(9) == QualityPreset.TRANSPARENT

    def test_from_f32(self):
        assert QualityPreset.from_f32(0.1) == QualityPreset.LOW
        assert QualityPreset.from_f32(0.5) == QualityPreset.HIGH
        assert QualityPreset.from_f32(0.9) == QualityPreset.TRANSPARENT

    def test_from_bitrate(self):
        assert QualityPreset.from_bitrate(48, 44100, 2) == QualityPreset.LOW
        # 1411 kbps raw / 320 = 4.41 > 4.0 -> VeryHigh (lossy/mod.rs:87-103).
        assert QualityPreset.from_bitrate(320, 44100, 2) == QualityPreset.VERY_HIGH
        assert QualityPreset.from_bitrate(400, 44100, 2) == QualityPreset.TRANSPARENT


class TestEndToEnd:
    def test_sine_snr_floor(self):
        rate = 44100
        sig = sine(440, rate, 1.0)
        data = lenc.encode(sig, rate, 1, 0.0)
        out = ldec.decode(data)
        assert snr_db(sig, out) > 10.0  # reference floor (lossy_transform_tests.rs:183)

    def test_quality_monotone(self):
        rate = 44100
        sig = sine(440, rate, 1.0)
        snrs, sizes = [], []
        for q in (0.0, 0.55, 1.0):
            data = lenc.encode(sig, rate, 1, q)
            snrs.append(snr_db(sig, ldec.decode(data)))
            sizes.append(len(data))
        assert snrs[0] < snrs[1] < snrs[2]
        assert sizes[0] <= sizes[1] <= sizes[2]

    def test_stereo(self):
        rate = 22050
        l = sine(440, rate, 0.7)
        r = sine(660, rate, 0.7)
        s = np.empty(2 * len(l), np.float32)
        s[0::2] = l
        s[1::2] = r
        data = lenc.encode(s, rate, 2, 0.75)
        f = reader.read(data)
        assert f.header.is_lossy
        assert f.header.lossy_quality == 3
        assert f.header.channels == 2
        out = ldec.decode(data)
        assert snr_db(s, out.astype(np.float32)) > 15.0

    def test_header_fields(self):
        rate = 8000
        sig = sine(200, rate, 0.5)
        data = lenc.encode(sig, rate, 1, 1.0)
        f = reader.read(data)
        assert f.header.is_lossy and f.header.lossy_quality == 4
        # total_samples counts hops*1024 incl. pre-roll/pad (encoder.rs:229-238).
        n_hops = -(-(len(sig) + 1024) // 1024)
        assert f.header.total_samples == n_hops * 1024
        assert all(fr.frame_samples == 1024 for fr in f.frames)

    def test_compression_ratio_envelope(self):
        rate = 44100
        l = sine(262, rate, 2.0, 0.4) + sine(330, rate, 2.0, 0.3) + sine(392, rate, 2.0, 0.3)
        s = np.empty(2 * len(l), np.float32)
        s[0::2] = l
        s[1::2] = l * 0.9
        raw = len(s) * 2
        low = lenc.encode(s, rate, 2, 0.0)
        high = lenc.encode(s, rate, 2, 1.0)
        assert raw / len(low) > 8.0
        assert raw / len(high) > 2.0


class TestCorpusConformance:
    """Decode reference-encoded lossy files (cross-implementation check)."""

    def test_lossy_chord_files(self, examples_dir):
        ref = lossless_decoder.decode((examples_dir / "chord_cmajor_stereo.flo").read_bytes())
        floors = {
            "lossy_chord_low": 20.0,
            "lossy_chord_medium": 30.0,
            "lossy_chord_high": 35.0,
            "lossy_chord_veryhigh": 40.0,
            "lossy_chord_transparent": 45.0,
        }
        prev = -1e9
        for name, floor in floors.items():
            out = ldec.decode((examples_dir / f"{name}.flo").read_bytes())
            s = snr_db(ref, out.astype(np.float32))
            assert s > floor, (name, s)
            assert s > prev, (name, s, prev)
            prev = s

    def test_encode_size_parity(self, examples_dir):
        """Re-encoding the chord signal lands within 15% of the reference's
        own lossy file sizes at every preset (measured: 3-8% smaller)."""
        sig = lossless_decoder.decode(
            (examples_dir / "chord_cmajor_stereo.flo").read_bytes()
        )
        for name, q in [("low", 0.0), ("medium", 0.35), ("high", 0.55),
                        ("veryhigh", 0.75), ("transparent", 1.0)]:
            ours = len(lenc.encode(sig, 44100, 2, q))
            ref = (examples_dir / f"lossy_chord_{name}.flo").stat().st_size
            assert 0.85 * ref <= ours <= 1.15 * ref, (name, ours, ref)

    def test_lossy_headers(self, examples_dir):
        for p in examples_dir.glob("lossy_*.flo"):
            f = reader.read(p.read_bytes())
            assert f.header.is_lossy
            out = ldec.decode_file(f)
            assert len(out) == (len(f.frames) - 1) * 1024 * f.header.channels
