"""AAC/M4A ingest (flo_tpu.aac over the system libavformat/libavcodec).

Ground truth comes from the system AAC *encoder* (flo_ingest_encode_aac,
an independent canonical implementation — the analog of tests/mp3_writer.py
for MP3), so these tests exercise exactly the reference's CLI flow
`flo encode in.m4a out.flo` (reflo/src/main.rs:218-290, Symphonia `aac` +
`isomp4` features per reflo/Cargo.toml:31-41) end to end.

AAC is a lossy codec with encoder delay (priming) that ADTS cannot signal,
so comparisons align by cross-correlation before measuring SNR.
"""

import numpy as np
import pytest

from flo_tpu import aac, audio_io, cli

pytestmark = pytest.mark.skipif(
    not aac.available(), reason="system libavformat/libavcodec not present"
)


def _tone(rate, seconds, channels, seed=7):
    n = int(rate * seconds)
    t = np.arange(n) / rate
    rng = np.random.default_rng(seed)
    out = np.empty(n * channels, np.float32)
    for c in range(channels):
        f = 330.0 * (c + 1)
        out[c::channels] = 0.45 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(n)
    return out


def _aligned_snr(ref, got, channels, max_lag=8192):
    """SNR in dB after aligning for AAC encoder delay (priming samples)."""
    r = ref.reshape(-1, channels).astype(np.float64).mean(axis=1)
    g = got.reshape(-1, channels).astype(np.float64).mean(axis=1)
    probe = r[: min(len(r), 4096)]
    best_lag, best_c = 0, -np.inf
    for lag in range(0, min(max_lag, max(1, len(g) - len(probe)))):
        c = float(np.dot(probe, g[lag : lag + len(probe)]))
        if c > best_c:
            best_c, best_lag = c, lag
    ra = ref.reshape(-1, channels)
    ga = got.reshape(-1, channels)[best_lag:]
    n = min(len(ra), len(ga))
    err = ra[:n].astype(np.float64) - ga[:n].astype(np.float64)
    sig = np.mean(ra[:n].astype(np.float64) ** 2)
    return 10 * np.log10(sig / max(np.mean(err**2), 1e-30))


class TestDecode:
    @pytest.mark.parametrize("channels", [1, 2])
    def test_adts_roundtrip_snr(self, channels):
        rate = 44100
        x = _tone(rate, 1.0, channels)
        data = aac.encode_for_tests(x, rate, channels, "adts")
        assert data[0] == 0xFF and (data[1] & 0xF6) == 0xF0  # ADTS sync
        d = aac.decode(data)
        assert d.sample_rate == rate and d.channels == channels
        assert len(d.samples) >= len(x)  # priming/padding, never truncation
        assert _aligned_snr(x, d.samples, channels) > 15.0

    def test_m4a_roundtrip_snr(self):
        rate = 48000
        x = _tone(rate, 1.0, 2)
        data = aac.encode_for_tests(x, rate, 2, "m4a")
        assert data[4:8] == b"ftyp"
        d = aac.decode(data)
        assert d.sample_rate == rate and d.channels == 2
        assert _aligned_snr(x, d.samples, 2) > 15.0

    def test_m4a_tags(self):
        x = _tone(44100, 0.25, 1)
        data = aac.encode_for_tests(
            x, 44100, 1, "m4a", title="Süite", artist="Ensemble"
        )
        md = aac.decode(data).metadata
        assert md.title == "Süite"
        assert md.artist == "Ensemble"
        assert md.source_format == "aac"

    def test_dispatch_via_audio_io(self):
        x = _tone(44100, 0.25, 2)
        for container, expect_fmt in (("adts", "aac"), ("m4a", "m4a"), ("mp4", "m4a")):
            data = aac.encode_for_tests(x, 44100, 2, container)
            samples, rate, ch, md = audio_io.read_audio_from_bytes(data)
            assert (rate, ch) == (44100, 2)
            assert md.source_format == expect_fmt

    def test_id3_prefixed_adts_routed_to_aac(self):
        # Some ADTS files carry a leading ID3v2 tag; the sniffer must peek
        # past it at the sync frame's layer bits and route to AAC, not MP3.
        x = _tone(44100, 0.25, 1)
        adts = aac.encode_for_tests(x, 44100, 1, "adts")
        tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 0])  # empty v2.4 tag
        samples, rate, ch, md = audio_io.read_audio_from_bytes(tag + adts)
        assert (rate, ch) == (44100, 1)
        assert md.source_format == "aac"

    def test_garbage_rejected(self):
        with pytest.raises(audio_io.UnsupportedFormatError):
            aac.decode(bytes([0xFF, 0xF1]) + b"\x00" * 64)
        with pytest.raises(audio_io.UnsupportedFormatError):
            aac.decode(b"\x00\x00\x00\x18ftypM4A junkjunkjunk")
        with pytest.raises(audio_io.UnsupportedFormatError):
            aac.decode(b"")


class TestCliFlow:
    @pytest.mark.parametrize("container,suffix", [("adts", "aac"), ("m4a", "m4a")])
    def test_encode_aac_to_flo(self, tmp_path, container, suffix):
        """`flo encode in.m4a out.flo` — the last ingest format (VERDICT r3 #1)."""
        rate = 44100
        x = _tone(rate, 1.0, 2)
        src = tmp_path / f"in.{suffix}"
        src.write_bytes(
            aac.encode_for_tests(
                x, rate, 2, container, title="FromAac", artist="A"
            )
        )
        dst = tmp_path / "out.flo"
        assert cli.main(["encode", str(src), str(dst)]) == 0 and dst.exists()

        from flo_tpu import lib, reflo

        blob = dst.read_bytes()
        assert lib.validate(blob)
        decoded, drate, dch = reflo.decode_to_samples(blob)
        assert (drate, dch) == (rate, 2)
        assert _aligned_snr(x, np.asarray(decoded), 2) > 12.0
        if container == "m4a":
            meta = lib.get_metadata(blob)
            assert meta.title == "FromAac" and meta.artist == "A"
