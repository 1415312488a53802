"""CLI + reflo-layer + audio I/O tests (mirrors reflo/tests/encode_decode_tests.rs
and the CLI surface of reflo/src/main.rs)."""

import json

import numpy as np
import pytest

from flo_tpu import audio_io, cli, lib, reflo
from flo_tpu.core.metadata import FloMetadata


def sine(freq, rate, seconds, amp=0.5):
    t = np.arange(int(rate * seconds), dtype=np.float64) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture()
def wav_file(tmp_path):
    rate = 8000
    s = sine(440, rate, 1.5)
    p = tmp_path / "in.wav"
    p.write_bytes(audio_io.write_wav_to_bytes(s, rate, 1))
    return p, s, rate


class TestAudioIO:
    def test_wav_f32_roundtrip(self):
        s = sine(440, 8000, 0.5)
        wav = audio_io.write_wav_to_bytes(s, 8000, 1)
        out, rate, ch, meta = audio_io.read_audio_from_bytes(wav)
        assert rate == 8000 and ch == 1
        np.testing.assert_array_equal(out, s)
        assert meta.source_format == "WAV"

    def test_wav_header_layout(self):
        wav = audio_io.write_wav_to_bytes(np.zeros(4, np.float32), 44100, 2)
        assert wav[0:4] == b"RIFF" and wav[8:12] == b"WAVE"
        assert wav[12:16] == b"fmt " and wav[36:40] == b"data"
        assert len(wav) == 44 + 16
        # format code 3 = IEEE float, 32 bits
        assert int.from_bytes(wav[20:22], "little") == 3
        assert int.from_bytes(wav[34:36], "little") == 32

    def test_wav_pcm16(self):
        import struct

        n = 100
        pcm = (np.sin(np.arange(n)) * 20000).astype("<i2")
        body = pcm.tobytes()
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", len(body))
        )
        out, rate, ch, _ = audio_io.read_audio_from_bytes(hdr + body)
        np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0)

    def test_unsupported_formats(self):
        for magic, name in [(b"fLaC", "FLAC"), (b"OggS", "OGG"), (b"ID3\x04", "MP3")]:
            with pytest.raises(audio_io.UnsupportedFormatError):
                audio_io.read_audio_from_bytes(magic + b"\x00" * 64)


class TestRefloLayer:
    def test_encode_options_builders(self):
        o = reflo.EncodeOptions.lossless().with_level(11)
        assert o.level == 9 and not o.lossy
        o = reflo.EncodeOptions.lossy_quality(2.0)
        assert o.lossy and o.quality == 1.0
        o = reflo.EncodeOptions.lossy_bitrate(128)
        assert o.lossy and o.bitrate == 128

    def test_encode_from_samples_stamps(self):
        s = sine(440, 8000, 1.0)
        data = reflo.encode_from_samples(s, 8000, 1, None, reflo.EncodeOptions.lossless())
        meta = reflo.get_metadata(data)
        assert meta.flo_encoder_version.startswith("flo_tpu")
        assert meta.encoder_settings == "Lossless, level 5"
        assert meta.length_ms == 1000
        assert meta.encoding_time is not None
        # reflo path does NOT auto-embed analysis (unlike lib.encode)
        assert meta.waveform_data is None

    def test_decode_to_wav(self):
        s = sine(440, 8000, 1.0)
        data = reflo.encode_from_samples(s, 8000, 1, None, reflo.EncodeOptions.lossless())
        wav = reflo.decode_to_wav(data)
        out, rate, ch, _ = audio_io.read_audio_from_bytes(wav)
        assert rate == 8000 and ch == 1
        assert np.abs(out - s).max() <= 1 / 32768 + 1e-6

    def test_lossy_options(self):
        s = sine(440, 44100, 1.0)
        data = reflo.encode_from_samples(
            s, 44100, 1, None, reflo.EncodeOptions.lossy_quality(0.6)
        )
        info = reflo.get_flo_info(data)
        assert info.is_lossy
        meta = reflo.get_metadata(data)
        assert meta.encoder_settings == "Lossy, quality 60%"

    def test_source_tags_merged(self):
        src = audio_io.AudioMetadata(
            title="T", artist="A", album="B", year=2020, comment="hi",
            cover_art=("image/png", b"\x89PNG"), source_format="WAV",
        )
        s = sine(200, 8000, 0.5)
        data = reflo.encode_from_samples(s, 8000, 1, src, reflo.EncodeOptions.lossless())
        meta = reflo.get_metadata(data)
        assert meta.title == "T" and meta.year == 2020
        assert meta.comments[0].text == "hi" and meta.comments[0].language == "eng"
        assert meta.pictures[0].mime_type == "image/png"
        assert meta.source_format == "WAV"

    def test_options_metadata_overrides_source(self):
        src = audio_io.AudioMetadata(title="SrcTitle")
        s = sine(200, 8000, 0.5)
        opts = reflo.EncodeOptions.lossless().with_metadata(FloMetadata(title="Mine"))
        data = reflo.encode_from_samples(s, 8000, 1, src, opts)
        assert reflo.get_metadata(data).title == "Mine"


class TestCli:
    def run(self, *args, capsys=None):
        return cli.main(list(args))

    def test_encode_decode_cycle(self, wav_file, tmp_path, capsys):
        p, s, rate = wav_file
        flo = tmp_path / "out.flo"
        wav2 = tmp_path / "out.wav"
        assert cli.main(["encode", str(p), str(flo), "--title", "X"]) == 0
        assert cli.main(["info", str(flo), "-m"]) == 0
        out = capsys.readouterr().out
        assert "Lossless" in out and "Title" in out
        assert cli.main(["decode", str(flo), str(wav2)]) == 0
        dec, r2, c2, _ = audio_io.read_audio_from_bytes(wav2.read_bytes())
        assert np.abs(dec - s).max() <= 1 / 32768 + 1e-6

    def test_encode_ogg_input(self, tmp_path, capsys):
        """`flo encode in.ogg out.flo` — the reference CLI's foreign-format
        headline flow (reflo/src/main.rs:218-290) with Vorbis input."""
        from tests.vorbis_writer import make_stream

        data, expected = make_stream(n=512, channels=2, frames=10, seed=5)
        # Lattice vectors can exceed full scale; scale into [-1, 1] territory
        # is not needed for encode (f32_to_i32 clamps), decode still matches
        # the clamped signal.
        ogg = tmp_path / "in.ogg"
        ogg.write_bytes(data)
        flo = tmp_path / "out.flo"
        assert cli.main(["encode", str(ogg), str(flo)]) == 0
        capsys.readouterr()
        assert cli.main(["info", str(flo)]) == 0
        out = capsys.readouterr().out
        assert "8000" in out
        from flo_tpu.lossless import decoder as lld

        dec = lld.decode(flo.read_bytes()).reshape(-1, 2).T
        clamped = np.clip(expected, -32768 / 32767, 1.0)
        assert np.abs(dec - clamped).max() <= 1 / 32768 + 2e-5

    def test_lossy_quality_flag(self, wav_file, tmp_path, capsys):
        p, s, rate = wav_file
        flo = tmp_path / "l.flo"
        assert cli.main(["encode", str(p), str(flo), "--lossy", "--quality", "medium"]) == 0
        capsys.readouterr()
        assert cli.main(["info", str(flo)]) == 0
        out = capsys.readouterr().out
        # CLI medium = 0.4 -> round(0.4*4) = 2 -> header quality "High" name
        assert "Lossy" in out

    def test_invalid_quality(self, wav_file, tmp_path):
        p, _, _ = wav_file
        assert cli.main(["encode", str(p), str(tmp_path / "x.flo"),
                         "--lossy", "--quality", "nope"]) == 1

    def test_metadata_json(self, wav_file, tmp_path, capsys):
        p, _, _ = wav_file
        flo = tmp_path / "m.flo"
        cli.main(["encode", str(p), str(flo), "--title", "JT", "--artist", "JA"])
        capsys.readouterr()
        assert cli.main(["metadata", str(flo), "--json"]) == 0
        d = json.loads(capsys.readouterr().out)
        assert d["title"] == "JT" and d["artist"] == "JA"

    def test_analysis_json(self, wav_file, tmp_path, capsys):
        p, _, _ = wav_file
        flo = tmp_path / "a.flo"
        cli.main(["encode", str(p), str(flo)])
        capsys.readouterr()
        assert cli.main(["analysis", str(flo), "-w", "-s", "--json"]) == 0
        d = json.loads(capsys.readouterr().out)
        assert set(d) == {"file_info", "loudness", "waveform", "spectral"}
        assert d["loudness"]["integrated_lufs"] < 0
        assert d["waveform"]["total_peaks"] == 90  # 1.5 s * 60/s
        assert len(d["spectral"]["energy_profile"]) == 16

    def test_validate(self, wav_file, tmp_path, capsys):
        p, _, _ = wav_file
        flo = tmp_path / "v.flo"
        cli.main(["encode", str(p), str(flo)])
        capsys.readouterr()
        assert cli.main(["validate", str(flo)]) == 0
        bad = bytearray(flo.read_bytes())
        bad[len(bad) // 2] ^= 0xFF  # inside the CRC-covered DATA chunk
        badp = tmp_path / "bad.flo"
        badp.write_bytes(bytes(bad))
        assert cli.main(["validate", str(badp)]) == 1

    def test_corpus_info(self, examples_dir, capsys):
        assert cli.main(["info", str(examples_dir / "sine_440hz_mono.flo")]) == 0
        out = capsys.readouterr().out
        assert "44100 Hz" in out and "CRC valid:   yes" in out
