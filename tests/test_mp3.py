"""MP3 ingest (flo_tpu.mp3 over the system libmpg123) vs lame ground truth.

The writer side (tests/mp3_writer.py, libmp3lame) is an independent
canonical encoder, so these tests exercise exactly the reference's headline
CLI flow `flo encode in.mp3 out.flo` (reflo/src/main.rs:218-290) against
real-world files.
"""

import struct

import numpy as np
import pytest

from flo_tpu import audio_io, cli, mp3
from tests import mp3_writer as mw

pytestmark = pytest.mark.skipif(
    not (mp3.available() and mw.available()),
    reason="system libmpg123/libmp3lame not present",
)


def _tone(rate, seconds, channels, seed=3):
    n = int(rate * seconds)
    t = np.arange(n) / rate
    rng = np.random.default_rng(seed)
    out = np.empty(n * channels, np.float32)
    for c in range(channels):
        f = 330.0 * (c + 1)
        out[c::channels] = 0.45 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(n)
    return out


def _snr(ref, got):
    n = min(len(ref), len(got))
    ref, got = ref[:n].astype(np.float64), got[:n].astype(np.float64)
    err = ref - got
    return 10 * np.log10(np.mean(ref**2) / max(np.mean(err**2), 1e-30))


class TestDecode:
    @pytest.mark.parametrize("channels", [1, 2])
    def test_roundtrip_snr(self, channels):
        rate = 44100
        x = _tone(rate, 1.0, channels)
        data = mw.write_mp3(x, rate, channels, 192)
        d = mp3.decode(data)
        assert d.sample_rate == rate and d.channels == channels
        # lame's gapless header makes decoded length sample-exact.
        assert len(d.samples) == len(x)
        assert _snr(x, d.samples) > 20.0

    def test_low_rate_mono(self):
        rate = 16000
        x = _tone(rate, 0.5, 1)
        d = mp3.decode(mw.write_mp3(x, rate, 1, 64))
        assert d.sample_rate == rate and d.channels == 1
        assert _snr(x, d.samples) > 15.0

    def test_dispatch_via_audio_io(self):
        x = _tone(44100, 0.25, 2)
        samples, rate, ch, md = audio_io.read_audio_from_bytes(
            mw.write_mp3(x, 44100, 2, 128)
        )
        assert (rate, ch) == (44100, 2)
        assert md.source_format == "mp3"

    def test_garbage_rejected(self):
        with pytest.raises(audio_io.UnsupportedFormatError):
            mp3.decode(b"\xff\xfbjunk" + b"\x00" * 64)

    def test_aac_not_routed_to_mp3(self):
        # ADTS sync (layer bits 00) must dispatch to the AAC path, never to
        # libmpg123 — truncated stubs surface the AAC error, not an MP3 one.
        adts = bytes([0xFF, 0xF1, 0x50, 0x80, 0x00, 0x1F, 0xFC]) + b"\x00" * 32
        with pytest.raises(audio_io.UnsupportedFormatError, match="AAC"):
            audio_io.read_audio_from_bytes(adts)
        m4a = b"\x00\x00\x00\x18ftypM4A \x00" + b"\x00" * 32
        with pytest.raises(audio_io.UnsupportedFormatError, match="AAC"):
            audio_io.read_audio_from_bytes(m4a)


class TestId3:
    def test_lame_tags(self):
        x = _tone(44100, 0.2, 1)
        data = mw.write_mp3(
            x, 44100, 1, 128,
            tags={"title": "Song", "artist": "Band", "album": "LP",
                  "year": "2023", "track": "5", "comment": "note"},
        )
        md = mp3.decode(data).metadata
        assert md.title == "Song" and md.artist == "Band" and md.album == "LP"
        assert md.year == 2023 and md.track_number == 5 and md.comment == "note"

    def test_id3v24_synthetic_unicode(self):
        # Hand-built v2.4 tag: syncsafe frame sizes, UTF-8 text, TDRC, APIC.
        def frame(fid, body):
            sz = len(body)
            ss = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                        (sz >> 7) & 0x7F, sz & 0x7F])
            return fid + ss + b"\x00\x00" + body

        frames = (
            frame(b"TIT2", b"\x03T\xc3\xa9st\x00")
            + frame(b"TPE1", b"\x01\xff\xfeB\x00j\x00\xf6\x00r\x00k\x00")
            + frame(b"TDRC", b"\x032019-05-01")
            + frame(b"TBPM", b"\x00128.5")
            + frame(b"APIC", b"\x00image/png\x00\x03desc\x00PNGBYTES")
        )
        sz = len(frames)
        tag = b"ID3\x04\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        ) + frames
        md, consumed = mp3.parse_id3v2(tag + b"\xff\xfb")
        assert consumed == 10 + sz
        assert md.title == "Tést"
        assert md.artist == "Björk"
        assert md.year == 2019
        assert md.bpm == 128.5
        assert md.cover_art == ("image/png", b"PNGBYTES")

    def test_no_tag(self):
        md, consumed = mp3.parse_id3v2(b"\xff\xfb\x00\x00")
        assert consumed == 0 and md.title is None


class TestCliFlow:
    def test_encode_mp3_to_flo(self, tmp_path):
        """`flo encode in.mp3 out.flo` — the reference's headline flow."""
        rate = 44100
        x = _tone(rate, 1.0, 2)
        src = tmp_path / "in.mp3"
        src.write_bytes(mw.write_mp3(
            x, rate, 2, 192, tags={"title": "FromMp3", "artist": "A"}
        ))
        dst = tmp_path / "out.flo"
        assert cli.main(["encode", str(src), str(dst)]) == 0 and dst.exists()

        from flo_tpu import lib, reflo

        blob = dst.read_bytes()
        assert lib.validate(blob)
        decoded, drate, dch = reflo.decode_to_samples(blob)
        assert (drate, dch) == (rate, 2)
        assert _snr(x, np.asarray(decoded)) > 18.0
        meta = lib.get_metadata(blob)
        assert meta.title == "FromMp3" and meta.artist == "A"
        assert meta.source_format == "mp3"


class TestId3EdgeCases:
    """Regressions: UTF-16 terminator alignment, v2.4 unsync semantics,
    ID3v2.2 translation (id3v2-00 / id3v2.4-structure specs)."""

    @staticmethod
    def _v24_tag(frames: bytes, flags: int = 0) -> bytes:
        sz = len(frames)
        ss = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                    (sz >> 7) & 0x7F, sz & 0x7F])
        return b"ID3\x04\x00" + bytes([flags]) + ss + frames

    @staticmethod
    def _v24_frame(fid: bytes, body: bytes, fflags: int = 0) -> bytes:
        sz = len(body)
        ss = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                    (sz >> 7) & 0x7F, sz & 0x7F])
        return fid + ss + bytes([0, fflags]) + body

    def test_utf16_description_terminator_alignment(self):
        # UTF-16LE desc 'A' = 41 00; byte-level search for 00 00 would split
        # one byte early and corrupt the text / cover bytes.
        desc = "A".encode("utf-16-le")
        text = b"\xff\xfe" + "Hi".encode("utf-16-le")  # BOM + UTF-16LE
        comm = b"\x01eng" + desc + b"\x00\x00" + text
        pic = b"\x89PNGDATA"
        apic = b"\x01image/png\x00\x03" + desc + b"\x00\x00" + pic
        tag = self._v24_tag(
            self._v24_frame(b"COMM", comm) + self._v24_frame(b"APIC", apic)
        )
        md, _ = mp3.parse_id3v2(tag + b"\xff\xfb")
        assert md.comment == "Hi"
        assert md.cover_art == ("image/png", pic)

    def test_v24_tag_level_unsync_per_frame(self):
        # v2.4: tag flag 0x80 means frames are unsynced; frame sizes count
        # the ON-DISK (still-unsynced) bytes, so de-unsync must run per
        # frame, not via a whole-tag replace that shifts every offset.
        body1 = b"\x00AB\xff\x00\xe0CD"   # de-unsyncs to AB\xff\xe0CD
        body2 = b"\x00Title"
        tag = self._v24_tag(
            self._v24_frame(b"TPE1", body1) + self._v24_frame(b"TIT2", body2),
            flags=0x80,
        )
        md, _ = mp3.parse_id3v2(tag + b"\xff\xfb")
        assert md.title == "Title"          # second frame still aligned
        assert md.artist == "AB\xff\xe0CD".encode("latin-1").decode("latin-1")

    def test_id3v22_translated(self):
        def fr(fid3: bytes, body: bytes) -> bytes:
            return fid3 + len(body).to_bytes(3, "big") + body

        frames = (
            fr(b"TT2", b"\x00Old Song")
            + fr(b"TP1", b"\x00Old Band")
            + fr(b"TAL", b"\x00Old LP")
            + fr(b"TYE", b"\x001999")
            + fr(b"TRK", b"\x003/12")
            + fr(b"PIC", b"\x00PNG\x03" + b"desc\x00" + b"\x89PNGPIC")
        )
        sz = len(frames)
        ss = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                    (sz >> 7) & 0x7F, sz & 0x7F])
        tag = b"ID3\x02\x00\x00" + ss + frames
        md, consumed = mp3.parse_id3v2(tag + b"\xff\xfb")
        assert consumed == 10 + sz
        assert md.title == "Old Song" and md.artist == "Old Band"
        assert md.album == "Old LP" and md.year == 1999 and md.track_number == 3
        assert md.cover_art == ("image/png", b"\x89PNGPIC")


class TestAnalysisWorkerErrors:
    def test_analysis_exception_propagates(self, monkeypatch):
        """An analysis failure on the worker thread must surface with its
        real error at collect time, not a bare IndexError from an empty
        result box."""
        import flo_tpu.core.analysis_batch as ab
        from flo_tpu import batch

        def boom(*a, **kw):
            raise RuntimeError("analysis exploded")

        monkeypatch.setattr(ab, "analyze_many", boom)
        clip = (0.1 * np.sin(np.arange(8000) * 0.01)).astype(np.float32)
        with pytest.raises(RuntimeError, match="analysis exploded"):
            batch.encode_many([clip], 4000, 2, analyze=True)


class TestId3FrameFormatFlags:
    """Frame format flags: grouping/DLI stripped, zlib decompressed,
    encrypted skipped (id3v2.4-structure §4.1.2, id3v2.3 §3.3.1)."""

    _v24_tag = staticmethod(TestId3EdgeCases._v24_tag)
    _v24_frame = staticmethod(TestId3EdgeCases._v24_frame)

    def test_v24_compressed_frame_with_dli(self):
        import zlib as _z

        plain = b"\x00Zipped Title"
        comp = _z.compress(plain)
        n = len(plain)
        dli = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                     (n >> 7) & 0x7F, n & 0x7F])
        tag = self._v24_tag(
            self._v24_frame(b"TIT2", dli + comp, fflags=0x08 | 0x01)
        )
        md, _ = mp3.parse_id3v2(tag + b"\xff\xfb")
        assert md.title == "Zipped Title"

    def test_v24_grouping_byte_stripped(self):
        tag = self._v24_tag(
            self._v24_frame(b"TPE1", b"\xaa\x00Band", fflags=0x40)
        )
        md, _ = mp3.parse_id3v2(tag + b"\xff\xfb")
        assert md.artist == "Band"

    def test_v24_encrypted_frame_skipped(self):
        tag = self._v24_tag(
            self._v24_frame(b"TIT2", b"\x01\x00garbage", fflags=0x04)
            + self._v24_frame(b"TPE1", b"\x00Still Here")
        )
        md, _ = mp3.parse_id3v2(tag + b"\xff\xfb")
        assert md.title is None and md.artist == "Still Here"

    @staticmethod
    def _v23_frame(fid: bytes, body: bytes, fflags: int = 0) -> bytes:
        import struct as _s

        return fid + _s.pack(">I", len(body)) + _s.pack(">H", fflags) + body

    def test_v23_compressed_frame(self):
        import struct as _s
        import zlib as _z

        plain = b"\x00Old Zip"
        frame = self._v23_frame(
            b"TIT2", _s.pack(">I", len(plain)) + _z.compress(plain),
            fflags=0x0080,
        ) + self._v23_frame(b"TPE1", b"\x00Plain Band")
        sz = len(frame)
        ss = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                    (sz >> 7) & 0x7F, sz & 0x7F])
        tag = b"ID3\x03\x00\x00" + ss + frame
        md, _ = mp3.parse_id3v2(tag + b"\xff\xfb")
        assert md.title == "Old Zip" and md.artist == "Plain Band"

    def test_v23_corrupt_compressed_frame_skipped(self):
        import struct as _s

        frame = self._v23_frame(
            b"TIT2", _s.pack(">I", 8) + b"notzlib!", fflags=0x0080
        ) + self._v23_frame(b"TALB", b"\x00Album OK")
        sz = len(frame)
        ss = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                    (sz >> 7) & 0x7F, sz & 0x7F])
        tag = b"ID3\x03\x00\x00" + ss + frame
        md, _ = mp3.parse_id3v2(tag + b"\xff\xfb")
        assert md.title is None and md.album == "Album OK"
