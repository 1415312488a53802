"""Ogg Vorbis decoder vs the independent from-spec writer (vorbis_writer)."""

import numpy as np
import pytest

from flo_tpu import vorbis
from tests.vorbis_writer import make_stream


def _decode_planar(data):
    d = vorbis.decode(data)
    return d, d.samples.reshape(-1, d.channels).T.astype(np.float64)


class TestOggLayer:
    def test_crc_and_packets(self):
        data, _ = make_stream(frames=4)
        pkts = vorbis.ogg_packets(data)
        assert pkts[0][:7] == b"\x01vorbis"
        assert pkts[1][:7] == b"\x03vorbis"
        assert pkts[2][:7] == b"\x05vorbis"
        assert len(pkts) == 3 + 4

    def test_corrupt_page_rejected(self):
        data, _ = make_stream(frames=2)
        bad = bytearray(data)
        bad[40] ^= 0x01  # flip a bit inside page 1's body
        with pytest.raises(vorbis.VorbisError):
            vorbis.ogg_packets(bytes(bad))

    def test_packet_spanning_pages(self):
        # The setup packet is split across pages by the writer (MAXSEG);
        # successful decode proves continuation reassembly.
        data, _ = make_stream(frames=2)
        assert data.count(b"OggS") >= 4


class TestVorbisDecode:
    @pytest.mark.parametrize("channels", [1, 2])
    def test_matches_writer_expectation(self, channels):
        data, expected = make_stream(
            n=512, channels=channels, frames=10, seed=7
        )
        d, got = _decode_planar(data)
        assert d.sample_rate == 8000
        assert d.channels == channels
        assert got.shape == expected.shape
        tol = 1e-4 * max(np.abs(expected).max(), 1.0)
        assert np.abs(got - expected).max() <= tol

    def test_coupled_stereo(self):
        data, expected = make_stream(
            n=512, channels=2, frames=8, coupled=True, seed=11
        )
        _, got = _decode_planar(data)
        tol = 1e-4 * max(np.abs(expected).max(), 1.0)
        assert np.abs(got - expected).max() <= tol

    def test_blocksize_variants(self):
        for n in (128, 256, 2048):
            data, expected = make_stream(n=n, channels=1, frames=6, seed=n)
            _, got = _decode_planar(data)
            tol = 1e-4 * max(np.abs(expected).max(), 1.0)
            assert got.shape == expected.shape
            assert np.abs(got - expected).max() <= tol, n

    def test_comments_to_metadata(self):
        data, _ = make_stream(
            frames=2,
            comments={
                "TITLE": "Song", "ARTIST": "Band", "ALBUM": "LP",
                "DATE": "1999-01-01", "TRACKNUMBER": "3/12", "GENRE": "test",
            },
        )
        d = vorbis.decode(data)
        md = d.metadata
        assert md.title == "Song" and md.artist == "Band" and md.album == "LP"
        assert md.year == 1999 and md.track_number == 3 and md.genre == "test"
        assert md.source_format == "ogg"

    def test_truncated_stream_errors(self):
        data, _ = make_stream(frames=2)
        with pytest.raises(vorbis.VorbisError):
            vorbis.decode(data[:50])

    def test_imdct_matches_direct_formula(self):
        rng = np.random.default_rng(0)
        for n2 in (32, 256, 1024):
            x = rng.standard_normal(n2)
            n = 2 * n2
            i = np.arange(n)[:, None]
            k = np.arange(n2)[None, :]
            C = np.cos(np.pi / (2 * n) * (2 * i + 1 + n2) * (2 * k + 1))
            np.testing.assert_allclose(
                vorbis.imdct(x), C @ x, atol=1e-9 * n2
            )


class TestIngestIntegration:
    def test_encode_ogg_to_flo(self):
        from flo_tpu import audio_io

        data, expected = make_stream(n=512, channels=2, frames=10, seed=3)
        samples, rate, ch, md = audio_io.read_audio_from_bytes(data)
        assert rate == 8000 and ch == 2
        planar = samples.reshape(-1, ch).T
        tol = 1e-4 * max(np.abs(expected).max(), 1.0)
        # audio ingest clips to [-1, 1]? No — vorbis output here is synthetic
        # lattice content and may exceed full scale; ingest returns it as-is.
        assert np.abs(planar - expected).max() <= tol

    def test_get_audio_info(self):
        from flo_tpu import audio_io

        data, expected = make_stream(n=512, channels=2, frames=10, seed=3)
        rate, ch, dur = audio_io.get_audio_info(data)
        assert rate == 8000 and ch == 2
        assert abs(dur - expected.shape[1] / 8000) < 0.2


class TestOggCrcAndGranule:
    def test_crc_matches_reference_loop(self):
        """The zlib bit-reversal CRC must equal the per-byte spec oracle."""
        rng = np.random.default_rng(9)
        for n in (0, 1, 3, 27, 255, 1000, 4096):
            blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            assert vorbis.ogg_crc(blob) == vorbis._ogg_crc_ref(blob), n
        assert vorbis.ogg_crc(b"OggS\x00\x02") == vorbis._ogg_crc_ref(b"OggS\x00\x02")

    @staticmethod
    def _patch_last_granule(data: bytes, new_granule: int) -> bytes:
        """Rewrite the final page's granule position + CRC."""
        import struct

        pages = []
        pos = 0
        while pos < len(data):
            assert data[pos : pos + 4] == b"OggS"
            nsegs = data[pos + 26]
            body = sum(data[pos + 27 : pos + 27 + nsegs])
            end = pos + 27 + nsegs + body
            pages.append((pos, end))
            pos = end
        lo, hi = pages[-1]
        page = bytearray(data[lo:hi])
        page[6:14] = struct.pack("<q", new_granule)
        page[22:26] = b"\x00\x00\x00\x00"
        crc = vorbis.ogg_crc(bytes(page))
        page[22:26] = struct.pack("<I", crc)
        return data[:lo] + bytes(page)

    def test_final_page_granule_truncates_padding(self):
        """libvorbis pads the last block and records the true length in the
        final page's granule; decode must truncate to it (regression: the
        granule was ignored entirely and padding leaked into the output)."""
        data, expected = make_stream(frames=6)
        full = vorbis.decode(data)
        total = full.samples.size // full.channels
        assert total == expected.shape[1]  # writer granule == decoded length
        trim = 100
        cut = self._patch_last_granule(data, total - trim)
        d = vorbis.decode(cut)
        got = d.samples.reshape(-1, d.channels).T.astype(np.float64)
        assert got.shape[1] == total - trim
        np.testing.assert_allclose(got, expected[:, : total - trim], atol=1e-10)

    def test_granule_past_decoded_length_is_noop(self):
        data, expected = make_stream(frames=4)
        total = expected.shape[1]
        over = self._patch_last_granule(data, total + 5000)
        d = vorbis.decode(over)
        assert d.samples.size // d.channels == total


class TestMalformedHeaders:
    """Corrupt/spec-invalid headers must raise VorbisError (the documented
    UnsupportedFormatError contract), never bare EOFError/ZeroDivisionError."""

    def test_truncated_setup_packet_raises_vorbis_error(self):
        from tests.vorbis_writer import (
            _Config, _comment_packet, _id_packet, _paginate, _setup_packet,
        )

        cfg = _Config(n=512, channels=1, rate=8000, coupled=False)
        setup = _setup_packet(cfg)
        packets = [
            _id_packet(cfg),
            _comment_packet({"TITLE": "t"}),
            setup[: len(setup) // 2],  # cut mid-codebook
        ]
        data = _paginate(packets, 256)
        with pytest.raises(vorbis.VorbisError):
            vorbis.decode(data)

    def test_truncated_comment_packet_raises_vorbis_error(self):
        from tests.vorbis_writer import (
            _Config, _comment_packet, _id_packet, _paginate, _setup_packet,
        )

        cfg = _Config(n=512, channels=1, rate=8000, coupled=False)
        comment = bytearray(_comment_packet({"TITLE": "a comment body"}))
        # Lie in the vendor-length field (bytes 7..11, LE u32) so the parser
        # reads far past the end of the (size-unchanged) packet.
        comment[7:11] = (0x00FFFFFF).to_bytes(4, "little")
        packets = [_id_packet(cfg), bytes(comment), _setup_packet(cfg)]
        data = _paginate(packets, 256)
        with pytest.raises(vorbis.VorbisError):
            vorbis.decode(data)

    def test_blocksize1_above_8192_rejected(self):
        from tests.vorbis_writer import (
            _Config, _comment_packet, _id_packet, _paginate, _setup_packet,
        )

        cfg = _Config(n=512, channels=1, rate=8000, coupled=False)
        ident = bytearray(_id_packet(cfg))
        # Byte 28 packs bs0 (low nibble) / bs1 (high nibble), LSB-first:
        # keep bs0=2^8=256, claim bs1=2^14=16384 (> the spec max 8192).
        ident[28] = 8 | (14 << 4)
        packets = [bytes(ident), _comment_packet({}), _setup_packet(cfg)]
        data = _paginate(packets, 256)
        with pytest.raises(vorbis.VorbisError, match="blocksize"):
            vorbis.decode(data)

    def test_lookup1_values_zero_dims_rejected(self):
        with pytest.raises(vorbis.VorbisError):
            vorbis.lookup1_values(16, 0)
