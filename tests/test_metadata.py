"""Metadata tests, mirroring tests/rust/core_metadata_tests.rs: round-trips
for every structure incl. a kitchen-sink object, plus byte-compat against the
reference-produced corpus metadata."""

import msgpack
import numpy as np
import pytest

from flo_tpu.container import reader
from flo_tpu.core.metadata import (
    AnimatedCover,
    BpmChange,
    CollaborationCredit,
    Comment,
    CoverVariant,
    CoverVariantType,
    CreatorNote,
    FloMetadata,
    KeyChange,
    LoudnessPoint,
    Lyrics,
    Picture,
    PictureType,
    Popularimeter,
    RemixChainEntry,
    SectionMarker,
    SectionType,
    SyncedLyrics,
    SyncedLyricsContentType,
    SyncedLyricsLine,
    UserText,
    UserUrl,
    WaveformData,
)


def rt(m: FloMetadata) -> FloMetadata:
    return FloMetadata.from_msgpack(m.to_msgpack())


class TestRoundTrips:
    def test_empty(self):
        m = rt(FloMetadata())
        assert m.is_empty()
        assert FloMetadata().to_msgpack() == msgpack.packb({})

    def test_basic(self):
        m = rt(FloMetadata.with_basic("Song", "Artist", "Album"))
        assert (m.title, m.artist, m.album) == ("Song", "Artist", "Album")

    def test_all_text_fields(self):
        m = FloMetadata(
            title="t", subtitle="st", content_group="cg", album="a",
            original_album="oa", set_subtitle="ss", isrc="USRC17607839",
            artist="ar", album_artist="aa", conductor="c", remixer="r",
            original_artist="oar", composer="co", lyricist="l",
            original_lyricist="ol", encoded_by="e", genre="g", mood="m",
            key="Am", language="eng", copyright="cp", produced_notice="pn",
            publisher="p", file_owner="fo", radio_station="rs",
            radio_station_owner="rso", album_sort="as", artist_sort="ars",
            title_sort="ts", original_filename="of", encoder_settings="es",
            url_commercial="http://c", url_copyright="http://cp",
            url_audio_file="http://af", url_artist="http://ar",
            url_audio_source="http://asrc", url_radio_station="http://rs",
            url_payment="http://pay", url_publisher="http://pub",
            flo_encoder_version="1.2", source_format="WAV",
        )
        m2 = rt(m)
        assert m2 == m

    def test_numeric_fields(self):
        m = rt(
            FloMetadata(
                track_number=3, track_total=12, disc_number=1, disc_total=2,
                bpm=128, length_ms=215000, year=2024, play_count=42,
                playlist_delay=100,
            )
        )
        assert m.track_number == 3 and m.length_ms == 215000 and m.play_count == 42

    def test_pairs(self):
        m = rt(
            FloMetadata(
                involved_people=[("producer", "Alice"), ("mixer", "Bob")],
                musician_credits=[("guitar", "Carol")],
            )
        )
        assert m.involved_people == [("producer", "Alice"), ("mixer", "Bob")]
        assert m.musician_credits == [("guitar", "Carol")]

    def test_pictures(self):
        m = FloMetadata()
        m.add_picture("image/png", PictureType.COVER_FRONT, b"\x89PNG...")
        m.pictures.append(
            Picture("image/jpeg", PictureType.BRIGHT_COLOURED_FISH, "fish!", b"\xff\xd8")
        )
        m2 = rt(m)
        assert m2.front_cover().data == b"\x89PNG..."
        assert m2.pictures[1].picture_type == PictureType.BRIGHT_COLOURED_FISH
        assert m2.pictures[1].description == "fish!"
        assert m2.any_picture() is m2.pictures[0]

    def test_comments_lyrics(self):
        m = FloMetadata()
        m.add_comment("great track", "eng")
        m.add_lyrics("la la la", None)
        m.add_synced_lyrics_line(1000, "first", "eng")
        m.add_synced_lyrics_line(2000, "second", "eng")
        m2 = rt(m)
        assert m2.comments[0].text == "great track"
        assert m2.comments[0].language == "eng"
        assert m2.lyrics[0].text == "la la la"
        assert len(m2.synced_lyrics) == 1
        assert [l.text for l in m2.synced_lyrics[0].lines] == ["first", "second"]
        assert m2.synced_lyrics[0].content_type == SyncedLyricsContentType.LYRICS

    def test_flo_unique(self):
        m = FloMetadata(
            # f32-exact values: floats round-trip through msgpack float32.
            waveform_data=WaveformData(50, [0.125, 0.5, 1.0], 2),
            spectrum_fingerprint=b"\x01\x02\x03",
            bpm_map=[BpmChange(0, 120.0), BpmChange(30000, 128.5)],
            key_changes=[KeyChange(0, "Am")],
            loudness_profile=[LoudnessPoint(0, -14.5)],
            integrated_loudness_lufs=-14.0,
            loudness_range_lu=6.5,
            true_peak_dbtp=-1.0,
            popularimeter=Popularimeter(rating=255, email="x@y.z", play_count=7),
            animated_cover=AnimatedCover("image/gif", b"GIF89a", 3000, 0),
            cover_variants=[CoverVariant(CoverVariantType.VINYL, "image/png", b"v")],
            artist_signature=Picture("image/png", PictureType.OTHER, None, b"sig"),
            user_text=[UserText("MOOD", "dark")],
            user_urls=[UserUrl("site", "http://x")],
            remix_chain=[RemixChainEntry("Orig", "OA", "sample", 1999, "ISRC1")],
            custom={"a": "1", "b": "2"},
        )
        m.add_section(0, SectionType.INTRO)
        m.add_section(15000, SectionType.DROP, "the drop")
        m.add_creator_note("mixed on monitors", None)
        m.add_collaboration("Bass", "Dee", 120000)
        m2 = rt(m)
        assert m2 == m
        assert np.isclose(m2.bpm_map[1].bpm, 128.5)
        assert m2.section_markers[1].label == "the drop"
        assert m2.custom == {"a": "1", "b": "2"}

    def test_unknown_fields_ignored(self):
        blob = msgpack.packb({"title": "x", "totally_new_field": [1, 2, 3]})
        m = FloMetadata.from_msgpack(blob)
        assert m.title == "x"


class TestWireFormat:
    def test_named_maps(self):
        m = FloMetadata(title="T", year=2020)
        d = msgpack.unpackb(m.to_msgpack(), raw=False)
        assert d == {"title": "T", "year": 2020}

    def test_field_order_matches_struct_order(self):
        m = FloMetadata(custom={"z": "1"}, title="T", artist="A", year=1999)
        d = msgpack.unpackb(m.to_msgpack(), raw=False)
        assert list(d.keys()) == ["title", "artist", "year", "custom"]

    def test_f32_packing(self):
        blob = FloMetadata(integrated_loudness_lufs=-14.25).to_msgpack()
        # msgpack float32 marker is 0xca
        assert b"\xca" in blob

    def test_bytes_as_bin(self):
        blob = FloMetadata(spectrum_fingerprint=b"\x00\x01").to_msgpack()
        d = msgpack.unpackb(blob, raw=False)
        assert isinstance(d["spectrum_fingerprint"], bytes)

    def test_corpus_byte_identical(self, examples_dir):
        for p in sorted(examples_dir.glob("*.flo")):
            blob = reader.read(p.read_bytes()).metadata
            if not blob:
                continue
            assert FloMetadata.from_msgpack(blob).to_msgpack() == blob, p.name
