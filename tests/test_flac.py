"""FLAC ingest decoder vs a from-spec writer oracle (tests/flac_writer.py)."""

import numpy as np
import pytest

from flo_tpu import flac
from tests import flac_writer as fw


def _decode_i(data, bps=16):
    d = flac.decode(data)
    return np.round(d.samples * (1 << (bps - 1))).astype(np.int64), d


def test_constant_and_verbatim_mono():
    rng = np.random.default_rng(0)
    bs = 64
    v = rng.integers(-30000, 30000, bs)
    bw = fw.BitWriter()
    fw.frame_header(bw, bs, 0, ch_code=0)
    fw.subframe_constant(bw, -1234, 16)
    fw.end_frame(bw)
    fw.frame_header(bw, bs, 1, ch_code=0)
    fw.subframe_verbatim(bw, v, 16)
    fw.end_frame(bw)
    data = fw.flac_file(bw, 44100, 1, 16, 2 * bs)
    got, d = _decode_i(data)
    assert d.sample_rate == 44100 and d.channels == 1 and d.bits_per_sample == 16
    want = np.concatenate([np.full(bs, -1234), v])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders(order):
    rng = np.random.default_rng(order)
    bs = 128
    t = np.arange(bs)
    s = (4000 * np.sin(t * 0.1)).astype(np.int64) + rng.integers(-20, 20, bs)
    bw = fw.BitWriter()
    fw.frame_header(bw, bs, 0, ch_code=0)
    fw.subframe_fixed(bw, s, order, 16, k=8)
    fw.end_frame(bw)
    got, _ = _decode_i(fw.flac_file(bw, 44100, 1, 16, bs))
    np.testing.assert_array_equal(got, s)


def test_lpc_subframe_and_partitions():
    rng = np.random.default_rng(7)
    bs = 256
    s = np.zeros(bs, np.int64)
    for i in range(bs):  # stable AR(2) signal
        s[i] = int(0.9 * s[i - 1] - 0.5 * s[i - 2] + rng.integers(-100, 100)) if i >= 2 else rng.integers(-100, 100)
    bw = fw.BitWriter()
    fw.frame_header(bw, bs, 0, ch_code=0)
    fw.subframe_lpc(bw, s, coeffs=[230, -128], shift=8, bps=16, k=7)
    fw.end_frame(bw)
    # fixed subframe with 4 partitions
    fw.frame_header(bw, bs, 1, ch_code=0)
    fw.subframe_fixed(bw, s, 2, 16, po=2, k=8)
    fw.end_frame(bw)
    got, _ = _decode_i(fw.flac_file(bw, 44100, 1, 16, 2 * bs))
    np.testing.assert_array_equal(got, np.concatenate([s, s]))


def test_escape_partition():
    bs = 64
    s = np.arange(bs, dtype=np.int64) * 3 - 90
    res = np.diff(s)
    bw = fw.BitWriter()
    fw.frame_header(bw, bs, 0, ch_code=0)
    bw.write(0, 1); bw.write(8 + 1, 6); bw.write(0, 1)  # fixed order 1
    bw.write_signed(int(s[0]), 16)
    fw.write_residuals(bw, res, 1, bs, po=0, escape_bits=[8])
    fw.end_frame(bw)
    got, _ = _decode_i(fw.flac_file(bw, 44100, 1, 16, bs))
    np.testing.assert_array_equal(got, s)


@pytest.mark.parametrize("mode,code", [("ls", 8), ("rs", 9), ("ms", 10)])
def test_stereo_decorrelation(mode, code):
    rng = np.random.default_rng(3)
    bs = 96
    left = rng.integers(-20000, 20000, bs).astype(np.int64)
    right = (left * 0.7).astype(np.int64) + rng.integers(-50, 50, bs)
    side = left - right
    bw = fw.BitWriter()
    fw.frame_header(bw, bs, 0, ch_code=code)
    if mode == "ls":
        fw.subframe_verbatim(bw, left, 16)
        fw.subframe_verbatim(bw, side, 17)
    elif mode == "rs":
        fw.subframe_verbatim(bw, side, 17)
        fw.subframe_verbatim(bw, right, 16)
    else:
        mid = (left + right) >> 1
        fw.subframe_verbatim(bw, mid, 16)
        fw.subframe_verbatim(bw, side, 17)
    fw.end_frame(bw)
    got, d = _decode_i(fw.flac_file(bw, 44100, 2, 16, bs))
    assert d.channels == 2
    np.testing.assert_array_equal(got[0::2], left)
    np.testing.assert_array_equal(got[1::2], right)


def test_wasted_bits():
    bs = 32
    s = (np.arange(bs, dtype=np.int64) - 16) << 3  # low 3 bits zero
    bw = fw.BitWriter()
    fw.frame_header(bw, bs, 0, ch_code=0)
    fw.subframe_verbatim(bw, s, 16, wasted=3)
    fw.end_frame(bw)
    got, _ = _decode_i(fw.flac_file(bw, 44100, 1, 16, bs))
    np.testing.assert_array_equal(got, s)


def test_vorbis_tags_and_ingest_entry():
    from flo_tpu import audio_io

    bs = 64
    s = np.arange(bs, dtype=np.int64) * 100 - 3000
    bw = fw.BitWriter()
    fw.frame_header(bw, bs, 0, ch_code=0)
    fw.subframe_verbatim(bw, s, 16)
    fw.end_frame(bw)
    data = fw.flac_file(
        bw, 22050, 1, 16, bs,
        tags={"TITLE": "Test Song", "ARTIST": "Nobody", "DATE": "1999-01-01",
              "TRACKNUMBER": "3/12"},
    )
    samples, rate, ch, meta = audio_io.read_audio_from_bytes(data)
    assert rate == 22050 and ch == 1
    assert meta.title == "Test Song" and meta.artist == "Nobody"
    assert meta.year == 1999 and meta.track_number == 3
    assert meta.source_format == "FLAC"
    np.testing.assert_allclose(samples, s / 32768.0, atol=1e-7)


def test_truncated_stream_raises():
    bs = 64
    bw = fw.BitWriter()
    fw.frame_header(bw, bs, 0, ch_code=0)
    fw.subframe_verbatim(bw, np.arange(bs), 16)
    fw.end_frame(bw)
    data = fw.flac_file(bw, 44100, 1, 16, 4 * bs)  # claims more than present
    with pytest.raises(flac.FlacError):
        flac.decode(data)
