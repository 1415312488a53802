"""Foreign-format ingest: vendored AIFF parser + FLAC through the CLI flow."""

import struct

import numpy as np
import pytest

from flo_tpu import audio_io, cli
from tests import flac_writer as fw


def _f80(rate: int) -> bytes:
    import math

    exp = int(math.floor(math.log2(rate)))
    mant = int(rate / (2.0**exp) * (1 << 63))
    return struct.pack(">H", exp + 16383) + mant.to_bytes(8, "big")


def make_aiff(samples_i16: np.ndarray, rate: int, ch: int, little=False) -> bytes:
    pcm = samples_i16.astype("<i2" if little else ">i2").tobytes()
    comm = struct.pack(">HIH", ch, len(samples_i16) // ch, 16) + _f80(rate) + (
        b"sowt" if little else b"NONE"
    )
    chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
    ssnd = struct.pack(">II", 0, 0) + pcm
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    form_type = b"AIFC" if little else b"AIFF"
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + form_type + chunks


@pytest.mark.parametrize("little", [False, True])
def test_aiff_roundtrip(little):
    s = (np.sin(np.arange(2000) * 0.05) * 20000).astype(np.int64)
    out, rate, ch, meta = audio_io.read_audio_from_bytes(
        make_aiff(s, 22050, 1, little)
    )
    assert rate == 22050 and ch == 1 and meta.source_format == "AIFF"
    np.testing.assert_allclose(out, s / 32768.0, atol=1e-7)


def test_cli_encode_flac_to_flo(tmp_path):
    """The reference's headline ingest flow: flo encode in.flac out.flo
    (reflo/src/main.rs:218-290, audio via Symphonia -> here flo_tpu.flac)."""
    bs = 128
    t = np.arange(2 * bs)
    s = (6000 * np.sin(t * 0.05)).astype(np.int64)
    bw = fw.BitWriter()
    for i in range(2):
        fw.frame_header(bw, bs, i, ch_code=0)
        fw.subframe_fixed(bw, s[i * bs : (i + 1) * bs], 2, 16, k=7)
        fw.end_frame(bw)
    data = fw.flac_file(bw, 44100, 1, 16, 2 * bs, tags={"TITLE": "Ingest"})
    src = tmp_path / "in.flac"
    src.write_bytes(data)
    dst = tmp_path / "out.flo"
    rc = cli.main(["encode", str(src), str(dst)])
    assert rc == 0 and dst.exists()

    from flo_tpu import lib
    from flo_tpu.core.metadata import FloMetadata
    from flo_tpu.container import reader
    from flo_tpu.lossless import decoder as lld

    blob = dst.read_bytes()
    assert lib.validate(blob)
    meta = FloMetadata.from_msgpack(reader.read(blob).metadata)
    assert meta.title == "Ingest"  # source tags merged (reflo lib.rs:202-309)
    out = lld.decode(blob)
    np.testing.assert_allclose(out[: len(s)], s / 32768.0, atol=1 / 32768 + 1e-6)
