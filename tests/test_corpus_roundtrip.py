"""North-star conformance: every lossless reference corpus file must
round-trip bit-exactly through OUR encoder (decode -> encode -> decode in the
i32 domain) — the BASELINE.md contract, at several compression levels."""

import numpy as np
import pytest

import flo_tpu
from flo_tpu.container import reader
from flo_tpu.core.convert import f32_to_i32_np
from flo_tpu.lossless import decoder as lld
from flo_tpu.lossless import encoder as lle


def lossless_corpus(examples_dir):
    out = []
    for p in sorted(examples_dir.glob("*.flo")):
        flo = reader.read(p.read_bytes())
        if flo.header.is_lossy or any(f.frame_type == 253 for f in flo.frames):
            continue
        if lld.decode_file_i32(flo).size == 0:
            continue
        out.append((p.name, flo))
    return out


def test_corpus_reencode_bit_exact(examples_dir):
    corpus = lossless_corpus(examples_dir)
    assert len(corpus) >= 10
    for name, flo in corpus:
        f32 = lld.decode_file(flo)
        enc = flo_tpu.encode(f32, flo.header.sample_rate, flo.header.channels, analyze=False)
        got = lld.decode_file_i32(reader.read(enc))
        want = f32_to_i32_np(f32).reshape(-1, flo.header.channels)
        assert got.shape == want.shape, name
        np.testing.assert_array_equal(got, want, err_msg=name)


@pytest.mark.parametrize("level", [0, 3, 9])
def test_corpus_reencode_levels(examples_dir, level):
    # A representative subset across rates/channel counts.
    names = ["sine_440hz_mono.flo", "chord_cmajor_stereo.flo", "hires_96khz.flo",
             "telephone_8khz.flo"]
    for name in names:
        flo = reader.read((examples_dir / name).read_bytes())
        f32 = lld.decode_file(flo)
        enc = lle.encode(f32, flo.header.sample_rate, flo.header.channels, 16, level)
        got = lld.decode_file_i32(reader.read(enc))
        want = f32_to_i32_np(f32).reshape(-1, flo.header.channels)
        np.testing.assert_array_equal(got, want, err_msg=f"{name} level {level}")


def test_corpus_reencode_bulk_device_analysis(examples_dir):
    """The zero-host-analysis bulk path holds the same contract."""
    groups: dict = {}
    for name, flo in lossless_corpus(examples_dir):
        key = (flo.header.sample_rate, flo.header.channels)
        groups.setdefault(key, []).append(flo)
    for (rate, ch), flos in groups.items():
        sigs = [lld.decode_file(f) for f in flos]
        encs = lle.encode_many(sigs, rate, ch, 16, 5, analysis="device")
        for s, e in zip(sigs, encs):
            got = lld.decode_file_i32(reader.read(e))
            np.testing.assert_array_equal(got, f32_to_i32_np(s).reshape(-1, ch))
