"""Reference-byte-compat encoder mode: byte-for-byte corpus reproduction.

compat="reference-bugs" makes the encoder replicate the reference's output
exactly, including its Raw-frame serialization defect (encoder.rs:104-119 +
writer.rs:266-268). Combined with integer-domain input (the stored i32
samples — the f32 API's asymmetric 1/32767 scale is lossy for 1536 values,
core/convert.py), re-encoding every clean lossless corpus file reproduces
the reference-produced bytes EXACTLY, proving selection order, tie-breaks,
Rice parameters, coefficient quantization, mid/side decisions, frame typing
and container layout all match.

Excluded by construction: silence_1sec.flo and white_noise.flo — the
reference generator hit its own Raw-frame bug producing truncated payloads,
so their original encode inputs are unrecoverable from the files.
"""

import pathlib

import numpy as np
import pytest

from flo_tpu.container import reader
from flo_tpu.lossless import decoder as lld, encoder as lle

#: Files whose original encoder input is destroyed by the generator's own
#: Raw-frame bug (see module docstring).
UNRECOVERABLE = {"silence_1sec.flo", "white_noise.flo"}


def _lossless_corpus(examples_dir):
    out = []
    for p in sorted(examples_dir.glob("*.flo")):
        f = reader.read(p.read_bytes())
        if f.header.is_lossy or any(fr.frame_type == 253 for fr in f.frames):
            continue
        out.append(p)
    return out


def test_reference_byte_compat_corpus(examples_dir):
    files = _lossless_corpus(examples_dir)
    assert len(files) == 11
    identical = []
    for p in files:
        data = p.read_bytes()
        f = reader.read(data)
        ints = lld.decode_file_i32(f)
        if p.name in UNRECOVERABLE:
            continue
        enc = lle.encode(
            ints.reshape(-1), f.header.sample_rate, f.header.channels,
            f.header.bit_depth, f.header.compression_level, f.metadata,
            compat="reference-bugs",
        )
        assert enc == data, f"{p.name} not byte-identical under compat mode"
        identical.append(p.name)
    assert len(identical) == 9


def test_compat_raw_frame_bug_reproduced():
    """A frame of fixed-0 winners gets typed Raw with bare Rice payloads in
    compat mode (the reference defect) but keeps the ALPC layout by default."""
    rng = np.random.default_rng(0)
    # near-constant signal: fixed-0 beats raw, stays order 0
    s = (rng.integers(-2, 3, 2000)).astype(np.int32)
    buggy = lle.encode(s, 2000, 1, compat="reference-bugs")
    fixed = lle.encode(s, 2000, 1)
    fb = reader.read(buggy)
    ff = reader.read(fixed)
    assert fb.frames[0].frame_type == 254  # Raw (the bug)
    assert ff.frames[0].frame_type != 254
    # default mode decodes exactly; the buggy stream misreads as i16 PCM
    got = lld.decode_file_i32(ff)
    np.testing.assert_array_equal(got.reshape(-1), s)


def test_integer_domain_input_equals_stored_samples(examples_dir):
    """Integer input is taken verbatim (no f32 detour): decode_i32 ->
    encode -> decode_i32 is identity even for the 1536 values where
    i32->f32->i32 is not."""
    p = examples_dir / "telephone_8khz.flo"
    f = reader.read(p.read_bytes())
    ints = lld.decode_file_i32(f)
    enc = lle.encode(ints.reshape(-1), f.header.sample_rate, f.header.channels)
    got = lld.decode_file_i32(reader.read(enc))
    np.testing.assert_array_equal(got, ints)
