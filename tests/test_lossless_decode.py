"""Lossless decoder: device scan vs a direct-transliteration oracle.

The oracle implements the reference decoder semantics (decoder.rs:92-273) in
plain python/numpy int64 — slow but indisputable. The batched device kernel
must match it sample-for-sample on the real corpus and on synthetic lanes.
"""

import numpy as np
import pytest

from flo_tpu.container import reader
from flo_tpu.core import rice_host
from flo_tpu.core.constants import FrameType
from flo_tpu.lossless import decoder as lossless_decoder


# --- oracle (reference semantics, per channel) ------------------------------

def _oracle_reconstruct_lpc(coeffs, residuals, shift, target_len):
    order = len(coeffs)
    n = min(target_len, len(residuals))
    out = list(residuals[: min(order, n)])
    for i in range(order, n):
        pred = 0
        for j in range(order):
            pred += int(coeffs[j]) * int(out[i - j - 1])
        out.append(((pred >> shift) + int(residuals[i])) % 2**32)
        out[-1] = out[-1] - 2**32 if out[-1] >= 2**31 else out[-1]
    out += [0] * (target_len - len(out))
    return np.array(out, dtype=np.int64)


_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _oracle_reconstruct_fixed(order, residuals, target_len):
    if order not in _FIXED or order == 0:
        out = list(residuals)
    else:
        out = []
        n = min(len(residuals), target_len)
        for i in range(n):
            eff = _FIXED[min(i, order)]
            pred = 0
            for j, c in enumerate(eff):
                pred += c * int(out[i - j - 1])
            v = (pred + int(residuals[i])) % 2**32
            out.append(v - 2**32 if v >= 2**31 else v)
    out = out[:target_len] + [0] * max(0, target_len - len(out))
    return np.array(out, dtype=np.int64)


def _oracle_decode_channel(ch, frame_samples):
    has_coeffs = len(ch.predictor_coeffs) > 0
    has_res = len(ch.residuals) > 0
    if not has_coeffs and has_res and ch.shift_bits >= 128:
        order = ch.shift_bits - 128
        res = rice_host.decode(ch.residuals, ch.rice_parameter, frame_samples)
        return _oracle_reconstruct_fixed(order, res, frame_samples)
    if has_coeffs:
        res = rice_host.decode(ch.residuals, ch.rice_parameter, frame_samples)
        return _oracle_reconstruct_lpc(
            ch.predictor_coeffs, res, min(ch.shift_bits, 15), frame_samples
        )
    if has_res:
        raw = np.frombuffer(ch.residuals[: (len(ch.residuals) // 2) * 2], dtype="<i2")
        out = np.zeros(frame_samples, dtype=np.int64)
        out[: min(len(raw), frame_samples)] = raw[: min(len(raw), frame_samples)]
        return out
    return np.zeros(frame_samples, dtype=np.int64)


def _oracle_decode_file(flo):
    channels = flo.header.channels
    per_ch = [[] for _ in range(channels)]
    for frame in flo.frames:
        if FrameType.from_byte(frame.frame_type).is_transform:
            continue
        ms = channels == 2 and bool(frame.flags & 0x01)
        cols = [
            _oracle_decode_channel(frame.channels[c], frame.frame_samples)
            for c in range(channels)
        ]
        if ms:
            m, s = cols

            def trunc2(t):
                q = np.abs(t) // 2
                return np.where(t >= 0, q, -q)

            cols = [trunc2(m + s), trunc2(m - s)]
        for c in range(channels):
            per_ch[c].append(cols[c])
    stacked = [np.concatenate(p) if p else np.zeros(0) for p in per_ch]
    return np.stack(stacked, axis=1).astype(np.int32)  # [n, C]


import os

_FAST_SET = [
    "sine_440hz_mono.flo",
    "chord_cmajor_stereo.flo",
    "telephone_8khz.flo",
    "audio_lossless.flo",
    "silence_1sec.flo",
    "white_noise.flo",
]
_FULL_EXTRA = [
    "multitone_stereo.flo",
    "sweep_20_20k.flo",
    "click_track_120bpm.flo",
    "dtmf_tones.flo",
    "hires_96khz.flo",
]
# The pure-python oracle is O(samples * order); the long files take minutes.
# Set FLO_TPU_FULL_ORACLE=1 to run the complete corpus comparison.
LOSSLESS_EXAMPLES = _FAST_SET + (_FULL_EXTRA if os.environ.get("FLO_TPU_FULL_ORACLE") else [])


@pytest.mark.parametrize("name", LOSSLESS_EXAMPLES)
def test_decode_matches_oracle(examples_dir, name):
    flo = reader.read((examples_dir / name).read_bytes())
    got = lossless_decoder.decode_file_i32(flo)
    want = _oracle_decode_file(flo)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_sine_signal_properties(examples_dir):
    """Decoded sine_440hz_mono must actually be a 440 Hz sine."""
    data = (examples_dir / "sine_440hz_mono.flo").read_bytes()
    samples = lossless_decoder.decode(data)
    assert len(samples) == 2 * 44100
    spectrum = np.abs(np.fft.rfft(samples * np.hanning(len(samples))))
    freq = np.fft.rfftfreq(len(samples), 1 / 44100)
    assert abs(freq[np.argmax(spectrum)] - 440.0) < 1.0
    assert 0.1 < np.abs(samples).max() <= 1.0


def test_stereo_decode_shapes(examples_dir):
    data = (examples_dir / "chord_cmajor_stereo.flo").read_bytes()
    flo = reader.read(data)
    samples = lossless_decoder.decode(data)
    assert len(samples) == flo.header.total_samples * 2


# --- device-unpacker host-fallback lanes ------------------------------------


def _one_alpc_file(residuals, k, n, sample_rate=8000):
    """Hand-build a 1-frame mono file whose single channel is a fixed-0
    (identity) ALPC lane with the given Rice stream."""
    from flo_tpu.container import writer
    from flo_tpu.core.constants import FIXED_PREDICTOR_MARKER, ResidualEncoding
    from flo_tpu.core.types import ChannelData, Frame

    blob = rice_host.encode(np.asarray(residuals, np.int32), k)
    frame = Frame(
        frame_type=int(FrameType.ALPC1),
        frame_samples=n,
        channels=[
            ChannelData(
                predictor_coeffs=[],
                shift_bits=FIXED_PREDICTOR_MARKER + 0,
                residual_encoding=ResidualEncoding.RICE,
                rice_parameter=k,
                residuals=blob,
            )
        ],
    )
    return writer.write(sample_rate, 1, 16, 5, [frame], b""), blob


def test_decode_big_quotient_lane_host_fallback():
    """A k=0 spike gives a Rice quotient far above the device unpacker's
    window (q > MAX_Q): the lane must be host-patched, bit-exactly."""
    r = np.zeros(64, np.int32)
    r[10] = 5000  # q = 10000 at k=0
    r[40] = -7
    data, _ = _one_alpc_file(r, 0, 64)
    flo = reader.read(data)
    got = lossless_decoder.decode_many([flo])[0]
    from flo_tpu.core.convert import i32_to_f32_np
    want = i32_to_f32_np(lossless_decoder.decode_file_i32(flo)[:, 0])
    np.testing.assert_array_equal(got, want)


def test_decode_truncated_blob_zero_fills_like_reference():
    """A Rice stream that ends early inside its declared payload must
    zero-fill (reference BitReader semantics) even when the device unpacker
    would read into the NEXT lane's bytes — the overrun check patches it."""
    r = np.arange(-60, 60, dtype=np.int32)
    k = rice_host.estimate_parameter(r)
    full = rice_host.encode(r, k)
    cut = full[: len(full) // 2]

    from flo_tpu.container import writer
    from flo_tpu.core.constants import FIXED_PREDICTOR_MARKER, ResidualEncoding
    from flo_tpu.core.types import ChannelData, Frame

    def ch(blob):
        return ChannelData(
            predictor_coeffs=[], shift_bits=FIXED_PREDICTOR_MARKER + 1,
            residual_encoding=ResidualEncoding.RICE, rice_parameter=k,
            residuals=blob,
        )

    # Two frames: the truncated lane first, a healthy one after it (so the
    # device read past the cut lands in REAL bytes, not padding).
    frames = [
        Frame(frame_type=int(FrameType.ALPC1), frame_samples=len(r), channels=[ch(cut)]),
        Frame(frame_type=int(FrameType.ALPC1), frame_samples=len(r), channels=[ch(full)]),
    ]
    data = writer.write(8000, 1, 16, 5, frames, b"")
    flo = reader.read(data)
    got = lossless_decoder.decode_many([flo])[0]
    from flo_tpu.core.convert import i32_to_f32_np
    want = i32_to_f32_np(lossless_decoder.decode_file_i32(flo)[:, 0])
    np.testing.assert_array_equal(got, want)


def test_reconstruct_host_matches_device():
    """The numpy fallback reconstruction equals the jitted scan."""
    from flo_tpu.ops import lpc

    rng = np.random.default_rng(11)
    L, S = 6, 400
    residuals = rng.integers(-2000, 2000, (L, S)).astype(np.int32)
    coeffs = np.zeros((L, lpc.MAX_ORDER), np.int32)
    shifts = np.zeros(L, np.int32)
    orders = np.zeros(L, np.int32)
    is_fixed = np.zeros(L, bool)
    coeffs[0, :4] = [900, -300, 120, -40]; shifts[0] = 9; orders[0] = 4
    coeffs[1, :2] = lpc._FIXED_COEFFS[2][:2]; orders[1] = 2; is_fixed[1] = True
    coeffs[2, :1] = [1 << 14]; shifts[2] = 14; orders[2] = 1
    # lane 3: identity; lane 4: fixed-4; lane 5: order-12 LPC
    coeffs[4] = lpc._FIXED_COEFFS[4]; orders[4] = 4; is_fixed[4] = True
    coeffs[5] = rng.integers(-1000, 1000, lpc.MAX_ORDER); shifts[5] = 10; orders[5] = 12
    got = lpc.reconstruct_host(residuals, coeffs, shifts, orders, is_fixed)
    want = np.asarray(lpc.reconstruct(residuals, coeffs, shifts, orders, is_fixed))
    np.testing.assert_array_equal(got, want)


def test_native_reconstruct_matches_oracles():
    """The C++ in-place reconstruction (native/rice.cpp lpc_reconstruct_batch)
    equals both the numpy oracle and the jitted scan, including int32 wrap."""
    from flo_tpu import native
    from flo_tpu.ops import lpc

    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(23)
    L, S = 7, 600
    residuals = rng.integers(-30000, 30000, (L, S)).astype(np.int32)
    coeffs = np.zeros((L, lpc.MAX_ORDER), np.int32)
    shifts = np.zeros(L, np.int32)
    orders = np.zeros(L, np.int32)
    is_fixed = np.zeros(L, bool)
    coeffs[0, :4] = [900, -300, 120, -40]; shifts[0] = 9; orders[0] = 4
    for o in range(5):
        coeffs[1 + o] = lpc._FIXED_COEFFS[o]; orders[1 + o] = o; is_fixed[1 + o] = True
    coeffs[6] = rng.integers(-(1 << 14), 1 << 14, lpc.MAX_ORDER)
    shifts[6] = 13; orders[6] = 12
    lengths = np.full(L, S, np.int64)
    lengths[2] = 17  # short lane: tail must stay untouched (residuals)

    want = lpc.reconstruct_host(residuals, coeffs, shifts, orders, is_fixed)
    got = residuals.copy()
    assert native.lpc_reconstruct_into(got, coeffs, shifts, orders, is_fixed, lengths)
    for l in range(L):
        n = int(lengths[l])
        np.testing.assert_array_equal(got[l, :n], want[l, :n])
        np.testing.assert_array_equal(got[l, n:], residuals[l, n:])


def test_decode_file_host_matches_bulk(examples_dir):
    """The no-device host decode path (streaming/seeking) is bit-identical to
    the bulk device decode on a real corpus file."""
    from flo_tpu.lossless import decoder as lld

    data = (examples_dir / "chord_cmajor_stereo.flo").read_bytes()
    flo = reader.read(data)
    host = lld.decode_file_host(flo)
    bulk = lld.decode_many([flo])[0]
    np.testing.assert_array_equal(host, bulk)
