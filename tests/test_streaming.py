"""Streaming tests: network-chunk simulation, state transitions, sample-count
equality with the standard decoder (mirrors streaming_tests.rs:36-66,
src/streaming/tests.rs:31-53)."""

import numpy as np
import pytest

import flo_tpu
from flo_tpu.streaming import DecoderState, StreamingDecoder, StreamingEncoder


def sine(freq, rate, seconds, amp=0.5):
    t = np.arange(int(rate * seconds), dtype=np.float64) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def feed_in_chunks(decoder, data, chunk):
    outs = []
    for i in range(0, len(data), chunk):
        decoder.feed(data[i : i + chunk])
        while True:
            out = decoder.next_frame()
            if out is None:
                break
            outs.append(out)
    return np.concatenate([o for o in outs if o.size]) if outs else np.zeros(0, np.float32)


class TestStreamingDecoder:
    def test_state_machine(self):
        rate = 2000
        s = sine(100, rate, 1.5)
        data = flo_tpu.encode(s, rate, 1, analyze=False)
        d = StreamingDecoder()
        assert d.state == DecoderState.WAITING_FOR_HEADER
        d.feed(data[:10])
        assert d.state == DecoderState.WAITING_FOR_HEADER
        d.feed(data[10:80])
        assert d.state in (DecoderState.WAITING_FOR_TOC, DecoderState.READY)
        d.feed(data[80:])
        assert d.state == DecoderState.READY
        info = d.info()
        assert info.sample_rate == rate and info.total_samples == len(s)

    def test_bad_magic(self):
        # Reference semantics (decoder.rs:186-189): bad magic transitions to
        # the terminal Error state and returns; only FURTHER feeds raise.
        d = StreamingDecoder()
        assert d.feed(b"JUNK" + b"\x00" * 100) is False
        assert d.state == DecoderState.ERROR
        with pytest.raises(ValueError):
            d.feed(b"more")

    @pytest.mark.parametrize("chunk", [53, 97, 1000])
    def test_chunked_equals_standard(self, chunk):
        rate = 2000
        s = sine(100, rate, 2.3)
        data = flo_tpu.encode(s, rate, 1, analyze=False)
        want = flo_tpu.decode(data)
        got = feed_in_chunks(StreamingDecoder(), data, chunk)
        np.testing.assert_array_equal(got, want)

    def test_stereo_chunked(self):
        rate = 2000
        l, r = sine(100, rate, 1.2), sine(150, rate, 1.2)
        s = np.empty(2 * len(l), np.float32)
        s[0::2], s[1::2] = l, r
        data = flo_tpu.encode(s, rate, 2, analyze=False)
        got = feed_in_chunks(StreamingDecoder(), data, 64)
        np.testing.assert_array_equal(got, flo_tpu.decode(data))

    def test_lossy_chunked(self):
        rate = 44100
        s = sine(440, rate, 1.0)
        data = flo_tpu.encode_lossy(s, rate, 1, 2, analyze=False)
        want = flo_tpu.decode(data)
        got = feed_in_chunks(StreamingDecoder(), data, 499)
        # 1.6e-5: the bulk decoder's i16 wire transport quantum (the
        # streaming path decodes at full f32 precision on the host).
        np.testing.assert_allclose(got, want, atol=1.6e-5)

    def test_frames_available_and_finished(self):
        rate = 1000
        s = sine(50, rate, 3.0)
        data = flo_tpu.encode(s, rate, 1, analyze=False)
        d = StreamingDecoder()
        d.feed(data)
        assert d.frames_available() == 3
        n = 0
        while d.next_frame() is not None:
            n += 1
        assert n == 3
        assert d.state == DecoderState.FINISHED
        assert d.current_frame_index() == 3

    def test_decode_available(self):
        rate = 1000
        s = sine(50, rate, 2.0)
        data = flo_tpu.encode(s, rate, 1, analyze=False)
        d = StreamingDecoder()
        d.feed(data)
        out = d.decode_available()
        np.testing.assert_array_equal(out, flo_tpu.decode(data))

    def test_reset(self):
        rate = 1000
        s = sine(50, rate, 1.0)
        data = flo_tpu.encode(s, rate, 1, analyze=False)
        d = StreamingDecoder()
        d.feed(data)
        d.decode_available()
        d.reset()
        assert d.state == DecoderState.WAITING_FOR_HEADER
        d.feed(data)
        np.testing.assert_array_equal(d.decode_available(), flo_tpu.decode(data))

    def test_corpus_streaming(self, examples_dir):
        data = (examples_dir / "chord_cmajor_stereo.flo").read_bytes()
        got = feed_in_chunks(StreamingDecoder(), data, 100)
        np.testing.assert_array_equal(got, flo_tpu.decode(data))


class TestStreamingEncoder:
    def test_push_and_finalize_roundtrip(self):
        rate = 2000
        s = sine(100, rate, 2.5)
        enc = StreamingEncoder(rate, 1).with_compression(5)
        for i in range(0, len(s), 333):
            enc.push_samples(s[i : i + 333])
        data = enc.finalize()
        assert flo_tpu.validate(data)
        out = flo_tpu.decode(data)
        assert len(out) == len(s)
        assert np.abs(out - s).max() <= 1 / 32768 + 1e-6

    def test_matches_standard_encoder_frames(self):
        """Streaming-finalized files decode identically to batch-encoded ones
        (possible because we fixed the reference's ALPC re-serialization)."""
        rate = 2000
        s = sine(100, rate, 2.0)
        data_std = flo_tpu.encode(s, rate, 1, analyze=False)
        enc = StreamingEncoder(rate, 1)
        enc.push_samples(s)
        data_stream = enc.finalize()
        np.testing.assert_array_equal(flo_tpu.decode(data_stream), flo_tpu.decode(data_std))

    def test_host_frame_encoder_matches_device_path(self):
        """encode_frame_host (C++ search) vs the device candidate search:
        identical frame bytes on this host (same f64 Levinson recursion and
        libm), bit-exact round-trip regardless."""
        from flo_tpu.container import writer
        from flo_tpu.lossless import decoder as lld
        from flo_tpu.lossless.encoder import encode_frame_host, encode_to_frames

        rng = np.random.default_rng(3)
        rate = 3000
        for C, gen in (
            (1, lambda n: 0.5 * np.sin(np.arange(n) * 0.05)),
            (2, lambda n: 0.4 * np.sin(np.arange(n * 2) * 0.03)
                + 0.02 * rng.standard_normal(n * 2)),
            (2, lambda n: np.clip(rng.standard_normal(n * 2), -1, 1)),  # raw-ish
        ):
            s = gen(rate).astype(np.float32)
            frame = encode_frame_host(s, rate, C, 5)
            if frame is None:
                pytest.skip("native toolchain unavailable")
            dev = encode_to_frames(s, rate, C, 5)
            assert len(dev) == 1
            assert writer.serialize_frame(frame) == writer.serialize_frame(dev[0])
            data = writer.write(rate, C, 16, 5, [frame], b"")
            out = lld.decode(data)
            assert np.abs(out - s[: len(out)]).max() <= 1 / 32768 + 1e-6

    def test_host_frame_encoder_silence(self):
        from flo_tpu.lossless.encoder import encode_frame_host

        frame = encode_frame_host(np.zeros(2000, np.float32), 1000, 2, 5)
        if frame is None:
            pytest.skip("native toolchain unavailable")
        assert frame.frame_type == 0  # Silence

    def test_next_frame_drain(self):
        rate = 1000
        s = sine(50, rate, 3.0)
        enc = StreamingEncoder(rate, 1)
        enc.push_samples(s)
        assert enc.pending_frames() == 3
        f0 = enc.next_frame()
        assert f0.index == 0 and f0.timestamp_ms == 0 and f0.samples == rate
        f1 = enc.next_frame()
        assert f1.index == 1 and f1.timestamp_ms == 1000
        # finalize() only includes undrained frames (reference semantics)
        data = enc.finalize()
        i = flo_tpu.info(data)
        assert i.total_samples == rate  # one remaining frame

    def test_flush_partial(self):
        rate = 1000
        enc = StreamingEncoder(rate, 1)
        enc.push_samples(sine(50, rate, 0.4))
        assert enc.pending_frames() == 0
        f = enc.flush()
        assert f is not None and f.samples == 400
        assert enc.pending_samples() == 0

    def test_lpc_prune_is_correctness_neutral(self):
        """The streaming encoder's Levinson-predicted LPC prune (top-K
        evaluated orders, native/encode.cpp prune_topk) may only trade
        bytes, never samples: pruned files must decode bit-identically to
        full-search files, and on ordinary tonal content the predicted
        top-2 should contain the true winner (byte-equal here)."""
        rate = 4000
        rng = np.random.default_rng(11)
        s = (0.4 * np.sin(np.arange(rate * 3) * 0.07)
             + 0.01 * rng.standard_normal(rate * 3)).astype(np.float32)

        def enc(prune):
            e = StreamingEncoder(rate, 1)
            e.lpc_prune_topk = prune
            e.push_samples(s)
            return e.finalize()

        full, pruned = enc(0), enc(2)
        np.testing.assert_array_equal(flo_tpu.decode(pruned), flo_tpu.decode(full))
        np.testing.assert_array_equal(flo_tpu.decode(full), flo_tpu.decode(flo_tpu.encode(s, rate, 1, analyze=False)))
        assert pruned == full  # tonal content: top-2 predicted held the winner

    def test_stereo_streaming_encoder(self):
        rate = 1500
        l, r = sine(100, rate, 1.7), sine(130, rate, 1.7)
        s = np.empty(2 * len(l), np.float32)
        s[0::2], s[1::2] = l, r
        enc = StreamingEncoder(rate, 2)
        enc.push_samples(s)
        data = enc.finalize()
        out = flo_tpu.decode(data)
        assert np.abs(out - s).max() <= 1 / 32768 + 1e-6
