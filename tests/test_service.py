"""HTTP service surface (the WASM/JS API analog, Docs/javascript-api.md)."""

import json
import struct
import threading
import urllib.request

import numpy as np
import pytest

import flo_tpu
from flo_tpu import service


@pytest.fixture(scope="module")
def server_url():
    srv = service.make_server("127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, path, body=b"", headers=None):
    req = urllib.request.Request(url + path, data=body, method="POST")
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    with urllib.request.urlopen(req) as r:
        return r.status, dict(r.headers), r.read()


def _get(url, path):
    with urllib.request.urlopen(url + path) as r:
        return r.status, r.read()


def sine(freq, rate, secs, channels=1):
    t = np.arange(int(rate * secs)) / rate
    s = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    if channels == 2:
        s = np.stack([s, s], 1).reshape(-1)
    return s


class TestService:
    def test_version(self, server_url):
        status, body = _get(server_url, "/v1/version")
        assert status == 200 and json.loads(body) == {"version": "1.2"}

    def test_encode_decode_roundtrip(self, server_url):
        s = sine(220, 4000, 1.0, channels=2)
        _, _, flo = _post(
            server_url, "/v1/encode?sample_rate=4000&channels=2",
            s.astype("<f4").tobytes(),
        )
        assert flo[:4] == b"FLO!"
        _, headers, raw = _post(server_url, "/v1/decode", flo)
        assert headers["X-Sample-Rate"] == "4000" and headers["X-Channels"] == "2"
        out = np.frombuffer(raw, "<f4")
        assert np.abs(out - s).max() <= 1 / 32768 + 1e-6

    def test_encode_lossy_and_info(self, server_url):
        s = sine(220, 8000, 1.0)
        _, _, flo = _post(
            server_url, "/v1/encode_lossy?sample_rate=8000&channels=1&quality=2",
            s.astype("<f4").tobytes(),
        )
        _, _, body = _post(server_url, "/v1/info", flo)
        info = json.loads(body)
        assert info["is_lossy"] and info["sample_rate"] == 8000

    def test_validate_and_metadata(self, server_url):
        s = sine(100, 2000, 0.5)
        flo = flo_tpu.encode(s, 2000, 1, analyze=True)
        _, _, body = _post(server_url, "/v1/validate", flo)
        assert json.loads(body)["valid"] is True
        _, _, body = _post(server_url, "/v1/metadata", flo)
        meta = json.loads(body)
        assert "length_ms" in meta

    def test_metadata_update_roundtrip(self, server_url):
        s = sine(100, 2000, 0.5)
        flo = flo_tpu.encode(s, 2000, 1, analyze=False)
        patch = json.dumps({"title": "Served", "artist": "Band"}).encode()
        body = struct.pack("<I", len(flo)) + flo + patch
        _, _, updated = _post(server_url, "/v1/metadata/update", body)
        meta = flo_tpu.get_metadata(updated)
        assert meta.title == "Served" and meta.artist == "Band"
        # Audio bytes untouched (zero-copy splice).
        assert np.array_equal(flo_tpu.decode(updated), flo_tpu.decode(flo))
        _, _, stripped = _post(server_url, "/v1/metadata/strip", updated)
        assert not flo_tpu.has_metadata(stripped)

    def test_decode_wav(self, server_url):
        s = sine(100, 2000, 0.5)
        flo = flo_tpu.encode(s, 2000, 1, analyze=False)
        _, _, wav = _post(server_url, "/v1/decode_wav", flo)
        assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"

    def test_encode_file_wav_input(self, server_url):
        from flo_tpu import audio_io

        s = sine(330, 4000, 0.5, channels=2)
        wav = audio_io.write_wav_to_bytes(s, 4000, 2)
        _, _, flo = _post(server_url, "/v1/encode_file?level=5", wav)
        assert flo[:4] == b"FLO!"
        out = flo_tpu.decode(flo)
        assert np.abs(out - s).max() <= 1 / 32768 + 1e-6

    def test_encode_file_lossy_and_bitrate(self, server_url):
        """Regression: ?quality= once crashed on EncodeOptions.lossy (the
        bool field) instead of lossy_quality; exercise both lossy variants."""
        from flo_tpu import audio_io

        s = sine(330, 8000, 0.5, channels=2)
        wav = audio_io.write_wav_to_bytes(s, 8000, 2)
        for qs in ("quality=2", "bitrate_kbps=128"):
            _, _, flo = _post(server_url, f"/v1/encode_file?{qs}", wav)
            assert flo[:4] == b"FLO!"
            status, _, body = _post(server_url, "/v1/info", flo)
            assert status == 200 and json.loads(body)["is_lossy"]

    def test_seek(self, server_url):
        s = sine(100, 2000, 3.0)
        flo = flo_tpu.encode(s, 2000, 1, analyze=False)
        _, _, body = _post(server_url, "/v1/seek?time_ms=1500", flo)
        res = json.loads(body)
        assert res["frame_index"] == 1 and res["sample_offset"] == 1000

    def test_analysis(self, server_url):
        s = sine(440, 8000, 1.0)
        flo = flo_tpu.encode(s, 8000, 1, analyze=False)
        _, _, body = _post(
            server_url, "/v1/analysis?waveform=1&spectrum=1", flo
        )
        out = json.loads(body)
        assert out["sample_rate"] == 8000
        assert out["loudness"]["integrated_lufs"] < 0
        assert len(out["waveform"]["peaks"]) > 0
        assert len(out["spectrum"]["energy_profile"]) == 16

    def test_errors(self, server_url):
        req = urllib.request.Request(server_url + "/v1/nope", data=b"", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 404
        req = urllib.request.Request(
            server_url + "/v1/encode?sample_rate=100", data=b"", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400

    def test_codec_dispatch_runs_under_shape_buckets(self, server_url):
        """Codec endpoints run with shape bucketing enabled (arbitrary
        client payload geometries must hit a logarithmic program family,
        not one compile per exact shape); metadata-only fast paths
        (/v1/version) stay outside the codec lock and unbucketed."""
        from unittest import mock

        from flo_tpu.parallel import shape_buckets_on

        seen = {}
        real = service._handle

        def spy(path, query, body):
            seen[path] = shape_buckets_on()
            return real(path, query, body)

        with mock.patch.object(service, "_handle", side_effect=spy):
            _post(
                server_url,
                "/v1/encode?sample_rate=2000&channels=1",
                sine(100, 2000, 0.2).tobytes(),
            )
            _get(server_url, "/v1/version")
        assert seen["/v1/encode"] is True
        assert seen["/v1/version"] is False

    def test_cover_art_404(self, server_url):
        s = sine(100, 2000, 0.2)
        flo = flo_tpu.encode(s, 2000, 1, analyze=False)
        req = urllib.request.Request(
            server_url + "/v1/cover_art", data=flo, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 404


class TestDemoPage:
    def test_demo_served(self, server_url):
        status, body = _get(server_url, "/demo")
        assert status == 200
        html = body.decode()
        assert "<!doctype html>" in html and "/v1/encode_file" in html
        # Root serves the same page for convenience.
        status2, body2 = _get(server_url, "/")
        assert status2 == 200 and body2 == body


def test_version_and_demo_bypass_codec_lock(server_url):
    """Health probes must answer while a bulk encode holds the codec lock
    (the orchestrator would otherwise mark a busy-but-healthy instance dead)."""
    import socket

    with service._CODEC_LOCK:
        old = socket.getdefaulttimeout()
        socket.setdefaulttimeout(10)
        try:
            status, body = _get(server_url, "/v1/version")
            assert status == 200 and json.loads(body)["version"] == flo_tpu.version()
            status, body = _get(server_url, "/demo")
            assert status == 200 and b"<html" in body.lower()
        finally:
            socket.setdefaulttimeout(old)


class TestRequestValidation:
    def test_bad_query_parameter_is_400_not_500(self, server_url):
        """Malformed client input (uncastable query param) is the client's
        fault: 400, never a 500 that trips load-balancer retries/alerts."""
        samples = sine(440, 8000, 0.2)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(
                server_url,
                "/v1/encode?sample_rate=abc&channels=2",
                samples.tobytes(),
            )
        assert e.value.code == 400
        assert "sample_rate" in json.loads(e.value.read())["error"]

    def test_bad_float_quality_is_400(self, server_url):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(
                server_url,
                "/v1/encode_transform?sample_rate=8000&channels=1&quality=hi",
                sine(440, 8000, 0.2).tobytes(),
            )
        assert e.value.code == 400

    def test_encode_transform_roundtrip(self, server_url):
        samples = sine(440, 8000, 0.5)
        status, _, data = _post(
            server_url,
            "/v1/encode_transform?sample_rate=8000&channels=1&quality=0.7",
            samples.tobytes(),
        )
        assert status == 200 and data[:4] == b"FLO!"
        status, headers, raw = _post(server_url, "/v1/decode", data)
        assert status == 200
        assert int(headers["X-Sample-Rate"]) == 8000
        got = np.frombuffer(raw, dtype="<f4")
        # Lossy decode length is padded up to the hop geometry.
        assert got.size >= samples.size


class TestStreamingSessions:
    """Session endpoints mirroring WasmStreamingDecoder/Encoder
    (libflo/src/lib.rs:544-812)."""

    def test_decoder_session_chunked_feed(self, server_url):
        s = sine(330, 4000, 1.6, channels=2)
        flo = flo_tpu.encode(s, 4000, 2, analyze=False)

        _, _, body = _post(server_url, "/v1/stream/decoder")
        sid = json.loads(body)["session"]

        _, body0 = _get(server_url, f"/v1/stream/{sid}/state")
        assert json.loads(body0)["state"] == "waiting_for_header"

        # Network-chunk simulation: feed in small slices, drain frames
        # as they become available (SURVEY §4 streaming pattern).
        got = []
        for i in range(0, len(flo), 997):
            _, _, st = _post(
                server_url, f"/v1/stream/{sid}/feed", flo[i : i + 997]
            )
            while True:
                status, headers, raw = _post(
                    server_url, f"/v1/stream/{sid}/next_frame"
                )
                if status == 204:
                    break
                got.append(np.frombuffer(raw, "<f4"))
        state = json.loads(st)
        assert state["state"] in ("ready", "finished")
        assert state["info"]["sample_rate"] == 4000

        out = np.concatenate(got)
        ref = flo_tpu.decode(flo)
        np.testing.assert_array_equal(out, np.asarray(ref, np.float32))

        _, _, body = _post(server_url, f"/v1/stream/{sid}/close")
        assert json.loads(body)["closed"] is True
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server_url, f"/v1/stream/{sid}/feed", b"x")
        assert e.value.code == 404

    def test_decoder_session_error_state_and_reset(self, server_url):
        _, _, body = _post(server_url, "/v1/stream/decoder")
        sid = json.loads(body)["session"]
        _, _, st = _post(server_url, f"/v1/stream/{sid}/feed", b"NOPE" + b"\0" * 80)
        assert json.loads(st)["state"] == "error"
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server_url, f"/v1/stream/{sid}/feed", b"more")
        assert e.value.code == 409
        _, _, st = _post(server_url, f"/v1/stream/{sid}/reset")
        assert json.loads(st)["state"] == "waiting_for_header"
        _post(server_url, f"/v1/stream/{sid}/close")

    def test_encoder_session_finalize(self, server_url):
        s = sine(220, 2000, 2.3)  # 2 full frames + a partial tail
        _, _, body = _post(
            server_url, "/v1/stream/encoder?sample_rate=2000&channels=1&level=5"
        )
        sid = json.loads(body)["session"]
        for i in range(0, len(s), 1500):
            _, _, st = _post(
                server_url, f"/v1/stream/{sid}/push",
                s[i : i + 1500].astype("<f4").tobytes(),
            )
        assert json.loads(st)["pending_frames"] == 2
        status, _, flo = _post(server_url, f"/v1/stream/{sid}/finalize")
        assert status == 200 and flo[:4] == b"FLO!"
        out = flo_tpu.decode(flo)
        assert np.abs(np.asarray(out, np.float32) - s).max() <= 1 / 32768 + 1e-6
        # Session consumed by finalize.
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(server_url, f"/v1/stream/{sid}/state")
        assert e.value.code == 404

    def test_encoder_session_drain_and_flush(self, server_url):
        s = sine(180, 2000, 1.4)
        _, _, body = _post(
            server_url, "/v1/stream/encoder?sample_rate=2000&channels=1"
        )
        sid = json.loads(body)["session"]
        _post(server_url, f"/v1/stream/{sid}/push", s.astype("<f4").tobytes())
        status, headers, frame0 = _post(server_url, f"/v1/stream/{sid}/next_frame")
        assert status == 200 and headers["X-Frame-Index"] == "0"
        assert int(headers["X-Samples"]) == 2000
        status, _, _ = _post(server_url, f"/v1/stream/{sid}/next_frame")
        assert status == 204
        status, headers, tail = _post(server_url, f"/v1/stream/{sid}/flush")
        assert status == 200 and int(headers["X-Samples"]) == 800
        assert len(tail) > 0
        # Second flush: nothing buffered.
        status, _, _ = _post(server_url, f"/v1/stream/{sid}/flush")
        assert status == 204
        _post(server_url, f"/v1/stream/{sid}/close")

    def test_session_cap(self, server_url):
        opened = []
        try:
            service._MAX_SESSIONS  # document the knob exists
            old_sessions = dict(service._SESSIONS)
            try:
                service._SESSIONS.clear()
                for _ in range(service._MAX_SESSIONS):
                    _, _, body = _post(server_url, "/v1/stream/decoder")
                    opened.append(json.loads(body)["session"])
                with pytest.raises(urllib.error.HTTPError) as e:
                    _post(server_url, "/v1/stream/decoder")
                assert e.value.code == 429
            finally:
                service._SESSIONS.clear()
                service._SESSIONS.update(old_sessions)
        finally:
            pass

    def test_idle_sessions_evicted_at_cap(self, server_url):
        """An abandoned client must not wedge the endpoint at the cap: idle
        sessions are evicted when a create finds the table full."""
        old_sessions = dict(service._SESSIONS)
        try:
            service._SESSIONS.clear()
            _, _, body = _post(server_url, "/v1/stream/decoder")
            stale = json.loads(body)["session"]
            # Age it past the TTL, fill the rest of the table fresh.
            service._SESSIONS[stale][1] -= service._SESSION_IDLE_TTL_S + 1
            for _ in range(service._MAX_SESSIONS - 1):
                _post(server_url, "/v1/stream/decoder")
            _, _, body = _post(server_url, "/v1/stream/decoder")  # evicts stale
            assert "session" in json.loads(body)
            assert stale not in service._SESSIONS
        finally:
            service._SESSIONS.clear()
            service._SESSIONS.update(old_sessions)


def test_toc_endpoint(server_url):
    """/v1/toc returns the seek table (the get_toc JS export analog)."""
    s = sine(100, 2000, 3.0)
    flo = flo_tpu.encode(s, 2000, 1, analyze=False)
    _, _, body = _post(server_url, "/v1/toc", flo)
    toc = json.loads(body)
    assert [e["frame_index"] for e in toc] == [0, 1, 2]
    assert [e["timestamp_ms"] for e in toc] == [0, 1000, 2000]
    assert all(e["frame_size"] > 0 for e in toc)
    # Offsets are cumulative within DATA.
    assert toc[1]["byte_offset"] == toc[0]["byte_offset"] + toc[0]["frame_size"]


class TestSeekAndMetadataEndpoints:
    def test_decode_frame(self, server_url):
        """/v1/decode_frame == the matching slice of a full decode."""
        s = sine(150, 2000, 3.0)
        flo = flo_tpu.encode(s, 2000, 1, analyze=False)
        full = np.asarray(flo_tpu.decode(flo), np.float32)
        _, _, raw = _post(server_url, "/v1/decode_frame?frame_index=1", flo)
        frame = np.frombuffer(raw, "<f4")
        np.testing.assert_array_equal(frame, full[2000:4000])

    def test_metadata_create_and_raw(self, server_url):
        """create_metadata_from_object + get_metadata_bytes analogs:
        build msgpack from JSON, finalize a stream with it, read it back."""
        obj = {
            "title": "Session Take",
            "artist": "Us",
            "bpm": 128.0,
            "section_markers": [
                {"timestamp_ms": 0, "section_type": "intro", "label": None},
                {"timestamp_ms": 30000, "section_type": "chorus", "label": "hook"},
            ],
        }
        _, headers, packed = _post(
            server_url, "/v1/metadata/create", json.dumps(obj).encode()
        )
        assert headers["Content-Type"] == "application/msgpack"
        from flo_tpu.core.metadata import FloMetadata

        meta = FloMetadata.from_msgpack(packed)
        assert meta.title == "Session Take"
        assert meta.section_markers[1].label == "hook"

        # Feed it to a streaming-encoder finalize.
        s = sine(200, 2000, 1.0)
        _, _, body = _post(
            server_url, "/v1/stream/encoder?sample_rate=2000&channels=1"
        )
        sid = json.loads(body)["session"]
        _post(server_url, f"/v1/stream/{sid}/push", s.astype("<f4").tobytes())
        _, _, flo = _post(server_url, f"/v1/stream/{sid}/finalize", packed)
        got = flo_tpu.get_metadata(flo)
        assert got.title == "Session Take" and len(got.section_markers) == 2

        # Raw metadata read-back is byte-identical to what was embedded.
        _, _, raw = _post(server_url, "/v1/metadata?raw=1", flo)
        assert raw == packed

    def test_metadata_update_nested_structures(self, server_url):
        """Nested patch fields must become dataclasses, not raw dicts
        (raw setattr used to 500 on re-serialization)."""
        s = sine(100, 2000, 0.5)
        flo = flo_tpu.encode(s, 2000, 1, analyze=False)
        patch = json.dumps({
            "title": "T",
            "section_markers": [
                {"timestamp_ms": 0, "section_type": "intro", "label": None}
            ],
        }).encode()
        body = struct.pack("<I", len(flo)) + flo + patch
        _, _, updated = _post(server_url, "/v1/metadata/update", body)
        meta = flo_tpu.get_metadata(updated)
        assert meta.title == "T"
        assert meta.section_markers[0].section_type.value == "intro"


class TestAnalysisEndpoints:
    def test_similarity(self, server_url):
        a = sine(440, 8000, 1.0)
        b = sine(445, 8000, 1.0)   # near-identical spectrum
        c = sine(3000, 8000, 1.0)  # very different
        fa = flo_tpu.encode(a, 8000, 1, analyze=False)
        fb = flo_tpu.encode(b, 8000, 1, analyze=False)
        fc = flo_tpu.encode(c, 8000, 1, analyze=False)

        def sim(x, y):
            body = struct.pack("<I", len(x)) + x + y
            _, _, out = _post(server_url, "/v1/similarity", body)
            return json.loads(out)["similarity"]

        assert sim(fa, fa) == 1.0  # identical content short-circuits on hash
        assert sim(fa, fb) > sim(fa, fc)

    def test_dominant_frequencies(self, server_url):
        s = sine(440, 8000, 1.0)
        flo = flo_tpu.encode(s, 8000, 1, analyze=False)
        _, _, out = _post(server_url, "/v1/dominant_frequencies?num=3", flo)
        frames = json.loads(out)
        assert frames and len(frames[0]) == 3
        assert all(0 <= f <= 4000 for f in frames[0])

    def test_similarity_bad_framing(self, server_url):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server_url, "/v1/similarity", struct.pack("<I", 999) + b"x")
        assert e.value.code == 400


class TestInfoEndpoints:
    def test_audio_info(self, server_url):
        from flo_tpu import audio_io

        s = sine(330, 4000, 1.5, channels=2)
        wav = audio_io.write_wav_to_bytes(s, 4000, 2)
        _, _, body = _post(server_url, "/v1/audio_info", wav)
        info = json.loads(body)
        assert info == {"sample_rate": 4000, "channels": 2, "duration_secs": 1.5}

    def test_encoding_info(self, server_url):
        from flo_tpu import audio_io, reflo

        s = sine(330, 4000, 0.5)
        wav = audio_io.write_wav_to_bytes(s, 4000, 1)
        flo = reflo.encode_from_audio(wav, reflo.EncodeOptions.lossless())
        _, _, body = _post(server_url, "/v1/encoding_info", flo)
        info = json.loads(body)
        assert info["source_format"] == "WAV"
        assert info["encoder_version"]  # stamped by encode_from_samples

        bare = flo_tpu.encode(s, 4000, 1, analyze=False)
        _, _, body = _post(server_url, "/v1/encoding_info", bare)
        assert json.loads(body) is None


class TestHardening:
    """Resource limits + input validation (VERDICT r3 weak #3 / next #5,
    ADVICE r3 lows 1 & 4)."""

    def test_oversize_content_length_is_413_before_read(self, server_url):
        # The cap must fire on the DECLARED length, before any body bytes
        # are read — a hostile Content-Length can't balloon the process.
        import http.client

        host, port = server_url.replace("http://", "").split(":")
        conn = http.client.HTTPConnection(host, int(port), timeout=10)
        try:
            conn.putrequest("POST", "/v1/encode?sample_rate=8000&channels=1")
            conn.putheader("Content-Length", str(service._MAX_BODY_BYTES + 1))
            conn.endheaders()  # never send the body
            resp = conn.getresponse()
            assert resp.status == 413
            assert "exceeds" in json.loads(resp.read())["error"]
        finally:
            conn.close()

    def test_garbage_content_length_is_400(self, server_url):
        import http.client

        host, port = server_url.replace("http://", "").split(":")
        conn = http.client.HTTPConnection(host, int(port), timeout=10)
        try:
            conn.putrequest("POST", "/v1/version")
            conn.putheader("Content-Length", "banana")
            conn.endheaders()
            assert conn.getresponse().status == 400
        finally:
            conn.close()

    def test_f32_body_not_multiple_of_4_is_400(self, server_url):
        for path in (
            "/v1/encode?sample_rate=8000&channels=1",
            "/v1/encode_lossy?sample_rate=8000&channels=1",
        ):
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(server_url, path, b"\x00" * 7)
            assert e.value.code == 400
            assert "multiple of 4" in json.loads(e.value.read())["error"]

    def test_stream_encoder_create_validates_ranges(self, server_url):
        for qs in (
            "sample_rate=0&channels=2",
            "sample_rate=-8000&channels=2",
            "sample_rate=8000&channels=0",
            "sample_rate=8000&channels=9",
            "sample_rate=8000&channels=2&bit_depth=12",
            "sample_rate=8000&channels=2&level=11",
        ):
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(server_url, f"/v1/stream/encoder?{qs}")
            assert e.value.code == 400, qs

    def test_stream_push_odd_body_is_400(self, server_url):
        _, _, body = _post(
            server_url, "/v1/stream/encoder?sample_rate=8000&channels=1"
        )
        sid = json.loads(body)["session"]
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(server_url, f"/v1/stream/{sid}/push", b"\x00" * 6)
            assert e.value.code == 400
        finally:
            _post(server_url, f"/v1/stream/{sid}/close")

    def test_session_buffer_cap_is_413(self, server_url, monkeypatch):
        monkeypatch.setattr(service, "_MAX_SESSION_BUFFER_BYTES", 64)
        _, _, body = _post(server_url, "/v1/stream/decoder")
        sid = json.loads(body)["session"]
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(server_url, f"/v1/stream/{sid}/feed", b"\x00" * 65)
            assert e.value.code == 413
            # Encoder sessions enforce the same cap on pushed samples.
            _, _, body = _post(
                server_url, "/v1/stream/encoder?sample_rate=8000&channels=1"
            )
            sid2 = json.loads(body)["session"]
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(server_url, f"/v1/stream/{sid2}/push", b"\x00" * 68)
            assert e.value.code == 413
            _post(server_url, f"/v1/stream/{sid2}/close")
        finally:
            _post(server_url, f"/v1/stream/{sid}/close")

    def test_idle_sessions_evicted_below_cap(self, server_url, monkeypatch):
        # ADVICE r3 low 2: eviction must not wait for the 64-session cap.
        _, _, body = _post(server_url, "/v1/stream/decoder")
        sid = json.loads(body)["session"]
        monkeypatch.setattr(service, "_SESSION_IDLE_TTL_S", -1)
        _post(server_url, "/v1/stream/decoder")  # any stream request sweeps
        monkeypatch.setattr(service, "_SESSION_IDLE_TTL_S", 15 * 60)
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(server_url, f"/v1/stream/{sid}/state")
        assert e.value.code == 404

    def test_similarity_empty_segment_is_400(self, server_url):
        flo = flo_tpu.encode(sine(100, 2000, 0.2), 2000, 1, analyze=False)
        for framed in (
            struct.pack("<I", 0) + flo,               # empty flo_a
            struct.pack("<I", len(flo)) + flo,        # empty flo_b
        ):
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(server_url, "/v1/similarity", framed)
            assert e.value.code == 400

    def test_serve_defaults_to_loopback(self):
        import inspect

        assert inspect.signature(service.serve).parameters["host"].default == "127.0.0.1"
