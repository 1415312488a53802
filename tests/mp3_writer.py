"""Test-only MP3 writer over the system libmp3lame (ground-truth generator).

Mirrors the role of tests/flac_writer.py and tests/vorbis_writer.py: an
INDEPENDENT producer of real-world files for the ingest tests.  lame is the
de-facto canonical MP3 encoder, so files it emits are exactly what
`flo encode in.mp3 out.flo` sees in the wild — including its ID3v2.3 tags
and the Xing/LAME gapless header that makes decoded length sample-exact.

Not imported by production code.
"""

from __future__ import annotations

import ctypes

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for name in ("libmp3lame.so.0", "libmp3lame.so"):
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.lame_init.restype = ctypes.c_void_p
        for fn in (
            "lame_set_in_samplerate", "lame_set_num_channels",
            "lame_set_brate", "lame_set_quality", "lame_init_params",
            "lame_close",
        ):
            getattr(lib, fn).argtypes = [ctypes.c_void_p] + (
                [ctypes.c_int] if fn.startswith("lame_set") else []
            )
        lib.lame_encode_buffer_ieee_float.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ]
        lib.lame_encode_flush.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ]
        _LIB = lib
        return lib
    return None


def available() -> bool:
    return _load() is not None


def write_mp3(
    samples: np.ndarray, sample_rate: int, channels: int,
    bitrate_kbps: int = 192, tags: dict | None = None,
) -> bytes:
    """Encode interleaved f32 samples to MP3 bytes (CBR, with LAME header).

    tags: optional {title, artist, album, year, track, comment} strings —
    written as an ID3v2 tag by lame's own tagger (the ground truth for our
    ID3 parser).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libmp3lame not available")
    samples = np.asarray(samples, dtype=np.float32).reshape(-1)
    n = len(samples) // channels
    gf = ctypes.c_void_p(lib.lame_init())
    if not gf:
        raise RuntimeError("lame_init failed")
    try:
        lib.lame_set_in_samplerate(gf, int(sample_rate))
        lib.lame_set_num_channels(gf, int(channels))
        lib.lame_set_brate(gf, int(bitrate_kbps))
        lib.lame_set_quality(gf, 2)
        if tags:
            lib.id3tag_init.argtypes = [ctypes.c_void_p]
            lib.id3tag_init(gf)
            lib.id3tag_add_v2.argtypes = [ctypes.c_void_p]
            lib.id3tag_add_v2(gf)
            for key, fn in (
                ("title", "id3tag_set_title"), ("artist", "id3tag_set_artist"),
                ("album", "id3tag_set_album"), ("year", "id3tag_set_year"),
                ("comment", "id3tag_set_comment"), ("track", "id3tag_set_track"),
            ):
                if key in tags:
                    f = getattr(lib, fn)
                    f.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
                    f(gf, str(tags[key]).encode("utf-8"))
        if lib.lame_init_params(gf) < 0:
            raise RuntimeError("lame_init_params failed")

        if channels == 1:
            left = samples.copy()
            right = samples.copy()  # lame ignores right for mono
        else:
            left = np.ascontiguousarray(samples[0::2])
            right = np.ascontiguousarray(samples[1::2])
        out = bytearray()
        buf = (ctypes.c_ubyte * (int(1.25 * n) + 7200 + 65536))()
        rc = lib.lame_encode_buffer_ieee_float(
            gf,
            left.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            right.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, buf, len(buf),
        )
        if rc < 0:
            raise RuntimeError(f"lame_encode_buffer failed ({rc})")
        out += bytes(buf[:rc])
        rc = lib.lame_encode_flush(gf, buf, len(buf))
        if rc < 0:
            raise RuntimeError(f"lame_encode_flush failed ({rc})")
        out += bytes(buf[:rc])
        # lame leaves a placeholder Xing/LAME frame at the front; fill it so
        # decoders get exact gapless lengths.
        get_tag = getattr(lib, "lame_get_lametag_frame", None)
        if get_tag is not None:
            get_tag.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_size_t,
            ]
            get_tag.restype = ctypes.c_size_t
            tsz = get_tag(gf, buf, len(buf))
            if 0 < tsz <= len(buf):
                # The tag frame sits after any ID3v2 block lame wrote.
                head = bytes(out[:10])
                off = 0
                if head[:3] == b"ID3":
                    off = 10 + (
                        (head[6] << 21) | (head[7] << 14)
                        | (head[8] << 7) | head[9]
                    )
                out[off : off + tsz] = bytes(buf[:tsz])
        return bytes(out)
    finally:
        lib.lame_close(gf)
