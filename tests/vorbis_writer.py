"""Test-only Ogg Vorbis WRITER: synthesizes spec-valid conformance vectors.

Ground truth for flo_tpu/vorbis.py, built the same way tests/flac_writer.py
verifies the FLAC decoder: an independent from-spec implementation of the
WRITE direction (bit packing, canonical Huffman assignment, Ogg paging,
forward floor/residue construction) that shares nothing with the decoder
beyond the format's defining constants. The writer also computes the exact
PCM a conforming decoder must produce — using the DIRECT O(n^2) IMDCT
formula, not the decoder's FFT factorization — so tests compare two fully
independent renderings of the same stream.

Stream shape: single blocksize, floor1 with zero partitions pinned to the
flat 1.0 curve (y0 = y1 = 255 at multiplier 1), residue type 2 over a
[-7, 7]^2 VQ lattice with a zero-partition class, optional square-polar
channel coupling, vorbis comments.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_LATTICE = 15  # values per dimension: -7..7
_PSIZE = 32  # residue partition size
_CLASS_DIMS = 4  # classbook dims (partitions per classword)


class _BitWriter:
    """LSB-first bit packer (Vorbis bit order)."""

    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc |= (int(value) & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_codeword(self, code: int, length: int):
        """Huffman codewords enter the stream tree-descent (MSB) first."""
        rev = int(f"{code:0{length}b}"[::-1], 2) if length else 0
        self.write(rev, length)

    def done(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.bytes)


def assign_codewords(lengths):
    """Canonical Vorbis codeword assignment (spec 3.2.1): entry order, lowest
    unused codeword of the entry's length."""
    codes = [0] * len(lengths)
    available = [0] * 33
    first = True
    for e, l in enumerate(lengths):
        if l == 0:
            continue
        if first:
            codes[e] = 0
            for i in range(1, l + 1):
                available[i] = 1 << (32 - i)
            first = False
            continue
        z = l
        while z > 0 and available[z] == 0:
            z -= 1
        assert z > 0, "over-subscribed test codebook"
        res = available[z]
        available[z] = 0
        codes[e] = res >> (32 - l)
        for y in range(l, z, -1):
            available[y] = res + (1 << (32 - y))
    return codes


def float32_pack(v: float) -> int:
    """Inverse of vorbis float32_unpack for exact small integers."""
    sign = 0
    if v < 0:
        sign = 0x80000000
        v = -v
    mantissa = int(v)
    assert mantissa == v and mantissa < (1 << 21), "test packer: ints only"
    return sign | (788 << 21) | mantissa


def _value_book_lengths():
    """Complete prefix code over the 225-entry lattice: Kraft-exact mix of
    31 seven-bit + 194 eight-bit codes."""
    n = _LATTICE * _LATTICE
    return [7] * 31 + [8] * (n - 31)


@dataclass
class _Config:
    n: int  # blocksize
    channels: int
    rate: int
    coupled: bool


def _id_packet(cfg: _Config) -> bytes:
    w = _BitWriter()
    for b in b"\x01vorbis":
        w.write(b, 8)
    w.write(0, 32)
    w.write(cfg.channels, 8)
    w.write(cfg.rate, 32)
    w.write(0, 32)
    w.write(0, 32)
    w.write(0, 32)
    exp = cfg.n.bit_length() - 1
    w.write(exp, 4)
    w.write(exp, 4)
    w.write(1, 1)
    return w.done()


def _comment_packet(comments: dict) -> bytes:
    w = _BitWriter()
    for b in b"\x03vorbis":
        w.write(b, 8)
    # Padded vendor string pushes the packet past 255 bytes so the paginator
    # can split it across pages (lacing can only break >=255-byte packets).
    vendor = b"flo_tpu test vectors" + b"." * 300
    w.write(len(vendor), 32)
    for b in vendor:
        w.write(b, 8)
    items = [f"{k}={v}".encode() for k, v in comments.items()]
    w.write(len(items), 32)
    for it in items:
        w.write(len(it), 32)
        for b in it:
            w.write(b, 8)
    w.write(1, 1)
    return w.done()


def _write_classbook(w: _BitWriter):
    """dims=4, entries=16, all lengths 4, no lookup."""
    w.write(0x564342, 24)
    w.write(_CLASS_DIMS, 16)
    w.write(16, 24)
    w.write(0, 1)  # unordered
    w.write(0, 1)  # not sparse
    for _ in range(16):
        w.write(4 - 1, 5)
    w.write(0, 4)  # lookup type 0


def _write_value_book(w: _BitWriter):
    """dims=2, entries=225, lookup type 1 lattice -7..7 step 1."""
    w.write(0x564342, 24)
    w.write(2, 16)
    w.write(_LATTICE * _LATTICE, 24)
    w.write(0, 1)
    w.write(0, 1)
    for l in _value_book_lengths():
        w.write(l - 1, 5)
    w.write(1, 4)  # lookup type 1
    w.write(float32_pack(-7.0), 32)  # minimum
    w.write(float32_pack(1.0), 32)  # delta
    w.write(4 - 1, 4)  # value_bits
    w.write(0, 1)  # sequence_p
    for m in range(_LATTICE):
        w.write(m, 4)


def _setup_packet(cfg: _Config) -> bytes:
    w = _BitWriter()
    for b in b"\x05vorbis":
        w.write(b, 8)
    w.write(2 - 1, 8)  # two codebooks
    _write_classbook(w)
    _write_value_book(w)
    w.write(0, 6)  # one time transform
    w.write(0, 16)
    # one floor, type 1
    w.write(0, 6)
    w.write(1, 16)
    w.write(0, 5)  # partitions = 0
    w.write(1 - 1, 2)  # multiplier = 1 (range 256)
    rangebits = (cfg.n // 2).bit_length() - 1  # 2^rangebits == n/2
    w.write(rangebits, 4)
    # one residue, type 2
    w.write(0, 6)
    w.write(2, 16)
    w.write(0, 24)  # begin
    w.write(cfg.n // 2 * cfg.channels, 24)  # end
    w.write(_PSIZE - 1, 24)
    w.write(2 - 1, 6)  # two classifications
    w.write(0, 8)  # classbook index 0
    # class 0: cascade 0; class 1: cascade bit0
    w.write(0, 3)
    w.write(0, 1)
    w.write(1, 3)
    w.write(0, 1)
    w.write(1, 8)  # class 1 pass 0 -> value book (index 1)
    # one mapping, type 0
    w.write(0, 6)
    w.write(0, 16)
    w.write(0, 1)  # one submap
    if cfg.coupled:
        assert cfg.channels == 2
        w.write(1, 1)
        w.write(0, 8)  # one coupling step
        w.write(0, 1)  # magnitude channel 0 (ilog(1) = 1 bit)
        w.write(1, 1)  # angle channel 1
    else:
        w.write(0, 1)
    w.write(0, 2)  # reserved
    w.write(0, 8)  # time config (discarded)
    w.write(0, 8)  # floor 0
    w.write(0, 8)  # residue 0
    # one mode: blockflag 0
    w.write(0, 6)
    w.write(0, 1)
    w.write(0, 16)
    w.write(0, 16)
    w.write(0, 8)
    w.write(1, 1)  # framing
    return w.done()


def _audio_packet(cfg: _Config, quantized: np.ndarray) -> bytes:
    """quantized: [ch, n/2] ints in [-7, 7] — the stored spectrum vectors
    (post-coupling domain when cfg.coupled)."""
    class_lengths = [4] * 16
    class_codes = assign_codewords(class_lengths)
    val_lengths = _value_book_lengths()
    val_codes = assign_codewords(val_lengths)

    n2 = cfg.n // 2
    ch = cfg.channels
    w = _BitWriter()
    w.write(0, 1)  # audio packet
    # mode number: ilog(modes-1) = ilog(0) = 0 bits -> nothing
    ybits = 8  # ilog(256 - 1)
    for _ in range(ch):
        w.write(1, 1)  # floor nonzero
        w.write(255, ybits)  # y0 -> inverse_dB[255] = 1.0
        w.write(255, ybits)
    # residue type 2: single interleaved vector
    inter = np.zeros(n2 * ch, np.int64)
    for c in range(ch):
        inter[c::ch] = quantized[c]
    parts = (n2 * ch) // _PSIZE
    classes = [
        0 if not inter[p * _PSIZE : (p + 1) * _PSIZE].any() else 1
        for p in range(parts)
    ]
    p = 0
    while p < parts:
        group = classes[p : p + _CLASS_DIMS]
        temp = 0
        for g in group:
            temp = temp * 2 + g  # base-`classifications` big-endian fold
        # pad missing tail entries (decoder only reads stored partitions)
        for _ in range(_CLASS_DIMS - len(group)):
            temp *= 2
        w.write_codeword(class_codes[temp], class_lengths[temp])
        for i in range(_CLASS_DIMS):
            if p + i >= parts:
                break
            if classes[p + i] == 1:
                seg = inter[(p + i) * _PSIZE : (p + i + 1) * _PSIZE]
                for j in range(0, _PSIZE, 2):
                    v0, v1 = int(seg[j]) + 7, int(seg[j + 1]) + 7
                    e = v0 + _LATTICE * v1
                    w.write_codeword(val_codes[e], val_lengths[e])
        p += _CLASS_DIMS
    return w.done()


def _ogg_page(serial, seq, htype, granule, segments) -> bytes:
    from flo_tpu.vorbis import ogg_crc

    body = b"".join(segments)
    lacing = bytes(len(s) for s in segments)
    header = (
        b"OggS" + bytes([0, htype])
        + struct.pack("<q", granule)
        + struct.pack("<I", serial)
        + struct.pack("<I", seq)
        + b"\x00\x00\x00\x00"
        + bytes([len(lacing)])
        + lacing
    )
    page = bytearray(header + body)
    crc = ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def _paginate(packets, n2: int, serial=0x1234) -> bytes:
    """Pack packets into pages, deliberately splitting large packets across
    pages (continuation flag) to exercise reassembly. n2 = blocksize/2,
    needed for spec-correct sample granule positions."""
    out = bytearray()
    seq = 0

    def lacing_for(pkt):
        segs = []
        rem = len(pkt)
        pos = 0
        while True:
            s = min(rem, 255)
            segs.append(pkt[pos : pos + s])
            pos += s
            rem -= s
            if s < 255:
                break
        return segs

    # Page 1: identification alone (spec requirement), BOS.
    out += _ogg_page(serial, seq, 0x02, 0, lacing_for(packets[0]))
    seq += 1
    # Page 2: the comment packet's FIRST segment only; page 3 carries its
    # remainder (continuation flag) plus the setup packet — a deliberately
    # continued packet to exercise cross-page reassembly.
    comment_segs = lacing_for(packets[1])
    assert len(comment_segs) > 1, "comment packet must span pages for the test"
    out += _ogg_page(serial, seq, 0, -1, comment_segs[:1])
    seq += 1
    out += _ogg_page(serial, seq, 0x01, -1, comment_segs[1:] + lacing_for(packets[2]))
    seq += 1
    # Audio pages: two packets per page. Granule position = PCM samples
    # decodable through the page's last completed packet: with a single
    # blocksize each packet after the first laps out n/2 samples, so after
    # j packets the stream position is (j-1)*n/2 (framing spec §granule).
    audio = packets[3:]
    i = 0
    pkts_done = 0
    while i < len(audio):
        group = audio[i : i + 2]
        segs = []
        for pkt in group:
            segs += lacing_for(pkt)
        pkts_done += len(group)
        gran = max(0, pkts_done - 1) * n2
        last = i + 2 >= len(audio)
        out += _ogg_page(serial, seq, 0x04 if last else 0, gran, segs)
        seq += 1
        i += 2
    return bytes(out)


def _vorbis_window_direct(n):
    i = np.arange(n, dtype=np.float64)
    return np.sin(0.5 * np.pi * np.sin(np.pi / n * (i + 0.5)) ** 2)


def _imdct_direct(spec):
    n2 = len(spec)
    n = 2 * n2
    i = np.arange(n)[:, None]
    k = np.arange(n2)[None, :]
    C = np.cos(np.pi / (2 * n) * (2 * i + 1 + n2) * (2 * k + 1))
    return C @ spec


def _inverse_coupling_direct(M, A):
    newM = np.where(M > 0, np.where(A > 0, M, M + A), np.where(A > 0, M, M - A))
    newA = np.where(M > 0, np.where(A > 0, M - A, M), np.where(A > 0, M + A, M))
    return newM, newA


def make_stream(
    n=512, channels=2, rate=8000, frames=12, coupled=False, seed=0,
    comments=None,
):
    """Build an Ogg Vorbis stream + the exact PCM a conforming decoder must
    output (float64 [ch, total]). Spectra are random lattice vectors."""
    rng = np.random.default_rng(seed)
    cfg = _Config(n=n, channels=channels, rate=rate, coupled=coupled)
    n2 = n // 2
    packets = [
        _id_packet(cfg),
        _comment_packet(comments or {"TITLE": "vector", "ARTIST": "flo_tpu"}),
        _setup_packet(cfg),
    ]
    expected_parts = []
    window = _vorbis_window_direct(n)
    prev_tail = None
    for f in range(frames):
        q = rng.integers(-7, 8, (channels, n2))
        # Sprinkle all-zero partitions to exercise class 0.
        for c in range(channels):
            for p in range(0, n2, _PSIZE):
                if rng.random() < 0.3:
                    q[c, p : p + _PSIZE] = 0
        packets.append(_audio_packet(cfg, q))

        spec = q.astype(np.float64)
        if coupled:
            m, a = _inverse_coupling_direct(spec[0], spec[1])
            spec = np.stack([m, a])
        # floor is flat 1.0; window both sides (single blocksize).
        time = np.stack([_imdct_direct(s) for s in spec]) * window[None, :]
        if prev_tail is not None:
            emit = time[:, : n2].copy()
            emit += prev_tail
            expected_parts.append(emit)
        prev_tail = time[:, n2:].copy()

    data = _paginate(packets, n2)
    expected = (
        np.concatenate(expected_parts, axis=1)
        if expected_parts
        else np.zeros((channels, 0))
    )
    return data, expected
