"""Minimal FLAC writer (test helper): synthesizes spec-conformant streams to
exercise flo_tpu.flac since this environment has no FLAC encoder. Covers
CONSTANT/VERBATIM/FIXED/LPC subframes, Rice + escape partitions, stereo
decorrelation modes, wasted bits, and VORBIS_COMMENT tags. Frame CRCs are
written as zeros (the decoder is CRC-tolerant by design)."""

from __future__ import annotations

import struct

import numpy as np


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)


def _rice(bw: BitWriter, vals, k: int):
    for v in vals:
        u = (int(v) << 1) ^ (int(v) >> 63)
        bw.write_unary(u >> k)
        if k:
            bw.write(u & ((1 << k) - 1), k)


def write_residuals(bw: BitWriter, res, order: int, blocksize: int, po: int = 0,
                    ks=None, escape_bits=None):
    bw.write(0, 2)  # method 0: 4-bit params
    bw.write(po, 4)
    nparts = 1 << po
    w = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        part = res[w : w + n]
        w += n
        if escape_bits is not None and escape_bits[p] is not None:
            bw.write(0xF, 4)
            bw.write(escape_bits[p], 5)
            for v in part:
                bw.write_signed(int(v), escape_bits[p])
        else:
            k = ks[p] if ks else 4
            bw.write(k, 4)
            _rice(bw, part, k)


def subframe_constant(bw: BitWriter, value: int, bps: int):
    bw.write(0, 1); bw.write(0, 6); bw.write(0, 1)
    bw.write_signed(value, bps)


def subframe_verbatim(bw: BitWriter, samples, bps: int, wasted: int = 0):
    bw.write(0, 1); bw.write(1, 6)
    if wasted:
        bw.write(1, 1); bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)
    for s in samples:
        bw.write_signed(int(s) >> wasted, bps - wasted)


def subframe_fixed(bw: BitWriter, samples, order: int, bps: int, po: int = 0, k: int = 4):
    bw.write(0, 1); bw.write(8 + order, 6); bw.write(0, 1)
    s = np.asarray(samples, np.int64)
    for v in s[:order]:
        bw.write_signed(int(v), bps)
    d = s.copy()
    for _ in range(order):
        d = np.diff(d)
    res = d if order == 0 else d
    if order == 0:
        res = s
    write_residuals(bw, res, order, len(s), po, ks=[k] * (1 << po))


def subframe_lpc(bw: BitWriter, samples, coeffs, shift: int, bps: int,
                 prec: int = 12, k: int = 6):
    order = len(coeffs)
    bw.write(0, 1); bw.write(32 + order - 1, 6); bw.write(0, 1)
    s = np.asarray(samples, np.int64)
    for v in s[:order]:
        bw.write_signed(int(v), bps)
    bw.write(prec - 1, 4)
    bw.write_signed(shift, 5)
    for c in coeffs:
        bw.write_signed(int(c), prec)
    res = np.empty(len(s) - order, np.int64)
    for i in range(order, len(s)):
        pred = sum(int(coeffs[j]) * int(s[i - 1 - j]) for j in range(order)) >> shift
        res[i - order] = int(s[i]) - pred
    write_residuals(bw, res, order, len(s), 0, ks=[k])


def frame_header(bw: BitWriter, blocksize: int, frame_idx: int, ch_code: int,
                 ss_code: int = 4, sr_code: int = 0):
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)  # reserved
    bw.write(0, 1)  # fixed blocking
    bw.write(6, 4)  # blocksize: 8-bit at end
    bw.write(sr_code, 4)
    bw.write(ch_code, 4)
    bw.write(ss_code, 3)
    bw.write(0, 1)
    assert frame_idx < 0x80
    bw.write(frame_idx, 8)  # coded number, single byte
    bw.write(blocksize - 1, 8)
    bw.write(0, 8)  # CRC-8 (unverified)


def end_frame(bw: BitWriter):
    bw.align()
    bw.write(0, 16)  # CRC-16 (unverified)


def flac_file(frames_bits: BitWriter, sample_rate: int, channels: int, bps: int,
              total: int, tags: dict | None = None) -> bytes:
    si = bytearray(34)
    struct.pack_into(">HH", si, 0, 16, 65535)
    packed = (sample_rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | total
    si[10:18] = packed.to_bytes(8, "big")
    blocks = []
    if tags:
        body = bytearray()
        vendor = b"flo-test"
        body += struct.pack("<I", len(vendor)) + vendor
        items = [f"{k}={v}".encode() for k, v in tags.items()]
        body += struct.pack("<I", len(items))
        for it in items:
            body += struct.pack("<I", len(it)) + it
        blocks.append((4, bytes(body)))
    out = bytearray(b"fLaC")
    out += bytes([0x00]) + len(si).to_bytes(3, "big") + si
    for i, (t, b) in enumerate(blocks):
        hdr = t | (0x80 if i == len(blocks) - 1 else 0)
        out += bytes([hdr]) + len(b).to_bytes(3, "big") + b
    if not blocks:
        out[4] |= 0x80  # STREAMINFO is last
    out += frames_bits.tobytes()
    return bytes(out)
