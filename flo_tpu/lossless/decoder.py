"""Lossless decoder: container -> device Rice unpack -> batched device scan.

Pipeline (mirrors the behavior of lossless/decoder.rs:21-273, redesigned
batch-first):

1. Classify every (frame, channel) into a *lane* with uniform parameters
   (packed residual blob, Rice k, 12 coefficient taps, shift, warm-up order,
   fixed flag) so a single universal program handles LPC/fixed/raw/silence.
2. The bulk path uploads the container's PACKED residual blobs verbatim
   (entropy-coded size — the wire is the bottleneck, not compute) and
   entropy-decodes them ON DEVICE (ops/riceunpack: Rice lanes via a
   leading-ones scan, raw-PCM lanes as fixed-width LE16 codes).
3. One jitted lax.scan over [lanes, samples] reconstructs everything at
   once; mid/side undo, f32 conversion, and the entropy-packed PCM DOWNLOAD
   transport (ops/wirecodec) are fused into the same jit.
4. Host trims per-frame tails and interleaves. Lanes the device unpacker
   cannot decode (Rice quotient > 47, or a truncated blob that must
   zero-fill like the reference BitReader) are flagged and re-decoded
   exactly on the host (rare: corrupt or adversarial streams only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..container import reader
from ..core import rice_host
from ..futures import BulkFuture
from ..ops import ricepack, riceunpack, wirecodec
from ..core.constants import (
    FIXED_PREDICTOR_MARKER,
    FrameType,
    ResidualEncoding,
)
from ..core.types import FloFile
from ..ops import lpc
from ..ops.intmath import div2_trunc


def _marshal_lanes(flo: FloFile):
    """Build per-lane arrays from a parsed file.

    Returns (residual_rows [L,S], coeffs [L,12], shifts [L], orders [L],
    is_fixed [L], mid_side [F] bool, S, frame_lengths [F]).
    Lane order is frame-major, channel-minor.
    """
    channels = flo.header.channels
    frames = [f for f in flo.frames if not FrameType.from_byte(f.frame_type).is_transform]
    F = len(frames)
    if F == 0:
        return None
    S = max(f.frame_samples for f in frames)
    L = F * channels

    rows = np.zeros((L, S), dtype=np.int32)
    coeffs = np.zeros((L, lpc.MAX_ORDER), dtype=np.int32)
    shifts = np.zeros(L, dtype=np.int32)
    orders = np.zeros(L, dtype=np.int32)
    is_fixed = np.zeros(L, dtype=bool)
    mid_side = np.zeros(F, dtype=bool)
    frame_lengths = np.zeros(F, dtype=np.int64)

    # Defer rice decodes so they run as one vectorized batch.
    rice_jobs = []  # (lane, blob, k, n)

    for fi, frame in enumerate(frames):
        n = frame.frame_samples
        frame_lengths[fi] = n
        mid_side[fi] = channels == 2 and bool(frame.flags & 0x01)
        for ci in range(channels):
            lane = fi * channels + ci
            ch = frame.channels[ci] if ci < len(frame.channels) else None
            if ch is None:
                continue
            has_coeffs = len(ch.predictor_coeffs) > 0
            has_residuals = len(ch.residuals) > 0
            # Classification order mirrors decoder.rs:92-148.
            if not has_coeffs and has_residuals and ch.shift_bits >= FIXED_PREDICTOR_MARKER:
                order = ch.shift_bits - FIXED_PREDICTOR_MARKER
                rice_jobs.append((lane, ch.residuals, ch.rice_parameter, n))
                if order <= 4:
                    is_fixed[lane] = True
                    orders[lane] = order
                    coeffs[lane, :] = lpc._FIXED_COEFFS[order]
                # order > 4: unknown fixed order -> samples = residuals verbatim
                # (decoder.rs:261-264): zero coeffs, order 0 already set.
            elif has_coeffs:
                order = len(ch.predictor_coeffs)
                rice_jobs.append((lane, ch.residuals, ch.rice_parameter, n))
                coeffs[lane, :order] = np.asarray(ch.predictor_coeffs, dtype=np.int64).astype(
                    np.int32
                )
                shifts[lane] = min(int(ch.shift_bits), 15)
                orders[lane] = order
            elif has_residuals:
                # Raw i16 PCM (decoder.rs:132-144); whole i16 pairs only.
                raw = np.frombuffer(
                    ch.residuals[: (len(ch.residuals) // 2) * 2], dtype="<i2"
                ).astype(np.int32)
                m = min(len(raw), n)
                rows[lane, :m] = raw[:m]
            # else: silence -> zeros already.

    if rice_jobs:
        job_lanes = np.array([j[0] for j in rice_jobs])
        job_ks = np.array([j[2] for j in rice_jobs], dtype=np.int32)
        job_ns = np.array([j[3] for j in rice_jobs], dtype=np.int64)
        decoded = rice_host.decode_batch(
            [j[1] for j in rice_jobs], job_ks, job_ns, S
        )
        rows[job_lanes] = decoded

    return rows, coeffs, shifts, orders, is_fixed, mid_side, S, frame_lengths


@partial(jax.jit, static_argnames=("channels",))
def _device_decode(rows, coeffs, shifts, orders, is_fixed, mid_side, channels: int):
    """Reconstruct + mid/side undo + f32 conversion, fully on device.

    rows: [F*C, S] -> returns [F, S, C] float32 (interleave-ready).
    """
    samples = lpc.reconstruct(rows, coeffs, shifts, orders, is_fixed)
    S = samples.shape[1]
    fcs = samples.reshape(-1, channels, S)
    if channels == 2:
        m, s = fcs[:, 0], fcs[:, 1]
        left = div2_trunc(m + s)
        right = div2_trunc(m - s)
        ms = mid_side[:, None]
        fcs = jnp.stack(
            [jnp.where(ms, left, m), jnp.where(ms, right, s)], axis=1
        )
    f32 = fcs.astype(jnp.float32) * jnp.float32(1.0 / 32767.0)
    return jnp.transpose(f32, (0, 2, 1))


def _marshal_blobs(flo: FloFile):
    """Per-lane tables for the packed-upload decode path: the container's
    residual blobs verbatim plus the decode parameters.

    Returns (blobs list[bytes], k [L], codes_n [L] — entropy codes the device
    must read, is_raw [L], coeffs [L,12], shifts [L], orders [L],
    is_fixed [L], mid_side [F], S, frame_lengths [F]); None if no lossless
    frames. Lane order is frame-major, channel-minor.
    """
    channels = flo.header.channels
    frames = [f for f in flo.frames if not FrameType.from_byte(f.frame_type).is_transform]
    F = len(frames)
    if F == 0:
        return None
    S = max(f.frame_samples for f in frames)
    L = F * channels

    blobs: list[bytes] = [b""] * L
    k = np.zeros(L, np.int32)
    codes_n = np.zeros(L, np.int32)
    is_raw = np.zeros(L, bool)
    coeffs = np.zeros((L, lpc.MAX_ORDER), dtype=np.int32)
    shifts = np.zeros(L, dtype=np.int32)
    orders = np.zeros(L, dtype=np.int32)
    is_fixed = np.zeros(L, dtype=bool)
    mid_side = np.zeros(F, dtype=bool)
    frame_lengths = np.zeros(F, dtype=np.int64)

    for fi, frame in enumerate(frames):
        n = frame.frame_samples
        frame_lengths[fi] = n
        mid_side[fi] = channels == 2 and bool(frame.flags & 0x01)
        for ci in range(channels):
            lane = fi * channels + ci
            ch = frame.channels[ci] if ci < len(frame.channels) else None
            if ch is None:
                continue
            has_coeffs = len(ch.predictor_coeffs) > 0
            has_residuals = len(ch.residuals) > 0
            # Classification order mirrors decoder.rs:92-148.
            if not has_coeffs and has_residuals and ch.shift_bits >= FIXED_PREDICTOR_MARKER:
                order = ch.shift_bits - FIXED_PREDICTOR_MARKER
                blobs[lane] = ch.residuals
                k[lane] = ch.rice_parameter
                codes_n[lane] = n
                if order <= 4:
                    is_fixed[lane] = True
                    orders[lane] = order
                    coeffs[lane, :] = lpc._FIXED_COEFFS[order]
                # order > 4: unknown fixed order -> samples = residuals
                # verbatim (decoder.rs:261-264): zero coeffs, order 0.
            elif has_coeffs:
                order = len(ch.predictor_coeffs)
                blobs[lane] = ch.residuals
                k[lane] = ch.rice_parameter
                codes_n[lane] = n
                coeffs[lane, :order] = np.asarray(
                    ch.predictor_coeffs, dtype=np.int64
                ).astype(np.int32)
                shifts[lane] = min(int(ch.shift_bits), 15)
                orders[lane] = order
            elif has_residuals:
                # Raw i16 PCM (decoder.rs:132-144); whole i16 pairs only.
                # codes_n counts the pairs actually present (short payloads
                # leave the tail zero, matching the reference).
                blobs[lane] = ch.residuals[: (len(ch.residuals) // 2) * 2]
                is_raw[lane] = True
                codes_n[lane] = min(len(blobs[lane]) // 2, n)
            # else: silence -> zeros already.

    return (blobs, k, codes_n, is_raw, coeffs, shifts, orders, is_fixed,
            mid_side, S, frame_lengths)


def _bucket_bytes(n: int, floor: int = 1 << 20) -> int:
    """Upload-buffer bucket: {1, 1.5} x 2^k growth bounds both the zero
    padding (<= 33%) and the number of distinct compiled shapes."""
    b = floor
    while b < n:
        b <<= 1
    return b * 3 // 4 if (b * 3 // 4 >= n and b * 3 // 4 >= floor) else b


def decode_file(flo: FloFile) -> np.ndarray:
    """Decode a parsed lossless file to interleaved float32 samples."""
    return decode_many([flo])[0]


def decode(data: bytes) -> np.ndarray:
    """Decode flo bytes to interleaved float32 samples (lossless path)."""
    return decode_file(reader.read(data))


@partial(jax.jit, static_argnames=("channels", "S"))
def _decode_blobs_packed(buf, bit_start, k, codes_n, is_raw, coeffs, shifts,
                         orders, is_fixed, mid_side, lane_nvalid,
                         channels: int, S: int):
    """Fully-packed decode step: the container's entropy-coded residual
    blobs in (ops/riceunpack — Rice + raw-LE16 lanes in one buffer),
    ENTROPY-PACKED true-L/R samples out (ops/wirecodec — the decoded PCM is
    the pipeline's largest download). Both wire directions carry
    compressed-size payloads. Returns the download transport plus the
    device-resident i32 PCM lanes (overflow refetch) and the unpacker's
    (end_bit, bad) lane flags for the host's exact-fallback check."""
    rows, end_bit, bad = riceunpack.unpack_lanes(
        buf, bit_start, k, codes_n, S, is_raw
    )
    samples = lpc.reconstruct(rows, coeffs, shifts, orders, is_fixed)
    fcs = samples.reshape(-1, channels, S)
    if channels == 2:
        m, s = fcs[:, 0], fcs[:, 1]
        left = div2_trunc(m + s)
        right = div2_trunc(m - s)
        ms = mid_side[:, None]
        fcs = jnp.stack([jnp.where(ms, left, m), jnp.where(ms, right, s)], axis=1)
    lanes = fcs.reshape(-1, S)
    packed, lane_bytes, lane_off, mode, wk, overflow = wirecodec.pack_pcm(
        lanes, lane_nvalid
    )
    return packed, lane_bytes, lane_off, mode, wk, overflow, lanes, end_bit, bad


def decode_many_async(flos: list[FloFile]) -> BulkFuture:
    """Bulk decode: every file's lanes in one reconstruction scan per channel
    count. Both wire directions are entropy-coded: the container's packed
    residual blobs upload verbatim and decode on device (ops/riceunpack),
    the reconstructed PCM downloads entropy-packed (ops/wirecodec). All
    device work is dispatched before this returns."""
    from ..core.convert import i32_to_f32_np
    from ..ops.select import gather_rows

    marshaled = [(_marshal_blobs(f), f.header.channels) for f in flos]
    outs: list[np.ndarray] = [np.zeros(0, dtype=np.float32)] * len(flos)
    by_channels: dict[int, list] = {}
    for i, (m, c) in enumerate(marshaled):
        if m is not None:
            by_channels.setdefault(c, []).append((i, m))

    collectors = []
    for channels, group in by_channels.items():
        S_max = max(m[9] for _, m in group)
        L_tot = sum(len(m[0]) for _, m in group)
        blobs: list[bytes] = []
        k = np.zeros(L_tot, np.int32)
        codes_n = np.zeros(L_tot, np.int32)
        is_raw = np.zeros(L_tot, bool)
        coeffs = np.zeros((L_tot, lpc.MAX_ORDER), np.int32)
        shifts = np.zeros(L_tot, np.int32)
        orders = np.zeros(L_tot, np.int32)
        is_fixed = np.zeros(L_tot, bool)
        mid_side_all = []
        off = 0
        for _, m in group:
            ln = len(m[0])
            blobs.extend(m[0])
            k[off : off + ln] = m[1]
            codes_n[off : off + ln] = m[2]
            is_raw[off : off + ln] = m[3]
            coeffs[off : off + ln] = m[4]
            shifts[off : off + ln] = m[5]
            orders[off : off + ln] = m[6]
            is_fixed[off : off + ln] = m[7]
            mid_side_all.append(m[8])
            off += ln
        mid_side = np.concatenate(mid_side_all)
        frame_lengths_all = np.concatenate([m[10] for _, m in group]).astype(np.int32)
        lane_nvalid = np.repeat(frame_lengths_all, channels)

        # Double-buffer over two frame sub-batches: chunk B's upload overlaps
        # chunk A's compute + download. More chunks when the packed payload
        # would exceed the per-call byte cap (keeps bit offsets in int32 and
        # bounds device buffers).
        F_tot = L_tot // channels
        n_chunks = 2 if F_tot >= 4 else 1
        total_bytes = sum(len(b) for b in blobs)
        n_chunks = max(n_chunks, -(-total_bytes // (192 << 20)))
        f_half = -(-F_tot // n_chunks)

        def dispatch(flo_f, fhi_f):
            lo, hi = flo_f * channels, fhi_f * channels
            sub_blobs = blobs[lo:hi]
            sizes = np.fromiter((len(b) for b in sub_blobs), np.int64, hi - lo)
            offs = np.zeros(hi - lo, np.int64)
            np.cumsum(sizes[:-1], out=offs[1:])
            total = int(offs[-1] + sizes[-1]) if hi > lo else 0
            nb = _bucket_bytes(total + riceunpack.PAD_BYTES)
            buf = np.zeros(nb, np.uint8)
            if total:
                buf[:total] = np.frombuffer(b"".join(sub_blobs), np.uint8)
            handle = _decode_blobs_packed(
                jnp.asarray(buf), jnp.asarray((offs * 8).astype(np.int32)),
                jnp.asarray(k[lo:hi]), jnp.asarray(codes_n[lo:hi]),
                jnp.asarray(is_raw[lo:hi]),
                jnp.asarray(coeffs[lo:hi]), jnp.asarray(shifts[lo:hi]),
                jnp.asarray(orders[lo:hi]), jnp.asarray(is_fixed[lo:hi]),
                jnp.asarray(mid_side[flo_f:fhi_f]),
                jnp.asarray(lane_nvalid[lo:hi]), channels, S_max,
            )
            blob_end_bits = ((offs + sizes) * 8).astype(np.int64)
            return handle, lo, blob_end_bits

        handles = []
        for flo_f in range(0, F_tot, f_half):
            fhi_f = min(flo_f + f_half, F_tot)
            handles.append(dispatch(flo_f, fhi_f))

        # NB: every group-level name the deferred closures touch is bound via
        # default args — the loop rebinds them for the next channel group
        # before collect() runs.
        def patch_frames(part, bad_lanes, lo, channels, *, blobs=blobs, k=k,
                         codes_n=codes_n, is_raw=is_raw, coeffs=coeffs,
                         shifts=shifts, orders=orders, is_fixed=is_fixed,
                         mid_side=mid_side, lane_nvalid=lane_nvalid,
                         S_max=S_max):
            """Exact host re-decode of the frames owning flagged lanes
            (reference zero-fill / big-quotient semantics)."""
            frames_to_fix = np.unique(bad_lanes // channels)
            lanes_fix = (frames_to_fix[:, None] * channels
                         + np.arange(channels)[None, :]).reshape(-1)
            g = lanes_fix + lo  # global lane ids
            rows_fix = rice_host.decode_batch(
                [blobs[i] if not is_raw[i] else b"" for i in g],
                k[g], np.where(is_raw[g], 0, codes_n[g]), S_max,
            )
            for j, gi in enumerate(g):  # raw lanes: verbatim LE16
                if is_raw[gi] and codes_n[gi]:
                    rows_fix[j, : codes_n[gi]] = np.frombuffer(
                        blobs[gi], "<i2"
                    )[: codes_n[gi]].astype(np.int32)
            from .. import native

            if native.lpc_reconstruct_into(
                rows_fix, coeffs[g], shifts[g], orders[g], is_fixed[g],
                np.full(len(g), S_max, np.int64),
            ):
                rec = rows_fix
            else:
                rec = lpc.reconstruct_host(
                    rows_fix, coeffs[g], shifts[g], orders[g], is_fixed[g]
                )
            fcs = rec.reshape(-1, channels, S_max).astype(np.int64)
            if channels == 2:
                ms = mid_side[(g[::2] // channels)][:, None]
                m_, s_ = fcs[:, 0], fcs[:, 1]
                t = m_ + s_
                left = np.where(ms, t // 2 + ((t < 0) & (t % 2 != 0)), m_)
                t = m_ - s_
                right = np.where(ms, t // 2 + ((t < 0) & (t % 2 != 0)), s_)
                fcs = np.stack([left, right], axis=1)
            flat = fcs.reshape(-1, S_max).astype(np.int32)
            nv = lane_nvalid[g]
            msk = np.arange(S_max)[None, :] < nv[:, None]
            part[lanes_fix] = np.where(msk, flat, 0)

        def collect(handles=handles, group=group, channels=channels,
                    lane_nvalid=lane_nvalid, S_max=S_max,
                    patch_frames=patch_frames):
            chunks = []
            for (packed_d, lb_d, lo_d, mode_d, wk_d, ovf_d, lanes_dev,
                 endbit_d, bad_d), lo, blob_end_bits in handles:
                lb = np.asarray(lb_d).astype(np.int64)
                lof = np.asarray(lo_d).astype(np.int64)
                mode = np.asarray(mode_d)
                wk = np.asarray(wk_d)
                nsub = len(lb)
                nv = lane_nvalid[lo : lo + nsub]
                total = int(lof[-1] + lb[-1]) if nsub else 0
                packed = ricepack.fetch_prefix(packed_d, total)
                part = wirecodec.unpack_pcm(packed, lb, lof, mode, wk, nv, S_max)
                ovf = np.flatnonzero(np.asarray(ovf_d))
                if len(ovf):
                    padb = 1 << max(len(ovf) - 1, 0).bit_length()
                    idx_p = np.zeros(padb, np.int32)
                    idx_p[: len(ovf)] = ovf
                    part[ovf] = np.asarray(gather_rows(lanes_dev, jnp.asarray(idx_p)))[
                        : len(ovf)
                    ]
                # Host fallback for lanes the device unpacker can't decode
                # exactly: big quotients or blob overrun (zero-fill).
                bad_lanes = np.flatnonzero(
                    np.asarray(bad_d)
                    | (np.asarray(endbit_d).astype(np.int64) > blob_end_bits)
                )
                if len(bad_lanes):
                    patch_frames(part, bad_lanes, lo, channels)
                chunks.append(part.reshape(-1, channels, S_max))
            fcs_all = np.concatenate(chunks)  # [F_tot, C, S_max]

            foff = 0
            for i, m in group:
                n_frames = len(m[0]) // channels
                S, frame_lengths = m[9], m[10]
                fcs = fcs_all[foff : foff + n_frames, :, :S]
                foff += n_frames
                parts = [fcs[j, :, : frame_lengths[j]].T for j in range(n_frames)]
                ints = np.concatenate(parts, axis=0)
                outs[i] = i32_to_f32_np(ints).reshape(-1)

        collectors.append(collect)

    def fin():
        for collect in collectors:
            collect()
        return outs

    return BulkFuture(fin)


def decode_many(flos: list[FloFile]) -> list[np.ndarray]:
    """Blocking form of decode_many_async."""
    return decode_many_async(flos).result()


def _undo_midside_host(fcs: np.ndarray, mid_side: np.ndarray, channels: int) -> np.ndarray:
    """Mid/side -> L/R on [F, C, S] int32 frames (decoder.rs:75-89; Rust's
    truncating `/ 2`)."""
    if channels != 2:
        return fcs
    m, s = fcs[:, 0].astype(np.int64), fcs[:, 1].astype(np.int64)

    def trunc_div2(t):
        return t // 2 + ((t < 0) & (t % 2 != 0))

    left = np.where(mid_side[:, None], trunc_div2(m + s), m)
    right = np.where(mid_side[:, None], trunc_div2(m - s), s)
    return np.stack([left.astype(np.int32), right.astype(np.int32)], axis=1)


def decode_file_i32(flo: FloFile) -> np.ndarray:
    """Integer-domain decode: [total_samples, channels] int32 (pre mid/side
    conversion applied, i.e. true L/R). Used by bit-exactness tests."""
    channels = flo.header.channels
    marshaled = _marshal_lanes(flo)
    if marshaled is None:
        return np.zeros((0, channels), dtype=np.int32)
    rows, coeffs, shifts, orders, is_fixed, mid_side, S, frame_lengths = marshaled
    samples = np.asarray(lpc.reconstruct(rows, coeffs, shifts, orders, is_fixed))
    fcs = _undo_midside_host(samples.reshape(-1, channels, S), mid_side, channels)
    parts = [fcs[i, :, : frame_lengths[i]].T for i in range(fcs.shape[0])]
    return np.concatenate(parts, axis=0)


def decode_file_host(flo: FloFile) -> np.ndarray:
    """Single-file decode with NO device round trip -> interleaved f32.

    The bulk pipelines amortize the device link's latency over thousands of
    lanes; a per-frame streaming next_frame() or a seek's decode_frame_at
    cannot, so those paths run entirely on the host: C++ batch Rice unpack
    plus C++ LPC reconstruction (native/rice.cpp lpc_reconstruct_batch, the
    native analog of decoder.rs:92-273's serial loops). Falls back to the
    jitted device path when the native toolchain is unavailable.
    """
    from .. import native
    from ..core.convert import i32_to_f32_np

    channels = flo.header.channels
    marshaled = _marshal_lanes(flo)
    if marshaled is None:
        return np.zeros(0, dtype=np.float32)
    rows, coeffs, shifts, orders, is_fixed, mid_side, S, frame_lengths = marshaled
    if not native.lpc_reconstruct_into(
        rows, coeffs, shifts, orders, is_fixed, np.repeat(frame_lengths, channels)
    ):
        return decode_file(flo)
    fcs = _undo_midside_host(rows.reshape(-1, channels, S), mid_side, channels)
    parts = [fcs[i, :, : frame_lengths[i]].T for i in range(fcs.shape[0])]
    ints = np.concatenate(parts, axis=0)
    return i32_to_f32_np(ints).reshape(-1)
