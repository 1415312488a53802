"""Lossless decoder: container -> host Rice unpack -> batched device scan.

Pipeline (mirrors the behavior of lossless/decoder.rs:21-273, redesigned
batch-first):

1. Classify every (frame, channel) into a *lane* with uniform parameters
   (residual row, 12 coefficient taps, shift, warm-up order, fixed flag) so a
   single universal reconstruction kernel handles LPC/fixed/raw/silence.
2. Rice-unpack all lanes on the host (vectorized, one pass).
3. One jitted lax.scan over [lanes, samples] reconstructs everything at once;
   mid/side undo and i32->f32 conversion are fused into the same jit.
4. Host trims per-frame tails and interleaves.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..container import reader
from ..core import rice_host
from ..futures import BulkFuture
from ..ops import ricepack, wirecodec
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


def decode_file(flo: FloFile) -> np.ndarray:
    """Decode a parsed lossless file to interleaved float32 samples."""
    return decode_many([flo])[0]


def decode(data: bytes) -> np.ndarray:
    """Decode flo bytes to interleaved float32 samples (lossless path)."""
    return decode_file(reader.read(data))


@partial(jax.jit, static_argnames=("channels",))
def _decode_lanes_packed(rows16, mis_rows, mis_idx, coeffs, shifts, orders, is_fixed,
                         mid_side, lane_nvalid, channels: int):
    """Transport-optimized decode step: i16 residual rows in (plus a sparse
    i32 misfit scatter), ENTROPY-PACKED true-L/R samples out (ops/wirecodec —
    the decoded PCM is the pipeline's largest download and the axon link is
    ~13x slower down than up). Returns the packed transport plus the
    device-resident i32 lane tensor for the rare overflow-lane refetch."""
    rows = rows16.astype(jnp.int32).at[mis_idx].set(mis_rows, mode="drop")
    samples = lpc.reconstruct(rows, coeffs, shifts, orders, is_fixed)
    S = samples.shape[1]
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
    return packed, lane_bytes, lane_off, mode, wk, overflow, lanes


def decode_many_async(flos: list[FloFile]) -> BulkFuture:
    """Bulk decode: every file's lanes in one reconstruction scan per channel
    count; i16 residual upload, entropy-packed PCM download (see
    _decode_lanes_packed). All device work is dispatched before this
    returns."""
    from ..core.convert import i32_to_f32_np
    from ..ops.select import gather_rows

    marshaled = [(_marshal_lanes(f), f.header.channels) for f in flos]
    outs: list[np.ndarray] = [np.zeros(0, dtype=np.float32)] * len(flos)
    by_channels: dict[int, list] = {}
    for i, (m, c) in enumerate(marshaled):
        if m is not None:
            by_channels.setdefault(c, []).append((i, m))

    collectors = []
    for channels, group in by_channels.items():
        S_max = max(m[6] for _, m in group)
        L_tot = sum(m[0].shape[0] for _, m in group)
        rows = np.zeros((L_tot, S_max), dtype=np.int32)
        coeffs = np.zeros((L_tot, lpc.MAX_ORDER), np.int32)
        shifts = np.zeros(L_tot, np.int32)
        orders = np.zeros(L_tot, np.int32)
        is_fixed = np.zeros(L_tot, bool)
        mid_side_all = []
        off = 0
        for _, m in group:
            r = m[0]
            rows[off : off + r.shape[0], : r.shape[1]] = r
            coeffs[off : off + r.shape[0]] = m[1]
            shifts[off : off + r.shape[0]] = m[2]
            orders[off : off + r.shape[0]] = m[3]
            is_fixed[off : off + r.shape[0]] = m[4]
            mid_side_all.append(m[5])
            off += r.shape[0]
        mid_side = np.concatenate(mid_side_all)
        frame_lengths_all = np.concatenate([m[7] for _, m in group]).astype(np.int32)
        lane_nvalid = np.repeat(frame_lengths_all, channels)

        # Double-buffer over two frame sub-batches; per chunk: i16 upload +
        # sparse i32 misfit scatter (power-of-two padded); entropy-packed
        # PCM download (ops/wirecodec).
        F_tot = L_tot // channels
        f_half = F_tot // 2 if F_tot >= 4 else F_tot

        def dispatch(flo_f, fhi_f):
            lo, hi = flo_f * channels, fhi_f * channels
            sub = rows[lo:hi]
            rows16 = sub.astype(np.int16)
            mis = np.flatnonzero((sub > 32767).any(axis=1) | (sub < -32768).any(axis=1))
            pad = 1 << max(len(mis) - 1, 0).bit_length()
            # Padding uses an out-of-bounds index: mode="drop" discards it
            # (negative indices would WRAP and corrupt the last row).
            mis_idx = np.full(pad, hi - lo, np.int32)
            mis_idx[: len(mis)] = mis
            mis_rows = np.zeros((pad, S_max), np.int32)
            mis_rows[: len(mis)] = sub[mis]
            return _decode_lanes_packed(
                jnp.asarray(rows16), jnp.asarray(mis_rows), jnp.asarray(mis_idx),
                jnp.asarray(coeffs[lo:hi]), jnp.asarray(shifts[lo:hi]),
                jnp.asarray(orders[lo:hi]), jnp.asarray(is_fixed[lo:hi]),
                jnp.asarray(mid_side[flo_f:fhi_f]),
                jnp.asarray(lane_nvalid[lo:hi]), channels,
            )

        handles = []
        for flo_f in range(0, F_tot, f_half):
            fhi_f = min(flo_f + f_half, F_tot)
            handles.append(dispatch(flo_f, fhi_f))

        def collect(handles=handles, group=group, channels=channels):
            chunks = []
            off_l = 0
            for packed_d, lb_d, lo_d, mode_d, wk_d, ovf_d, lanes_dev in handles:
                lb = np.asarray(lb_d).astype(np.int64)
                lof = np.asarray(lo_d).astype(np.int64)
                mode = np.asarray(mode_d)
                wk = np.asarray(wk_d)
                nsub = len(lb)
                nv = lane_nvalid[off_l : off_l + nsub]
                off_l += nsub
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
                chunks.append(part.reshape(-1, channels, S_max))
            fcs_all = np.concatenate(chunks)  # [F_tot, C, S_max]

            foff = 0
            for i, m in group:
                n_frames = m[0].shape[0] // channels
                S, frame_lengths = m[6], m[7]
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


def decode_file_i32(flo: FloFile) -> np.ndarray:
    """Integer-domain decode: [total_samples, channels] int32 (pre mid/side
    conversion applied, i.e. true L/R). Used by bit-exactness tests."""
    channels = flo.header.channels
    marshaled = _marshal_lanes(flo)
    if marshaled is None:
        return np.zeros((0, channels), dtype=np.int32)
    rows, coeffs, shifts, orders, is_fixed, mid_side, S, frame_lengths = marshaled
    samples = np.asarray(lpc.reconstruct(rows, coeffs, shifts, orders, is_fixed))
    fcs = samples.reshape(-1, channels, S)
    if channels == 2:
        m, s = fcs[:, 0].astype(np.int64), fcs[:, 1].astype(np.int64)

        def trunc_div2(t):
            return t // 2 + ((t < 0) & (t % 2 != 0))

        left = np.where(mid_side[:, None], trunc_div2(m + s), m)
        right = np.where(mid_side[:, None], trunc_div2(m - s), s)
        fcs = np.stack([left.astype(np.int32), right.astype(np.int32)], axis=1)
    parts = [fcs[i, :, : frame_lengths[i]].T for i in range(fcs.shape[0])]
    return np.concatenate(parts, axis=0)
