"""Lossless encoder: batched best-of-N predictor search, device-first.

Behavioral model: libflo/src/lossless/encoder.rs:32-302. Redesigned for TPU:
instead of the reference's per-channel serial loop that tries ~14 candidate
encodings one at a time, every (frame, channel) lane evaluates *all*
candidates in one jitted pass:

1. Host marshals interleaved f32 into [lanes, S] int32 (silence detection,
   f32->i32, deinterleave, exact i64 mid/side decision, encoder.rs:66-170).
2. Host computes exact integer autocorrelation (i64 einsum == autocorr_int,
   lpc.rs:213-221) and the float64 Levinson recursion for every LPC order in
   one vectorized sweep (ops/lpc.py).
3. Device (jit): for each candidate (raw / fixed 0-4 / LPC 5..max) compute
   exact int32-limb residuals and *aggregates only*: max|r|, Σmin(|r|,2^22)
   as two split-limb int32 sums, and the capped Rice quotient sum for all 16
   k values. No residual stream is materialized per candidate.
4. Host: exact Rice parameter estimation (rice.rs:29-69) + encoded byte size
   from the aggregates, argmin with the reference's evaluation order and
   strict-< tie-break (raw, fixed 0..4, LPC 5..max; encoder.rs:173-217),
   instability rejection max|r| > 1e6 (encoder.rs:269-271).
5. Device: materialize only the winning residual stream per lane.
6. Host: vectorized Rice bit-packing (core/rice_host.py) + container writer.

Exactness notes:
* Valid candidates have |r| <= 16*65535 < 2^22 (fixed, mid/side domain) or
  <= 1e6 (accepted LPC), so the clamped Σ|r| and all limb sums are exact for
  every candidate that can win; rejected-LPC aggregates may saturate, which
  only affects candidates that are discarded anyway.
* The split Σ|r| sums (11-bit limbs) are exact for S < 2^20 samples/frame,
  i.e. sample rates up to 1 MHz (frames are 1 s, encoder.rs:33).

Deliberate deviation from the reference (bug, not behavior): encoder.rs:104-119
types a frame Raw when every channel's best *order* is 0 — which includes
fixed-predictor-0 winners whose payload is Rice bytes, and Raw serialization
(writer.rs:266-268) then drops the Rice framing so the decoder misreads the
stream as i16 PCM (this is visibly corrupt in the reference's own
Examples/white_noise.flo). We type a frame Raw only when every channel chose
the raw-PCM strategy; fixed-0 winners keep the ALPC layout, which the
reference decoder handles correctly (decoder.rs:92-148).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..container import writer
from ..core import rice_host
from ..core.constants import (
    FIXED_PREDICTOR_MARKER,
    FRAME_FLAG_MID_SIDE,
    FrameType,
    LPC_ORDER_BY_LEVEL,
    MIN_LEVEL_FOR_LPC,
    ResidualEncoding,
    SILENCE_THRESHOLD,
)
from ..core.convert import f32_to_i32_np
from ..core.types import ChannelData, Frame
from ..ops import lpc
from ..ops.intmath import predict_shift, predict_shift_taps

_SUM_SPLIT = 11  # Σ|r| limb split; exact for S < 2^(31-11) samples per frame
_ABS_CLAMP = 1 << 22  # above any valid candidate's |r|


def _candidate_plan(compression_level: int):
    """Candidate list in the reference's evaluation order (encoder.rs:183-214).

    Returns (kinds, orders): kind 'raw' | 'fixed' | 'lpc'.
    """
    max_order = LPC_ORDER_BY_LEVEL[min(compression_level, 9)]
    kinds = ["raw"]
    orders = [0]
    for o in range(0, min(4, max_order) + 1):
        kinds.append("fixed")
        orders.append(o)
    if compression_level >= MIN_LEVEL_FOR_LPC and max_order > 4:
        for o in range(5, max_order + 1):
            kinds.append("lpc")
            orders.append(o)
    return kinds, orders, max_order


def _residuals_one(lanes, nvalid, coeffs, shifts, orders, is_fixed):
    """Masked residuals [L, S] for one candidate per lane.

    Main region uses the stored coefficients; the <=12-sample warm-up prefix is
    fixed up separately: LPC emits samples verbatim (lpc.rs:283-285), fixed
    predictors ramp through orders 0..min(i,4) (lpc.rs:301-359).
    """
    L, S = lanes.shape
    pred = predict_shift_taps(lanes, coeffs, shifts[:, None])
    r = lanes - pred

    P = min(lpc.MAX_ORDER, S)
    prefix = lanes[:, :P]
    lag_pref = jnp.stack(
        [jnp.pad(prefix, ((0, 0), (j + 1, 0)))[:, :P] for j in range(lpc.MAX_ORDER)],
        axis=-1,
    )  # [L, P, 12]
    fixed_table = jnp.asarray(lpc._FIXED_COEFFS)
    i_idx = jnp.arange(P, dtype=jnp.int32)
    ramp_rows = fixed_table[jnp.minimum(i_idx, 4)]  # [P, 12]
    pred_ramp = predict_shift(ramp_rows[None, :, :], lag_pref, jnp.int32(0))
    in_warmup = i_idx[None, :] < orders[:, None]
    r_pref = jnp.where(
        in_warmup,
        jnp.where(is_fixed[:, None], prefix - pred_ramp, prefix),
        r[:, :P],
    )
    r = jnp.concatenate([r_pref, r[:, P:]], axis=1)
    valid = jnp.arange(S, dtype=jnp.int32)[None, :] < nvalid[:, None]
    return jnp.where(valid, r, 0)


def _zigzag_u32(r):
    z = (r << 1) ^ (r >> 31)
    return jax.lax.bitcast_convert_type(z, jnp.uint32)


def _aggregate_one(r):
    """Selection aggregates for one candidate's masked residuals.

    Returns (max_abs [L] i32 wrapping like Rust release `.abs()`,
    sum_hi/sum_lo [L] i32 split limbs of Σ min(|r|, 2^22),
    qsum [L, 16] i32 = Σ min(zigzag(r) >> k, 255) for k = 0..15).
    """
    a_wrap = jnp.abs(r)  # int32, wraps at i32::MIN exactly like Rust release
    max_abs = jnp.max(a_wrap, axis=1)
    a = jnp.minimum(a_wrap, _ABS_CLAMP)
    a = jnp.where(a < 0, _ABS_CLAMP, a)  # wrapped i32::MIN counts as huge
    sum_hi = jnp.sum(a >> _SUM_SPLIT, axis=1, dtype=jnp.int32)
    sum_lo = jnp.sum(a & ((1 << _SUM_SPLIT) - 1), axis=1, dtype=jnp.int32)
    u = _zigzag_u32(r)
    qcols = [
        jnp.sum(
            jnp.minimum(u >> jnp.uint32(k), jnp.uint32(255)).astype(jnp.int32),
            axis=1,
            dtype=jnp.int32,
        )
        for k in range(16)
    ]
    return max_abs, sum_hi, sum_lo, jnp.stack(qcols, axis=1)


@jax.jit
def _aggregate_candidates(lanes, nvalid, coeffs_all, shifts_all, orders_all, fixed_all):
    """Aggregates for every candidate: inputs [L, NC, ...] -> outputs [L, NC, ...].

    NC is a static shape; the per-candidate loop unrolls into one fused graph.
    """
    NC = coeffs_all.shape[1]
    outs = []
    for c in range(NC):
        r = _residuals_one(
            lanes,
            nvalid,
            coeffs_all[:, c],
            shifts_all[:, c],
            orders_all[:, c],
            fixed_all[:, c],
        )
        outs.append(_aggregate_one(r))
    max_abs = jnp.stack([o[0] for o in outs], axis=1)
    sum_hi = jnp.stack([o[1] for o in outs], axis=1)
    sum_lo = jnp.stack([o[2] for o in outs], axis=1)
    qsum = jnp.stack([o[3] for o in outs], axis=1)
    return max_abs, sum_hi, sum_lo, qsum


_materialize_residuals = jax.jit(_residuals_one)


def _autocorr_int_exact(lanes: np.ndarray, nvalid: np.ndarray, max_order: int) -> np.ndarray:
    """Exact integer autocorrelation lags 0..max_order (lpc.rs:213-221).

    i64 products/sums; zero padding beyond nvalid contributes nothing.
    """
    x = lanes.astype(np.int64)
    S = x.shape[1]
    mask = np.arange(S)[None, :] < nvalid[:, None]
    x = np.where(mask, x, 0)
    cols = [np.einsum("ls,ls->l", x, x)]
    for lag in range(1, max_order + 1):
        cols.append(np.einsum("ls,ls->l", x[:, lag:], x[:, : S - lag]))
    return np.stack(cols, axis=1)


def _estimate_k_and_size(max_abs, sum_hi, sum_lo, qsum, nvalid):
    """Vectorized exact mirror of rice k estimation + encoded byte size.

    All int64 numpy. Returns (k [L, NC], size_bytes [L, NC]).
    """
    max_abs = max_abs.astype(np.int64)
    # Wrapped i32::MIN shows up negative; its unsigned_abs is 2^31.
    max_u = np.where(max_abs < 0, np.int64(1) << 31, max_abs)
    total = sum_hi.astype(np.int64) * (1 << _SUM_SPLIT) + sum_lo.astype(np.int64)
    n = nvalid.astype(np.int64)[:, None]

    max_unsigned = 2 * max_u
    bits_mu = np.zeros_like(max_unsigned)
    nz = max_unsigned > 0
    bits_mu[nz] = np.floor(np.log2(max_unsigned[nz])).astype(np.int64) + 1
    min_k = np.where(max_unsigned > 255, np.maximum(bits_mu - 8, 0), 0)

    mean = total // np.maximum(n, 1)
    mean_bits = np.zeros_like(mean)
    mz = mean > 0
    mean_bits[mz] = np.floor(np.log2(mean[mz])).astype(np.int64) + 1

    k = np.clip(np.maximum(min_k, mean_bits), 0, 15)
    k = np.where(max_u == 0, 0, k)  # max_abs==0 -> k=0 (rice.rs:37-39)

    L, NC = k.shape
    qs = np.take_along_axis(qsum.astype(np.int64), k[:, :, None], axis=2)[:, :, 0]
    bits = qs + n * (1 + k)
    return k, (bits + 7) // 8


def encode_to_frames(
    samples: np.ndarray,
    sample_rate: int,
    channels: int,
    compression_level: int = 5,
) -> List[Frame]:
    """Encode interleaved f32 samples into a list of container frames."""
    samples = np.asarray(samples, dtype=np.float32).reshape(-1)
    C = int(channels)
    spf = int(sample_rate)
    if spf >= (1 << 20):
        raise ValueError("sample_rate too large for exact aggregation")
    total = len(samples) // C
    num_frames = -(-total // spf) if total else 0
    if num_frames == 0:
        return []

    kinds, cand_orders, max_order = _candidate_plan(compression_level)
    NC = len(kinds)

    padded = np.zeros(num_frames * spf * C, dtype=np.float32)
    padded[: total * C] = samples[: total * C]
    fsc = padded.reshape(num_frames, spf, C)

    frame_samples = np.full(num_frames, spf, dtype=np.int64)
    frame_samples[-1] = total - (num_frames - 1) * spf

    # Silence detection over valid samples only; zero padding is silent anyway.
    silent = (np.abs(fsc) < SILENCE_THRESHOLD).all(axis=(1, 2))

    active = np.flatnonzero(~silent)
    frames: List[Frame] = [None] * num_frames  # type: ignore[list-item]
    for fi in np.flatnonzero(silent):
        frames[fi] = Frame(
            frame_type=int(FrameType.SILENCE),
            frame_samples=int(frame_samples[fi]),
            channels=[ChannelData.silence() for _ in range(C)],
        )
    if len(active) == 0:
        return frames

    ints = f32_to_i32_np(fsc[active])  # [F', S, C]
    ch = np.moveaxis(ints, 2, 1).astype(np.int64)  # [F', C, S]
    Fa = len(active)
    nvalid_f = frame_samples[active]

    mid_side = np.zeros(Fa, dtype=bool)
    if C == 2:
        l, r = ch[:, 0], ch[:, 1]
        var_l = np.einsum("fs,fs->f", l, l)
        var_r = np.einsum("fs,fs->f", r, r)
        side = l - r
        var_side = np.einsum("fs,fs->f", side, side)
        mid_side = var_side < (var_l + var_r) // 2
        mid = l + r
        ch = np.where(mid_side[:, None, None], np.stack([mid, side], axis=1), ch)

    lanes = ch.reshape(Fa * C, spf).astype(np.int32)
    nvalid = np.repeat(nvalid_f, C).astype(np.int32)
    L = lanes.shape[0]

    # Per-lane candidate parameter tables.
    coeffs_all = np.zeros((L, NC, lpc.MAX_ORDER), dtype=np.int32)
    shifts_all = np.zeros((L, NC), dtype=np.int32)
    orders_all = np.zeros((L, NC), dtype=np.int32)
    fixed_all = np.zeros((L, NC), dtype=bool)
    cand_ok = np.ones((L, NC), dtype=bool)

    lpc_cols = [i for i, kd in enumerate(kinds) if kd == "lpc"]
    if lpc_cols:
        ac = _autocorr_int_exact(lanes, nvalid, max_order).astype(np.float64)
        lpc_c, lpc_s, lpc_valid = lpc.levinson_durbin_all_orders(ac, max_order)
    for ci, (kd, o) in enumerate(zip(kinds, cand_orders)):
        if kd == "raw":
            cand_ok[:, ci] = False  # raw handled analytically (size = 2n)
        elif kd == "fixed":
            coeffs_all[:, ci, :] = lpc._FIXED_COEFFS[o]
            orders_all[:, ci] = o
            fixed_all[:, ci] = True
        else:  # lpc order o
            coeffs_all[:, ci] = lpc_c[:, o - 1]
            shifts_all[:, ci] = lpc_s[:, o - 1]
            orders_all[:, ci] = o
            cand_ok[:, ci] = lpc_valid[:, o - 1] & (nvalid > o)

    max_abs, sum_hi, sum_lo, qsum = (
        np.asarray(a)
        for a in _aggregate_candidates(
            jnp.asarray(lanes),
            jnp.asarray(nvalid),
            jnp.asarray(coeffs_all),
            jnp.asarray(shifts_all),
            jnp.asarray(orders_all),
            jnp.asarray(fixed_all),
        )
    )

    ks, sizes = _estimate_k_and_size(max_abs, sum_hi, sum_lo, qsum, nvalid)

    # LPC instability rejection (encoder.rs:269-271): Rust release `.abs()`
    # wraps, so compare in the wrapped domain exactly.
    for ci, kd in enumerate(kinds):
        if kd == "lpc":
            cand_ok[:, ci] &= max_abs[:, ci].astype(np.int64) <= 1_000_000

    # Arg-best with the reference's evaluation order and strict-< tie-break.
    raw_size = 2 * nvalid.astype(np.int64)
    best_size = raw_size.copy()
    best_ci = np.zeros(L, dtype=np.int64)  # candidate 0 == raw
    for ci, kd in enumerate(kinds):
        if kd == "raw":
            continue
        ok = cand_ok[:, ci] if kd == "lpc" else np.ones(L, dtype=bool)
        better = ok & (sizes[:, ci] < best_size)
        best_size = np.where(better, sizes[:, ci], best_size)
        best_ci = np.where(better, ci, best_ci)

    # Materialize only the winners' residual streams.
    sel = best_ci
    win_coeffs = coeffs_all[np.arange(L), sel]
    win_shifts = shifts_all[np.arange(L), sel]
    win_orders = orders_all[np.arange(L), sel]
    win_fixed = fixed_all[np.arange(L), sel]
    residuals = np.asarray(
        _materialize_residuals(
            jnp.asarray(lanes),
            jnp.asarray(nvalid),
            jnp.asarray(win_coeffs),
            jnp.asarray(win_shifts),
            jnp.asarray(win_orders),
            jnp.asarray(win_fixed),
        )
    )

    is_rice = np.array([kinds[ci] != "raw" for ci in sel])
    rice_rows = np.flatnonzero(is_rice)
    blobs: dict[int, bytes] = {}
    if len(rice_rows):
        packed = rice_host.encode_batch(
            residuals[rice_rows],
            ks[rice_rows, sel[rice_rows]],
            nvalid[rice_rows],
        )
        blobs = dict(zip(rice_rows.tolist(), packed))

    for idx, fi in enumerate(active):
        n = int(frame_samples[fi])
        chans = []
        all_raw = True
        for c in range(C):
            lane = idx * C + c
            ci = int(sel[lane])
            kd = kinds[ci]
            if kd == "raw":
                raw_bytes = lanes[lane, :n].astype("<i2").tobytes()
                chans.append(ChannelData.raw(raw_bytes))
            else:
                all_raw = False
                k = int(ks[lane, ci])
                if kd == "fixed":
                    chans.append(
                        ChannelData(
                            predictor_coeffs=[],
                            shift_bits=FIXED_PREDICTOR_MARKER + cand_orders[ci],
                            residual_encoding=ResidualEncoding.RICE,
                            rice_parameter=k,
                            residuals=blobs[lane],
                        )
                    )
                else:
                    order = cand_orders[ci]
                    chans.append(
                        ChannelData(
                            predictor_coeffs=[int(v) for v in win_coeffs[lane][:order]],
                            shift_bits=int(win_shifts[lane]),
                            residual_encoding=ResidualEncoding.RICE,
                            rice_parameter=k,
                            residuals=blobs[lane],
                        )
                    )
        ftype = FrameType.RAW if all_raw else FrameType.from_order(max_order)
        frames[fi] = Frame(
            frame_type=int(ftype),
            frame_samples=n,
            flags=FRAME_FLAG_MID_SIDE if mid_side[idx] else 0,
            channels=chans,
        )
    return frames


def encode(
    samples: np.ndarray,
    sample_rate: int,
    channels: int,
    bit_depth: int = 16,
    compression_level: int = 5,
    metadata: bytes = b"",
) -> bytes:
    """Encode interleaved f32 samples to flo bytes (encoder.rs:32-45)."""
    level = min(int(compression_level), 9)
    frames = encode_to_frames(samples, sample_rate, channels, level)
    return writer.write(
        int(sample_rate), int(channels), int(bit_depth), level, frames, metadata
    )
