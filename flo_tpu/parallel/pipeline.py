"""Single-program batch encode step + mesh sharding helpers.

The conformance encoder (lossless/encoder.py) splits work between device
aggregates and exact host selection. For throughput and for multi-chip
scaling, this module provides the whole candidate search as ONE jitted
program — aggregates, Rice-k estimation, candidate sizing, argmin selection
(reference evaluation order, strict-< tie-break), and winner-residual
materialization — so it shards over a `jax.sharding.Mesh` batch axis with no
host round-trip per step.

Exactness: the on-device k estimation reproduces rice.rs:29-69 with pure
int32 arithmetic (bit-length via 24 comparisons; the exact integer mean via
two-step division of the split-limb sum). Selection can differ from the host
path only for candidates the reference rejects anyway (wrapped |i32::MIN|
pathologies); any selected candidate still round-trips bit-exactly because
residuals, coefficients, and k are all stored in the stream.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lossless.encoder import _SUM_SPLIT, _aggregate_candidates, _residuals_one

_MAX_RATE = 1 << 18  # exact-mean guarantee for the device path


def device_mesh(devices=None, n: int | None = None) -> Mesh:
    """1-D 'batch' mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.array(devices), ("batch",))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (lanes) across the mesh, replicate the rest."""
    return NamedSharding(mesh, P("batch", *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, *arrays):
    """device_put each array with its batch-axis sharding."""
    return tuple(jax.device_put(a, batch_sharding(mesh, np.ndim(a))) for a in arrays)


def _bit_length(x):
    """Exact integer bit length for x in [0, 2^24) (int32)."""
    x = x.astype(jnp.int32)
    bits = jnp.zeros_like(x)
    for k in range(24):
        bits = bits + (x >= (1 << k)).astype(jnp.int32)
    return bits


def _rice_k_device(max_abs, sum_hi, sum_lo, nvalid):
    """rice.rs:29-69 in int32 (see module docstring).

    max_abs: wrapped |r| (negative only for the |i32::MIN| pathology, which
    only valid-rejected candidates can produce).
    """
    n = jnp.maximum(nvalid, 1)
    max_u2 = 2 * jnp.clip(max_abs, 0, 1 << 22)
    min_k = jnp.where(max_u2 > 255, jnp.maximum(_bit_length(max_u2) - 8, 0), 0)

    # Exact mean of the split-limb sum: total = hi*2^s + lo, all int32-safe
    # for frames up to _MAX_RATE samples.
    q1 = sum_hi // n
    r1 = sum_hi - q1 * n
    mean = q1 * (1 << _SUM_SPLIT) + ((r1 * (1 << _SUM_SPLIT) + sum_lo) // n)
    mean_k = _bit_length(mean)

    k = jnp.clip(jnp.maximum(min_k, mean_k), 0, 15)
    return jnp.where(max_abs == 0, 0, k)


@partial(jax.jit, static_argnames=("is_lpc",))
def encode_select_step(
    lanes, nvalid, coeffs_all, shifts_all, orders_all, fixed_all, cand_ok, is_lpc: tuple
):
    """Full lossless candidate search on device.

    Args: lanes [L, S] i32; nvalid [L]; candidate tables [L, NC, ...];
    cand_ok [L, NC] host-known validity (Levinson); is_lpc: static per-
    candidate flags, candidate 0 must be the raw-PCM baseline.

    Returns (sel [L], k [L], size_bytes [L], residuals [L, S]).
    """
    max_abs, sum_hi, sum_lo, qsum = _aggregate_candidates(
        lanes, nvalid, coeffs_all, shifts_all, orders_all, fixed_all
    )
    L, NC = max_abs.shape

    k = _rice_k_device(max_abs, sum_hi, sum_lo, nvalid[:, None])
    qs = jnp.take_along_axis(qsum, k[:, :, None], axis=2)[:, :, 0]
    bits = qs + nvalid[:, None] * (1 + k)
    sizes = (bits + 7) >> 3

    ok = cand_ok
    lpc_mask = jnp.asarray(np.array(is_lpc, dtype=bool))
    stable = (max_abs >= 0) & (max_abs <= 1_000_000)  # encoder.rs:269-271
    ok = ok & (~lpc_mask[None, :] | stable)

    raw_size = 2 * nvalid
    best_size = raw_size
    best_ci = jnp.zeros((L,), jnp.int32)
    for ci in range(1, NC):
        better = ok[:, ci] & (sizes[:, ci] < best_size)
        best_size = jnp.where(better, sizes[:, ci], best_size)
        best_ci = jnp.where(better, ci, best_ci)

    take = lambda t: jnp.take_along_axis(t, best_ci[:, None], axis=1)[:, 0]
    win_c = jnp.take_along_axis(coeffs_all, best_ci[:, None, None], axis=1)[:, 0]
    residuals = _residuals_one(
        lanes, nvalid, win_c, take(shifts_all), take(orders_all), take(fixed_all)
    )
    return best_ci, take(k), best_size, residuals


@partial(jax.jit, static_argnames=("channels",))
def decode_step(rows, coeffs, shifts, orders, is_fixed, mid_side, channels: int):
    """Sharded decode step: reconstruction + mid/side + f32 (one program)."""
    from ..lossless.decoder import _device_decode

    return _device_decode(rows, coeffs, shifts, orders, is_fixed, mid_side, channels)
