"""Sparse coefficient transport: ship (column, value) pairs, not dense rows.

Quantized MDCT coefficients are mostly zeros (that is the whole point of the
psychoacoustic gate — lossy ratios are 2-30x), yet round 1 moved them as
dense [rows, 1024] i16 tensors in BOTH directions. These helpers compact the
nonzeros on device (encode: download 4 bytes per nonzero) and expand
host-built pairs back to dense on device (decode: upload 4 bytes per
nonzero), cutting the lossy wire traffic by roughly the compression ratio.

Entry format: int32 ``(col << 16) | (value & 0xFFFF)`` — col < 32768 keeps
the sign bit clear, values are i16. Entries are emitted row-major (ascending
column within each row) so hosts split rows with one cumsum of row_nnz.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def compact_nonzeros(q):
    """q [R, W] i16/i32 -> (entries i32 [R*W] prefix-packed, row_nnz [R]).

    entries[:row_nnz.sum()] holds the nonzeros in row-major order; the tail
    is zero. Download only the prefix (fetch_prefix)."""
    R, W = q.shape
    flat = q.reshape(-1).astype(jnp.int32)
    nz = flat != 0
    rank = jnp.cumsum(nz.astype(jnp.int32)) - 1
    dest = jnp.where(nz, rank, R * W)  # zeros -> dropped
    col = jnp.arange(R * W, dtype=jnp.int32) % W
    entry = (col << 16) | (flat & 0xFFFF)
    entries = jnp.zeros((R * W,), jnp.int32).at[dest].set(
        entry, mode="drop", unique_indices=True
    )
    row_nnz = jnp.sum(nz.reshape(R, W), axis=1, dtype=jnp.int32)
    return entries, row_nnz


def split_entries(entries: np.ndarray):
    """Host-side: int32 entries -> (cols int32, vals int16)."""
    cols = (entries >> 16).astype(np.int32)
    vals = (entries & 0xFFFF).astype(np.uint16).view(np.int16)
    return cols, vals


def make_entries(cols: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Host-side inverse of split_entries."""
    return (cols.astype(np.int32) << 16) | (
        vals.astype(np.int16).view(np.uint16).astype(np.int32)
    )


@partial(jax.jit, static_argnames=("R", "W"))
def expand_nonzeros(entries, row_nnz, total, R: int, W: int):
    """Rebuild dense [R, W] i32 rows from padded row-major entries.

    entries: [N_pad] i32 (tail past ``total`` ignored); row_nnz: [R] i32;
    total: scalar i32 (= row_nnz.sum(), passed so shapes stay static).
    """
    N = entries.shape[0]
    # Row id per entry: +1 markers at each row's first entry index, cumsum.
    # Rows with zero entries stack their markers on the same index (add).
    row_start = jnp.cumsum(row_nnz) - row_nnz
    marks = jnp.zeros((N,), jnp.int32).at[row_start].add(1, mode="drop")
    row_id = jnp.cumsum(marks) - 1
    col = entries >> 16
    val = (entries << 16) >> 16  # sign-extended low 16 bits
    flat_idx = row_id * W + col
    valid = jnp.arange(N, dtype=jnp.int32) < total
    flat_idx = jnp.where(valid, flat_idx, R * W)
    dense = jnp.zeros((R * W,), jnp.int32).at[flat_idx].set(
        val, mode="drop", unique_indices=True
    )
    return dense.reshape(R, W)


#: Download-slice bucket (elements) — see ricepack.PREFIX_BUCKET.
PREFIX_BUCKET = 2 << 20


@partial(jax.jit, static_argnames=("n",))
def _take_prefix(arr, n: int):
    return jax.lax.dynamic_slice_in_dim(arr, 0, n)


def fetch_prefix(arr, n: int) -> np.ndarray:
    """Download the first n elements of a device 1-D buffer (bucketed)."""
    if n <= 0:
        return np.zeros(0, arr.dtype)
    cap = arr.shape[0]
    m = min(-(-n // PREFIX_BUCKET) * PREFIX_BUCKET, cap)
    return np.asarray(_take_prefix(arr, m))[:n]


def pad_entries(entries: np.ndarray, bucket: int = 1 << 20) -> np.ndarray:
    """Pad to a bucket multiple so the expand program rarely recompiles."""
    n = len(entries)
    cap = -(-max(n, 1) // bucket) * bucket
    out = np.zeros(cap, np.int32)
    out[:n] = entries
    return out
