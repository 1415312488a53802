"""Bucketed device->host prefix fetches (+ encoder batch bounds).

Historical note: this module originally held the round-2 device Rice packer
(`pack_lanes`), which spread per-code deltas over a 169M-element bit domain.
Hardware profiling (tools/pack_primitives.py) showed every per-code indexed
op costs ~10 ns/element on this chip, making that design the entire gap
between the measured candidate search and 1000x realtime; the production
packer is now the block-dense two-phase design in ops/blockspread.py. What
remains here are the download helpers shared by every wire transport
(blockspread, blockpack, compact).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np

#: Worst-case packed bits per sample (raw baseline bound: selection never
#: keeps a candidate larger than raw).
WORST_BITS_PER_SAMPLE = 16

#: Hard cap so packer bit indices fit int32 (with word-align slack); the
#: encoder's pipeline chunking keeps batches below this.
MAX_BATCH_SAMPLES = (1 << 30) // WORST_BITS_PER_SAMPLE - 1

#: Download-slice bucket (BYTES): prefixes round up so the slice program
#: compiles a bounded number of shapes. Each fetch over-downloads at most
#: one bucket; payload sizes cluster, so the shape count stays small.
PREFIX_BUCKET = 2 << 20


@partial(jax.jit, static_argnames=("n",))
def _take_prefix(arr, n: int):
    return jax.lax.dynamic_slice_in_dim(arr, 0, n)


def fetch_prefix_start(arr, nelems: int):
    """Dispatch the bucketed prefix slice and begin its host copy (does not
    block). Finish with :func:`fetch_prefix_finish` — splitting the phases
    lets one chunk's download overlap another chunk's host finalization.

    The bucket is sized in BYTES (PREFIX_BUCKET / itemsize elements), so u8
    and u32 payloads bucket to the same wire size."""
    if nelems <= 0:
        return None
    from ..futures import start_host_copy

    cap = arr.shape[0]
    step = max(PREFIX_BUCKET // max(arr.dtype.itemsize, 1), 1)
    n = min(-(-nelems // step) * step, cap)
    h = _take_prefix(arr, n)
    start_host_copy(h)
    return h


def fetch_prefix_finish(h, nelems: int) -> np.ndarray:
    if h is None:
        return np.zeros(0, np.uint8)
    return np.asarray(h)[:nelems]


def fetch_prefix(arr, nbytes: int) -> np.ndarray:
    """Download the first nbytes of a device byte buffer (bucketed slice)."""
    return fetch_prefix_finish(fetch_prefix_start(arr, nbytes), nbytes)


@partial(jax.jit, static_argnames=("n",))
def _take_range(arr, lo, n: int):
    # dynamic_slice clamps lo to cap-n; the caller recomputes the clamped
    # start and offsets into the result, so the clamp is harmless.
    return jax.lax.dynamic_slice_in_dim(arr, lo, n)


def fetch_range_start(arr, lo_elems: int, nelems: int):
    """Dispatch + async-start a download of arr[lo : lo+nelems] (bucketed
    length, dynamic start — one compiled program per length bucket, not per
    offset). Finish with :func:`fetch_range_finish`. Returns None when the
    range is empty."""
    if nelems <= 0:
        return None
    from ..futures import start_host_copy

    cap = arr.shape[0]
    step = max(PREFIX_BUCKET // max(arr.dtype.itemsize, 1), 1)
    n = min(-(-nelems // step) * step, cap)
    lo_clamped = min(max(lo_elems, 0), cap - n)
    h = _take_range(arr, lo_clamped, n)
    start_host_copy(h)
    return (h, lo_elems - lo_clamped)


def fetch_range_finish(hr, nelems: int) -> np.ndarray:
    if hr is None:
        return np.zeros(0, np.uint8)
    h, skip = hr
    return np.asarray(h)[skip : skip + nelems]
