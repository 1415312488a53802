"""Mesh sharding helpers + sharded codec steps.

The fused candidate-search program lives in ops/select.py; this module adds
the `jax.sharding` plumbing for scaling it over a device mesh: a 1-D 'batch'
axis over codec lanes (data parallelism — the only parallelism dimension the
workload warrants, SURVEY.md §2.9). Each lane is independent, so XLA
partitions every step with zero collectives; host gather of the
variable-length packed streams is the only cross-device synchronization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.select import encode_select_step  # re-exported sharded step

__all__ = [
    "batch_sharding",
    "decode_step",
    "device_mesh",
    "encode_select_step",
    "shard_batch",
]


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


@partial(jax.jit, static_argnames=("channels",))
def decode_step(rows, coeffs, shifts, orders, is_fixed, mid_side, channels: int):
    """Sharded decode step: reconstruction + mid/side + f32 (one program)."""
    from ..lossless.decoder import _device_decode

    return _device_decode(rows, coeffs, shifts, orders, is_fixed, mid_side, channels)
