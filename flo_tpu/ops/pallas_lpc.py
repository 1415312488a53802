"""Pallas TPU kernel for the batched integer LPC reconstruction recurrence.

The decoder's only truly sequential op:

    s[i] = r[i] + ((Σ_j c_eff[j] · s[i-1-j]) >> shift)      (int32 wrap)

with the warm-up rule of lossless/decoder.rs:92-273 (i < order: fixed lanes
use the ramped fixed predictor FIXED[min(i,4)], LPC lanes use zero
coefficients) and the exact i64-equivalent 15-bit-limb arithmetic of
ops/intmath.py.

Why Pallas: under XLA this is a 44100-step `lax.scan` whose per-step work is
a handful of ops on a few-hundred-lane vector — the while-loop executes one
tiny VPU op at a time and per-step overhead dominates (~76 ms per bench
chunk measured). Here the recurrence runs inside one kernel with the
12-sample carry held in REGISTERS (a 12-tuple of [8, 128] int32 tiles — pure
SSA, no VMEM traffic per step) and 1024 lanes packed into the native VPU
tile shape, so each time step is ~a hundred fused [8, 128] VPU ops.

Layout: lanes are padded to multiples of LANES_PER_TILE=1024 and arranged
[8, 128] (sublane × lane, the int32 register tile). Time is tiled at
S_TILE=1024 so a residual block is 4 MB of VMEM with double-buffered
pipelining; the carry hands off between time tiles through a small VMEM
scratch (the TPU grid is sequential, scratch persists across grid steps).

Exactness contract: bit-identical to ops/lpc.reconstruct (the lax.scan
formulation) for every input — covered by tests against both the scan and
the numpy oracle, in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lpc import MAX_ORDER, _FIXED_COEFFS

LANES_PER_TILE = 8 * 128
#: Time-tile: 512 keeps in+out blocks (plus their pipeline double buffers)
#: comfortably inside the 16 MB VMEM budget.
S_TILE = 512

_MASK15 = 0x7FFF


def _kernel(tab_ref, res_ref, coeffs_ref, shifts_ref, orders_ref, fixed_ref,
            out_ref, carry_ref):
    """One (lane-tile, time-tile) grid cell.

    tab_ref: [5, 12] int32 ramp table in SMEM; res_ref/out_ref:
    [S_TILE, 1, 8, 128] int32; coeffs_ref: [12, 1, 8, 128];
    shifts/orders/fixed_ref: [1, 8, 128] int32; carry_ref: VMEM scratch
    [12, 8, 128] persisting the recurrence state across time tiles.
    """
    jt = pl.program_id(1)

    @pl.when(jt == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    shifts_i = shifts_ref[0]  # [8, 128] int32
    shifts = shifts_i.astype(jnp.uint32)
    orders = orders_ref[0]
    fixed = fixed_ref[0] != 0

    coeffs = tuple(coeffs_ref[j, 0] for j in range(MAX_ORDER))
    carry = tuple(carry_ref[j] for j in range(MAX_ORDER))

    def step(t, carry):
        i = jt * S_TILE + t  # global time index
        r = res_ref[t, 0]

        ramp_i = jnp.minimum(i, 4)
        ramp_row = [tab_ref[ramp_i, j] for j in range(MAX_ORDER)]  # scalars
        use_ramp = i < orders  # [8, 128]

        # Exact Σ c_eff*carry via 15-bit limbs (ops/intmath.py proof).
        zero = jnp.zeros_like(r)
        SAhi = SAlo = SP1hi = SP1lo = SP2hi = SP2lo = SP0hi = SP0lo = zero
        for j in range(MAX_ORDER):
            c = jnp.where(
                use_ramp,
                jnp.where(fixed, ramp_row[j], 0),
                coeffs[j],
            )
            s = carry[j]
            c1, c0 = c >> 15, c & _MASK15
            s1, s0 = s >> 15, s & _MASK15
            A = c1 * s1
            P1 = c1 * s0
            P2 = c0 * s1
            P0 = c0 * s0
            SAhi += A >> 15
            SAlo += A & _MASK15
            SP1hi += P1 >> 15
            SP1lo += P1 & _MASK15
            SP2hi += P2 >> 15
            SP2lo += P2 & _MASK15
            SP0hi += P0 >> 15
            SP0lo += P0 & _MASK15
        L3 = SAhi
        L2 = SAlo + SP1hi + SP2hi
        L1 = SP1lo + SP2lo + SP0hi
        L0 = SP0lo
        L1 = L1 + (L0 >> 15)
        L0 = L0 & _MASK15
        L2 = L2 + (L1 >> 15)
        L1 = L1 & _MASK15
        L3 = L3 + (L2 >> 15)
        L2 = L2 & _MASK15
        # (value >> shift) mod 2^32 for shift in [0, 15].
        # Shift amounts stay int32 (Mosaic lacks unsigned vector min) and are
        # cast at the shift itself; all are < 32 so the cast is value-exact.
        lower = (L1 << 15) | L0
        t_lower = lower.astype(jnp.uint32) >> shifts
        t_L2 = L2.astype(jnp.uint32) << (jnp.uint32(30) - shifts)
        amt3 = 45 - shifts_i
        t_L3 = jnp.where(
            amt3 < 32,
            L3.astype(jnp.uint32) << jnp.minimum(amt3, 31).astype(jnp.uint32),
            jnp.uint32(0),
        )
        pred = (t_L3 + t_L2 + t_lower).astype(jnp.int32)

        s_new = pred + r  # wrapping int32 add
        out_ref[t, 0] = s_new
        return (s_new,) + carry[:-1]

    carry = jax.lax.fori_loop(0, S_TILE, step, carry)
    for j in range(MAX_ORDER):
        carry_ref[j] = carry[j]


@partial(jax.jit, static_argnames=("interpret",))
def reconstruct_pallas(residuals, coeffs, shifts, orders, is_fixed,
                       interpret: bool = False):
    """Drop-in equivalent of ops/lpc.reconstruct backed by the Pallas kernel.

    residuals [L, S] int32, coeffs [L, 12] int32, shifts/orders [L] int32,
    is_fixed [L] bool -> [L, S] int32. Pads L to a multiple of 1024 and S to
    a multiple of S_TILE internally (padding lanes/steps are zeros ->
    identity reconstruction, trimmed on return).
    """
    L, S = residuals.shape
    Lp = pl.cdiv(max(L, 1), LANES_PER_TILE) * LANES_PER_TILE
    Sp = pl.cdiv(max(S, 1), S_TILE) * S_TILE
    k = Lp // LANES_PER_TILE
    nS = Sp // S_TILE

    def lanes4(x, fill=0):
        x = jnp.pad(x, ((0, Lp - L),), constant_values=fill) if x.ndim == 1 else x
        return x.reshape(k, 8, 128)

    res = jnp.pad(residuals, ((0, Lp - L), (0, Sp - S)))
    res = res.T.reshape(Sp, k, 8, 128)  # time-major
    cfs = jnp.pad(coeffs, ((0, Lp - L), (0, 0)))
    cfs = cfs.T.reshape(MAX_ORDER, k, 8, 128)
    sh = lanes4(shifts.astype(jnp.int32))
    od = lanes4(orders.astype(jnp.int32))
    fx = lanes4(is_fixed.astype(jnp.int32))

    out = pl.pallas_call(
        _kernel,
        grid=(k, nS),
        in_specs=[
            pl.BlockSpec((5, MAX_ORDER), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((S_TILE, 1, 8, 128), lambda i, j: (j, i, 0, 0)),
            pl.BlockSpec((MAX_ORDER, 1, 8, 128), lambda i, j: (0, i, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((S_TILE, 1, 8, 128), lambda i, j: (j, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Sp, k, 8, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((MAX_ORDER, 8, 128), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(_FIXED_COEFFS), res, cfs, sh, od, fx)

    return out.reshape(Sp, Lp).T[:L, :S]
