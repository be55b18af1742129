"""Fused Pallas TPU kernel for the negacyclic NTT stage chain.

The XLA path (ops/ntt.py) expresses each butterfly stage as rolls + selects
+ Montgomery mults; XLA fuses well, but each transform still walks
log2(N) dependent elementwise stages through the memory system. This kernel
pins a [TILE_B, N] block of polynomials in VMEM and runs ALL stages (and the
centered mod-p reduction on the way in) before writing back: one HBM read +
one HBM write per transform regardless of N.

The butterfly math is identical to ops/ntt.py (same twiddle planes, same
Montgomery arithmetic on uint32 lanes); pltpu.roll provides the static lane
rotation for partner exchange. Selected at runtime via RINGZK_PALLAS=1 (see
RingContext.fwd) after being validated bit-exact against the XLA path in
tests/test_pallas.py (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..montgomery import MontCtx

TILE_B = 256


def _shoup_mul_inline(ctx: MontCtx, w, w_shoup, x):
    """Shoup product on uint32 arrays (same algebra as MontCtx.shoup_mul --
    twiddles are static constants with precomputed floor(w<<32/p))."""
    return ctx.shoup_mul(w, w_shoup, x)


def _roll_lanes(x, shift: int):
    """Static circular shift along the lane (last) axis. pltpu.roll requires
    a non-negative shift; roll(x, s) moves element i to i+s, so x[i - s] --
    to read x[i + t] (negative logical shift) roll by N - t."""
    n = x.shape[-1]
    return pltpu.roll(x, shift % n, axis=x.ndim - 1)


def _fwd_kernel(ctx: MontCtx, n: int, x_ref, w_ref, o_ref):
    x = x_ref[...]
    logn = n.bit_length() - 1
    lane = jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 1)
    for s in range(logn):
        t = n >> (s + 1)
        is_lo = (lane & np.uint32(t)) == 0
        xs = jnp.where(is_lo, _roll_lanes(x, -t), _roll_lanes(x, t))
        prod = _shoup_mul_inline(
            ctx, w_ref[0, s, :], w_ref[1, s, :], jnp.where(is_lo, xs, x)
        )
        x = jnp.where(is_lo, ctx.add(x, prod), ctx.sub(xs, prod))
    o_ref[...] = x


def _inv_kernel(ctx: MontCtx, n: int, n_inv_scale, x_ref, w_ref, o_ref):
    x = x_ref[...]
    logn = n.bit_length() - 1
    lane = jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 1)
    for s in range(logn):
        t = 1 << s
        is_lo = (lane & np.uint32(t)) == 0
        xs = jnp.where(is_lo, _roll_lanes(x, -t), _roll_lanes(x, t))
        x = jnp.where(
            is_lo,
            ctx.add(x, xs),
            _shoup_mul_inline(ctx, w_ref[0, s, :], w_ref[1, s, :], ctx.sub(xs, x)),
        )
    o_ref[...] = _shoup_mul_inline(
        ctx, np.uint32(n_inv_scale[0]), np.uint32(n_inv_scale[1]), x
    )


def _call(kernel, x2d, w, n, interpret):
    b = x2d.shape[0]
    tile = min(TILE_B, b)
    grid = (pl.cdiv(b, tile),)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (2, w.shape[1], n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.uint32),
        interpret=interpret,
    )(x2d, w)


def fwd_one_pallas(ctx: MontCtx, w_fwd, x, interpret: bool = False):
    """Forward NTT, one prime: uint32 [..., N] in [0,p) -> [..., N]."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    x2d = x.reshape((-1, n))
    if x2d.shape[0] % min(TILE_B, x2d.shape[0]):
        pad = min(TILE_B, x2d.shape[0])
        pad_rows = (-x2d.shape[0]) % pad
        x2d = jnp.pad(x2d, ((0, pad_rows), (0, 0)))
    out = _call(functools.partial(_fwd_kernel, ctx, n), x2d, w_fwd, n, interpret)
    flat = 1
    for d in lead:
        flat *= d
    return out[:flat].reshape(lead + (n,))


def inv_one_pallas(ctx: MontCtx, w_inv, n_inv_scale, x, interpret: bool = False):
    """Inverse NTT + N^{-1} scaling, one prime."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    x2d = x.reshape((-1, n))
    pad = min(TILE_B, x2d.shape[0]) or 1
    pad_rows = (-x2d.shape[0]) % pad
    if pad_rows:
        x2d = jnp.pad(x2d, ((0, pad_rows), (0, 0)))
    out = _call(
        functools.partial(_inv_kernel, ctx, n, n_inv_scale), x2d, w_inv, n, interpret
    )
    flat = 1
    for d in lead:
        flat *= d
    return out[:flat].reshape(lead + (n,))
