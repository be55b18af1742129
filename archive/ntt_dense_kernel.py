"""Fused dense MXU NTT: digitize -> int8 matmul -> fold in one Pallas kernel.

Round 1 measured the dense transform-as-matmul engine (ops/ntt_mxu.py) at
290k proofs/s vs 455k for the butterfly default, and blamed relayout copies
around the digitize/matmul/fold glue: XLA materializes the [R, 4N] int8
digit operand and the [R, 4N] int32 product in HBM with layout changes on
both sides of the matmul. This kernel is the focused attempt VERDICT.md
item 9 calls for: one pallas_call per (prime, direction) where a row tile
of centered int32 coefficients is digitized in VMEM (closed-form shift/mask,
no borrow chain), multiplied against the VMEM-resident [4N, 4N] int8
constant operator on the MXU with int32 accumulation, and folded back to
[0, p) uint32 -- the int8/int32 intermediates never touch HBM.

Grid: one program per row tile (TILE_R x N block). The operator (4 MB at
N=512 per prime) rides VMEM across the whole grid; with the x tile, product
tile, and output tile the footprint stays ~7 MB, inside the 16 MB budget.

The fold is the wrap-safe per-plane form (ntt_mxu._fold_planes): step sums
reach din*N*128^2 ~ 2^25 at N=512, where the paired int32 combine could
overflow for adversarially aligned digits.

Bit-identical to ntt_mxu.fwd_one_dense/inv_one_dense (tests/test_ntt_mxu.py
runs both, interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..montgomery import MontCtx

TILE_R = 256  # rows per grid step: int8 lhs 0.5 MB, int32 product 2 MB at N=512

# Largest N whose [4N, 4N] int8 operator (+ tiles) fits the ~16 MB VMEM
# budget: 4 MB at 512; 16 MB at 1024 leaves no room for operands, so the
# dense engine falls back to the composed XLA path there.
PALLAS_DENSE_MAX_N = 512


def fits_vmem(n: int) -> bool:
    return n <= PALLAS_DENSE_MAX_N


def _dense_kernel(ctx: MontCtx, din: int, dout: int, n: int, shifts_mont,
                  x_ref, m_ref, o_ref):
    """x_ref: [TILE_R, N] int32 (centered values, or bitcast [0,p) hats);
    m_ref: [din*N, dout*N] int8 operator; o_ref: [TILE_R, N] uint32."""
    x = x_ref[:]
    bias = sum(128 << (8 * i) for i in range(din))
    ub = jax.lax.bitcast_convert_type(x, jnp.uint32) + np.uint32(bias)
    planes = [
        (
            ((ub >> np.uint32(8 * u)) & np.uint32(255)).astype(jnp.int32)
            - np.int32(128)
        ).astype(jnp.int8)
        for u in range(din)
    ]
    lhs = jnp.concatenate(planes, axis=-1)            # [TILE_R, din*N] int8
    h = jax.lax.dot_general(
        lhs, m_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                  # [TILE_R, dout*N]
    acc = ctx.reduce_i32_centered(h[:, :n])
    for w in range(1, dout):
        acc = ctx.add(
            acc,
            ctx.mont_mul(
                ctx.reduce_i32_centered(h[:, w * n : (w + 1) * n]),
                np.uint32(shifts_mont[w]),
            ),
        )
    o_ref[:] = acc


def dense_apply_pallas(ctx: MontCtx, table, x_i32, n: int,
                       interpret: bool = False):
    """Fused digitize/matmul/fold transform. table: dict with din, dout,
    m ([din*N, dout*N] int8 jnp array), shifts_mont. x_i32: int32 [..., N].
    Returns uint32 [..., N] in [0, p) -- same contract as
    ntt_mxu._dense_apply, computed in one VMEM-resident kernel."""
    lead = x_i32.shape[:-1]
    din, dout = table["din"], table["dout"]
    x2 = x_i32.reshape((-1, n))
    r = x2.shape[0]
    tile = min(TILE_R, r) if r else TILE_R
    pad = (-r) % tile
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    rp = x2.shape[0]

    kernel = functools.partial(
        _dense_kernel, ctx, din, dout, n, tuple(table["shifts_mont"])
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rp, n), jnp.uint32),
        grid=(rp // tile,),
        in_specs=[
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (din * n, dout * n), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x2, table["m"])
    if pad:
        out = out[:r]
    return out.reshape(lead + (n,))
