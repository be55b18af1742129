"""Fused Pallas TPU kernel for the int8 digit-matmul key matvec.

The XLA path (ops/conv_mxu.matvec_digits) runs ONE [dv*B, kN] @
[kN, D*rowsN] int8 matmul and then folds the digit planes mod q in a
separate elementwise pass. XLA cannot fuse that fold into the matmul: a
folded output element combines dv*D matmul ROWS-times-planes, so the full
int32 plane tensor [dv, B, D, rowsN] materializes in HBM between the two
stages -- ~0.9 GB written + read per headline batch across the four
protocol matvecs, the largest single HBM stream in the program.

This kernel keeps everything for a [TILE_B] slab of input vectors in VMEM:
balanced digit decomposition (the same bias trick as
conv_mxu.balanced_digits), one int8 MXU dot per (dv, dw) digit-plane pair
against the resident operator columns (the operator layout is
column-contiguous per dw, so the slices are static), shift-group
accumulation, and the single-REDC mod-q fold -- one HBM read of v, one
streamed read of the operator, one write of the centered result, no plane
intermediate. Bit-identical to the XLA path by construction (identical
digits, identical exact mod-q algebra; tests/test_pallas.py).

Gated to operators that fit VMEM (w <= ~8 MB: the headline N=512 shapes)
with the XLA path as fallback -- see conv_mxu.matvec_digits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

TILE_B = int(os.environ.get("RINGZK_MATVEC_TILE", "128"))
W_VMEM_BUDGET = 8 * 1024 * 1024   # resident-operator cap (bytes, int8)


def _matvec_kernel(
    ring, v_digits: int, key_digits: int, rows_n: int, v_ref, w_ref, o_ref
):
    """v_ref [TB, kN] int32; w_ref [kN, D*rows_n] int8; o_ref [TB, rows_n]."""
    from .. import conv_mxu

    qc = ring.qctx
    v = v_ref[...]
    bias = sum((conv_mxu.RADIX // 2) << (conv_mxu.RADIX_BITS * i)
               for i in range(v_digits))
    u = jax.lax.bitcast_convert_type(v, jnp.uint32) + np.uint32(bias)
    half = np.int32(conv_mxu.RADIX // 2)

    groups = [None] * (v_digits + key_digits - 1)
    for dv in range(v_digits):
        d = (
            ((u >> np.uint32(conv_mxu.RADIX_BITS * dv))
             & np.uint32(conv_mxu.RADIX - 1)).astype(jnp.int32) - half
        ).astype(jnp.int8)
        for dw in range(key_digits):
            wcol = w_ref[:, dw * rows_n : (dw + 1) * rows_n]
            p = jax.lax.dot_general(
                d,
                wcol,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = dv + dw
            groups[s] = p if groups[s] is None else groups[s] + p

    # single-REDC fold, identical algebra to conv_mxu.matvec_digits
    acc = None
    for s, g in enumerate(groups):
        gu = jax.lax.bitcast_convert_type(g, jnp.uint32)
        term = qc.mont_mul(gu, jnp.uint32(conv_mxu._shift_mont(ring, s)))
        corr = jnp.where(
            g < 0, jnp.uint32(conv_mxu._shift_neg_corr(ring, s)), jnp.uint32(0)
        )
        term = qc.sub(term, corr)
        acc = term if acc is None else qc.add(acc, term)
    o_ref[...] = ring.to_centered(acc)


def matvec_fits(w_digits, n: int) -> bool:
    """Kernel applicability: operator resident in VMEM, lane-aligned shapes."""
    rows_n = w_digits.shape[1]
    return (
        w_digits.size <= W_VMEM_BUDGET
        and n >= 128
        and n % 128 == 0
        and w_digits.shape[0] % 128 == 0
        and rows_n % 128 == 0
    )


def matvec_digits_pallas(
    ring, w_digits, rows: int, v, v_digits: int, *, interpret: bool = False
):
    """Drop-in for conv_mxu.matvec_digits on VMEM-resident operators.

    w_digits: [kN, D*rows*N] int8; v: [..., k, N] int32 within v_digits
    capacity. Returns centered int32 [..., rows, N], bit-identical to the
    XLA path.
    """
    from .. import conv_mxu

    kn = w_digits.shape[0]
    n = v.shape[-1]
    batch = v.shape[:-2]
    bflat = 1
    for d in batch:
        bflat *= d
    v2 = v.reshape((bflat, kn))
    pad = (-bflat) % TILE_B
    if pad:
        v2 = jnp.pad(v2, ((0, pad), (0, 0)))
    rows_n = rows * n
    out = pl.pallas_call(
        functools.partial(
            _matvec_kernel, ring, v_digits, conv_mxu.KEY_DIGITS, rows_n
        ),
        grid=(pl.cdiv(v2.shape[0], TILE_B),),
        in_specs=[
            pl.BlockSpec((TILE_B, kn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (kn, conv_mxu.KEY_DIGITS * rows_n),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (TILE_B, rows_n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((v2.shape[0], rows_n), jnp.int32),
        interpret=interpret,
    )(v2, w_digits)
    return out[:bflat].reshape(batch + (rows, n))
