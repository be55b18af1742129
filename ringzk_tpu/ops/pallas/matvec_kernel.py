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

Column-blocked variant (round 5): operators past the VMEM gate (N >= 1024,
where the plane-intermediate HBM stream the resident kernel kills grows
quadratically worse) run `matvec_digits_colblock`: the operator is stored
[D, kN, rows*N] (keygen picks the layout) and the grid walks (batch tile,
column block) with the batch tile OUTER -- the [TILE_B, kN] input slab
stays VMEM-resident across one full sweep of operator column slabs
streamed from HBM, each producing its [TILE_B, CB] output block with the
same in-kernel digits + shift-group fold. HBM traffic per matvec:
read v once + stream the operator (B/TILE_B) times + write the result --
still no [dv, B, D, rowsN] int32 plane tensor. Bit-identical to both
other paths (tests/test_pallas.py).
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
# column-blocked variant: Mosaic scoped-vmem stack budget for the WHOLE
# kernel invocation -- double-buffered input + operator slabs AND the
# kernel body's temporaries (the biased uint32 copy of the input slab, one
# int8 digit plane, output + fold). The chip limit is 16 MB; 14 MB leaves
# slack for Mosaic's own spills (the N=2048 CB=128 TILE=128 plan measured
# 19.79 MB against the naive slab-only estimate of ~13 MB -- the temps are
# real).
COL_VMEM_BUDGET = int(
    os.environ.get("RINGZK_MATVEC_COL_VMEM", str(14 * 1024 * 1024))
)


def _digits_matmul_fold(ring, v_digits: int, key_digits: int, v, take_wcol):
    """Shared kernel body: balanced-digit-decompose ``v`` [TB, kN] (the
    bias trick of conv_mxu.balanced_digits), one int8 MXU dot per (dv, dw)
    digit-plane pair against ``take_wcol(dw)`` [kN, C], shift-group
    accumulation, and the single-REDC mod-q fold -- identical algebra to
    conv_mxu.matvec_digits. Returns centered int32 [TB, C]."""
    from .. import conv_mxu

    qc = ring.qctx
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
            p = jax.lax.dot_general(
                d,
                take_wcol(dw),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = dv + dw
            groups[s] = p if groups[s] is None else groups[s] + p

    acc = None
    for s, g in enumerate(groups):
        gu = jax.lax.bitcast_convert_type(g, jnp.uint32)
        term = qc.mont_mul(gu, jnp.uint32(conv_mxu._shift_mont(ring, s)))
        corr = jnp.where(
            g < 0, jnp.uint32(conv_mxu._shift_neg_corr(ring, s)), jnp.uint32(0)
        )
        term = qc.sub(term, corr)
        acc = term if acc is None else qc.add(acc, term)
    return ring.to_centered(acc)


def _matvec_kernel(
    ring, v_digits: int, key_digits: int, rows_n: int, v_ref, w_ref, o_ref
):
    """v_ref [TB, kN] int32; w_ref [kN, D*rows_n] int8; o_ref [TB, rows_n]."""
    o_ref[...] = _digits_matmul_fold(
        ring, v_digits, key_digits, v_ref[...],
        lambda dw: w_ref[:, dw * rows_n : (dw + 1) * rows_n],
    )


def _matvec_colblock_kernel(
    ring, v_digits: int, key_digits: int, v_ref, w_ref, o_ref
):
    """v_ref [TB, kN] int32; w_ref [D, kN, CB] int8 (one streamed column
    slab of the blocked operator); o_ref [TB, CB]."""
    o_ref[...] = _digits_matmul_fold(
        ring, v_digits, key_digits, v_ref[...], lambda dw: w_ref[dw]
    )


def matvec_fits(w_digits, n: int) -> bool:
    """Resident-kernel applicability: operator [kN, D*rows_n] fits VMEM,
    lane-aligned shapes."""
    if w_digits.ndim != 2:
        return False
    rows_n = w_digits.shape[1]
    return (
        w_digits.size <= W_VMEM_BUDGET
        and n >= 128
        and n % 128 == 0
        and w_digits.shape[0] % 128 == 0
        and rows_n % 128 == 0
    )


def _colblock_stack(tile_b: int, cb: int, kn: int, key_digits: int) -> int:
    """Scoped-vmem stack estimate for one colblock kernel invocation:
    2x input slab (double-buffered) + the body's biased uint32 copy + one
    int8 digit plane + 2x operator slab + 2x output block + fixed slack
    for Mosaic temporaries. Calibrated against the observed 19.79 MB at
    (tile 128, CB 128, kN 6144) -- see COL_VMEM_BUDGET."""
    slack = 2 * 1024 * 1024
    return (
        2 * tile_b * kn * 4      # input slab, double-buffered
        + tile_b * kn * 4        # biased uint32 copy (digit extraction)
        + tile_b * kn            # one int8 digit plane
        + 2 * key_digits * kn * cb   # operator slab, double-buffered
        + 2 * tile_b * cb * 4    # output block
        + slack
    )


def colblock_plan(kn: int, rows_n: int, key_digits: int):
    """(tile_b, cb) for the blocked kernel, or None when nothing fits the
    scoped-vmem stack budget. Prefers the largest batch tile (operator HBM
    traffic scales as B/tile_b full-operator streams), then the widest
    column slab (fewer grid steps). RINGZK_MATVEC_CB forces cb."""
    env = os.environ.get("RINGZK_MATVEC_CB")
    if env is not None:
        cb = int(env)
        return (TILE_B, cb) if cb and rows_n % cb == 0 else None
    for tile_b in (TILE_B, TILE_B // 2, TILE_B // 4):
        if tile_b < 8:
            continue
        best = None
        cb = 128
        while cb <= rows_n:
            if (
                rows_n % cb == 0
                and _colblock_stack(tile_b, cb, kn, key_digits)
                <= COL_VMEM_BUDGET
            ):
                best = cb
            cb *= 2
        if best is not None:
            return tile_b, best
    return None


def blocked_layout_ok(rows: int, k: int, n: int, key_digits: int) -> bool:
    """True when keygen should store the [D, kN, rows*N] blocked operator
    layout for this key shape: the resident kernel's VMEM gate fails but a
    FULL-tile column plan fits. Plans that must shrink the batch tile are
    excluded -- operator HBM traffic scales as B/tile_b full streams, and
    the N=2048 (tile 64, CB 128) plan measured 79.7k vs the XLA fold's
    94.9k same-day (A/B in BENCHMARKS.md); the N=1024 full-tile plan
    (128, 256) measured 257.5k vs 242.0k (+6.4%). Mirrors matvec_fits'
    alignment conditions."""
    kn, rows_n = k * n, rows * n
    if (
        key_digits * kn * rows_n <= W_VMEM_BUDGET
        or n < 128
        or n % 128
        or kn % 128
        or rows_n % 128
    ):
        return False
    plan = colblock_plan(kn, rows_n, key_digits)
    return plan is not None and plan[0] >= TILE_B


def to_blocked_layout(w_digits):
    """[kN, D*rows_n] int8 -> [D, kN, rows_n]: the streamed-slab layout
    (int8 tiling wants the (kN, CB) plane in the last two dims; D=4 in the
    middle would force sublane padding)."""
    from .. import conv_mxu

    kn, dcols = w_digits.shape
    d = conv_mxu.KEY_DIGITS
    return jnp.transpose(w_digits.reshape(kn, d, dcols // d), (1, 0, 2))


def matvec_digits_colblock(
    ring, w3, rows: int, v, v_digits: int, *, interpret: bool = False
):
    """Column-blocked digit matvec against a [D, kN, rows*N] blocked
    operator (see to_blocked_layout). Grid (batch tile OUTER, column slab
    inner): the input slab loads once per batch tile and stays resident
    while operator slabs stream from HBM; each step emits one [TILE_B, CB]
    output block through the fused digits + fold. Bit-identical to
    matvec_digits / matvec_digits_pallas (tests/test_pallas.py)."""
    from .. import conv_mxu

    d, kn, rows_n = w3.shape
    n = v.shape[-1]
    assert rows_n == rows * n
    plan = colblock_plan(kn, rows_n, d)
    if plan is None:
        # keygen only stores the blocked layout when a plan exists, so this
        # is an env mismatch (RINGZK_MATVEC_CB / _COL_VMEM changed after
        # keygen) or a direct call on an unplannable shape -- say so
        # instead of TypeError-ing mid-trace
        raise ValueError(
            f"no colblock VMEM plan for operator [{d}, {kn}, {rows_n}] "
            "(RINGZK_MATVEC_CB/RINGZK_MATVEC_COL_VMEM changed since "
            "keygen?); rebuild the key or unset the overrides"
        )
    tile_b, cb = plan
    batch = v.shape[:-2]
    bflat = 1
    for dim in batch:
        bflat *= dim
    v2 = v.reshape((bflat, kn))
    pad = (-bflat) % tile_b
    if pad:
        v2 = jnp.pad(v2, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            _matvec_colblock_kernel, ring, v_digits, conv_mxu.KEY_DIGITS
        ),
        grid=(pl.cdiv(v2.shape[0], tile_b), rows_n // cb),
        in_specs=[
            pl.BlockSpec(
                (tile_b, kn), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (d, kn, cb), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, cb), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((v2.shape[0], rows_n), jnp.int32),
        interpret=interpret,
    )(v2, w3)
    return out[:bflat].reshape(batch + (rows, n))


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
