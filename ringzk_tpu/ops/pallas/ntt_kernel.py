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

from .. import u64
from ..montgomery import MontCtx

TILE_B = 256


def _tile_for(n: int, rows: int) -> int:
    """Row-tile size bounded by a VMEM budget that scales inversely with N:
    the stage chain keeps O(1) [tile, N] u32 planes live per prime, and at
    TILE_B=256 the footprint is proven at N<=512; halve the tile per
    doubling beyond that (N=1024 OOM'd the 16 MB scoped vmem otherwise).

    RINGZK_NTT_TILE overrides the base tile (probe knob, same role as
    RINGZK_MATVEC_TILE for the matvec kernel)."""
    import os

    base = int(os.environ.get("RINGZK_NTT_TILE", TILE_B))
    budget = max(8, (base * 512) // max(n, 512))
    return max(1, min(base, rows, budget))


def _shoup_mul_inline(ctx: MontCtx, w, w_shoup, x):
    """Shoup product on uint32 arrays (same algebra as MontCtx.shoup_mul --
    twiddles are static constants with precomputed floor(w<<32/p))."""
    return ctx.shoup_mul(w, w_shoup, x)


def _roll_lanes(x, shift: int):
    """Static circular shift along the lane (last) axis. pltpu.roll requires
    a non-negative shift; roll(x, s) moves element i to i+s, so x[i - s] --
    to read x[i + t] (negative logical shift) roll by N - t. The shift is
    pinned to int32: under jax x64 (wide rings) a bare Python int traces as
    i64 and Mosaic's tpu.dynamic_rotate rejects a 64-bit shift operand."""
    n = x.shape[-1]
    return pltpu.roll(x, np.int32(shift % n), axis=x.ndim - 1)


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


# ---------------------------------------------------------------------------
# Fused multi-prime kernels with Harvey-style lazy reduction.
#
# All butterflies keep values in [0, 4p) (4p < 2^32 for every NTT prime):
# each stage first folds its input into [0, 2p) with one conditional
# subtract, multiplies with a *lazy* Shoup product (result in [0, 2p), no
# conditional subtract), and writes x+prod / xs+2p-prod back without modular
# reduction. Only the final stage output is fully reduced to [0, p). This
# drops ~2-3 lane ops per butterfly vs the strict per-stage reduction and is
# bit-identical after the final fold (validated against the strict XLA path
# in tests/test_pallas.py).
#
# The per-prime loop lives INSIDE one kernel: the int32 input block is read
# from HBM once and all CRT images are produced in VMEM (fwd), resp. all
# per-prime inverse transforms + the Garner CRT reconstruction run in VMEM
# and only the final centered int32 leaves the kernel (inv).
# ---------------------------------------------------------------------------


def _lazy_shoup(ctx: MontCtx, w, w_shoup, x):
    """w*x mod p in [0, 2p), any uint32 x (no trailing conditional subtract)."""
    q = u64.mul_hi(w_shoup, x)
    return w * x - q * np.uint32(ctx.p)


def _csub(x, m: int):
    """x - m if x >= m else x (uint32 arrays, static m)."""
    mm = np.uint32(m)
    return x - jnp.where(x >= mm, mm, np.uint32(0))


def _fwd_stages_lazy(ctx: MontCtx, n: int, x, w):
    """All forward butterfly stages, lazy form: x uint32 [..., N] in [0, 2p)
    -> fully reduced [0, p). w: [2, logn, N] (plain, shoup) planes."""
    logn = n.bit_length() - 1
    two_p = 2 * ctx.p
    lane = jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 1)
    for s in range(logn):
        if s:
            x = _csub(x, two_p)            # [0, 4p) -> [0, 2p)
        t = n >> (s + 1)
        is_lo = (lane & np.uint32(t)) == 0
        xs = jnp.where(is_lo, _roll_lanes(x, -t), _roll_lanes(x, t))
        prod = _lazy_shoup(ctx, w[0, s, :], w[1, s, :], jnp.where(is_lo, xs, x))
        x = jnp.where(is_lo, x + prod, xs + np.uint32(two_p) - prod)
    return _csub(_csub(x, two_p), ctx.p)


def _inv_stages_lazy(ctx: MontCtx, n: int, n_inv_scale, x, w):
    """All inverse butterfly stages + N^{-1} scaling, lazy form: x uint32
    [..., N] in [0, 2p) -> fully reduced [0, p)."""
    logn = n.bit_length() - 1
    two_p = 2 * ctx.p
    lane = jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 1)
    for s in range(logn):
        if s:
            x = _csub(x, two_p)
        t = 1 << s
        is_lo = (lane & np.uint32(t)) == 0
        xs = jnp.where(is_lo, _roll_lanes(x, -t), _roll_lanes(x, t))
        x = jnp.where(
            is_lo,
            x + xs,
            _lazy_shoup(ctx, w[0, s, :], w[1, s, :], xs + np.uint32(two_p) - x),
        )
    x = _csub(x, two_p)
    return ctx.shoup_mul(np.uint32(n_inv_scale[0]), np.uint32(n_inv_scale[1]), x)


def _fwd_all_kernel(ring, num: int, n: int, x_ref, w_ref, o_ref):
    """int32 centered block -> all ``num`` CRT NTT images, one HBM read."""
    xi = x_ref[...]
    for i in range(num):
        ctx = ring.mont[i]
        xr = ctx.reduce_i32_centered(xi)       # [0, p) c [0, 2p)
        o_ref[i] = _fwd_stages_lazy(ctx, n, xr, w_ref[i])


def _inv_all_kernel(ring, num: int, n: int, x_ref, w_ref, o_ref):
    """All per-prime inverse NTTs + Garner CRT to centered int32 in VMEM."""
    ys = []
    for i in range(num):
        ctx = ring.mont[i]
        tbl = ring._tables[i]
        ys.append(_inv_stages_lazy(ctx, n, tbl[2], x_ref[i], w_ref[i]))
    o_ref[...] = ring._crt_to_centered(ys)


def _stacked_tables(ring, num: int, fwd: bool):
    idx = 3 if fwd else 4
    return jnp.stack([jnp.asarray(ring._tables[i][idx]) for i in range(num)], 0)


def fwd_all_pallas(ring, x, num: int, interpret: bool = False):
    """Centered int32 [..., N] -> plain NTT domain uint32 [num, ..., N],
    all primes fused in one kernel (single HBM read of x)."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    x2d = x.reshape((-1, n))
    rows = x2d.shape[0]
    tile = _tile_for(n, rows)
    pad_rows = (-rows) % tile
    if pad_rows:
        x2d = jnp.pad(x2d, ((0, pad_rows), (0, 0)))
    w = _stacked_tables(ring, num, fwd=True)
    logn = n.bit_length() - 1
    out = pl.pallas_call(
        functools.partial(_fwd_all_kernel, ring, num, n),
        grid=(pl.cdiv(x2d.shape[0], tile),),
        in_specs=[
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num, 2, logn, n), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (num, tile, n), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num, x2d.shape[0], n), jnp.uint32),
        interpret=interpret,
    )(x2d, w)
    return out[:, :rows].reshape((num,) + lead + (n,))


def inv_all_pallas(ring, xhat, interpret: bool = False):
    """Plain NTT domain uint32 [num, ..., N] -> centered int32 [..., N]:
    per-prime INTTs + Garner CRT + centered mod-q fold in one kernel."""
    num = xhat.shape[0]
    n = xhat.shape[-1]
    lead = xhat.shape[1:-1]
    x2d = xhat.reshape((num, -1, n))
    rows = x2d.shape[1]
    tile = _tile_for(n, rows)
    pad_rows = (-rows) % tile
    if pad_rows:
        x2d = jnp.pad(x2d, ((0, 0), (0, pad_rows), (0, 0)))
    w = _stacked_tables(ring, num, fwd=False)
    logn = n.bit_length() - 1
    out = pl.pallas_call(
        functools.partial(_inv_all_kernel, ring, num, n),
        grid=(pl.cdiv(x2d.shape[1], tile),),
        in_specs=[
            pl.BlockSpec(
                (num, tile, n), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (num, 2, logn, n), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2d.shape[1], n), jnp.int32),
        interpret=interpret,
    )(x2d, w)
    return out[:rows].reshape(lead + (n,))


def _scalar_mul_add_kernel(
    ring, num: int, n: int, d_ref, m_ref, t_ref, w_ref, wi_ref, o_ref
):
    """out = t + d * m  (mod q, centered) for ONE row of m per grid step:
    per-prime forward NTTs of the scalar d and the row, pointwise Montgomery
    products, inverse NTTs, Garner CRT, and the centered mod-q add of t --
    one HBM read per operand, one write, zero intermediate round-trips.
    The grid's second axis walks the rows of m (d's transform is recomputed
    per row: ~1/(num+1) of the work, the price of keeping the VMEM
    footprint at a full-size batch tile).

    d: [tile, N]; m, t blocks: [tile, 1, N] int32 centered. Exactness
    contract is the caller's (same as RingContext.polymul): the CRT subset
    ``num`` must cover the integer product bound of d*m.
    """
    d = d_ref[...]
    imgs = []
    for i in range(num):
        ctx = ring.mont[i]
        dr = ctx.reduce_i32_centered(d)
        dhat = _fwd_stages_lazy(ctx, n, dr, w_ref[i])
        dhat_m = ctx.to_mont(dhat)  # const form: product lands in plain form
        mr = ctx.reduce_i32_centered(m_ref[0])
        mhat = _fwd_stages_lazy(ctx, n, mr, w_ref[i])
        prod = ctx.mont_mul(dhat_m, mhat)
        imgs.append(_inv_stages_lazy(ctx, n, ring._tables[i][2], prod, wi_ref[i]))
    qc = ring.qctx
    qq = np.uint32(ring.q)
    dm = ring._crt_to_centered(imgs)  # centered int32
    t = t_ref[0]
    ua = jax.lax.bitcast_convert_type(dm, jnp.uint32) + jnp.where(
        dm < 0, qq, np.uint32(0)
    )
    ub = jax.lax.bitcast_convert_type(t, jnp.uint32) + jnp.where(
        t < 0, qq, np.uint32(0)
    )
    o_ref[0] = ring.to_centered(qc.add(ua, ub))


def scalar_mul_add_pallas(ring, d, m, t, num: int, interpret: bool = False):
    """Fused ``t + d * m`` over the ring (centered int32), Pallas.

    d: [..., N]; m, t: [..., rows, N] with the same batch prefix. Replaces
    inv(scalar_mul_hat(fwd_const(d), fwd(m))) + add_centered -- the hot
    pair in create_response (z = y + d*r) and verify (t + c1*d) -- with a
    single kernel launch (measured: the unfused chain is 6 kernel
    dispatches + 4 HBM round-trips of the [B, rows, N] working set).
    """
    n = d.shape[-1]
    assert m.shape[-1] == n and m.shape[:-2] == d.shape[:-1], (d.shape, m.shape)
    assert t.shape == m.shape, (t.shape, m.shape)
    rows = m.shape[-2]
    lead = d.shape[:-1]
    d2 = d.reshape((-1, n))
    # rows axis leads (a grid dimension): blocks are [1, tile, N], keeping
    # the TPU-required (8, 128)-divisible trailing dims at full tile size
    m3 = jnp.moveaxis(m.reshape((-1, rows, n)), 1, 0)
    t3 = jnp.moveaxis(t.reshape((-1, rows, n)), 1, 0)
    b = d2.shape[0]
    tile = _tile_for(n, b)
    pad_rows = (-b) % tile
    if pad_rows:
        d2 = jnp.pad(d2, ((0, pad_rows), (0, 0)))
        m3 = jnp.pad(m3, ((0, 0), (0, pad_rows), (0, 0)))
        t3 = jnp.pad(t3, ((0, 0), (0, pad_rows), (0, 0)))
    w = _stacked_tables(ring, num, fwd=True)
    wi = _stacked_tables(ring, num, fwd=False)
    logn = n.bit_length() - 1
    out = pl.pallas_call(
        functools.partial(_scalar_mul_add_kernel, ring, num, n),
        grid=(pl.cdiv(d2.shape[0], tile), rows),
        in_specs=[
            pl.BlockSpec((tile, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile, n), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile, n), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (num, 2, logn, n), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (num, 2, logn, n), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, n), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, d2.shape[0], n), jnp.int32),
        interpret=interpret,
    )(d2, m3, t3, w, wi)
    return jnp.moveaxis(out[:, :b], 0, 1).reshape(lead + (rows, n))


def _scalar_mul_add_kernel_v2(
    ring, num: int, n: int, rows: int, d_ref, m_ref, t_ref, w_ref, wi_ref, o_ref
):
    """v2 of the fused ``t + d*m`` kernel: ALL rows of m live in the block
    and the scalar's forward transform is computed once per prime per tile
    (v1 walked rows on a grid axis and re-transformed d for each -- the
    measured reason it lost to the composed chain). Transform count now
    matches the composed chain exactly -- num*(rows+1) forwards +
    num*rows inverses -- while keeping its advantage: one kernel launch,
    no [P, B, rows, N] intermediates in HBM.

    d: [tile, N]; m, t, o blocks: [tile, rows, N] int32 centered.
    """
    d = d_ref[...]
    qc = ring.qctx
    qq = np.uint32(ring.q)
    dh = []
    for i in range(num):
        ctx = ring.mont[i]
        dr = ctx.reduce_i32_centered(d)
        dh.append(ctx.to_mont(_fwd_stages_lazy(ctx, n, dr, w_ref[i])))
    for r in range(rows):
        imgs = []
        for i in range(num):
            ctx = ring.mont[i]
            mr = ctx.reduce_i32_centered(m_ref[:, r])
            mhat = _fwd_stages_lazy(ctx, n, mr, w_ref[i])
            imgs.append(
                _inv_stages_lazy(
                    ctx, n, ring._tables[i][2], ctx.mont_mul(dh[i], mhat),
                    wi_ref[i],
                )
            )
        dm = ring._crt_to_centered(imgs)
        t = t_ref[:, r]
        ua = jax.lax.bitcast_convert_type(dm, jnp.uint32) + jnp.where(
            dm < 0, qq, np.uint32(0)
        )
        ub = jax.lax.bitcast_convert_type(t, jnp.uint32) + jnp.where(
            t < 0, qq, np.uint32(0)
        )
        o_ref[:, r] = ring.to_centered(qc.add(ua, ub))


def scalar_mul_add_pallas_v2(ring, d, m, t, num: int, interpret: bool = False):
    """Fused ``t + d * m`` with rows in-block (see _scalar_mul_add_kernel_v2).

    Same contract as scalar_mul_add_pallas; natural [B, rows, N] layout
    (no moveaxis), batch tile shrunk by the rows multiplier to respect the
    VMEM budget.
    """
    n = d.shape[-1]
    assert m.shape[-1] == n and m.shape[:-2] == d.shape[:-1], (d.shape, m.shape)
    assert t.shape == m.shape, (t.shape, m.shape)
    rows = m.shape[-2]
    lead = d.shape[:-1]
    d2 = d.reshape((-1, n))
    m3 = m.reshape((-1, rows, n))
    t3 = t.reshape((-1, rows, n))
    b = d2.shape[0]
    # Mosaic stack-allocates the stage intermediates of all num*(rows+1)
    # transform chains at once; measured scoped-vmem at N=512 tile=128
    # rows=1 num=2 was 18.7 MB, so halve beyond the per-plane estimate.
    tile = max(8, _tile_for(n, b) // (2 * (rows + 1)))
    tile = min(tile, b)
    pad_rows = (-b) % tile
    if pad_rows:
        d2 = jnp.pad(d2, ((0, pad_rows), (0, 0)))
        m3 = jnp.pad(m3, ((0, pad_rows), (0, 0), (0, 0)))
        t3 = jnp.pad(t3, ((0, pad_rows), (0, 0), (0, 0)))
    w = _stacked_tables(ring, num, fwd=True)
    wi = _stacked_tables(ring, num, fwd=False)
    logn = n.bit_length() - 1
    out = pl.pallas_call(
        functools.partial(_scalar_mul_add_kernel_v2, ring, num, n, rows),
        grid=(pl.cdiv(d2.shape[0], tile),),
        in_specs=[
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile, rows, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, rows, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (num, 2, logn, n), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (num, 2, logn, n), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile, rows, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d2.shape[0], rows, n), jnp.int32),
        interpret=interpret,
    )(d2, m3, t3, w, wi)
    return out[:b].reshape(lead + (rows, n))


def _call(kernel, x2d, w, n, interpret):
    b = x2d.shape[0]
    tile = _tile_for(n, b)
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
    pad = _tile_for(n, x2d.shape[0])
    pad_rows = (-x2d.shape[0]) % pad
    if pad_rows:
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
    pad = _tile_for(n, x2d.shape[0])
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


# ---------------------------------------------------------------------------
# Wide-ring (modulus >= 2^32) fused kernels.
#
# The per-prime butterflies are IDENTICAL to the narrow kernels (uint32
# Shoup/Harvey lanes); only the ring boundary differs: centered residues are
# int64, which Mosaic handles poorly -- so the int64 <-> uint32-limb bitcasts
# stay OUTSIDE the kernel (plain XLA elementwise) and the kernels speak pure
# uint32: the forward takes (lo, hi-signed) limb planes and folds them into
# each prime's residue in VMEM; the inverse runs the per-prime INTTs plus the
# ops/mont64 Garner limb-pair fold (RingContext._crt_to_pair) and emits the
# [0, q) (lo, hi) planes. Bit-identical to the XLA wide path
# (tests/test_bigmod.py).
# ---------------------------------------------------------------------------


def _fwd_stages_strict(ctx: MontCtx, n: int, x, w):
    """Forward stages with per-stage full reduction: x uint32 [..., N] in
    [0, p) -> [0, p). Needed for primes with 4p >= 2^32 (the EXT_PRIMES
    above 2^30 that wide rings pull in) where the Harvey lazy form's
    [0, 4p) working range no longer fits uint32. Same algebra as
    ops/ntt._fwd_one."""
    logn = n.bit_length() - 1
    lane = jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 1)
    for s in range(logn):
        t = n >> (s + 1)
        is_lo = (lane & np.uint32(t)) == 0
        xs = jnp.where(is_lo, _roll_lanes(x, -t), _roll_lanes(x, t))
        prod = ctx.shoup_mul(w[0, s, :], w[1, s, :], jnp.where(is_lo, xs, x))
        x = jnp.where(is_lo, ctx.add(x, prod), ctx.sub(xs, prod))
    return x


def _inv_stages_strict(ctx: MontCtx, n: int, n_inv_scale, x, w):
    """Inverse stages + N^{-1} scaling, strict form (see
    _fwd_stages_strict): x uint32 [..., N] in [0, p) -> [0, p)."""
    logn = n.bit_length() - 1
    lane = jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 1)
    for s in range(logn):
        t = 1 << s
        is_lo = (lane & np.uint32(t)) == 0
        xs = jnp.where(is_lo, _roll_lanes(x, -t), _roll_lanes(x, t))
        x = jnp.where(
            is_lo,
            ctx.add(x, xs),
            ctx.shoup_mul(w[0, s, :], w[1, s, :], ctx.sub(xs, x)),
        )
    return ctx.shoup_mul(np.uint32(n_inv_scale[0]), np.uint32(n_inv_scale[1]), x)


def _fwd_stages(ctx: MontCtx, n: int, x, w):
    """Lazy Harvey stages when 4p fits uint32 (every base prime), strict
    per-stage reduction otherwise. Input [0, p) valid for both."""
    if 4 * ctx.p < 2**32:
        return _fwd_stages_lazy(ctx, n, x, w)
    return _fwd_stages_strict(ctx, n, x, w)


def _inv_stages(ctx: MontCtx, n: int, n_inv_scale, x, w):
    if 4 * ctx.p < 2**32:
        return _inv_stages_lazy(ctx, n, n_inv_scale, x, w)
    return _inv_stages_strict(ctx, n, n_inv_scale, x, w)


# index-map constant pinned to int32: under jax x64 a bare Python 0 in a
# BlockSpec index map traces as i64 and Mosaic rejects the index
# function's (i32, i64) return signature
_I0 = np.int32(0)


def _tile_for_wide(n: int, rows: int, num: int) -> int:
    """Wide rings carry ``num`` prime planes (up to 8 vs the narrow 3):
    scale the narrow VMEM-budget tile down by the extra planes."""
    budget = max(8, (TILE_B * 512 * 3) // (max(n, 512) * max(num, 3)))
    return max(1, min(TILE_B, rows, budget))


def _fwd_wide_kernel(ring, num: int, n: int, lo_ref, hi_ref, w_ref, o_ref):
    """(lo uint32, hi int32) limb blocks -> all ``num`` CRT NTT images.
    Per prime: x mod p = lo mod p + (hi signed) * (2^32 mod p) -- the same
    limb-wise reduction as RingContext._fwd_wide, fused with the stages."""
    lo = lo_ref[...]
    hi = hi_ref[...]
    for i in range(num):
        ctx = ring.mont[i]
        shift = jnp.uint32(ctx.h_to_mont((1 << 32) % ctx.p))
        xi = ctx.add(
            ctx.reduce_u32(lo),
            ctx.mont_mul(ctx.reduce_i32_centered(hi), shift),
        )
        o_ref[i] = _fwd_stages(ctx, n, xi, w_ref[i])


def _inv_wide_kernel(ring, num: int, n: int, x_ref, w_ref, lo_ref, hi_ref):
    """All per-prime inverse NTTs + the Garner limb-pair CRT in VMEM; the
    final int64 bitcast happens outside (inv_wide_all_pallas)."""
    ys = []
    for i in range(num):
        ctx = ring.mont[i]
        tbl = ring._tables[i]
        ys.append(_inv_stages(ctx, n, tbl[2], x_ref[i], w_ref[i]))
    lo, hi = ring._crt_to_pair(ys)
    lo_ref[...] = lo
    hi_ref[...] = hi


def fwd_wide_all_pallas(ring, x, num: int, interpret: bool = False):
    """Centered int64 [..., N] -> plain NTT domain uint32 [num, ..., N]."""
    from ..mont64 import Mont64Ctx

    n = x.shape[-1]
    lead = x.shape[:-1]
    lo, hi = Mont64Ctx.split_i64(jnp.asarray(x, jnp.int64))
    lo2 = lo.reshape((-1, n))
    hi2 = hi.reshape((-1, n))
    rows = lo2.shape[0]
    tile = _tile_for_wide(n, rows, num)
    pad_rows = (-rows) % tile
    if pad_rows:
        lo2 = jnp.pad(lo2, ((0, pad_rows), (0, 0)))
        hi2 = jnp.pad(hi2, ((0, pad_rows), (0, 0)))
    w = _stacked_tables(ring, num, fwd=True)
    logn = n.bit_length() - 1
    out = pl.pallas_call(
        functools.partial(_fwd_wide_kernel, ring, num, n),
        grid=(pl.cdiv(lo2.shape[0], tile),),
        in_specs=[
            pl.BlockSpec((tile, n), lambda i: (i, _I0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, _I0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num, 2, logn, n), lambda i: (_I0, _I0, _I0, _I0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (num, tile, n), lambda i: (_I0, i, _I0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num, lo2.shape[0], n), jnp.uint32),
        interpret=interpret,
    )(lo2, hi2, w)
    return out[:, :rows].reshape((num,) + lead + (n,))


def inv_wide_all_pallas(ring, xhat, interpret: bool = False):
    """Plain NTT domain uint32 [num, ..., N] -> centered int64 [..., N]."""
    num = xhat.shape[0]
    n = xhat.shape[-1]
    lead = xhat.shape[1:-1]
    x2d = xhat.reshape((num, -1, n))
    rows = x2d.shape[1]
    tile = _tile_for_wide(n, rows, num)
    pad_rows = (-rows) % tile
    if pad_rows:
        x2d = jnp.pad(x2d, ((0, 0), (0, pad_rows), (0, 0)))
    w = _stacked_tables(ring, num, fwd=False)
    logn = n.bit_length() - 1
    lo, hi = pl.pallas_call(
        functools.partial(_inv_wide_kernel, ring, num, n),
        grid=(pl.cdiv(x2d.shape[1], tile),),
        in_specs=[
            pl.BlockSpec(
                (num, tile, n), lambda i: (_I0, i, _I0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (num, 2, logn, n), lambda i: (_I0, _I0, _I0, _I0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((tile, n), lambda i: (i, _I0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, _I0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x2d.shape[1], n), jnp.uint32),
            jax.ShapeDtypeStruct((x2d.shape[1], n), jnp.uint32),
        ),
        interpret=interpret,
    )(x2d, w)
    out = ring.qctx.to_centered_i64(lo[:rows], hi[:rows])
    return out.reshape(lead + (n,))
