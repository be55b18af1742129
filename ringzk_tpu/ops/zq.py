"""Centered mod-q scalar arithmetic on int32 arrays.

External representation of ring elements matches the reference's
``ZqI64<Q>`` centered residues in [-(q-1)/2, (q-1)/2]
(/root/reference/src/params.rs:121-127): int32 arrays. Since q ~ 2^31.7,
centered sums overflow int32, so add/sub round-trip through the unsigned
[0, q) domain with wrap-aware uint32 ops (see ops.montgomery.MontCtx).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .montgomery import MontCtx


def to_unsigned(ctx: MontCtx, a):
    """Centered int32 (|a| <= q/2) -> uint32 in [0, q)."""
    ai = jnp.asarray(a, jnp.int32)
    u = jax.lax.bitcast_convert_type(ai, jnp.uint32)
    # a < 0: true residue a + q = u - (2^32 - q) in uint32 wrap space
    return jnp.where(ai < 0, u - jnp.uint32((2**32 - ctx.p) % 2**32), u)


def to_centered(ctx: MontCtx, u):
    """uint32 in [0, q) -> centered int32."""
    wrap = u > jnp.uint32(ctx.p // 2)
    return jax.lax.bitcast_convert_type(
        u - jnp.where(wrap, jnp.uint32(ctx.p), jnp.uint32(0)), jnp.int32
    )


def add_centered(ctx, a, b):
    """(a + b) mod q on centered operands, result centered. ctx is a
    MontCtx (int32 residues) or an ops.mont64.Mont64Ctx (int64 residues,
    wide rings q >= 2^32) -- dispatched on ctx.is64."""
    if getattr(ctx, "is64", False):
        return ctx.add_centered_i64(a, b)
    return to_centered(ctx, ctx.add(to_unsigned(ctx, a), to_unsigned(ctx, b)))


def sub_centered(ctx, a, b):
    if getattr(ctx, "is64", False):
        return ctx.sub_centered_i64(a, b)
    return to_centered(ctx, ctx.sub(to_unsigned(ctx, a), to_unsigned(ctx, b)))


def neg_centered(ctx: MontCtx, a):
    return to_centered(ctx, ctx.neg(to_unsigned(ctx, a)))


def reduce_centered(ctx: MontCtx, a):
    """Reduce arbitrary int32 values to centered mod-q representatives."""
    return to_centered(ctx, ctx.reduce_i32_centered(a))
