"""64-bit unsigned integer emulation on 32-bit lanes.

TPUs have no native 64-bit integer datapath (JAX x64 is emulated and slow on
TPU), but exact lattice arithmetic mod q ~ 2^31.7 needs 64-bit intermediates.
This module represents a 64-bit unsigned value as a pair of uint32 arrays
``(hi, lo)`` and provides the handful of exact primitives everything else is
built from:

  * ``mul_wide(a, b)``      -- exact 32x32 -> 64 multiply via 16-bit halves
  * ``add64`` / ``add64_32``-- 64-bit addition with carry propagation
  * ``sum_squares``         -- exact sum of squares of int32 along an axis
                               (tree-folded 64-bit accumulation)
  * ``le64`` / ``lt64``     -- 64-bit comparisons

All functions are shape-polymorphic, jit-safe, and operate on uint32 arrays.
Reference parity: this subsumes the BigInt/BigUint norm arithmetic of the Rust
reference (``/root/reference/src/polynomial.rs:60-73``) with exact fixed-width
math instead of arbitrary precision (values are bounded by construction).
"""

from __future__ import annotations

import jax.numpy as jnp

_MASK16 = jnp.uint32(0xFFFF)


def mul_wide(a, b):
    """Exact widening multiply of two uint32 arrays.

    Returns ``(hi, lo)`` uint32 pair with ``a * b == hi * 2^32 + lo`` exactly.
    """
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    a_lo = a & _MASK16
    a_hi = a >> 16
    b_lo = b & _MASK16
    b_hi = b >> 16

    ll = a_lo * b_lo                    # < 2^32, exact
    lh = a_lo * b_hi                    # < 2^32, exact
    hl = a_hi * b_lo                    # < 2^32, exact
    hh = a_hi * b_hi                    # < 2^32, exact

    # mid = lh + hl may carry into bit 32.
    mid = lh + hl
    mid_carry = (mid < lh).astype(jnp.uint32)  # carry out of 32 bits

    lo = ll + (mid << 16)
    lo_carry = (lo < ll).astype(jnp.uint32)

    hi = hh + (mid >> 16) + (mid_carry << 16) + lo_carry
    return hi, lo


def add64(a_hi, a_lo, b_hi, b_lo):
    """(a_hi:a_lo) + (b_hi:b_lo) mod 2^64, as a uint32 pair."""
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(jnp.uint32)
    hi = a_hi + b_hi + carry
    return hi, lo


def add64_32(a_hi, a_lo, b):
    """64-bit + 32-bit addition."""
    lo = a_lo + b
    carry = (lo < a_lo).astype(jnp.uint32)
    return a_hi + carry, lo


def lt64(a_hi, a_lo, b_hi, b_lo):
    """a < b for 64-bit pairs (boolean array)."""
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))


def le64(a_hi, a_lo, b_hi, b_lo):
    """a <= b for 64-bit pairs (boolean array)."""
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo <= b_lo))


def sum64(hi, lo, axis=-1):
    """Exact 64-bit sum of uint32 pairs along ``axis`` via log-tree folding.

    The input axis length must be a power of two (pad with zeros otherwise).
    """
    hi = jnp.moveaxis(hi, axis, -1)
    lo = jnp.moveaxis(lo, axis, -1)
    n = hi.shape[-1]
    if n & (n - 1):
        raise ValueError(f"sum64 axis length {n} must be a power of two")
    while n > 1:
        n //= 2
        hi, lo = add64(hi[..., :n], lo[..., :n], hi[..., n:], lo[..., n:])
    return hi[..., 0], lo[..., 0]


def sum_squares(x, axis=-1):
    """Exact sum of x_i^2 along ``axis`` for int32 ``x``, as a 64-bit pair.

    Bound: with |x_i| <= 2^31 and axis length <= 2^16, the sum fits 64 bits.
    Used for the exact L2-norm constraint checks (the reference's
    ``norm_2`` at /root/reference/src/polynomial.rs:60-73 compares an integer
    sqrt; we compare squared sums exactly instead -- see ops.norms).
    """
    x = x.astype(jnp.int32)
    ax = jnp.abs(x).astype(jnp.uint32)  # abs of INT32_MIN wraps correctly
    hi, lo = mul_wide(ax, ax)
    # pad to power of two along the reduction axis
    hi = jnp.moveaxis(hi, axis, -1)
    lo = jnp.moveaxis(lo, axis, -1)
    n = hi.shape[-1]
    pot = 1
    while pot < n:
        pot *= 2
    if pot != n:
        pad = [(0, 0)] * (hi.ndim - 1) + [(0, pot - n)]
        hi = jnp.pad(hi, pad)
        lo = jnp.pad(lo, pad)
    return sum64(hi, lo, axis=-1)
