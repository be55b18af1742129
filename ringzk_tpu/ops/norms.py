"""Exact integer norms for polynomials of centered int32 residues.

Reference semantics (/root/reference/src/polynomial.rs:49-87): norms are
computed on the *centered representative* coefficients with arbitrary
precision (BigInt squares, BigUint integer sqrt). We never materialize the
square root: the reference only ever compares ``norm_2(p) <= B`` for an
integer bound B (/root/reference/src/params.rs:102-118), and

    isqrt(S) <= B  <=>  S <= B^2 + 2B

so we compare the exact 64-bit sum of squares against a precomputed 64-bit
bound instead -- integer-exact, float-free, and a single vectorized reduce.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import u64


def norm2_squared(x, axis=-1):
    """Exact sum of squared coefficients as a (hi, mid, lo) uint32 triple."""
    return u64.sum_squares(x, axis=axis)


def norm2_leq(x, bound: int, axis=-1):
    """Boolean array: integer-sqrt(sum x^2) <= bound, exactly.

    ``bound`` is a Python int (static). Matches BigUint isqrt comparison.

    int64 inputs (wide rings, modulus >= 2^32) are handled by the
    necessary-condition reduction: norm_2 >= max|coeff|, so any row with a
    coefficient beyond ``bound`` rejects outright, and the survivors'
    coefficients fit int32 exactly (bound < 2^31 is asserted -- every
    sane parameter set's 4*sigma*sqrt(N) is far below it), where the
    96-bit-accumulated exact compare applies unchanged. Adversarial
    full-range int64 coefficients therefore cannot wrap anything.
    """
    limit = bound * bound + 2 * bound        # isqrt(S) <= B  <=>  S <= B^2+2B
    assert limit < 2**96
    x = jnp.asarray(x)
    if x.dtype == jnp.int64:
        if bound >= 2**31:
            raise ValueError(
                f"wide-ring norm bound {bound} >= 2^31: the exact int32 "
                "norm path cannot apply (check Params b/kappa vs N)"
            )
        coeff_ok = jnp.all(jnp.abs(x) <= bound, axis=axis)
        x = jnp.clip(x, -bound, bound).astype(jnp.int32)
    else:
        coeff_ok = True
    l2 = jnp.uint32(limit >> 64)
    l1 = jnp.uint32((limit >> 32) & 0xFFFFFFFF)
    l0 = jnp.uint32(limit & 0xFFFFFFFF)
    s2, s1, s0 = norm2_squared(x, axis=axis)
    return coeff_ok & u64.le96(s2, s1, s0, l2, l1, l0)


def norm1(x, axis=-1):
    """Exact L1 norm (sum |c_i|) as a (hi, lo) uint32 pair."""
    ax = jnp.moveaxis(jnp.abs(jnp.asarray(x, jnp.int32)).astype(jnp.uint32), axis, -1)
    zero = jnp.zeros_like(ax)
    return u64.sum64(*_pad_pot(zero, ax), axis=-1)


def _pad_pot(hi, lo):
    n = hi.shape[-1]
    pot = 1
    while pot < n:
        pot *= 2
    if pot != n:
        pad = [(0, 0)] * (hi.ndim - 1) + [(0, pot - n)]
        hi = jnp.pad(hi, pad)
        lo = jnp.pad(lo, pad)
    return hi, lo


def norm_inf(x, axis=-1):
    """Max |c_i| (exact in int32 domain)."""
    return jnp.max(jnp.abs(jnp.asarray(x, jnp.int32)), axis=axis)
