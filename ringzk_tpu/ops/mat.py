"""Matrices of ring elements as dense arrays: [..., rows, cols, N] int32.

TPU-native replacement for the reference's clone-heavy `Mat<I, N>`
(/root/reference/src/mat.rs): a "matrix of polynomials" is just an array with
two structure axes before the ring axis, and every operation is a batched
array op. The hot `dot` (triple loop of schoolbook multiplies,
/root/reference/src/mat.rs:95-115) becomes an NTT-domain pointwise
multiply-accumulate; shape ops (extend/split/concat,
/root/reference/src/mat.rs:186-233) become jnp.concatenate / slicing.

Divergence (intentional, documented in SURVEY.md section 2.1): the reference's
`split_rows(r)` returns the *last* r rows as the second element, so its
`c1_c2` only labels c1/c2 correctly when n == l. Here `split_rows(x, r)`
returns (first r rows, remaining rows) -- the correct split for all n, l.

NTT-domain forms carry a leading prime axis: [P, ..., rows, cols, N] uint32.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import zq
from .ntt import RingContext


def matvec_hat(ring: RingContext, a_hat, v_hat):
    """NTT-domain (matrix . vector) over the ring.

    a_hat: [P, *A, rows, k, N] uint32; v_hat: [P, *B, k, N] uint32 with
    broadcast-compatible batch prefixes *A and *B. Returns [P, *, rows, N].
    The contraction length k must be <= RingContext.ACC_MAX for CRT
    exactness (k is 3..8 in practice).
    """
    k = a_hat.shape[-2]
    assert v_hat.shape[-2] == k, (a_hat.shape, v_hat.shape)
    assert k <= ring.ACC_MAX
    v_hat = v_hat[..., None, :, :]  # [P, *B, 1, k, N]
    out = ring.dot_hat(a_hat[..., :, 0, :], v_hat[..., :, 0, :])
    for t in range(1, k):
        out = ring.add_hat(out, ring.dot_hat(a_hat[..., :, t, :], v_hat[..., :, t, :]))
    return out  # [P, *, rows, N]


def scalar_mul_hat(ring: RingContext, g_hat, m_hat):
    """Componentwise multiply every entry of an NTT-domain stack by the
    polynomial g (the reference's `componentwise_mul`,
    /root/reference/src/mat.rs:168-178).

    g_hat: [P, *, N] const-form; m_hat: [P, *, rows, N] plain-form.
    g broadcasts over the rows axis; result is plain-form.
    """
    return ring.dot_hat(g_hat[..., None, :], m_hat)


def add_centered(ring: RingContext, a, b):
    """Elementwise ring addition on centered int32 arrays."""
    return zq.add_centered(ring.qctx, a, b)


def sub_centered(ring: RingContext, a, b):
    return zq.sub_centered(ring.qctx, a, b)


def split_rows(x, r: int):
    """(first r rows, remaining rows) along axis -2 (the rows axis of a
    column-stack [..., rows, N])."""
    return x[..., :r, :], x[..., r:, :]


def equal_mod_q_hat(ring: RingContext, a_hat, b_hat, struct_axes=1):
    """Ring equality of two plain-form NTT-domain stacks, via a single
    inverse transform of their difference: a == b in R_q iff
    inv(a_hat - b_hat) == 0 (inv reduces the exact integer difference mod q).
    Reduces over ``struct_axes`` structure axes plus the ring axis."""
    diff = ring.inv(ring.sub_hat(a_hat, b_hat))
    eq = diff == 0
    for _ in range(struct_axes + 1):
        eq = jnp.all(eq, axis=-1)
    return eq


def poly_equal(a, b, struct_axes=2):
    """Exact equality of centered poly stacks, reduced over the trailing
    ``struct_axes`` structure axes plus the ring axis."""
    eq = a == b
    for _ in range(struct_axes + 1):
        eq = jnp.all(eq, axis=-1)
    return eq
