"""Pallas fused NTT kernel must match the XLA roll-based path bit-for-bit
(interpret mode on CPU; the compiled kernel is exercised on TPU by the
bench/micro-bench scripts)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ringzk_tpu.ops import ntt
from ringzk_tpu.ops.pallas import ntt_kernel

Q = 3_515_337_053


@pytest.mark.parametrize("n", [128, 512])
def test_pallas_fwd_matches_xla(rng, n):
    ring = ntt.get_ring(n, Q)
    x = rng.integers(-(Q // 2), Q // 2 + 1, size=(5, n))
    for i in range(ntt.NUM_PRIMES):
        ctx = ring.mont[i]
        w_fwd = jnp.asarray(ring._tables[i][3])
        xi = ctx.reduce_i32_centered(jnp.asarray(x, jnp.int32))
        want = np.asarray(ntt._fwd_one(ctx, w_fwd, xi))
        got = np.asarray(ntt_kernel.fwd_one_pallas(ctx, w_fwd, xi, interpret=True))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [128, 512])
def test_pallas_inv_matches_xla(rng, n):
    ring = ntt.get_ring(n, Q)
    x = rng.integers(-(Q // 2), Q // 2 + 1, size=(5, n))
    for i in range(ntt.NUM_PRIMES):
        ctx = ring.mont[i]
        _, _, n_inv_scale, w_fwd, w_inv = ring._tables[i]
        xi = ctx.reduce_i32_centered(jnp.asarray(x, jnp.int32))
        xh = ntt._fwd_one(ctx, jnp.asarray(w_fwd), xi)
        want = np.asarray(ntt._inv_one(ctx, jnp.asarray(w_inv), n_inv_scale, xh))
        got = np.asarray(
            ntt_kernel.inv_one_pallas(ctx, jnp.asarray(w_inv), n_inv_scale, xh,
                                      interpret=True)
        )
        np.testing.assert_array_equal(got, want)


def test_pallas_nondivisible_batch(rng):
    n = 128
    ring = ntt.get_ring(n, Q)
    ctx = ring.mont[0]
    w_fwd = jnp.asarray(ring._tables[0][3])
    x = rng.integers(-(Q // 2), Q // 2 + 1, size=(3, 7, n))
    xi = ctx.reduce_i32_centered(jnp.asarray(x, jnp.int32))
    want = np.asarray(ntt._fwd_one(ctx, w_fwd, xi))
    got = np.asarray(ntt_kernel.fwd_one_pallas(ctx, w_fwd, xi, interpret=True))
    np.testing.assert_array_equal(got, want)
