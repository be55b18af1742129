"""Four-step MXU NTT (ops/ntt_mxu.py) must match the stage-chain transforms
bit-for-bit: same values, same bit-reversed storage order, every prime,
forward and inverse, plus a full polymul round trip through the RingContext
dispatch (RINGZK_NTT=mxu)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ringzk_tpu.ops import ntt, ntt_mxu
from ringzk_tpu.ops.ntt import negacyclic_schoolbook

Q = 3_515_337_053


@pytest.mark.parametrize("n", [128, 512, 1024])
def test_mxu_fwd_matches_stage_chain(rng, n):
    ring = ntt.get_ring(n, Q)
    x = jnp.asarray(rng.integers(-(Q // 2), Q // 2 + 1, size=(5, n)), jnp.int32)
    for i in range(ntt.NUM_PRIMES):
        ctx = ring.mont[i]
        xi = ctx.reduce_i32_centered(x)
        want = np.asarray(ntt._fwd_one(ctx, jnp.asarray(ring._tables[i][3]), xi))
        got = np.asarray(ntt_mxu.fwd_one_mxu(ring, i, x))
        np.testing.assert_array_equal(got, want)
        got = np.asarray(ntt_mxu.fwd_one_dense(ring, i, x))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [128, 512])
def test_mxu_inv_matches_stage_chain(rng, n):
    ring = ntt.get_ring(n, Q)
    for i in range(ntt.NUM_PRIMES):
        ctx = ring.mont[i]
        p = ctx.p
        xh = jnp.asarray(
            rng.integers(0, p, size=(4, n)).astype(np.int64), jnp.uint32
        )
        n_inv_scale, w_inv = ring._tables[i][2], ring._tables[i][4]
        want = np.asarray(ntt._inv_one(ctx, jnp.asarray(w_inv), n_inv_scale, xh))
        got = np.asarray(ntt_mxu.inv_one_mxu(ring, i, xh))
        np.testing.assert_array_equal(got, want)
        got = np.asarray(ntt_mxu.inv_one_dense(ring, i, xh))
        np.testing.assert_array_equal(got, want)


def test_mxu_polymul_roundtrip(rng):
    """End-to-end exact ring product through the RINGZK_NTT=mxu dispatch."""
    n = 128
    ring = ntt.get_ring(n, Q)
    a = rng.integers(-(Q // 2), Q // 2 + 1, size=(3, n))
    b = rng.integers(-(Q // 2), Q // 2 + 1, size=(3, n))
    want = negacyclic_schoolbook(a, b, Q)
    os.environ["RINGZK_NTT"] = "mxu"
    try:
        got = np.asarray(
            ring.polymul(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32))
        )
    finally:
        del os.environ["RINGZK_NTT"]
    np.testing.assert_array_equal(got, np.asarray(want, np.int64))
