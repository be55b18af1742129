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


@pytest.mark.parametrize("n", [128, 512])
def test_dense_pallas_kernel_matches(rng, n):
    """The fused digitize/matmul/fold Pallas kernel (interpret mode) is
    bit-identical to the composed XLA dense path, forward and inverse,
    every prime -- including non-tile-multiple row counts (padding path)."""
    from ringzk_tpu.ops.pallas import ntt_dense_kernel

    ring = ntt.get_ring(n, Q)
    x = jnp.asarray(rng.integers(-(Q // 2), Q // 2 + 1, size=(5, n)), jnp.int32)
    for i in range(ntt.NUM_PRIMES):
        p = ring.mont[i].p
        t = ntt_mxu._tables_dense(p, ntt.GENERATORS[i], n)
        for m_key in ("mf", "mi"):
            table = {
                "din": t["din"], "dout": t["dout"],
                "m": jnp.asarray(t[m_key]), "shifts_mont": t["shifts_mont"],
            }
            if m_key == "mf":
                xin = x
            else:
                import jax as _jax

                xh = jnp.asarray(
                    rng.integers(0, p, size=(5, n)).astype(np.int64), jnp.uint32
                )
                xin = _jax.lax.bitcast_convert_type(xh, jnp.int32)
            want = np.asarray(ntt_mxu._dense_apply(ring.mont[i], table, xin, n))
            got = np.asarray(
                ntt_dense_kernel.dense_apply_pallas(
                    ring.mont[i], table, xin, n, interpret=True
                )
            )
            np.testing.assert_array_equal(got, want)


def test_fold_planes_wrap_safety():
    """Adversarially aligned digit planes whose paired combine would wrap
    int32 still fold exactly (the dense path's soundness fix): compare
    against exact Python integer arithmetic."""
    ring = ntt.get_ring(128, Q)
    ctx = ring.mont[0]
    p = ctx.p
    shifts = tuple(ctx.h_to_mont(pow(256, w, p)) for w in range(4))
    # plane values near the dense bound din*N*128^2 at N=512 (~2^25):
    # h0 + 256*h1 would be ~2^33 -> int32 wrap in the paired combine
    big = 4 * 512 * 128 * 128 - 3
    hw = jnp.asarray(
        np.array([[[big, -big, big - 1, 7]]] * 4, np.int32).reshape(1, 4, 4)
    )
    got = np.asarray(ntt_mxu._fold_planes(ctx, shifts, hw))
    vals = np.asarray(hw)[0]  # [4 planes, 4 lanes]
    for lane in range(4):
        expect = sum(int(vals[w, lane]) * pow(256, w, p) for w in range(4)) % p
        assert got[0, lane] == expect
