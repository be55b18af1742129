"""Tier-1 kernel unit tests: Montgomery arithmetic, u64 emulation, NTT
exactness vs the schoolbook golden model, norms, samplers.

Mirrors the reference's inline module tests (SURVEY.md section 4 tier 1):
exact golden values where the reference has them (norm values on [1,-2,3,-4],
sigma(N=1024) == 21780, challenge norm structure).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ringzk_tpu.ops import norms, ntt, sampling, u64, zq
from ringzk_tpu.ops.montgomery import MontCtx
from ringzk_tpu.params import Params

Q = 3_515_337_053


# -- u64 emulation -----------------------------------------------------------


def test_mul_wide_exact(rng):
    a = rng.integers(0, 2**32, size=1000, dtype=np.uint64)
    b = rng.integers(0, 2**32, size=1000, dtype=np.uint64)
    hi, lo = u64.mul_wide(jnp.asarray(a, jnp.uint32), jnp.asarray(b, jnp.uint32))
    want = a.astype(object) * b.astype(object)
    got = (np.asarray(hi).astype(object) << 32) + np.asarray(lo).astype(object)
    assert (got == want).all()


def test_sum_squares_exact(rng):
    x = rng.integers(-(2**31), 2**31, size=(7, 13), dtype=np.int64)
    hi, mid, lo = u64.sum_squares(jnp.asarray(x, jnp.int32), axis=-1)
    want = (x.astype(object) ** 2).sum(axis=-1)
    got = (
        (np.asarray(hi).astype(object) << 64)
        + (np.asarray(mid).astype(object) << 32)
        + np.asarray(lo).astype(object)
    )
    assert (got == want).all()


# -- Montgomery --------------------------------------------------------------


@pytest.mark.parametrize("p", list(ntt.PRIMES) + [Q])
def test_mont_mul_matches_python(p, rng):
    ctx = MontCtx.make(p)
    a = rng.integers(0, p, size=512, dtype=np.uint64)
    b = rng.integers(0, p, size=512, dtype=np.uint64)
    got = np.asarray(ctx.mul(jnp.asarray(a, jnp.uint32), jnp.asarray(b, jnp.uint32)))
    want = (a.astype(object) * b.astype(object)) % p
    assert (got.astype(object) == want).all()
    # add / sub
    gota = np.asarray(ctx.add(jnp.asarray(a, jnp.uint32), jnp.asarray(b, jnp.uint32)))
    assert (gota.astype(object) == (a.astype(object) + b) % p).all()
    gots = np.asarray(ctx.sub(jnp.asarray(a, jnp.uint32), jnp.asarray(b, jnp.uint32)))
    assert (gots.astype(object) == (a.astype(object) - b) % p).all()


def test_reduce_i32_centered(rng):
    ctx = MontCtx.make(ntt.PRIMES[0])
    x = rng.integers(-(2**31), 2**31, size=1000, dtype=np.int64)
    got = np.asarray(ctx.reduce_i32_centered(jnp.asarray(x, jnp.int32)))
    assert (got.astype(object) == x.astype(object) % ctx.p).all()


# -- NTT ---------------------------------------------------------------------


@pytest.mark.parametrize("n", [4, 16, 64, 512])
def test_polymul_exact_full_range(n, rng):
    ring = ntt.get_ring(n, Q)
    a = rng.integers(-(Q // 2), Q // 2 + 1, size=(3, n))
    b = rng.integers(-(Q // 2), Q // 2 + 1, size=(3, n))
    got = np.asarray(ring.polymul(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32)))
    want = ntt.negacyclic_schoolbook(a, b, Q)
    np.testing.assert_array_equal(got, want)


def test_fwd_inv_roundtrip_with_identity(rng):
    """inv(dot(fwd_const(1), fwd(x))) == x for the constant polynomial 1."""
    n = 32
    ring = ntt.get_ring(n, Q)
    one = np.zeros((n,), np.int64)
    one[0] = 1
    x = rng.integers(-(Q // 2), Q // 2 + 1, size=(5, n))
    got = np.asarray(
        ring.polymul(jnp.asarray(np.broadcast_to(one, (5, n)), jnp.int32),
                     jnp.asarray(x, jnp.int32))
    )
    np.testing.assert_array_equal(got, x)


def test_accumulation_exactness(rng):
    """k-term NTT-domain accumulation stays exact (depth-one rule)."""
    n, k = 64, 8
    ring = ntt.get_ring(n, Q)
    a = rng.integers(-(Q // 2), Q // 2 + 1, size=(k, n))
    b = rng.integers(-(Q // 2), Q // 2 + 1, size=(k, n))
    ah = ring.fwd_const(jnp.asarray(a, jnp.int32))
    bh = ring.fwd(jnp.asarray(b, jnp.int32))
    acc = ring.sum_hat(ring.dot_hat(ah, bh), axis=1)
    got = np.asarray(ring.inv(acc))
    want = ntt.negacyclic_schoolbook(a, b, Q)
    wsum = want.astype(object).sum(axis=0) % Q
    wsum = np.where(wsum > Q // 2, wsum - Q, wsum)
    np.testing.assert_array_equal(got.astype(object), wsum)


# -- norms (golden values from /root/reference/src/polynomial.rs:106-121) ----


def test_norm_golden_values():
    p = jnp.asarray([1, -2, 3, -4], jnp.int32)
    hi, lo = norms.norm1(p)
    assert int(hi) == 0 and int(lo) == 10
    s2, s1, s0 = norms.norm2_squared(p)
    assert int(s2) == 0 and int(s1) == 0 and int(s0) == 30  # isqrt(30) == 5
    assert bool(norms.norm2_leq(p, 5))
    assert not bool(norms.norm2_leq(p, 4))
    assert int(norms.norm_inf(p)) == 4


def test_sigma_golden_value():
    # /root/reference/src/params.rs:144-150
    assert Params().standard_deviation(1024) == 21780


# -- samplers ----------------------------------------------------------------


def test_uniform_bounds():
    x = sampling.uniform_centered(jax.random.PRNGKey(0), (100,), 64, 10)
    assert int(x.min()) >= -10 and int(x.max()) <= 10
    # full-range bound must not overflow
    y = sampling.uniform_centered(jax.random.PRNGKey(1), (10,), 64, Q // 2)
    assert int(jnp.abs(y).max()) <= Q // 2


def test_gaussian_3sigma():
    # /root/reference/src/polynomial.rs:124-132 checks |c| <= 3 sigma (99.7%)
    x = sampling.gaussian_rounded(jax.random.PRNGKey(0), (200,), 64, 10.0)
    frac = float(jnp.mean((jnp.abs(x) <= 30).astype(jnp.float32)))
    assert frac > 0.99


def test_challenge_structure():
    # /root/reference/src/challenge_space.rs:64-71: ||c||_1 = kappa, ||c||_inf = 1
    n, kappa = 256, 60
    c = sampling.challenge(jax.random.PRNGKey(0), (50,), n, kappa)
    assert int(jnp.max(jnp.abs(c))) == 1
    l1 = jnp.sum(jnp.abs(c), axis=-1)
    assert (np.asarray(l1) == kappa).all()


def test_challenge_difference_range():
    # /root/reference/src/challenge_space.rs:73-81: coeffs in [-2, 2], nonzero
    c = sampling.challenge_difference(jax.random.PRNGKey(0), (50,), 256, 60)
    assert int(jnp.max(jnp.abs(c))) <= 2
    assert bool(jnp.all(jnp.any(c != 0, axis=-1)))


def test_challenge_kappa_clamps_to_n():
    # reference take(kappa) semantics at N < kappa (tests/test.rs runs N=16)
    c = sampling.challenge(jax.random.PRNGKey(0), (20,), 16, 36)
    assert (np.asarray(jnp.sum(jnp.abs(c), axis=-1)) == 16).all()


def test_challenge_signkey_mode():
    """RINGZK_CHALLENGE_SIGNKEY=1: one PRNG draw supplies signs (bit 0,
    exactly fair and independent) and 31-bit selection keys -- structure
    invariants and sign balance must hold, and the mode must be
    deterministic per key while changing the transcript stream."""
    from conftest import env_override

    n, kappa = 256, 60
    with env_override("RINGZK_CHALLENGE_SIGNKEY", "1"):
        c = sampling.challenge(jax.random.PRNGKey(3), (200,), n, kappa)
        c2 = sampling.challenge(jax.random.PRNGKey(3), (200,), n, kappa)
    assert int(jnp.max(jnp.abs(c))) == 1
    assert (np.asarray(jnp.sum(jnp.abs(c), axis=-1)) == kappa).all()
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c2))
    # fair signs: 200*60 = 12000 coins, expect ~6000 +/- 5 sigma (~274)
    pos = int(jnp.sum(c == 1))
    assert abs(pos - 6000) < 300, pos
    # different stream than the default two-draw mode
    c_default = sampling.challenge(jax.random.PRNGKey(3), (200,), n, kappa)
    assert not np.array_equal(np.asarray(c), np.asarray(c_default))
    # sign bit must be independent of selection. The raw draws expose both
    # planes for ALL lanes (not just the kappa selected ones): the
    # point-biserial correlation between "sign is +1" and "lane selected"
    # must vanish -- a selection rule that peeks at bit 0 (e.g. keys not
    # shifted down) skews it far beyond the 5-sigma band ~5/sqrt(M).
    with env_override("RINGZK_CHALLENGE_SIGNKEY", "1"):
        signs, u = sampling.challenge_draws(jax.random.PRNGKey(3), (200,), n)
    mask = sampling._mask_topk(u, kappa)
    # the draws + mask must reconstruct challenge()'s output exactly
    np.testing.assert_array_equal(
        np.asarray(jnp.where(mask, signs, 0)), np.asarray(c)
    )
    s = np.asarray(signs == 1, np.float64).ravel()
    m = np.asarray(mask, np.float64).ravel()
    corr = np.corrcoef(s, m)[0, 1]
    assert abs(corr) < 5.0 / np.sqrt(s.size), corr


# -- zq centered arithmetic --------------------------------------------------


def test_add_sub_centered(rng):
    ctx = MontCtx.make(Q)
    a = rng.integers(-(Q // 2), Q // 2 + 1, size=1000)
    b = rng.integers(-(Q // 2), Q // 2 + 1, size=1000)
    got = np.asarray(zq.add_centered(ctx, jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32)))
    want = (a.astype(object) + b) % Q
    want = np.where(want > Q // 2, want - Q, want)
    assert (got.astype(object) == want).all()
    got = np.asarray(zq.sub_centered(ctx, jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32)))
    want = (a.astype(object) - b) % Q
    want = np.where(want > Q // 2, want - Q, want)
    assert (got.astype(object) == want).all()


# -- mat helpers (reference Mat parity, /root/reference/src/mat.rs tests) ----


def test_mat_dot_matches_schoolbook(rng):
    from ringzk_tpu.ops import mat as mat_mod

    n = 16
    ring = ntt.get_ring(n, Q)
    a = rng.integers(-(Q // 2), Q // 2 + 1, size=(2, 3, n))
    b = rng.integers(-(Q // 2), Q // 2 + 1, size=(3, 2, n))
    got = np.asarray(mat_mod.dot(ring, jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32)))
    want = np.zeros((2, 2, n), np.int64)
    for i in range(2):
        for j in range(2):
            acc = np.zeros(n, dtype=object)
            for t in range(3):
                acc = acc + ntt.negacyclic_schoolbook(a[i, t], b[t, j], Q).astype(object)
            acc = acc % Q
            acc = np.where(acc > Q // 2, acc - Q, acc)
            want[i, j] = acc.astype(np.int64)
    np.testing.assert_array_equal(got, want)


def test_mat_shape_helpers(rng):
    from ringzk_tpu.ops import mat as mat_mod

    n = 8
    p1 = jnp.asarray(rng.integers(-5, 6, size=(n,)), jnp.int32)
    m = mat_mod.from_element(2, 3, p1)
    assert m.shape == (2, 3, n)
    d = mat_mod.diag(3, 3, p1)
    assert d.shape == (3, 3, n)
    assert (np.asarray(d[0, 1]) == 0).all()
    np.testing.assert_array_equal(np.asarray(d[1, 1]), np.asarray(p1))
    v = mat_mod.from_vec(jnp.stack([p1, p1]))
    assert v.shape == (2, 1, n)
    np.testing.assert_array_equal(np.asarray(mat_mod.one_d_mat_to_vec(v)[0]), np.asarray(p1))
    assert mat_mod.dim(m) == (2, 3)
    er = mat_mod.extend_rows(m, m)
    assert er.shape == (4, 3, n)
    ec = mat_mod.extend_cols(m, m)
    assert ec.shape == (2, 6, n)
    # split_rows operates on column stacks [..., rows, N] (as used by c1_c2)
    stack = jnp.stack([p1, p1, p1, p1])  # [4, n]
    top, bot = mat_mod.split_rows(stack, 1)
    assert top.shape == (1, n) and bot.shape == (3, n)


def test_mat_componentwise_mul(rng):
    from ringzk_tpu.ops import mat as mat_mod

    n = 16
    ring = ntt.get_ring(n, Q)
    m = rng.integers(-(Q // 2), Q // 2 + 1, size=(3, 1, n))
    g = rng.integers(-(Q // 2), Q // 2 + 1, size=(n,))
    got = np.asarray(
        mat_mod.componentwise_mul(ring, jnp.asarray(m, jnp.int32), jnp.asarray(g, jnp.int32))
    )
    for i in range(3):
        want = ntt.negacyclic_schoolbook(m[i, 0], g, Q)
        np.testing.assert_array_equal(got[i, 0], want)
