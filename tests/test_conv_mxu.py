"""MXU digit-matmul matvec must agree bit-for-bit with the NTT path, and
prime-subset NTT products must stay exact within their declared bounds."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ringzk_tpu.ops import conv_mxu, mat, ntt

Q = 3_515_337_053


@pytest.fixture(scope="module")
def ring():
    return ntt.get_ring(64, Q)


def _rand_key_matrix(rng, rows, k, n):
    return rng.integers(-(Q // 2), Q // 2 + 1, size=(rows, k, n)).astype(np.int64)


def _ntt_matvec(ring, a, v):
    a_hat = ring.fwd_const(jnp.asarray(a, jnp.int32))
    v_hat = ring.fwd(jnp.asarray(v, jnp.int32))
    return np.asarray(ring.inv(mat.matvec_hat(ring, a_hat, v_hat)))


def test_balanced_digits_roundtrip(rng):
    v = rng.integers(-(2**20), 2**20, size=(4, 32)).astype(np.int32)
    nd = conv_mxu.digits_for_bound(2**20)
    d = np.asarray(conv_mxu.balanced_digits(jnp.asarray(v), nd)).astype(np.int64)
    recon = sum(d[i] * conv_mxu.RADIX**i for i in range(nd))
    np.testing.assert_array_equal(recon, v)


def test_digit_capacity_consistent():
    for nd in range(1, 6):
        cap = conv_mxu.digit_capacity(nd)
        assert conv_mxu.digits_for_bound(cap) == nd
        assert conv_mxu.digits_for_bound(cap + 1) == nd + 1


@pytest.mark.parametrize("v_bound,rows", [(1, 2), (1_400_000, 1), (2**20, 2)])
def test_mxu_matvec_matches_ntt(ring, rng, v_bound, rows):
    n, k = 64, 3
    a = _rand_key_matrix(rng, rows, k, n)
    op = conv_mxu.KeyOperator(a, ring)
    v = rng.integers(-v_bound, v_bound + 1, size=(5, k, n)).astype(np.int32)
    nd = conv_mxu.digits_for_bound(v_bound)
    got = np.asarray(op.matvec(jnp.asarray(v), nd))
    want = _ntt_matvec(ring, a, v)
    np.testing.assert_array_equal(got, want)


def test_mxu_matvec_full_range_key_small_v(ring, rng):
    """Extreme key values with ternary v (the commit path)."""
    n, k = 64, 3
    a = np.full((2, k, n), Q // 2, dtype=np.int64)
    a[0, 0, 0] = -(Q // 2)
    op = conv_mxu.KeyOperator(a, ring)
    v = rng.integers(-1, 2, size=(3, k, n)).astype(np.int32)
    got = np.asarray(op.matvec(jnp.asarray(v), 1))
    want = _ntt_matvec(ring, a, v)
    np.testing.assert_array_equal(got, want)


# -- prime-subset NTT --------------------------------------------------------


def test_primes_needed(ring):
    assert ring.primes_needed(36) == 1
    assert ring.primes_needed(2**36) == 2
    assert ring.primes_needed(2**70) == 3


@pytest.mark.parametrize("num", [1, 2, 3])
def test_subset_prime_product_exact(ring, rng, num):
    """Products whose integer coefficients fit the subset range must be
    exact with fewer primes."""
    n = 64
    # pick operand bounds so that the conv bound n*b1*b2 fits num primes
    prod = 1
    for p in ntt.PRIMES[:num]:
        prod *= p
    b2 = 1
    b1 = min(Q // 2, (prod // 2) // (n * b2) - 1)
    a = rng.integers(-b1, b1 + 1, size=(3, n)).astype(np.int64)
    b = rng.integers(-b2, b2 + 1, size=(3, n)).astype(np.int64)
    ah = ring.fwd_const(jnp.asarray(a, jnp.int32), num)
    bh = ring.fwd(jnp.asarray(b, jnp.int32), num)
    got = np.asarray(ring.inv(ring.dot_hat(ah, bh)))
    want = ntt.negacyclic_schoolbook(a, b, Q)
    np.testing.assert_array_equal(got, want)


def test_subset_prime_add_mixed_magnitude(ring, rng):
    """t + c1*d with arbitrary-int32 t and kappa-sparse d fits 2 primes."""
    n = 64
    kappa = 36
    t = rng.integers(-(2**31), 2**31, size=(2, n)).astype(np.int64)
    c1 = rng.integers(-(Q // 2), Q // 2 + 1, size=(2, n)).astype(np.int64)
    d = np.zeros((2, n), np.int64)
    d[:, :kappa] = rng.choice([-1, 1], size=(2, kappa))
    d_hat = ring.fwd_const(jnp.asarray(d, jnp.int32), 2)
    rhs = ring.inv(
        ring.add_hat(
            ring.fwd(jnp.asarray(t, jnp.int32), 2),
            ring.dot_hat(d_hat, ring.fwd(jnp.asarray(c1, jnp.int32), 2)),
        )
    )
    want = ntt.negacyclic_schoolbook(d, c1, Q).astype(object)
    want = (want + t.astype(object)) % Q
    want = np.where(want > Q // 2, want - Q, want)
    np.testing.assert_array_equal(np.asarray(rhs).astype(object), want)


def test_mxu_max_n_cap_gates_digit_operator():
    """MXU_MAX_N (env RINGZK_MXU_MAX_N, read at import) caps the digit
    operator both ways -- the digit-vs-NTT crossover probe of
    BENCHMARKS.md's ring-degree scan -- and verdicts stay
    engine-independent. Patch the module global rather than reloading
    (reload would re-mint the NamedTuple classes under other modules)."""
    import ringzk_tpu as rz
    from ringzk_tpu.protocols import commit as commit_mod
    from ringzk_tpu.protocols import open as open_mod

    params = rz.Params()
    saved = commit_mod.MXU_MAX_N
    try:
        commit_mod.MXU_MAX_N = 64          # cap below N: no digits
        ck_ntt = commit_mod.keygen(jax.random.PRNGKey(0), params, 128)
        assert ck_ntt.a1_dig is None
        commit_mod.MXU_MAX_N = 128         # cap at N (inclusive): digits
        ck_dig = commit_mod.keygen(jax.random.PRNGKey(0), params, 128)
        assert ck_dig.a1_dig is not None
    finally:
        commit_mod.MXU_MAX_N = saved

    # identical key material, engine-independent verdicts
    np.testing.assert_array_equal(np.asarray(ck_ntt.a1), np.asarray(ck_dig.a1))
    k = jax.random.PRNGKey(1)
    x = jax.random.randint(k, (4, params.l, 128), -params.q, params.q + 1, jnp.int32)
    ok_a, op_a = open_mod.roundtrip(k, ck_ntt, x, params)
    ok_b, op_b = open_mod.roundtrip(k, ck_dig, x, params)
    np.testing.assert_array_equal(np.asarray(ok_a & op_a), np.asarray(ok_b & op_b))
    assert bool((ok_b & op_b).all())


def test_fused_full_key_matvec_bit_identical():
    """matvec_key('a', ...) with the fused [kN, D*(n+l)N] operator
    (RINGZK_FUSED_A=1, opt-in) must equal the two row-block matmuls
    (RINGZK_FUSED_A=0, the measured-faster default) AND the exact NTT path,
    for both digit widths the protocols use (ternary r and verify-bound z)."""
    from conftest import env_override
    from ringzk_tpu import Params
    from ringzk_tpu.protocols import commit as commit_mod

    params = Params()
    n_deg = 64
    ring = ntt.get_ring(n_deg, params.modulus)
    ck = commit_mod.keygen(jax.random.PRNGKey(3), params, n_deg)
    assert ck.a1_dig is not None and ck.a2_dig is not None

    for bound in (params.b, params.commit_bound(n_deg)):
        v = jax.random.randint(
            jax.random.PRNGKey(4), (5, params.k, n_deg), -bound, bound + 1,
            jnp.int32,
        )
        with env_override("RINGZK_FUSED_A", "1"):
            fused = np.asarray(commit_mod.matvec_key(ring, ck, "a", v, bound))
        with env_override("RINGZK_FUSED_A", "0"):
            split = np.asarray(commit_mod.matvec_key(ring, ck, "a", v, bound))
        a = np.concatenate([np.asarray(ck.a1), np.asarray(ck.a2)], axis=0)
        want = _ntt_matvec(ring, a.astype(np.int64), np.asarray(v))
        np.testing.assert_array_equal(fused, split)
        np.testing.assert_array_equal(fused, want)


def test_argkey_jit_bit_identical_n4096():
    """The N=4096 digit engine (on by default off-tunnel since round 4:
    commit._default_mxu_max_n) must be bit-identical whether the key is
    CLOSED OVER by jit (operators baked as program constants -- the variant
    that trips the axon tunnel's compile payload) or passed as a jit
    ARGUMENT (the deployment-recommended form at N>=4096), and must match
    the NTT key path. CPU-executed; pins the BENCHMARKS.md crossover
    claim's correctness leg."""
    import ringzk_tpu as rz
    from conftest import env_override
    from ringzk_tpu.protocols import commit as commit_mod

    params = rz.Params()
    n_deg = 4096
    ring = ntt.get_ring(n_deg, params.modulus)
    saved = commit_mod.MXU_MAX_N
    try:
        commit_mod.MXU_MAX_N = 4096
        ck = commit_mod.keygen(jax.random.PRNGKey(3), params, n_deg)
        assert ck.a1_dig is not None
    finally:
        commit_mod.MXU_MAX_N = saved
    with env_override("RINGZK_MXU", "0"):
        ck_ntt = commit_mod.keygen(jax.random.PRNGKey(3), params, n_deg)
    assert ck_ntt.a1_dig is None

    bound = params.verify_bound(n_deg)
    v = jax.random.randint(
        jax.random.PRNGKey(4), (1, params.k, n_deg), -bound, bound + 1, jnp.int32
    )
    closed = jax.jit(
        lambda v: commit_mod.matvec_key(ring, ck, "a", v, bound)
    )(v)
    argkey = jax.jit(
        lambda ck, v: commit_mod.matvec_key(ring, ck, "a", v, bound)
    )(ck, v)
    via_ntt = commit_mod.matvec_key(ring, ck_ntt, "a", v, bound)
    np.testing.assert_array_equal(np.asarray(closed), np.asarray(argkey))
    np.testing.assert_array_equal(np.asarray(closed), np.asarray(via_ntt))


def test_mxu_max_n_autodetect():
    """_default_mxu_max_n: 2048 under the tunnel env, 4096 off it,
    RINGZK_MXU_MAX_N always wins."""
    from conftest import env_override
    from ringzk_tpu.protocols import commit as commit_mod

    with env_override("PALLAS_AXON_POOL_IPS", "10.0.0.1"):
        assert commit_mod._default_mxu_max_n() == 2048
        with env_override("RINGZK_MXU_MAX_N", "4096"):
            assert commit_mod._default_mxu_max_n() == 4096
    prev = os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    try:
        os.environ.pop("RINGZK_MXU_MAX_N", None)
        assert commit_mod._default_mxu_max_n() == 4096
    finally:
        if prev is not None:
            os.environ["PALLAS_AXON_POOL_IPS"] = prev
