"""Non-default moduli end-to-end: the genericity envelope, executed.

The reference is generic over the coefficient type ``I`` and the const
modulus ``Q`` (/root/reference/src/params.rs:18,38-47) but only ever ships
and tests Q = 3515337053. PARITY.md claims the same envelope ("any odd
modulus < 2^32, any power-of-two N"); these tests actually run it at the
envelope's edges instead of one interior point:

  * Q_SMALL = 32749 (prime ~2^15): a small NTT-unfriendly odd modulus --
    protocol values wrap mod q far below the int32 range, and the MXU
    digit key path stays active (q/2 fits one int8 digit pair);
  * Q_BIG = 4294967291 (2^32 - 5, prime): stresses the p >= 2^31
    Montgomery carry branches (mont_mul/add carry-out tracking), the
    centered <-> unsigned folds at the uint32 edge, AND the keygen
    digit-capacity gate (q/2 = 2147483645 exceeds the 4-digit balanced
    capacity 2139062143, so keys must take the NTT path -- a corrupt
    digit operator would be a silent wrong-answer bug);
  * a property test sweeping random odd moduli (prime or not -- the
    reference's ZqI64<Q> never requires primality) against the exact
    schoolbook golden model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ringzk_tpu as rz
from ringzk_tpu.ops import ntt
from ringzk_tpu.protocols import commit as commit_mod
from ringzk_tpu.protocols import linear, open as open_mod, sum as sum_mod

N = 16

Q_SMALL = 32749
Q_BIG = 4294967291  # 2^32 - 5

P_SMALL = rz.Params(q=Q_SMALL // 2, modulus=Q_SMALL)
P_BIG = rz.Params(q=Q_BIG // 2, modulus=Q_BIG)

MODULI = [pytest.param(P_SMALL, id="q15_32749"), pytest.param(P_BIG, id="q32_2p32m5")]


def make_ck(params):
    return rz.keygen(jax.random.PRNGKey(11), params, N)


def rand_x(key, params, batch):
    return jax.random.randint(
        key, batch + (params.l, N), -params.q, params.q + 1, dtype=jnp.int32
    )


@pytest.mark.parametrize("params", MODULI)
def test_params_validate(params):
    params.validate()
    assert params.standard_deviation(N) == params.b * 11 * params.kappa * int(
        np.sqrt(params.k * N)
    )


def test_big_modulus_keys_take_ntt_path():
    """q/2 for Q_BIG exceeds the 4-digit balanced capacity: keygen must NOT
    build an MXU digit operator (it would silently wrap in the biased
    decomposition) and must fall back to the exact NTT key path."""
    from ringzk_tpu.ops import conv_mxu

    assert P_BIG.q > conv_mxu.digit_capacity(conv_mxu.KEY_DIGITS)
    ck = make_ck(P_BIG)
    assert ck.a1_dig is None and ck.a2_dig is None
    # the small modulus stays on the MXU path (capacity covers its keys)
    ck_s = make_ck(P_SMALL)
    assert ck_s.a1_dig is not None


@pytest.mark.parametrize("params", MODULI)
def test_commit_verify(params):
    ck = make_ck(params)
    kx, kc = jax.random.split(jax.random.PRNGKey(0))
    x = rand_x(kx, params, (8,))
    opening, com = commit_mod.commit(kc, ck, x, params)
    assert bool(jnp.all(commit_mod.verify(ck, com, opening, params)))
    bad = opening._replace(x=opening.x.at[..., 0, 0].add(1))
    assert not bool(jnp.any(commit_mod.verify(ck, com, bad, params)))


@pytest.mark.parametrize("params", MODULI)
def test_open_roundtrip_and_forgery(params):
    ck = make_ck(params)
    kx, kp, kc = jax.random.split(jax.random.PRNGKey(1), 3)
    x = rand_x(kx, params, (8,))
    ok, op_ok = jax.jit(lambda k, x: open_mod.roundtrip(k, ck, x, params))(kp, x)
    assert bool(jnp.all(ok)) and bool(jnp.all(op_ok))

    rctx, pcom = open_mod.prover_commit(kp, ck, x, params)
    vctx, chal = open_mod.generate_challenge(kc, pcom, params)
    resp = open_mod.create_response(rctx, chal, params)
    assert bool(jnp.all(open_mod.verify(ck, resp, vctx, params)))
    forged = resp._replace(z=resp.z.at[..., 0, 0].add(1))
    assert not bool(jnp.any(open_mod.verify(ck, forged, vctx, params)))


@pytest.mark.parametrize("params", MODULI)
def test_linear_roundtrip(params):
    ck = make_ck(params)
    kx, kg, kp = jax.random.split(jax.random.PRNGKey(2), 3)
    x = rand_x(kx, params, (4,))
    g = jax.random.randint(kg, (4, N), -params.q, params.q + 1, dtype=jnp.int32)
    ok, op_ok = jax.jit(lambda k: linear.roundtrip(k, ck, g, x, params))(kp)
    assert bool(jnp.all(ok)) and bool(jnp.all(op_ok))


@pytest.mark.parametrize("params", MODULI)
def test_sum_roundtrip(params):
    ck = make_ck(params)
    kx, kg, kp = jax.random.split(jax.random.PRNGKey(3), 3)
    vl = 3
    xs = jax.random.randint(
        kx, (4, vl, params.l, N), -params.q, params.q + 1, dtype=jnp.int32
    )
    gs = jax.random.randint(kg, (4, vl, N), -params.q, params.q + 1, dtype=jnp.int32)
    ok, op_ok = jax.jit(lambda k: sum_mod.roundtrip(k, ck, gs, xs, params))(kp)
    assert bool(jnp.all(ok)) and bool(jnp.all(op_ok))


# -- ring-level property test over the whole modulus domain ------------------

# Odd moduli across the envelope: tiny, ~2^15 prime, odd composite,
# just over 2^31 (carry branch), 2^32 - 5, and the default.
PROP_MODULI = [3, 257, 32749, 999999, 2**31 + 11, Q_BIG, 3515337053]


@pytest.mark.parametrize("q", PROP_MODULI)
@pytest.mark.parametrize("n", [8, 64])
def test_polymul_matches_schoolbook(rng, q, n):
    """Exact negacyclic product == the CRT schoolbook golden model for any
    odd modulus (the ZqI64<Q> genericity surface, incl. non-primes)."""
    ring = ntt.get_ring(n, q)
    half = q // 2
    a = jnp.asarray(rng.integers(-half, half + 1, size=(3, n)), jnp.int32)
    b = jnp.asarray(rng.integers(-half, half + 1, size=(3, n)), jnp.int32)
    got = np.asarray(ring.polymul(a, b))
    want = ntt.negacyclic_schoolbook(np.asarray(a), np.asarray(b), q)
    np.testing.assert_array_equal(got, np.asarray(want, np.int32))


@pytest.mark.parametrize("q", [2**31 + 11, Q_BIG])
def test_centered_fold_at_uint32_edge(rng, q):
    """add/sub/reduce round-trips at the extreme residues of p >= 2^31
    moduli (u - q wrap, carry-out in add, reduce_i32_centered correction)."""
    from ringzk_tpu.ops import zq
    from ringzk_tpu.ops.montgomery import MontCtx

    ctx = MontCtx.make(q)
    half = q // 2
    edge = np.asarray(
        [-half, -half + 1, -1, 0, 1, half - 1, half, q // 3, -(q // 3)],
        np.int64,
    )
    # int32 holds |v| <= 2^31 - 1 >= half for any q < 2^32
    assert half <= 2**31 - 1
    a = jnp.asarray(edge.astype(np.int32))
    b = jnp.asarray(np.roll(edge, 3).astype(np.int32))
    got = np.asarray(zq.add_centered(ctx, a, b), np.int64)
    want = (edge + np.roll(edge, 3)) % q
    want = np.where(want > half, want - q, want)
    np.testing.assert_array_equal(got, want)
    got = np.asarray(zq.sub_centered(ctx, a, b), np.int64)
    want = (edge - np.roll(edge, 3)) % q
    want = np.where(want > half, want - q, want)
    np.testing.assert_array_equal(got, want)
