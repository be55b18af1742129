"""Accumulation-envelope parity: k > ACC_MAX and VL > ACC_MAX-1 must work.

The reference's `Mat::dot` and sum proof accept any contraction length k and
any summand count VL (/root/reference/src/mat.rs:95-115,
/root/reference/src/prove/sum.rs:106-120). Rounds 1-3 capped both at the CRT
exactness ceiling ACC_MAX=16 terms per NTT-domain accumulation; round 4
removes the ceiling with chunked accumulation (ring.sum_to_centered /
mat.matvec): each <=ACC_MAX-term partial is reconstructed exactly out of the
NTT domain and the centered partials are added mod q. These tests pin the
envelope at k=20 and VL=24 -- roundtrips, forgeries, and bit-exactness
against the schoolbook golden model -- plus the clean-error discipline of
the hat-domain primitives that still carry the per-chunk ceiling.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ringzk_tpu import Params, keygen
from ringzk_tpu.ops import mat
from ringzk_tpu.ops.ntt import get_ring, negacyclic_schoolbook
from ringzk_tpu.protocols import commit as commit_mod
from ringzk_tpu.protocols import open as open_mod
from ringzk_tpu.protocols import sum as sum_mod

N = 16
P_K20 = Params(n=1, k=20, l=1)  # contraction length k > ACC_MAX
PARAMS = Params()               # default k=3 for the VL=24 sum tests
VL = 24


def rand_x(key, params, batch):
    return jax.random.randint(
        key, batch + (params.l, N), -params.q, params.q + 1, dtype=jnp.int32
    )


# -- primitive-level exactness ------------------------------------------------


def test_matvec_chunked_matches_schoolbook():
    """mat.matvec at contraction 35 (3 chunks) == exact schoolbook golden."""
    ring = get_ring(N, PARAMS.modulus)
    k = 35
    ka, kv = jax.random.split(jax.random.PRNGKey(40))
    a = jax.random.randint(ka, (2, k, N), -PARAMS.q, PARAMS.q + 1, jnp.int32)
    v = jax.random.randint(kv, (k, N), -PARAMS.q, PARAMS.q + 1, jnp.int32)
    got = np.asarray(mat.matvec(ring, ring.fwd_const(a), ring.fwd(v)))
    want = negacyclic_schoolbook(np.asarray(a), np.asarray(v)[None], ring.q).sum(
        axis=-2
    )
    # sum of exact products, re-reduced centered mod q
    want = np.mod(want, ring.q)
    want = np.where(want > ring.q // 2, want - ring.q, want)
    np.testing.assert_array_equal(got, want)


def test_dot_chunked_matches_schoolbook():
    """mat.dot at contraction 20: [2, 20, N] . [20, 3, N] == golden."""
    ring = get_ring(N, PARAMS.modulus)
    ka, kb = jax.random.split(jax.random.PRNGKey(41))
    a = jax.random.randint(ka, (2, 20, N), -PARAMS.q, PARAMS.q + 1, jnp.int32)
    b = jax.random.randint(kb, (20, 3, N), -PARAMS.q, PARAMS.q + 1, jnp.int32)
    got = np.asarray(mat.dot(ring, a, b))
    prods = negacyclic_schoolbook(
        np.asarray(a)[:, :, None], np.asarray(b)[None], ring.q
    )  # [2, 20, 3, N]
    want = np.mod(prods.sum(axis=1), ring.q)
    want = np.where(want > ring.q // 2, want - ring.q, want)
    np.testing.assert_array_equal(got, want)


def test_sum_to_centered_chunked():
    """ring.sum_to_centered over 40 product terms == golden summation."""
    ring = get_ring(N, PARAMS.modulus)
    kg, kx = jax.random.split(jax.random.PRNGKey(42))
    g = jax.random.randint(kg, (40, N), -PARAMS.q, PARAMS.q + 1, jnp.int32)
    x = jax.random.randint(kx, (40, N), -PARAMS.q, PARAMS.q + 1, jnp.int32)
    hat = ring.dot_hat(ring.fwd_const(g), ring.fwd(x))
    got = np.asarray(ring.sum_to_centered(hat, axis=1))
    want = np.mod(
        negacyclic_schoolbook(np.asarray(g), np.asarray(x), ring.q).sum(axis=0),
        ring.q,
    )
    want = np.where(want > ring.q // 2, want - ring.q, want)
    np.testing.assert_array_equal(got, want)


def test_hat_primitives_raise_past_acc_max():
    """The hat-domain primitives (whose output cannot be chunked) reject
    over-long accumulations with clean ValueErrors instead of silently
    wrapping mod M (was a bare assert in rounds 1-3)."""
    ring = get_ring(N, PARAMS.modulus)
    a = jnp.zeros((2, 17, N), jnp.int32)
    v = jnp.zeros((17, N), jnp.int32)
    with pytest.raises(ValueError, match="ACC_MAX"):
        mat.matvec_hat(ring, ring.fwd_const(a), ring.fwd(v))
    with pytest.raises(ValueError, match="sum_to_centered"):
        ring.sum_hat(ring.fwd(jnp.zeros((17, N), jnp.int32)), axis=1)


# -- protocol level: k = 20 ---------------------------------------------------


@pytest.fixture(scope="module", params=["mxu", "ntt"])
def ck20(request):
    """k=20 commitment key, once with the digit engine (default; the int32
    capacity gate still admits k*N=320) and once forced onto the chunked
    NTT path."""
    from conftest import env_override

    if request.param == "ntt":
        with env_override("RINGZK_MXU", "0"):
            ck = keygen(jax.random.PRNGKey(50), P_K20, N)
        assert ck.a1_dig is None
    else:
        ck = keygen(jax.random.PRNGKey(50), P_K20, N)
        assert ck.a1_dig is not None, "k=20, N=16 fits the digit capacity gate"
    return ck


def test_open_roundtrip_k20(ck20):
    kx, kp = jax.random.split(jax.random.PRNGKey(51))
    x = rand_x(kx, P_K20, (4,))
    ok, op_ok = open_mod.roundtrip(kp, ck20, x, P_K20)
    assert bool(jnp.all(ok)) and bool(jnp.all(op_ok))


def test_open_forged_z_rejected_k20(ck20):
    kx, kp, kc = jax.random.split(jax.random.PRNGKey(52), 3)
    x = rand_x(kx, P_K20, (4,))
    rctx, pcom = open_mod.prover_commit(kp, ck20, x, P_K20)
    vctx, chal = open_mod.generate_challenge(kc, pcom, P_K20)
    resp = open_mod.create_response(rctx, chal, P_K20)
    forged = resp._replace(z=resp.z.at[..., 0, 0].add(1))
    assert not bool(jnp.any(open_mod.verify(ck20, forged, vctx, P_K20)))


def test_mxu_ntt_bit_identical_k20():
    """The two k=20 engines must agree transcript-for-transcript."""
    from conftest import env_override

    kx, kp = jax.random.split(jax.random.PRNGKey(53))
    x = rand_x(kx, P_K20, (2,))

    def transcript(ck):
        kc, kr = jax.random.split(jax.random.PRNGKey(54))
        rctx, pcom = open_mod.prover_commit(kc, ck, x, P_K20)
        vctx, chal = open_mod.generate_challenge(kr, pcom, P_K20)
        resp = open_mod.create_response(rctx, chal, P_K20)
        ok = open_mod.verify(ck, resp, vctx, P_K20)
        return [pcom.c.c, pcom.t, resp.z, ok]

    ck_mxu = keygen(jax.random.PRNGKey(50), P_K20, N)
    with env_override("RINGZK_MXU", "0"):
        ck_ntt = keygen(jax.random.PRNGKey(50), P_K20, N)
    assert ck_mxu.a1_dig is not None and ck_ntt.a1_dig is None
    for a, b in zip(transcript(ck_mxu), transcript(ck_ntt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# -- protocol level: VL = 24 --------------------------------------------------


@pytest.fixture(scope="module")
def ck_default():
    return keygen(jax.random.PRNGKey(60), PARAMS, N)


def rand_gs_xs(key, batch):
    kg, kx = jax.random.split(key)
    gs = jax.random.randint(
        kg, batch + (VL, N), -PARAMS.q, PARAMS.q + 1, jnp.int32
    )
    xs = jax.random.randint(
        kx, batch + (VL, PARAMS.l, N), -PARAMS.q, PARAMS.q + 1, jnp.int32
    )
    return gs, xs


def test_sum_roundtrip_vl24(ck_default):
    kgx, kp = jax.random.split(jax.random.PRNGKey(61))
    gs, xs = rand_gs_xs(kgx, (2,))
    ok, op_ok = sum_mod.roundtrip(kp, ck_default, gs, xs, PARAMS)
    assert bool(jnp.all(ok)) and bool(jnp.all(op_ok))


def test_sum_forged_summand_rejected_vl24(ck_default):
    kgx, kp, kc = jax.random.split(jax.random.PRNGKey(62), 3)
    gs, xs = rand_gs_xs(kgx, (2,))
    rctx, pcom = sum_mod.prover_commit(kp, ck_default, gs, xs, PARAMS)
    vctx, chal = sum_mod.generate_challenge(kc, pcom, PARAMS)
    resp = sum_mod.create_response(rctx, chal, PARAMS)
    # corrupt one summand's response deep in the V stack (index 20 > ACC_MAX
    # exercises the second accumulation chunk)
    forged = resp._replace(zs=resp.zs.at[..., 20, 0, 0].add(1))
    assert not bool(jnp.any(sum_mod.verify(ck_default, forged, vctx, PARAMS)))


def test_sum_xp_exact_vl24(ck_default):
    """The prover's xp = sum_i g_i*x_i at VL=24 is the exact golden value
    (two accumulation chunks; pins the chunk seam's correctness)."""
    kgx, kp = jax.random.split(jax.random.PRNGKey(63))
    gs, xs = rand_gs_xs(kgx, ())
    rctx, _ = sum_mod.prover_commit(kp, ck_default, gs, xs, PARAMS)
    ring = get_ring(N, PARAMS.modulus)
    prods = negacyclic_schoolbook(
        np.asarray(gs)[:, None], np.asarray(xs), ring.q
    )  # [VL, l, N]
    want = np.mod(prods.sum(axis=0), ring.q)
    want = np.where(want > ring.q // 2, want - ring.q, want)
    np.testing.assert_array_equal(np.asarray(rctx.opening_p.x), want)
