"""Non-default parameter sets end-to-end: n != l, k-n-l > 0, l > 1.

The repo's flagship correctness divergence is the fixed `c1_c2` split
(ringzk_tpu/protocols/commit.py): the reference's split
(/root/reference/src/commit.rs:213-218 via split_rows,
/root/reference/src/mat.rs:203-213) hands c1 the first *l* rows and c2 the
last *n* rows, which is only correct when n == l. Every reference test (and
every round-1 test here) ran the default n=1, l=1, where the bug is
invisible. These tests run full keygen/commit/sigma round-trips for general
shapes -- including a case where the reference's split would produce the
wrong rows -- covering:

  * Params(n=2, k=5, l=1): n != l (the bug-visible case), a2' width 2
  * Params(n=2, k=6, l=2): l > 1 messages, square n == l at larger sizes
"""

import pytest

import jax
import jax.numpy as jnp

from ringzk_tpu import Params, keygen
from ringzk_tpu.ops import mat
from ringzk_tpu.protocols import commit as commit_mod
from ringzk_tpu.protocols import linear, open as open_mod, sum as sum_mod

N = 16

P_NL = Params(n=2, k=5, l=1)   # n != l: reference's c1_c2 split is wrong here
P_L2 = Params(n=2, k=6, l=2)   # l > 1 messages, k - n - l = 2

ALL = [pytest.param(P_NL, id="n2k5l1"), pytest.param(P_L2, id="n2k6l2")]


def make_ck(params):
    return keygen(jax.random.PRNGKey(7), params, N)


def rand_x(key, params, batch):
    return jax.random.randint(
        key, batch + (params.l, N), -params.q, params.q + 1, dtype=jnp.int32
    )


@pytest.mark.parametrize("params", ALL)
def test_keygen_structure(params):
    """a1 = [I_n | A1'], a2 = [0_{lxn} | I_l | A2'] for general n, k, l
    (paper eqs. 5-6, /root/reference/src/commit.rs:33-60)."""
    ck = make_ck(params)
    n, k, l = params.n, params.k, params.l
    assert ck.a1.shape == (n, k, N)
    assert ck.a2.shape == (l, k, N)
    eye_n = jnp.zeros((n, n, N), jnp.int32).at[jnp.arange(n), jnp.arange(n), 0].set(1)
    assert (ck.a1[:, :n] == eye_n).all()
    assert (ck.a2[:, :n] == 0).all()
    eye_l = jnp.zeros((l, l, N), jnp.int32).at[jnp.arange(l), jnp.arange(l), 0].set(1)
    assert (ck.a2[:, n : n + l] == eye_l).all()


@pytest.mark.parametrize("params", ALL)
def test_commit_verify(params):
    ck = make_ck(params)
    kx, kc = jax.random.split(jax.random.PRNGKey(0))
    x = rand_x(kx, params, (8,))
    opening, com = commit_mod.commit(kc, ck, x, params)
    assert com.c.shape == (8, params.n + params.l, N)
    assert bool(jnp.all(commit_mod.verify(ck, com, opening, params)))
    # wrong message must not verify
    bad = opening._replace(x=opening.x.at[..., 0, 0].add(1))
    assert not bool(jnp.any(commit_mod.verify(ck, com, bad, params)))


@pytest.mark.parametrize("params", ALL)
def test_open_roundtrip(params):
    ck = make_ck(params)
    kx, kp = jax.random.split(jax.random.PRNGKey(1))
    x = rand_x(kx, params, (8,))
    ok, op_ok = jax.jit(lambda k, x: open_mod.roundtrip(k, ck, x, params))(kp, x)
    assert bool(jnp.all(ok)) and bool(jnp.all(op_ok))


@pytest.mark.parametrize("params", ALL)
def test_open_forged_fails(params):
    ck = make_ck(params)
    kx, kp, kc = jax.random.split(jax.random.PRNGKey(2), 3)
    x = rand_x(kx, params, (4,))
    rctx, pcom = open_mod.prover_commit(kp, ck, x, params)
    vctx, chal = open_mod.generate_challenge(kc, pcom, params)
    resp = open_mod.create_response(rctx, chal, params)
    assert bool(jnp.all(open_mod.verify(ck, resp, vctx, params)))
    forged = resp._replace(z=resp.z.at[..., 0, 0].add(1))
    assert not bool(jnp.any(open_mod.verify(ck, forged, vctx, params)))


@pytest.mark.parametrize("params", ALL)
def test_linear_roundtrip(params):
    ck = make_ck(params)
    kx, kg, kp = jax.random.split(jax.random.PRNGKey(3), 3)
    x = rand_x(kx, params, (4,))
    g = jax.random.randint(kg, (4, N), -params.q, params.q + 1, dtype=jnp.int32)
    ok, op_ok = jax.jit(lambda k: linear.roundtrip(k, ck, g, x, params))(kp)
    assert bool(jnp.all(ok)) and bool(jnp.all(op_ok))


@pytest.mark.parametrize("params", ALL)
def test_sum_roundtrip(params):
    ck = make_ck(params)
    kx, kg, kp = jax.random.split(jax.random.PRNGKey(4), 3)
    vl = 3
    xs = jax.random.randint(
        kx, (4, vl, params.l, N), -params.q, params.q + 1, dtype=jnp.int32
    )
    gs = jax.random.randint(kg, (4, vl, N), -params.q, params.q + 1, dtype=jnp.int32)
    ok, op_ok = jax.jit(lambda k: sum_mod.roundtrip(k, ck, gs, xs, params))(kp)
    assert bool(jnp.all(ok)) and bool(jnp.all(op_ok))


def test_reference_buggy_split_breaks_for_n_ne_l():
    """Demonstrate the reference's c1_c2 bug is *material* for n != l.

    The reference's split gives c1 = first l rows, c2 = last n rows
    (/root/reference/src/commit.rs:213-218 + /root/reference/src/mat.rs:206
    `split_off(m - r)`). For n=2, l=1 its "c1" has ONE row where the
    verifier needs the TWO a1-rows: the t + c1*d accumulation is
    shape-incompatible (the reference would panic in Mat::add,
    /root/reference/src/mat.rs:128-130) and the row it does carry is a
    correct-c1 row only by accident of being row 0. The corrected split
    verifies; emulating the buggy one cannot.
    """
    params = P_NL
    ck = make_ck(params)
    kx, kp, kc = jax.random.split(jax.random.PRNGKey(5), 3)
    x = rand_x(kx, params, (2,))
    rctx, pcom = open_mod.prover_commit(kp, ck, x, params)
    vctx, chal = open_mod.generate_challenge(kc, pcom, params)
    resp = open_mod.create_response(rctx, chal, params)
    # corrected split: verifies
    assert bool(jnp.all(open_mod.verify(ck, resp, vctx, params)))
    # correct c1 = first n rows; buggy "c1" = first l rows
    c1_correct, c2_correct = mat.split_rows(pcom.c.c, params.n)
    c1_buggy, _ = pcom.c.c[..., : params.l, :], pcom.c.c[..., params.l :, :]
    assert c1_correct.shape == (2, params.n, N)
    assert c1_buggy.shape == (2, params.l, N)
    assert c1_correct.shape != c1_buggy.shape
    # A verifier fed the buggy split must fail loudly: the (l, N) "c1" can
    # never satisfy the (n, N) shape of t in `t + c1*d` (shapes always
    # differ for n != l, so there is no broadcast path to a silent accept).
    bad_vctx = vctx._replace(c1=c1_buggy)
    with pytest.raises(ValueError, match="scalar_mul_add"):
        open_mod.verify(ck, resp, bad_vctx, params)
