"""Multi-device tests on the 8-device virtual CPU mesh: dp-sharded proof
batches with psum batch-verify, and the sequence-parallel (N-sharded) NTT."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import ringzk_tpu as rz
from ringzk_tpu.ops import ntt
from ringzk_tpu.parallel import mesh as pmesh
from ringzk_tpu.parallel import ntt_sp

N = 16
PARAMS = rz.Params()
Q = PARAMS.modulus


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (run via scripts/pytest-cpu)")
    return pmesh.make_mesh(8)


def test_dp_sharded_roundtrip(mesh8):
    kk, kx, kp = jax.random.split(jax.random.PRNGKey(0), 3)
    ck = rz.keygen(kk, PARAMS, N)
    x = jax.random.randint(kx, (32, PARAMS.l, N), -PARAMS.q, PARAMS.q + 1, jnp.int32)
    ok, all_ok = pmesh.batched_open_prove_verify(mesh8, kp, ck, x, PARAMS)
    assert ok.shape == (32,)
    assert bool(jnp.all(ok)) and bool(all_ok)


def test_dp_sharding_layout(mesh8):
    kk, kx, kp = jax.random.split(jax.random.PRNGKey(1), 3)
    ck = rz.keygen(kk, PARAMS, N)
    x = jax.random.randint(kx, (16, PARAMS.l, N), -PARAMS.q, PARAMS.q + 1, jnp.int32)
    xs = pmesh.shard_batch(mesh8, x)
    # batch axis must actually be split 8 ways
    assert len(xs.sharding.device_set) == 8
    step = pmesh.open_step_fn(mesh8, ck, PARAMS)
    ok, all_ok = step(kp, xs)
    assert bool(all_ok)


def test_dp_sharded_linear_roundtrip(mesh8):
    kk, kg, kx, kp = jax.random.split(jax.random.PRNGKey(7), 4)
    ck = rz.keygen(kk, PARAMS, N)
    g = jax.random.randint(kg, (16, N), -PARAMS.q, PARAMS.q + 1, jnp.int32)
    x = jax.random.randint(kx, (16, PARAMS.l, N), -PARAMS.q, PARAMS.q + 1, jnp.int32)
    ok, all_ok = pmesh.batched_linear_prove_verify(mesh8, kp, ck, g, x, PARAMS)
    assert ok.shape == (16,)
    assert bool(jnp.all(ok)) and bool(all_ok)


def test_dp_sharded_sum_roundtrip(mesh8):
    vl = 3
    kk, kg, kx, kp = jax.random.split(jax.random.PRNGKey(8), 4)
    ck = rz.keygen(kk, PARAMS, N)
    gs = jax.random.randint(kg, (16, vl, N), -PARAMS.q, PARAMS.q + 1, jnp.int32)
    xs = jax.random.randint(
        kx, (16, vl, PARAMS.l, N), -PARAMS.q, PARAMS.q + 1, jnp.int32
    )
    ok, all_ok = pmesh.batched_sum_prove_verify(mesh8, kp, ck, gs, xs, PARAMS)
    assert ok.shape == (16,)
    assert bool(jnp.all(ok)) and bool(all_ok)


def test_batch_not_divisible_raises(mesh8):
    kk, kx, kp = jax.random.split(jax.random.PRNGKey(2), 3)
    ck = rz.keygen(kk, PARAMS, N)
    x = jax.random.randint(kx, (10, PARAMS.l, N), -PARAMS.q, PARAMS.q + 1, jnp.int32)
    with pytest.raises(ValueError, match="divisible"):
        pmesh.batched_open_prove_verify(mesh8, kp, ck, x, PARAMS)


@pytest.fixture(scope="module")
def mesh_sp():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (run via scripts/pytest-cpu)")
    return pmesh.make_mesh(8, axis="sp")


@pytest.mark.parametrize("n_sp", [256, 1024])
def test_sp_ntt_polymul_matches_schoolbook(mesh_sp, rng, n_sp):
    """Coefficient-axis-sharded polymul == single-device exact product."""
    mesh8 = mesh_sp
    a = rng.integers(-(Q // 2), Q // 2 + 1, size=(n_sp,))
    b = rng.integers(-(Q // 2), Q // 2 + 1, size=(n_sp,))
    got = np.asarray(
        ntt_sp.polymul_sp(
            mesh8, jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32), n_sp, Q
        )
    )
    ring = ntt.get_ring(n_sp, Q)
    want = np.asarray(ring.polymul(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32)))
    np.testing.assert_array_equal(got, want)


def test_sp_ntt_batched(mesh_sp, rng):
    mesh8 = mesh_sp
    n_sp = 256
    a = rng.integers(-(Q // 2), Q // 2 + 1, size=(3, n_sp))
    b = rng.integers(-(Q // 2), Q // 2 + 1, size=(3, n_sp))
    got = np.asarray(
        ntt_sp.polymul_sp(
            mesh8, jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32), n_sp, Q
        )
    )
    ring = ntt.get_ring(n_sp, Q)
    want = np.asarray(ring.polymul(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32)))
    np.testing.assert_array_equal(got, want)


def test_sharded_matches_unsharded(mesh8):
    """Determinism across device layouts (SURVEY section 5.2 analog): the
    sharded pipeline must produce bit-identical proofs to the single-device
    run for the same PRNG key (threefry is counter-based; partitioning must
    not change sampled values or arithmetic)."""
    from ringzk_tpu.protocols import open as open_mod

    kk, kx, kp = jax.random.split(jax.random.PRNGKey(3), 3)
    ck = rz.keygen(kk, PARAMS, N)
    x = jax.random.randint(kx, (16, PARAMS.l, N), -PARAMS.q, PARAMS.q + 1, jnp.int32)

    rctx_u, pcom_u = open_mod.prover_commit(kp, ck, x, PARAMS)

    xs = pmesh.shard_batch(mesh8, x)
    ck_r = pmesh.replicate(mesh8, ck)
    rctx_s, pcom_s = jax.jit(
        lambda k, xx: open_mod.prover_commit(k, ck_r, xx, PARAMS)
    )(kp, xs)

    np.testing.assert_array_equal(np.asarray(pcom_u.c.c), np.asarray(pcom_s.c.c))
    np.testing.assert_array_equal(np.asarray(pcom_u.t), np.asarray(pcom_s.t))
    np.testing.assert_array_equal(np.asarray(rctx_u.y), np.asarray(rctx_s.y))


def test_sp_dp_composed_polymul(rng):
    """dp x sp composition: independent polynomial batches sharded over
    "dp" while each ring's coefficient axis is sharded over "sp" -- one
    shard_map, ppermutes confined to the sp axis."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (run via scripts/pytest-cpu)")
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh2d = Mesh(devs, ("dp", "sp"))
    n_sp = 256
    a = rng.integers(-(Q // 2), Q // 2 + 1, size=(4, n_sp))
    b = rng.integers(-(Q // 2), Q // 2 + 1, size=(4, n_sp))
    got = np.asarray(
        ntt_sp.polymul_sp(
            mesh2d, jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32),
            n_sp, Q, batch_axis="dp",
        )
    )
    ring = ntt.get_ring(n_sp, Q)
    want = np.asarray(ring.polymul(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32)))
    np.testing.assert_array_equal(got, want)
