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


def test_dp_sharded_roundtrip_pallas_kernels(mesh8):
    """The TPU headline path's Pallas kernels (fused NTT + challenge
    select), forced on INSIDE the dp-sharded jitted step, must partition
    under GSPMD and still verify. On this CPU mesh the kernels run in
    interpret mode; what this proves ahead of hardware is that the sharded
    program traces, partitions around the (interpreted) pallas_calls, and
    produces correct verdicts -- the multi-chip safety gate itself
    (_use_pallas auto-disables for >1 device) is what default runs get."""
    from conftest import env_override

    n_pl = 128  # >= 128 lanes so both kernels engage
    with env_override("RINGZK_PALLAS", "1"), env_override(
        "RINGZK_PALLAS_CHALLENGE", "1"
    ):
        kk, kx, kp = jax.random.split(jax.random.PRNGKey(30), 3)
        ck = rz.keygen(kk, PARAMS, n_pl)
        x = jax.random.randint(
            kx, (16, PARAMS.l, n_pl), -PARAMS.q, PARAMS.q + 1, jnp.int32
        )
        ok, all_ok = pmesh.batched_open_prove_verify(mesh8, kp, ck, x, PARAMS)
    assert ok.shape == (16,)
    assert bool(jnp.all(ok)) and bool(all_ok)

    # cross-engine determinism: the unsharded XLA-path roundtrip under the
    # same key must produce the identical verdict vector (the kernels are
    # bit-identical transforms; tests/test_pallas.py proves it per-kernel)
    from ringzk_tpu.protocols import open as open_mod

    with env_override("RINGZK_PALLAS", "0"), env_override(
        "RINGZK_PALLAS_CHALLENGE", "0"
    ):
        ok_ref, op_ok_ref = jax.jit(
            lambda k, xx: open_mod.roundtrip(k, ck, xx, PARAMS)
        )(kp, x)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref & op_ok_ref))


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


# -- sp in the PROTOCOL layer (ring axis sharded end-to-end) -----------------


@pytest.fixture(scope="module")
def mesh_dpsp():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (run via scripts/pytest-cpu)")
    from ringzk_tpu.parallel import protocol_sp

    return protocol_sp.make_sp_mesh(2, 4)


def test_spring_polymul_matches_plain(mesh_sp, rng):
    """SpRing (the protocol-layer sp ring) fwd/inv == plain RingContext.

    Jitted: eager SpRing ops dispatch one sharded program per primitive
    (minutes of wall-clock); one traced program is the usage mode anyway."""
    from ringzk_tpu.parallel.ring_sp import SpRing

    n_sp = 1024
    ring = SpRing(n=n_sp, q=Q, mesh=mesh_sp, axis="sp", batch_axis=None)
    plain = ntt.get_ring(n_sp, Q)
    a = jnp.asarray(rng.integers(-(Q // 2), Q // 2 + 1, size=(4, n_sp)), jnp.int32)
    b = jnp.asarray(rng.integers(-(Q // 2), Q // 2 + 1, size=(4, n_sp)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(jax.jit(ring.polymul)(a, b)),
        np.asarray(jax.jit(plain.polymul)(a, b)),
    )


def test_sp_open_roundtrip_large_n(mesh_dpsp):
    """VERDICT item 3: open-proof roundtrip at N=8192 with the ring axis
    sharded over sp composed with dp -- sp-aware matvec_key,
    scalar_mul_add, and 96-bit norm reductions, end to end."""
    from ringzk_tpu.parallel import protocol_sp

    n_big = 8192
    kk, kx, kp = jax.random.split(jax.random.PRNGKey(20), 3)
    ck = rz.keygen(kk, PARAMS, n_big)
    x = jax.random.randint(
        kx, (8, PARAMS.l, n_big), -PARAMS.q, PARAMS.q + 1, jnp.int32
    )
    ok, all_ok = protocol_sp.open_roundtrip_sp(mesh_dpsp, kp, ck, x, PARAMS)
    assert ok.shape == (8,)
    assert bool(jnp.all(ok)) and bool(all_ok)


def test_sp_linear_and_sum_roundtrips(mesh_dpsp):
    from ringzk_tpu.parallel import protocol_sp

    n_sp = 64
    kk, kg, kx, kp, kp2 = jax.random.split(jax.random.PRNGKey(21), 5)
    ck = rz.keygen(kk, PARAMS, n_sp)
    g = jax.random.randint(kg, (8, n_sp), -PARAMS.q, PARAMS.q + 1, jnp.int32)
    x = jax.random.randint(
        kx, (8, PARAMS.l, n_sp), -PARAMS.q, PARAMS.q + 1, jnp.int32
    )
    ok, all_ok = protocol_sp.linear_roundtrip_sp(mesh_dpsp, kp, ck, g, x, PARAMS)
    assert bool(all_ok)
    gs = jax.random.randint(kg, (8, 3, n_sp), -PARAMS.q, PARAMS.q + 1, jnp.int32)
    xs = jax.random.randint(
        kx, (8, 3, PARAMS.l, n_sp), -PARAMS.q, PARAMS.q + 1, jnp.int32
    )
    ok, all_ok = protocol_sp.sum_roundtrip_sp(mesh_dpsp, kp2, ck, gs, xs, PARAMS)
    assert bool(all_ok)


def test_sp_open_forged_rejected(mesh_dpsp):
    """Negative path under sp sharding: the sp-aware verifier still
    rejects -- run the phases with the override installed and forge z.

    Two jitted programs (honest phases, then re-verify of a tampered z):
    eager per-op sharded dispatch took ~15 min of wall-clock; and the ck's
    MXU digit operators are stripped like protocol_sp does, so the sp NTT
    matvec path (not the digit matmul) is what verifies/rejects here."""
    from ringzk_tpu.ops import ntt as ntt_mod
    from ringzk_tpu.parallel import protocol_sp
    from ringzk_tpu.parallel.ring_sp import SpRing
    from ringzk_tpu.protocols import open as open_mod

    n_sp = 64
    ring = SpRing(n=n_sp, q=Q, mesh=mesh_dpsp, axis="sp", batch_axis="dp")
    kk, kx, kp, kc = jax.random.split(jax.random.PRNGKey(22), 4)
    ck = protocol_sp._lane_sharded_ck(mesh_dpsp, rz.keygen(kk, PARAMS, n_sp), "sp")
    x = jax.random.randint(
        kx, (8, PARAMS.l, n_sp), -PARAMS.q, PARAMS.q + 1, jnp.int32
    )

    @jax.jit
    def honest(kp, kc, x):
        with ntt_mod.ring_override(ring):
            rctx, pcom = open_mod.prover_commit(kp, ck, x, PARAMS)
            vctx, chal = open_mod.generate_challenge(kc, pcom, PARAMS)
            resp = open_mod.create_response(rctx, chal, PARAMS)
            ok = open_mod.verify(ck, resp, vctx, PARAMS)
        return ok, resp.z, vctx

    @jax.jit
    def reverify(z, vctx):
        with ntt_mod.ring_override(ring):
            return open_mod.verify(ck, open_mod.OpenProofResponse(z=z), vctx,
                                   PARAMS)

    ok, z, vctx = honest(kp, kc, x)
    assert bool(jnp.all(ok))
    assert not bool(jnp.any(reverify(z.at[..., 0, 0].add(1), vctx)))


# -- tp: CRT prime axis sharded ----------------------------------------------


def test_tp_polymul_matches_plain(rng):
    """The P=3 prime axis sharded over "tp": per-prime NTTs run tp-locally,
    Garner gathers the residues (parallel/ntt_tp.py)."""
    from ringzk_tpu.parallel import ntt_tp

    if len(jax.devices()) < 3:
        pytest.skip("needs 3 devices (run via scripts/pytest-cpu)")
    mesh = ntt_tp.make_tp_mesh(dp=1)
    n_tp = 256
    a = jnp.asarray(rng.integers(-(Q // 2), Q // 2 + 1, size=(n_tp,)), jnp.int32)
    b = jnp.asarray(rng.integers(-(Q // 2), Q // 2 + 1, size=(n_tp,)), jnp.int32)
    got = np.asarray(ntt_tp.polymul_tp(mesh, a, b, n_tp, Q))
    want = np.asarray(ntt.get_ring(n_tp, Q).polymul(a, b))
    np.testing.assert_array_equal(got, want)


def test_tp_dp_composed(rng):
    from ringzk_tpu.parallel import ntt_tp

    if len(jax.devices()) < 6:
        pytest.skip("needs 6 devices (run via scripts/pytest-cpu)")
    mesh = ntt_tp.make_tp_mesh(dp=2)
    n_tp = 256
    a = jnp.asarray(rng.integers(-(Q // 2), Q // 2 + 1, size=(4, n_tp)), jnp.int32)
    b = jnp.asarray(rng.integers(-(Q // 2), Q // 2 + 1, size=(4, n_tp)), jnp.int32)
    got = np.asarray(ntt_tp.polymul_tp(mesh, a, b, n_tp, Q, batch_axis="dp"))
    want = np.asarray(ntt.get_ring(n_tp, Q).polymul(a, b))
    np.testing.assert_array_equal(got, want)


def test_tp_wrong_axis_size_raises(rng):
    from ringzk_tpu.parallel import ntt_tp
    from jax.sharding import Mesh as JMesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = JMesh(np.asarray(jax.devices()[:4]).reshape(4), ("tp",))
    a = jnp.zeros((16,), jnp.int32)
    with pytest.raises(ValueError, match="tp axis"):
        ntt_tp.polymul_tp(mesh, a, a, 16, Q)
