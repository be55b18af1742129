"""Pallas fused NTT kernel must match the XLA roll-based path bit-for-bit
(interpret mode on CPU; the compiled kernel is exercised on TPU by the
bench/micro-bench scripts)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ringzk_tpu.ops import ntt
from ringzk_tpu.ops.pallas import ntt_kernel

from conftest import env_override

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


@pytest.mark.parametrize("n", [128, 512])
@pytest.mark.parametrize("num", [1, 2, 3])
def test_pallas_fused_fwd_matches_xla(rng, n, num):
    """fwd_all_pallas (multi-prime, lazy reduction, in-kernel centered
    reduce) must equal the strict XLA fwd() bit-for-bit."""
    import os
    ring = ntt.get_ring(n, Q)
    x = jnp.asarray(rng.integers(-(Q // 2), Q // 2 + 1, size=(5, n)), jnp.int32)
    with env_override("RINGZK_PALLAS", "0"):
        want = np.asarray(ring.fwd(x, num))
    got = np.asarray(ntt_kernel.fwd_all_pallas(ring, x, num, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [128, 512])
@pytest.mark.parametrize("num", [1, 3])
def test_pallas_fused_inv_matches_xla(rng, n, num):
    """inv_all_pallas (INTTs + Garner CRT + centered fold in VMEM) must
    equal the strict XLA inv() bit-for-bit, including on products."""
    import os
    ring = ntt.get_ring(n, Q)
    a = jnp.asarray(rng.integers(-(Q // 2), Q // 2 + 1, size=(4, n)), jnp.int32)
    b = jnp.asarray(rng.integers(-(Q // 2), Q // 2 + 1, size=(4, n)), jnp.int32)
    with env_override("RINGZK_PALLAS", "0"):
        if num == 3:
            xh = ring.dot_hat(ring.fwd_const(a), ring.fwd(b))
        else:
            xh = ring.fwd(jnp.asarray(a % 7, jnp.int32), num)
        want = np.asarray(ring.inv(xh))
    got = np.asarray(ntt_kernel.inv_all_pallas(ring, xh, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_fused_nondivisible_batch(rng):
    import os
    n = 128
    ring = ntt.get_ring(n, Q)
    x = jnp.asarray(rng.integers(-(Q // 2), Q // 2 + 1, size=(3, 7, n)), jnp.int32)
    with env_override("RINGZK_PALLAS", "0"):
        want = np.asarray(ring.fwd(x))
    got = np.asarray(ntt_kernel.fwd_all_pallas(ring, x, ntt.NUM_PRIMES, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n,rows,num", [(128, 3, 1), (128, 1, 2), (512, 3, 3)])
def test_pallas_scalar_mul_add_matches_composed(rng, n, rows, num):
    """Fused t + d*m kernel == composed fwd_const/fwd/inv + centered add,
    bit-for-bit, for every prime-subset size and row count used by the
    protocols (response: rows=k num=1; verify rhs: rows=n num=2)."""
    import os
    from ringzk_tpu.ops import zq

    ring = ntt.get_ring(n, Q)
    # keep |d*m| inside the num-prime CRT bound: ternary d for num=1
    dmax = 1 if num == 1 else Q // 2
    d = jnp.asarray(rng.integers(-dmax, dmax + 1, size=(5, n)), jnp.int32)
    m = jnp.asarray(
        rng.integers(-1 if num < 3 else -(Q // 2), (1 if num < 3 else Q // 2) + 1,
                     size=(5, rows, n)), jnp.int32)
    t = jnp.asarray(rng.integers(-(Q // 2), Q // 2 + 1, size=(5, rows, n)), jnp.int32)
    with env_override("RINGZK_PALLAS", "0"):
        dm = ring.inv(ring.dot_hat(ring.fwd_const(d, num)[..., None, :],
                                   ring.fwd(m, num)))
        want = np.asarray(zq.add_centered(ring.qctx, t, dm))
        via_method = np.asarray(ring.scalar_mul_add(d, m, t, num))
    np.testing.assert_array_equal(via_method, want)
    got = np.asarray(ntt_kernel.scalar_mul_add_pallas(ring, d, m, t, num,
                                                      interpret=True))
    np.testing.assert_array_equal(got, want)
    # v2 (rows in-block, scalar transformed once) must also be bit-exact
    got2 = np.asarray(ntt_kernel.scalar_mul_add_pallas_v2(ring, d, m, t, num,
                                                          interpret=True))
    np.testing.assert_array_equal(got2, want)


@pytest.mark.parametrize("n,kappa", [(128, 36), (512, 36), (512, 60), (256, 1),
                                     (512, 511)])
def test_pallas_challenge_select_matches_topk(rng, n, kappa):
    """The Pallas binary-search select must reproduce the stable-top_k
    challenge support bit-for-bit (same values-desc, lane-asc tie rule)."""
    from ringzk_tpu.ops import sampling
    from ringzk_tpu.ops.pallas import challenge_kernel

    u = jnp.asarray(rng.integers(0, 2**32, size=(37, n), dtype=np.uint64),
                    jnp.uint32)
    signs = jnp.asarray(1 - 2 * rng.integers(0, 2, size=(37, n)), jnp.int32)
    want = np.asarray(
        jnp.where(sampling._mask_topk(u, kappa), signs, jnp.zeros((), jnp.int32))
    )
    got = np.asarray(
        challenge_kernel.challenge_select_pallas(u, signs, kappa, interpret=True)
    )
    np.testing.assert_array_equal(got, want)
    assert (np.abs(got).sum(-1) == kappa).all()


def test_pallas_challenge_select_tie_breaking(rng):
    """Crafted duplicate keys straddling the kappa-th value: ties at the
    threshold must be taken in ascending lane order, exactly kappa total."""
    from ringzk_tpu.ops import sampling
    from ringzk_tpu.ops.pallas import challenge_kernel

    n, kappa = 128, 7
    # keys drawn from a tiny alphabet -> many duplicates, threshold ties
    u = jnp.asarray(rng.integers(0, 5, size=(64, n)), jnp.uint32)
    signs = jnp.asarray(1 - 2 * rng.integers(0, 2, size=(64, n)), jnp.int32)
    want = np.asarray(
        jnp.where(sampling._mask_topk(u, kappa), signs, jnp.zeros((), jnp.int32))
    )
    got = np.asarray(
        challenge_kernel.challenge_select_pallas(u, signs, kappa, interpret=True)
    )
    np.testing.assert_array_equal(got, want)
    assert (np.abs(got).sum(-1) == kappa).all()


def test_pallas_challenge_select_full_sampler(rng):
    """End-to-end: sampling.challenge with the Pallas select forced on
    equals the XLA top_k path under the same key (multi-dim batch)."""
    import os
    import jax
    from ringzk_tpu.ops import sampling

    key = jax.random.PRNGKey(7)
    with env_override("RINGZK_PALLAS_CHALLENGE", "0"):
        want = np.asarray(sampling.challenge(key, (3, 5), 512, 36))
    # interpret path via the kernel directly (CPU has no Mosaic), fed by the
    # sampler's own draw helper so the two sides cannot silently diverge
    signs, u = sampling.challenge_draws(key, (3, 5), 512)
    from ringzk_tpu.ops.pallas import challenge_kernel

    got = np.asarray(
        challenge_kernel.challenge_select_pallas(u, signs, 36, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_challenge_select_signkey_mode():
    """The kernel must agree with the XLA top_k path for the signkey draw
    too (31-bit selection keys, signs from bit 0 -- more threshold ties)."""
    import jax
    from ringzk_tpu.ops import sampling
    from ringzk_tpu.ops.pallas import challenge_kernel

    key = jax.random.PRNGKey(9)
    with env_override("RINGZK_CHALLENGE_SIGNKEY", "1"):
        with env_override("RINGZK_PALLAS_CHALLENGE", "0"):
            want = np.asarray(sampling.challenge(key, (4, 3), 512, 36))
        signs, u = sampling.challenge_draws(key, (4, 3), 512)
    got = np.asarray(
        challenge_kernel.challenge_select_pallas(u, signs, 36, interpret=True)
    )
    np.testing.assert_array_equal(got, want)
    assert (np.abs(got).sum(-1) == 36).all()


def test_pallas_matvec_kernel_bit_identical():
    """The fused digit-matvec kernel (RINGZK_PALLAS_MATVEC=1; interpret
    mode on CPU) must equal the XLA matmul+fold path bit for bit, across
    digit counts and both key matrices, incl. through a full roundtrip."""
    from conftest import env_override
    from ringzk_tpu import Params, keygen
    from ringzk_tpu.ops.ntt import get_ring
    from ringzk_tpu.ops.pallas.matvec_kernel import matvec_fits
    from ringzk_tpu.protocols import open as open_mod
    from ringzk_tpu.protocols.commit import matvec_key

    params = Params()
    n_deg = 512  # the kernel gate needs lane-aligned shapes
    ring = get_ring(n_deg, params.modulus)
    ck = keygen(jax.random.PRNGKey(40), params, n_deg)
    assert ck.a1_dig is not None and matvec_fits(ck.a1_dig, n_deg)

    for which, bound in [("a1", 1), ("a1", 10**6), ("a", 1), ("a", 10**6)]:
        v = jax.random.randint(
            jax.random.PRNGKey(41), (3, params.k, n_deg), -bound, bound + 1,
            jnp.int32,
        )
        with env_override("RINGZK_PALLAS_MATVEC", "1"):
            got = matvec_key(ring, ck, which, v, bound)
        with env_override("RINGZK_PALLAS_MATVEC", "0"):
            want = matvec_key(ring, ck, which, v, bound)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    x = jax.random.randint(
        jax.random.PRNGKey(42), (2, params.l, n_deg), -params.q, params.q + 1,
        jnp.int32,
    )
    with env_override("RINGZK_PALLAS_MATVEC", "1"):
        ok, op_ok = open_mod.roundtrip(jax.random.PRNGKey(43), ck, x, params)
    assert bool(jnp.all(ok)) and bool(jnp.all(op_ok))


def test_pallas_matvec_colblock_bit_identical():
    """The column-blocked digit-matvec kernel (operators past the resident
    VMEM gate -- N >= 1024) must equal the XLA matmul+fold path bit for
    bit, for both layouts, across digit counts, and through the keygen
    dispatch."""
    from conftest import env_override
    from ringzk_tpu.ops import conv_mxu
    from ringzk_tpu.ops.ntt import get_ring
    from ringzk_tpu.ops.pallas import matvec_kernel

    q = Q
    n_deg = 1024
    k, rows = 3, 1
    ring = get_ring(n_deg, q)
    a = jax.random.randint(
        jax.random.PRNGKey(50), (rows, k, n_deg), -(q // 2), q // 2 + 1,
        jnp.int32,
    )
    w2 = conv_mxu.build_operator_digits_device(a, ring)
    assert not matvec_kernel.matvec_fits(w2, n_deg)  # past the resident gate
    assert matvec_kernel.blocked_layout_ok(rows, k, n_deg, conv_mxu.KEY_DIGITS)
    w3 = matvec_kernel.to_blocked_layout(w2)
    assert w3.shape == (conv_mxu.KEY_DIGITS, k * n_deg, rows * n_deg)

    for ndig, bound in [(1, 1), (3, 10**6)]:
        v = jax.random.randint(
            jax.random.PRNGKey(51), (5, k, n_deg), -bound, bound + 1, jnp.int32
        )
        want = np.asarray(conv_mxu.matvec_digits(ring, w2, rows, v, ndig))
        got = np.asarray(
            matvec_kernel.matvec_digits_colblock(
                ring, w3, rows, v, ndig, interpret=True
            )
        )
        np.testing.assert_array_equal(got, want)
        # dispatcher: 3D operator routes to the colblock kernel when the
        # kernel is on, and reconstructs the 2D layout when it is off
        with env_override("RINGZK_PALLAS_MATVEC", "1"):
            got2 = np.asarray(conv_mxu.matvec_digits(ring, w3, rows, v, ndig))
        with env_override("RINGZK_PALLAS_MATVEC", "0"):
            got3 = np.asarray(conv_mxu.matvec_digits(ring, w3, rows, v, ndig))
        np.testing.assert_array_equal(got2, want)
        np.testing.assert_array_equal(got3, want)

    # non-TILE_B-divisible batch exercises the pad path
    v = jax.random.randint(
        jax.random.PRNGKey(52), (3, k, n_deg), -1, 2, jnp.int32
    )
    want = np.asarray(conv_mxu.matvec_digits(ring, w2, rows, v, 1))
    got = np.asarray(
        matvec_kernel.matvec_digits_colblock(ring, w3, rows, v, 1, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_keygen_blocked_layout_dispatch():
    """keygen stores the streamed [D, kN, rowsN] layout exactly when the
    colblock kernel is the active path (RINGZK_PALLAS_MATVEC=1, operator
    past the resident gate), and the full open roundtrip verifies on it."""
    from conftest import env_override
    from ringzk_tpu import Params, keygen
    from ringzk_tpu.protocols import open as open_mod

    params = Params()
    n_deg = 1024
    with env_override("RINGZK_PALLAS_MATVEC", "1"):
        ck = keygen(jax.random.PRNGKey(53), params, n_deg)
        assert ck.a1_dig is not None and ck.a1_dig.ndim == 3
        x = jax.random.randint(
            jax.random.PRNGKey(54), (2, params.l, n_deg), -params.q,
            params.q + 1, jnp.int32,
        )
        ok, op_ok = open_mod.roundtrip(jax.random.PRNGKey(55), ck, x, params)
        assert bool(jnp.all(ok)) and bool(jnp.all(op_ok))
    with env_override("RINGZK_PALLAS_MATVEC", "0"):
        ck2 = keygen(jax.random.PRNGKey(53), params, n_deg)
        assert ck2.a1_dig is not None and ck2.a1_dig.ndim == 2


def test_colblock_plan_solver():
    """The colblock VMEM plan: full-tile preference, cb maximization, env
    override, and refusal when nothing fits."""
    from conftest import env_override
    from ringzk_tpu.ops.pallas import matvec_kernel as mk

    # N=1024 key shape: full tile, widest fitting slab (the measured config)
    assert mk.colblock_plan(3072, 1024, 4) == (128, 256)
    # N=2048: only a shrunk-tile plan fits -> plan exists but the layout
    # gate refuses it (measured loss; blocked_layout_ok)
    plan = mk.colblock_plan(6144, 2048, 4)
    assert plan is not None and plan[0] < mk.TILE_B
    assert not mk.blocked_layout_ok(1, 3, 2048, 4)
    # N=4096: nothing fits -> None, gate refuses
    assert mk.colblock_plan(12288, 4096, 4) is None
    assert not mk.blocked_layout_ok(1, 3, 4096, 4)
    # stack estimate is monotone in every dimension
    s0 = mk._colblock_stack(128, 128, 3072, 4)
    assert mk._colblock_stack(128, 256, 3072, 4) > s0
    assert mk._colblock_stack(256, 128, 3072, 4) > s0
    assert mk._colblock_stack(128, 128, 6144, 4) > s0
    # env override forces cb (or refuses a non-divisor)
    with env_override("RINGZK_MATVEC_CB", "512"):
        assert mk.colblock_plan(3072, 1024, 4) == (mk.TILE_B, 512)
    with env_override("RINGZK_MATVEC_CB", "500"):
        assert mk.colblock_plan(3072, 1024, 4) is None
