"""Tier-3 doctest-analog tests: the README example flows of the reference,
driven through the object API (/root/reference/README.md:32-55 and the
module docs of open.rs/linear.rs/sum.rs)."""

import jax
import jax.numpy as jnp

import ringzk_tpu as rz

N = 16


def test_readme_commit_example():
    """/root/reference/src/commit.rs:66-78 doctest."""
    params = rz.Params()
    key = jax.random.PRNGKey(0)
    kk, kc = jax.random.split(key)
    ck = rz.generate_commitment_key(kk, params, N)
    x = rz.prepare_value(params, [[1, 2, 3, 4]], N)
    opening, com = rz.commit(kc, ck, x, params)
    assert bool(rz.verify(ck, com, opening, params))


def test_readme_open_proof_example():
    """/root/reference/src/prove/open.rs:14-36 doctest."""
    params = rz.Params()
    kk, kp, kc = jax.random.split(jax.random.PRNGKey(1), 3)
    ck = rz.generate_commitment_key(kk, params, N)
    x = rz.prepare_value(params, [[1, 2, 3, 4]], N)

    prover = rz.OpenProofProver(ck, params)
    verifier = rz.OpenProofVerifier(ck, params)

    response_ctx, commitment = prover.commit(kp, x)
    verification_ctx, challenge = verifier.generate_challenge(kc, commitment)
    response = prover.create_response(response_ctx, challenge)
    assert bool(verifier.verify(response, verification_ctx))


def test_readme_linear_proof_example():
    """/root/reference/src/prove/linear.rs:14-38 doctest."""
    params = rz.Params()
    kk, kp, kc = jax.random.split(jax.random.PRNGKey(2), 3)
    ck = rz.generate_commitment_key(kk, params, N)
    x = rz.prepare_value(params, [[1, 2, 3, 4]], N)
    g = rz.prepare_scalar(params, [5, 6], N)

    prover = rz.LinearProofProver(ck, params)
    verifier = rz.LinearProofVerifier(ck, params)

    response_ctx, commitment = prover.commit(kp, g, x)
    verification_ctx, challenge = verifier.generate_challenge(kc, commitment)
    response = prover.create_response(response_ctx, challenge)
    assert bool(verifier.verify(response, verification_ctx))


def test_readme_sum_proof_example():
    """/root/reference/src/prove/sum.rs:20-50 doctest (VL=2)."""
    params = rz.Params()
    kk, kp, kc = jax.random.split(jax.random.PRNGKey(3), 3)
    ck = rz.generate_commitment_key(kk, params, N)
    xs = jnp.stack(
        [
            rz.prepare_value(params, [[1, 2, 3, 4]], N),
            rz.prepare_value(params, [[5, 6, 7, 8]], N),
        ]
    )
    gs = jnp.stack(
        [
            rz.prepare_scalar(params, [5, 6], N),
            rz.prepare_scalar(params, [7, 8], N),
        ]
    )

    prover = rz.SumProofProver(ck, params)
    verifier = rz.SumProofVerifier(ck, params)

    response_ctx, commitment = prover.commit(kp, gs, xs)
    verification_ctx, challenge = verifier.generate_challenge(kc, commitment)
    response = prover.create_response(response_ctx, challenge)
    assert bool(verifier.verify(response, verification_ctx))


def test_prepare_value_shape_checks():
    params = rz.Params()
    x = rz.prepare_value(params, [[1, 2, 3, 4]], N)
    assert x.shape == (1, N)
    assert int(x[0, 3]) == 4 and int(x[0, 4]) == 0
    g = rz.prepare_scalar(params, [5, 6], N)
    assert g.shape == (N,)
    try:
        rz.prepare_value(params, [[1], [2]], N)  # l=1 but 2 rows
        assert False, "should have raised"
    except ValueError:
        pass
