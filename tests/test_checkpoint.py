"""Mid-protocol suspend/resume: save the prover's response context after
move 1, reload it, and complete the sigma protocol (SURVEY.md section 5.4)."""

import jax
import jax.numpy as jnp

import ringzk_tpu as rz
from ringzk_tpu.protocols import open as open_mod
from ringzk_tpu.utils import checkpoint

N = 16


def test_suspend_resume_open_proof(tmp_path):
    params = rz.Params()
    kk, kx, kp, kc = jax.random.split(jax.random.PRNGKey(0), 4)
    ck = rz.keygen(kk, params, N)
    x = jax.random.randint(kx, (2, params.l, N), -params.q, params.q + 1, jnp.int32)

    rctx, pcom = open_mod.prover_commit(kp, ck, x, params)
    path = str(tmp_path / "rctx.rzk")
    checkpoint.save(path, rctx)

    # ... time passes; a fresh context resumes from disk ...
    rctx2 = checkpoint.load(path, open_mod.OpenProofResponseContext)

    vctx, chal = open_mod.generate_challenge(kc, pcom, params)
    resp = open_mod.create_response(rctx2, chal, params)
    ok = open_mod.verify(ck, resp, vctx, params)
    assert bool(jnp.all(ok))


def test_suspend_resume_linear_proof(tmp_path):
    """Typed reload of the linear response context (nested Openings) via
    the generic rebuild -- then finish the protocol from the reload."""
    from ringzk_tpu.protocols import linear

    params = rz.Params()
    kk, kx, kg, kp, kc = jax.random.split(jax.random.PRNGKey(1), 5)
    ck = rz.keygen(kk, params, N)
    x = jax.random.randint(kx, (2, params.l, N), -params.q, params.q + 1, jnp.int32)
    g = jax.random.randint(kg, (2, N), -params.q, params.q + 1, jnp.int32)

    rctx, pcom = linear.prover_commit(kp, ck, g, x, params)
    path = str(tmp_path / "lrctx.rzk")
    checkpoint.save(path, rctx)
    rctx2 = checkpoint.load(path, linear.LinearProofResponseContext)
    assert rctx2.opening.f is None and rctx2.opening_p.f is None

    vctx, chal = linear.generate_challenge(kc, pcom, params)
    resp = linear.create_response(rctx2, chal, params)
    assert bool(jnp.all(linear.verify(ck, resp, vctx, params)))


def test_suspend_resume_sum_proof(tmp_path):
    from ringzk_tpu.protocols import sum as sum_mod

    params = rz.Params()
    kk, kx, kg, kp, kc = jax.random.split(jax.random.PRNGKey(2), 5)
    ck = rz.keygen(kk, params, N)
    xs = jax.random.randint(
        kx, (2, 3, params.l, N), -params.q, params.q + 1, jnp.int32
    )
    gs = jax.random.randint(kg, (2, 3, N), -params.q, params.q + 1, jnp.int32)

    rctx, pcom = sum_mod.prover_commit(kp, ck, gs, xs, params)
    path = str(tmp_path / "srctx.rzk")
    checkpoint.save(path, rctx)
    rctx2 = checkpoint.load(path, sum_mod.SumProofResponseContext)

    vctx, chal = sum_mod.generate_challenge(kc, pcom, params)
    resp = sum_mod.create_response(rctx2, chal, params)
    assert bool(jnp.all(sum_mod.verify(ck, resp, vctx, params)))
