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
