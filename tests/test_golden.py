"""Transcript determinism goldens: a fixed PRNG key must produce an
identical protocol transcript (bit-for-bit wire encoding) on every platform
and every run -- jax.random's threefry is counter-based and platform
independent, and all arithmetic here is exact integer math.

If one of these digests changes, sampling order, wire layout, or ring
arithmetic changed -- that is a breaking change to transcript compatibility
and must be intentional (regenerate with scripts/regen_golden.py).
"""

import json
import os

import jax
import jax.numpy as jnp
import pytest

import ringzk_tpu as rz
from ringzk_tpu.protocols import open as open_mod
from ringzk_tpu.utils.testvectors import transcript_digest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "transcripts.json")
N = 16
PARAMS = rz.Params()


def build_transcript():
    kk, kx, kp, kc = jax.random.split(jax.random.PRNGKey(20260817), 4)
    ck = rz.keygen(kk, PARAMS, N)
    x = jax.random.randint(kx, (2, PARAMS.l, N), -PARAMS.q, PARAMS.q + 1, dtype=jnp.int32)
    rctx, pcom = open_mod.prover_commit(kp, ck, x, PARAMS)
    vctx, chal = open_mod.generate_challenge(kc, pcom, PARAMS)
    resp = open_mod.create_response(rctx, chal, PARAMS)
    ok = open_mod.verify(ck, resp, vctx, PARAMS)
    assert bool(ok.all())
    return {
        "ck": transcript_digest({"a1": ck.a1, "a2": ck.a2}),
        "proof_commitment": transcript_digest(pcom),
        "challenge": transcript_digest(chal),
        "response": transcript_digest(resp),
    }


@pytest.mark.skipif(not os.path.exists(GOLDEN_PATH), reason="golden not generated")
def test_transcript_digests_stable():
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    got = build_transcript()
    assert got == want, f"transcript drift:\n got={got}\nwant={want}"


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(build_transcript(), f, indent=1)
    print("wrote", GOLDEN_PATH)
