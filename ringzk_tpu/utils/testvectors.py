"""Cross-implementation test vectors and transcript determinism.

Two jobs (SURVEY.md section 4's "bit-exactness harness"):

1. **Self-determinism**: our transcripts are a pure function of the PRNG key
   (jax.random's counter-based threefry is platform-independent), so a
   SHA-256 digest of the canonical wire encoding of a whole protocol run is
   a golden value -- any accidental change to sampling order, wire layout,
   or arithmetic shows up as a digest change (tests/test_golden.py).

2. **Rust interchange**: the reference cannot be built in this image (no
   Rust toolchain), so bit-exact cross-checking against ring-zk uses
   dropped-in golden files instead. The interchange format is JSON:

     {"n": 16, "params": {...}, "seed": ...,
      "ck": {"a1": [[[coeffs...]]], "a2": ...},
      "x": [[coeffs...]], "r": ..., "y": ..., "d": ..., "z": ...,
      "c": ..., "t": ...}

   (column-major-free: plain nested lists of centered i64 coefficients,
   trailing zeros NOT trimmed). `check_rust_vector` replays the algebraic
   pipeline on the recorded randomness (r, y, d) and asserts every derived
   quantity (c, t, z, verify) matches -- this validates arithmetic
   bit-exactness without replaying Rust's RNG bitstream. A generator for
   the Rust side is specified in docs/INTEROP.md.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np

from ..ops import mat, zq
from ..ops.ntt import get_ring
from ..params import Params
from . import serial


def transcript_digest(tree) -> str:
    """SHA-256 of the canonical (compact) wire encoding of a pytree."""
    return hashlib.sha256(serial.dumps(tree, compact=True)).hexdigest()


def check_rust_vector(vec: dict) -> dict:
    """Replay a recorded open-proof transcript algebraically.

    vec: the interchange JSON (already parsed). Returns a dict of named
    bool results; all must be True for bit-exact agreement.
    """
    p = vec["params"]
    params = Params(
        q=p["q"], b=p["b"], n=p["n"], k=p["k"], l=p["l"], kappa=p["kappa"],
        modulus=p.get("modulus", 2 * p["q"] + 1),
    )
    n_deg = vec["n"]
    ring = get_ring(n_deg, params.modulus)

    import jax.numpy as jnp

    a1 = jnp.asarray(vec["ck"]["a1"], ring.dtype)   # [n, k, N]
    a2 = jnp.asarray(vec["ck"]["a2"], ring.dtype)   # [l, k, N]
    x = jnp.asarray(vec["x"], ring.dtype)           # [l, N]
    r = jnp.asarray(vec["r"], ring.dtype)           # [k, N]
    y = jnp.asarray(vec["y"], ring.dtype)           # [k, N]
    d = jnp.asarray(vec["d"], ring.dtype)           # [N]

    a_hat = ring.fwd_const(jnp.concatenate([a1, a2], axis=0))
    a1_hat = ring.fwd_const(a1)

    # c = [a1; a2].r + [0; x]
    zfull = jnp.concatenate(
        [jnp.zeros((params.n, n_deg), ring.dtype), x], axis=0
    )
    c = zq.add_centered(ring.qctx, mat.matvec(ring, a_hat, ring.fwd(r)), zfull)
    # t = a1.y
    t = mat.matvec(ring, a1_hat, ring.fwd(y))
    # z = y + d*r
    dr = ring.inv(mat.scalar_mul_hat(ring, ring.fwd_const(d), ring.fwd(r)))
    z = zq.add_centered(ring.qctx, y, dr)

    results = {
        "c": np.array_equal(np.asarray(c), np.asarray(vec["c"], np.int64)),
        "t": np.array_equal(np.asarray(t), np.asarray(vec["t"], np.int64)),
        "z": np.array_equal(np.asarray(z), np.asarray(vec["z"], np.int64)),
    }
    # verifier algebra: a1.z == t + c1*d
    lhs = mat.matvec(ring, a1_hat, ring.fwd(z))
    c1 = c[: params.n]
    rhs = ring.inv(
        ring.add_hat(
            ring.fwd(t), mat.scalar_mul_hat(ring, ring.fwd_const(d), ring.fwd(c1))
        )
    )
    results["verify_eq"] = np.array_equal(np.asarray(lhs), np.asarray(rhs))
    return results


def _params_of(vec: dict) -> Params:
    p = vec["params"]
    return Params(
        q=p["q"], b=p["b"], n=p["n"], k=p["k"], l=p["l"], kappa=p["kappa"],
        modulus=p.get("modulus", 2 * p["q"] + 1),
    )


def check_rust_vector_linear(vec: dict) -> dict:
    """Replay a recorded linear-proof transcript (x' = g*x) algebraically.

    Extra fields over the open-proof format: g [N]; rp, yp [k, N]; and the
    recorded outputs cp [n+l, N], tp [n, N], u [l, N], zp [k, N]."""
    params = _params_of(vec)
    n_deg = vec["n"]
    ring = get_ring(n_deg, params.modulus)

    import jax.numpy as jnp

    a1 = jnp.asarray(vec["ck"]["a1"], ring.dtype)
    a2 = jnp.asarray(vec["ck"]["a2"], ring.dtype)
    g = jnp.asarray(vec["g"], ring.dtype)
    x = jnp.asarray(vec["x"], ring.dtype)
    r = jnp.asarray(vec["r"], ring.dtype)
    rp = jnp.asarray(vec["rp"], ring.dtype)
    y = jnp.asarray(vec["y"], ring.dtype)
    yp = jnp.asarray(vec["yp"], ring.dtype)
    d = jnp.asarray(vec["d"], ring.dtype)

    a_hat = ring.fwd_const(jnp.concatenate([a1, a2], axis=0))
    a1_hat = ring.fwd_const(a1)
    a2_hat = ring.fwd_const(a2)
    g_hat = ring.fwd_const(g)
    d_hat = ring.fwd_const(d)

    def commit_value(xv, rv):
        zfull = jnp.concatenate(
            [jnp.zeros((params.n, n_deg), ring.dtype), xv], axis=0
        )
        return zq.add_centered(
            ring.qctx, mat.matvec(ring, a_hat, ring.fwd(rv)), zfull
        )

    gx = ring.inv(mat.scalar_mul_hat(ring, g_hat, ring.fwd(x)))
    c = commit_value(x, r)
    cp = commit_value(gx, rp)
    t = mat.matvec(ring, a1_hat, ring.fwd(y))
    tp = mat.matvec(ring, a1_hat, ring.fwd(yp))
    a2y = mat.matvec(ring, a2_hat, ring.fwd(y))
    a2yp = mat.matvec(ring, a2_hat, ring.fwd(yp))
    u = zq.sub_centered(
        ring.qctx, ring.inv(mat.scalar_mul_hat(ring, g_hat, ring.fwd(a2y))), a2yp
    )
    z = zq.add_centered(
        ring.qctx, y, ring.inv(mat.scalar_mul_hat(ring, d_hat, ring.fwd(r)))
    )
    zp = zq.add_centered(
        ring.qctx, yp, ring.inv(mat.scalar_mul_hat(ring, d_hat, ring.fwd(rp)))
    )
    results = {}
    for name, got in [("c", c), ("cp", cp), ("t", t), ("tp", tp), ("u", u),
                      ("z", z), ("zp", zp)]:
        # the reference derives no serde on LinearProofResponse, so its
        # generator records z/zp as null -- they are recomputed above and
        # checked implicitly through the verifier relation below
        if vec.get(name) is not None:
            results[name] = np.array_equal(
                np.asarray(got), np.asarray(vec[name], np.int64)
            )
    # verifier relation: g*(a2.z) - a2.zp == (g*c2 - c2p)*d + u
    a2z = mat.matvec(ring, a2_hat, ring.fwd(z))
    a2zp = mat.matvec(ring, a2_hat, ring.fwd(zp))
    lhs = zq.sub_centered(
        ring.qctx, ring.inv(mat.scalar_mul_hat(ring, g_hat, ring.fwd(a2z))), a2zp
    )
    gc2 = ring.inv(
        ring.sub_hat(
            mat.scalar_mul_hat(ring, g_hat, ring.fwd(c[params.n :])),
            ring.fwd(cp[params.n :]),
        )
    )
    rhs = zq.add_centered(
        ring.qctx, ring.inv(mat.scalar_mul_hat(ring, d_hat, ring.fwd(gc2))), u
    )
    results["verify_eq"] = np.array_equal(np.asarray(lhs), np.asarray(rhs))
    return results


def check_rust_vector_sum(vec: dict) -> dict:
    """Replay a recorded sum-proof transcript (x' = sum g_i x_i).

    Vector fields: gs [V, N], xs [V, l, N], rs [V, k, N], ys [V, k, N],
    rp, yp [k, N], d [N]; outputs cs [V, n+l, N], cp, ts [V, n, N], tp, u,
    zs [V, k, N], zp."""
    params = _params_of(vec)
    n_deg = vec["n"]
    ring = get_ring(n_deg, params.modulus)

    import jax.numpy as jnp

    a1 = jnp.asarray(vec["ck"]["a1"], ring.dtype)
    a2 = jnp.asarray(vec["ck"]["a2"], ring.dtype)
    gs = jnp.asarray(vec["gs"], ring.dtype)
    xs = jnp.asarray(vec["xs"], ring.dtype)
    rs = jnp.asarray(vec["rs"], ring.dtype)
    rp = jnp.asarray(vec["rp"], ring.dtype)
    ys = jnp.asarray(vec["ys"], ring.dtype)
    yp = jnp.asarray(vec["yp"], ring.dtype)
    d = jnp.asarray(vec["d"], ring.dtype)

    a_hat = ring.fwd_const(jnp.concatenate([a1, a2], axis=0))
    a1_hat = ring.fwd_const(a1)
    a2_hat = ring.fwd_const(a2)
    gs_hat = ring.fwd_const(gs)
    d_hat = ring.fwd_const(d)

    def commit_value(xv, rv):
        zfull = jnp.concatenate(
            [jnp.zeros(xv.shape[:-2] + (params.n, n_deg), ring.dtype), xv],
            axis=-2,
        )
        return zq.add_centered(
            ring.qctx, mat.matvec(ring, a_hat, ring.fwd(rv)), zfull
        )

    xp = ring.sum_to_centered(
        mat.scalar_mul_hat(ring, gs_hat, ring.fwd(xs)), axis=-3
    )
    cs = commit_value(xs, rs)
    cp = commit_value(xp, rp)
    ts = mat.matvec(ring, a1_hat, ring.fwd(ys))
    tp = mat.matvec(ring, a1_hat, ring.fwd(yp))
    a2ys = mat.matvec(ring, a2_hat, ring.fwd(ys))
    a2yp = mat.matvec(ring, a2_hat, ring.fwd(yp))
    u = zq.sub_centered(
        ring.qctx,
        ring.sum_to_centered(
            mat.scalar_mul_hat(ring, gs_hat, ring.fwd(a2ys)), axis=-3
        ),
        a2yp,
    )
    zs = zq.add_centered(
        ring.qctx, ys,
        ring.inv(mat.scalar_mul_hat(ring, d_hat[..., None, :], ring.fwd(rs))),
    )
    zp = zq.add_centered(
        ring.qctx, yp, ring.inv(mat.scalar_mul_hat(ring, d_hat, ring.fwd(rp)))
    )
    results = {}
    for name, got in [("cs", cs), ("cp", cp), ("ts", ts), ("tp", tp),
                      ("u", u), ("zs", zs), ("zp", zp)]:
        results[name] = np.array_equal(
            np.asarray(got), np.asarray(vec[name], np.int64)
        )
    return results


_CHECKERS = {
    "open": check_rust_vector,
    "linear": check_rust_vector_linear,
    "sum": check_rust_vector_sum,
}


def check_vector(vec: dict) -> dict:
    """Dispatch on vec["protocol"] (default "open"). Wide-ring vectors
    (derived modulus >= 2^32: the generator's ZqI64 wide families) carry
    int64 coefficients, so their replay runs under a scoped x64 enable."""
    fn = _CHECKERS[vec.get("protocol", "open")]
    p = vec["params"]
    if p.get("modulus", 2 * p["q"] + 1) >= 2**32:
        import jax

        with jax.enable_x64(True):
            return fn(vec)
    return fn(vec)


def load_vectors(path: str):
    with open(path) as f:
        data = json.load(f)
    return data if isinstance(data, list) else [data]
