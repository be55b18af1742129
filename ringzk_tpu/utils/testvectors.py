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

    a1 = jnp.asarray(vec["ck"]["a1"], jnp.int32)   # [n, k, N]
    a2 = jnp.asarray(vec["ck"]["a2"], jnp.int32)   # [l, k, N]
    x = jnp.asarray(vec["x"], jnp.int32)           # [l, N]
    r = jnp.asarray(vec["r"], jnp.int32)           # [k, N]
    y = jnp.asarray(vec["y"], jnp.int32)           # [k, N]
    d = jnp.asarray(vec["d"], jnp.int32)           # [N]

    a_hat = ring.fwd_const(jnp.concatenate([a1, a2], axis=0))
    a1_hat = ring.fwd_const(a1)

    # c = [a1; a2].r + [0; x]
    zfull = jnp.concatenate(
        [jnp.zeros((params.n, n_deg), jnp.int32), x], axis=0
    )
    c = ring.inv(
        ring.add_hat(mat.matvec_hat(ring, a_hat, ring.fwd(r)), ring.fwd(zfull))
    )
    # t = a1.y
    t = ring.inv(mat.matvec_hat(ring, a1_hat, ring.fwd(y)))
    # z = y + d*r
    dr = ring.inv(mat.scalar_mul_hat(ring, ring.fwd_const(d), ring.fwd(r)))
    z = zq.add_centered(ring.qctx, y, dr)

    results = {
        "c": np.array_equal(np.asarray(c), np.asarray(vec["c"], np.int64)),
        "t": np.array_equal(np.asarray(t), np.asarray(vec["t"], np.int64)),
        "z": np.array_equal(np.asarray(z), np.asarray(vec["z"], np.int64)),
    }
    # verifier algebra: a1.z == t + c1*d
    lhs = ring.inv(mat.matvec_hat(ring, a1_hat, ring.fwd(z)))
    c1 = c[: params.n]
    rhs = ring.inv(
        ring.add_hat(
            ring.fwd(t), mat.scalar_mul_hat(ring, ring.fwd_const(d), ring.fwd(c1))
        )
    )
    results["verify_eq"] = np.array_equal(np.asarray(lhs), np.asarray(rhs))
    return results


def load_vectors(path: str):
    with open(path) as f:
        data = json.load(f)
    return data if isinstance(data, list) else [data]
