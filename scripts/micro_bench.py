#!/usr/bin/env python
"""Component microbenchmarks on the current backend: where do the ms go?

Times each building block of the open-proof pipeline at the headline config
(N=512) so optimization effort goes where the time is.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, *args, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--n", type=int, default=512)
    args = ap.parse_args()
    b, n = args.batch, args.n

    import ringzk_tpu as rz
    from ringzk_tpu.ops import conv_mxu, mat, sampling
    from ringzk_tpu.ops.ntt import get_ring
    from ringzk_tpu.protocols import open as open_mod

    params = rz.Params()
    ring = get_ring(n, params.modulus)
    kk, kx, kp = jax.random.split(jax.random.PRNGKey(0), 3)
    ck = rz.keygen(kk, params, n)
    x = jax.random.randint(kx, (b, params.l, n), -params.q, params.q + 1, jnp.int32)
    r = jax.random.randint(kx, (b, params.k, n), -1, 2, jnp.int32)
    y = open_mod.sample_y(kp, params, n, (b,))
    z3 = jnp.clip(y, -(2**20), 2**20)
    sigma = params.standard_deviation(n)

    rows = [
        ("sample_uniform_r [B,k,N]", lambda k: sampling.uniform_centered(k, (b, params.k), n, 1), (kp,)),
        ("sample_gaussian_y [B,k,N]", lambda k: sampling.gaussian_rounded(k, (b, params.k), n, sigma), (kp,)),
        ("sample_challenge [B,N]", lambda k: sampling.challenge(k, (b,), n, params.kappa), (kp,)),
        ("fwd 3-prime [B,k,N]", lambda v: ring.fwd(v), (y,)),
        ("fwd 1-prime [B,k,N]", lambda v: ring.fwd(v, 1), (r,)),
        ("inv 3-prime [B,k,N]", lambda v: ring.inv(ring.fwd(v)), (y,)),
        ("mxu matvec a1.y (3dig)", lambda v: conv_mxu.matvec_digits(ring, ck.a1_dig, params.n, v, 3), (z3,)),
        ("mxu matvec A.r (1dig)", lambda v: jnp.concatenate([
            conv_mxu.matvec_digits(ring, ck.a1_dig, params.n, v, 1),
            conv_mxu.matvec_digits(ring, ck.a2_dig, params.l, v, 1)], axis=-2), (r,)),
        ("mxu matvec a1.z (4dig adv)", lambda v: conv_mxu.matvec_digits(ring, ck.a1_dig, params.n, v, 4), (z3,)),
        ("ntt matvec a1.y", lambda v: ring.inv(mat.matvec_hat(ring, ck.a1_hat, ring.fwd(v))), (y,)),
        ("digit decompose 4dig", lambda v: conv_mxu.balanced_digits(v, 4), (z3,)),
        ("norm check z", lambda v: jnp.all(
            __import__("ringzk_tpu.ops.norms", fromlist=["norms"]).norm2_leq(v, params.verify_bound(n)), -1), (z3,)),
    ]

    for name, fn, fargs in rows:
        dt = t(fn, *fargs)
        print(f"{name:32s} {dt*1e3:9.3f} ms  ({dt/b*1e9:8.1f} ns/proof)", flush=True)

    # full phases
    for name, fn, fargs in [
        ("PHASE prover_commit", lambda k, xx: open_mod.prover_commit(k, ck, xx, params), (kp, x)),
        ("PHASE roundtrip", lambda k, xx: open_mod.roundtrip(k, ck, xx, params), (kp, x)),
    ]:
        dt = t(fn, *fargs)
        print(f"{name:32s} {dt*1e3:9.3f} ms  ({dt/b*1e9:8.1f} ns/proof)", flush=True)


if __name__ == "__main__":
    main()
