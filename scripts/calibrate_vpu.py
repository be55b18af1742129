#!/usr/bin/env python
"""Calibrate the sustained uint32 VPU op rate used as the NTT roofline.

The roofline in bench.py divides a measured peak lane-op rate by a
per-butterfly op count. Both sides must use the same op currency (one
jnp-level uint32 op = 1), and the peak measurement must actually saturate
the VPU or the ratio exceeds 100% and means nothing. This script measures
several candidate peak kernels and prints their sustained rates so the
bench's calibration constant can be pinned to the best (= most saturating)
one:

  A. XLA elementwise multiply-add chains, 4/8/16 independent chains
  B. same but add-only (no 32-bit multiply decomposition cost)
  C. a Pallas kernel running dense dependent MAC chains entirely in VMEM
  D. the butterfly-mix chain: csub + roll + select + lazy-Shoup per step,
     i.e. the real stage op sequence on fake twiddles -- the achievable
     rate for the *actual* instruction mix, measured outside the NTT
     (this is the denominator bench.py should use)

Run on the TPU:  python scripts/calibrate_vpu.py
"""

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


def bench(fn, x, iters=10):
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def madd_chains(lanes, chain):
    def f(v):
        vs = [v + jnp.uint32(i) for i in range(lanes)]
        for i in range(chain):
            vs = [u * jnp.uint32(2654435761 + i) + jnp.uint32(i) for u in vs]
        out = vs[0]
        for u in vs[1:]:
            out = out ^ u
        return out

    return f, lanes * chain * 2  # ops per element


def add_chains(lanes, chain):
    def f(v):
        vs = [v + jnp.uint32(i) for i in range(lanes)]
        for i in range(chain):
            vs = [(u ^ jnp.uint32(2654435761 + i)) + jnp.uint32(i) for u in vs]
        out = vs[0]
        for u in vs[1:]:
            out = out ^ u
        return out

    return f, lanes * chain * 2


def butterfly_mix(n, p, stages):
    """One synthetic lazy-butterfly stage repeated `stages` times: the exact
    jnp op sequence of ntt_kernel._fwd_stages_lazy with constant twiddles."""
    from ringzk_tpu.ops import u64

    two_p = np.uint32(2 * p)
    w = np.uint32(123456789 % p)
    ws = np.uint32((123456789 << 32) // p)

    def f(x):
        lane = jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 1)
        for s in range(stages):
            t = n >> (1 + (s % (n.bit_length() - 1)))
            x = x - jnp.where(x >= two_p, two_p, np.uint32(0))
            is_lo = (lane & np.uint32(t)) == 0
            xs = jnp.where(is_lo, jnp.roll(x, -t, -1), jnp.roll(x, t, -1))
            xin = jnp.where(is_lo, xs, x)
            q = u64.mul_hi(ws, xin)
            prod = w * xin - q * np.uint32(p)
            x = jnp.where(is_lo, x + prod, xs + two_p - prod)
        return x

    return f, None


def pallas_mac(chain):
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        v = x_ref[...]
        a = v ^ jnp.uint32(1)
        for i in range(chain):
            v = v * jnp.uint32(2654435761 + i) + jnp.uint32(i)
            a = a * jnp.uint32(2246822519 + i) + jnp.uint32(i)
        o_ref[...] = v ^ a

    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(x.shape[0] // 256,),
            in_specs=[pl.BlockSpec((256, x.shape[1]), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((256, x.shape[1]), lambda i: (i, 0)),
        )(x)

    return f, chain * 2 * 2


def main():
    n = 512
    rows = 3 * 8192  # the create_response working set shape
    x = jax.random.randint(
        jax.random.PRNGKey(0), (rows, n), 0, 2**31 - 1, jnp.int32
    ).astype(jnp.uint32)
    size = x.size

    print(f"array: {x.shape} uint32 ({x.nbytes/1e6:.1f} MB)", flush=True)

    for lanes in (4, 8, 16):
        f, ops = madd_chains(lanes, 32)
        dt = bench(jax.jit(f), x)
        print(f"madd chains x{lanes:<2d}: {size*ops/dt:.3e} uint32 ops/s")

    f, ops = add_chains(8, 32)
    dt = bench(jax.jit(f), x)
    print(f"add chains  x8 : {size*ops/dt:.3e} uint32 ops/s")

    f, ops = pallas_mac(64)
    try:
        dt = bench(jax.jit(f), x)
        print(f"pallas mac d64 : {size*ops/dt:.3e} uint32 ops/s")
    except Exception as e:  # interpret-mode/back-end gaps
        print(f"pallas mac: skipped ({type(e).__name__})")

    # The one that matters: achievable rate for the butterfly's own op mix.
    stages = 36
    p = 998244353
    f, _ = butterfly_mix(n, p, stages)
    dt = bench(jax.jit(f), x)
    # each synthetic stage processes size lanes = size/2 butterflies
    bfly_rate = size * stages / 2 / dt
    print(f"butterfly-mix  : {bfly_rate:.3e} achievable butterflies/s "
          f"({stages} synthetic stages, XLA path)")


if __name__ == "__main__":
    main()
