#!/usr/bin/env python
"""Measure the five BASELINE.json measurement configs (see BASELINE.md).

  1. single opening proof, Params::default, N=512, message [1,2,3,4]
     (the reference README example, /root/reference/README.md:32-55)
  2. 1024 batched opening proofs, N=512
  3. linear relation, N=512, batch 256, scalar length 2
  4. sum proof, 8 commitments (VL=8), N=1024
  5. 64K opening proofs with psum batch-verify (host-sharded runner;
     degenerate single-host form when only one process exists)

Emits one JSON line per config. Run on TPU with plain `python` (background;
first process pays the axon tunnel), or on CPU via the pytest-cpu env vars.
"""

import argparse
import json
import sys
import time

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, args, iters, windows=5):
    """Median of ``windows`` timing windows (the axon tunnel's dispatch
    rate swings ~20% between single windows; see bench.py)."""
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(2):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[len(times) // 2]


def emit(name, seconds, batch):
    print(
        json.dumps(
            {
                "config": name,
                "seconds_per_batch": round(seconds, 6),
                "proofs_per_s": round(batch / seconds, 1),
                "batch": batch,
            }
        ),
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--skip-config5", action="store_true")
    args = ap.parse_args()

    import ringzk_tpu as rz
    from ringzk_tpu.protocols import linear, open as open_mod, sum as sum_mod

    params = rz.Params()
    kk, kp = jax.random.split(jax.random.PRNGKey(0))
    ck512 = rz.keygen(kk, params, 512)

    # config 1: single proof, message [1,2,3,4]
    x1 = rz.prepare_value(params, [[[1, 2, 3, 4]]], 512)  # [1, l, N]
    f1 = jax.jit(lambda k: open_mod.roundtrip(k, ck512, x1, params))
    emit("1_single_open_N512", timeit(f1, (kp,), args.iters), 1)

    # config 2: 1024 batched opening proofs
    x2 = jax.random.randint(
        jax.random.PRNGKey(1), (1024, params.l, 512), -params.q, params.q + 1,
        dtype=jnp.int32,
    )
    f2 = jax.jit(lambda k: open_mod.roundtrip(k, ck512, x2, params))
    emit("2_batched_open_1024_N512", timeit(f2, (kp,), args.iters), 1024)

    # config 3: linear, batch 256, scalar length 2
    g3 = rz.prepare_scalar(params, [[3, 5]] * 256, 512)  # [256, N], 2 coeffs
    x3 = jax.random.randint(
        jax.random.PRNGKey(2), (256, params.l, 512), -params.q, params.q + 1,
        dtype=jnp.int32,
    )
    f3 = jax.jit(lambda k: linear.roundtrip(k, ck512, g3, x3, params))
    emit("3_linear_256_N512_slen2", timeit(f3, (kp,), args.iters), 256)

    # config 4: sum with 8 commitments at N=1024
    ck1024 = rz.keygen(jax.random.PRNGKey(3), params, 1024)
    gs4 = jax.random.randint(
        jax.random.PRNGKey(4), (32, 8, 1024), -params.q, params.q + 1,
        dtype=jnp.int32,
    )
    xs4 = jax.random.randint(
        jax.random.PRNGKey(5), (32, 8, params.l, 1024), -params.q, params.q + 1,
        dtype=jnp.int32,
    )
    f4 = jax.jit(lambda k: sum_mod.roundtrip(k, ck1024, gs4, xs4, params))
    emit("4_sum_VL8_N1024_batch32", timeit(f4, (kp,), args.iters), 32)

    # config 5: 64K proofs, host-sharded psum batch-verify
    if not args.skip_config5:
        from ringzk_tpu.parallel import multihost

        out = multihost.batch_verify_run(
            total_batch=65536, n_deg=512, iters=max(1, args.iters // 2)
        )
        print(json.dumps({"config": "5_multihost_64k_N512", **out}), flush=True)


if __name__ == "__main__":
    main()
