#!/usr/bin/env python
"""Full benchmark suite: per-phase and per-protocol timings + JSON emitter.

Reproduces the reference's Criterion bench surface
(/root/reference/benches/bench.rs: 4 phases x 3 protocols at N=512, VL=4 for
sum) as batched TPU programs, plus the BASELINE.json measurement configs:

  1. single open proof roundtrip (README example config)
  2. 1024 batched open proofs
  3. linear relation, batch 256, scalar len 2
  4. sum proof, 8 summands, N=1024
  5. (multi-host config runs via parallel.mesh; single-chip here)

Emits a github-action-benchmark-style JSON list (the reference CI publishes
Criterion means the same way -- .github/scripts/extract-benchmarks.sh) to
--out, and a human table to stderr.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax
import jax.numpy as jnp


def timeit(fn, args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_results.json")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--quick", action="store_true", help="small shapes (CI smoke)")
    args = ap.parse_args()

    import ringzk_tpu as rz
    from ringzk_tpu.protocols import linear, open as open_mod, sum as sum_mod

    params = rz.Params()
    n_deg = 64 if args.quick else 512
    b = 8 if args.quick else args.batch
    results = []

    def record(name, seconds_per_batch, batch, unit_scale=1e9):
        per_op_ns = seconds_per_batch / batch * unit_scale
        results.append({"name": name, "unit": "ns/op", "value": round(per_op_ns, 1),
                        "extra": f"batch={batch}, N={n_deg}"})
        print(f"{name:36s} {per_op_ns:14.1f} ns/op  "
              f"({batch / seconds_per_batch:12.1f} op/s)", file=sys.stderr)

    kk, kx, kg, kp, kc = jax.random.split(jax.random.PRNGKey(0), 5)
    ck = rz.keygen(kk, params, n_deg)
    x = jax.random.randint(kx, (b, params.l, n_deg), -params.q, params.q + 1,
                           dtype=jnp.int32)
    g = jax.random.randint(kg, (b, n_deg), -params.q, params.q + 1, dtype=jnp.int32)

    # ---- open proof phases (bench.rs:35-109) ----
    commit_f = jax.jit(lambda k, x: open_mod.prover_commit(k, ck, x, params))
    rctx, pcom = commit_f(kp, x)
    record("open_proof_commit", timeit(commit_f, (kp, x), args.iters), b)

    chal_f = jax.jit(lambda k, pc: open_mod.generate_challenge(k, pc, params))
    vctx, chal = chal_f(kc, pcom)
    record("open_proof_generate_challenge", timeit(chal_f, (kc, pcom), args.iters), b)

    resp_f = jax.jit(lambda rc, ch: open_mod.create_response(rc, ch, params))
    resp = resp_f(rctx, chal)
    record("open_proof_create_response", timeit(resp_f, (rctx, chal), args.iters), b)

    verify_f = jax.jit(lambda r, v: open_mod.verify(ck, r, v, params))
    record("open_proof_verify", timeit(verify_f, (resp, vctx), args.iters), b)

    # ---- linear proof phases (bench.rs:113-196) ----
    lb = max(1, b // 4)
    xl, gl = x[:lb], g[:lb]
    lcommit_f = jax.jit(lambda k: linear.prover_commit(k, ck, gl, xl, params))
    lrctx, lpcom = lcommit_f(kp)
    record("linear_proof_commit", timeit(lcommit_f, (kp,), args.iters), lb)

    lchal_f = jax.jit(lambda k, pc: linear.generate_challenge(k, pc, params))
    lvctx, lchal = lchal_f(kc, lpcom)
    record("linear_proof_generate_challenge", timeit(lchal_f, (kc, lpcom), args.iters), lb)

    lresp_f = jax.jit(lambda rc, ch: linear.create_response(rc, ch, params))
    lresp = lresp_f(lrctx, lchal)
    record("linear_proof_create_response", timeit(lresp_f, (lrctx, lchal), args.iters), lb)

    lverify_f = jax.jit(lambda r, v: linear.verify(ck, r, v, params))
    record("linear_proof_verify", timeit(lverify_f, (lresp, lvctx), args.iters), lb)

    # ---- sum proof phases, VL=4 (bench.rs:202-305) ----
    sb = max(1, b // 8)
    vl = 4
    xs = jax.random.randint(kx, (sb, vl, params.l, n_deg), -params.q, params.q + 1,
                            dtype=jnp.int32)
    gs = jax.random.randint(kg, (sb, vl, n_deg), -params.q, params.q + 1,
                            dtype=jnp.int32)
    scommit_f = jax.jit(lambda k: sum_mod.prover_commit(k, ck, gs, xs, params))
    srctx, spcom = scommit_f(kp)
    record("sum_proof_commit", timeit(scommit_f, (kp,), args.iters), sb)

    schal_f = jax.jit(lambda k, pc: sum_mod.generate_challenge(k, pc, params))
    svctx, schal = schal_f(kc, spcom)
    record("sum_proof_generate_challenge", timeit(schal_f, (kc, spcom), args.iters), sb)

    sresp_f = jax.jit(lambda rc, ch: sum_mod.create_response(rc, ch, params))
    sresp = sresp_f(srctx, schal)
    record("sum_proof_create_response", timeit(sresp_f, (srctx, schal), args.iters), sb)

    sverify_f = jax.jit(lambda r, v: sum_mod.verify(ck, r, v, params))
    record("sum_proof_verify", timeit(sverify_f, (sresp, svctx), args.iters), sb)

    # ---- end-to-end throughput (the headline) ----
    rt = jax.jit(lambda k, x: open_mod.roundtrip(k, ck, x, params))
    dt = timeit(rt, (kp, x), args.iters)
    record("open_proof_full_roundtrip", dt, b)
    # Human throughput line only (stderr): the JSON stays uniformly
    # smaller-is-better ns/op so github-action-benchmark's customSmallerIsBetter
    # regression alerting is meaningful for every entry.
    print(f"{'open_proofs_per_second':36s} {b / dt:14.1f} proofs/s", file=sys.stderr)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
