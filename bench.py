"""Headline benchmark: verified proofs per second, N=512, one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "proofs/s", "vs_baseline": N,
   "windows": {"min": ..., "median": ..., "max": ...},
   "fetch_forced": N, "engine": {...}}

vs_baseline is measured against the north-star target of 1e5 verified
opening proofs/s per host at N=512 (BASELINE.json; the Rust reference
publishes no numbers and cannot be built here -- no Rust toolchain -- so the
north-star target is the denominator).

The extra fields make a driver-captured number self-diagnosing against the
documented band (round-3 lesson: BENCH_r03 read 4.5% under the band with
nothing to attribute it):
  windows       per-window proofs/s spread of the median-of-5 timing --
                wide spread == tunnel dispatch-rate swings, not a code
                regression;
  fetch_forced  a cross-check window timed to a D2H fetch of the result
                (catches block_until_ready under-reporting, BENCHMARKS.md);
                run LAST since the fetch degrades subsequent dispatch;
  engine        the active RINGZK_* flag fingerprint + PRNG impl + backend,
                so a flag-default regression is visible in the record.

Each open "proof" is the complete 3-move sigma protocol plus the standalone
opening verification: commit (incl. key-less message prep), t = a1.y,
challenge, z = y + d*r, norm check and a1.z == t + c1.d, plus
Commitment::verify -- i.e. strictly more work than any single Criterion
phase bench in the reference (/root/reference/benches/bench.rs).
--protocol linear|sum benches the other two protocols' full roundtrips the
same way (VL=4 summands for sum, the reference bench's config).

Usage: python bench.py [--protocol open|linear|sum] [--batch B] [--n N]
                       [--iters I] [--full]
  --full additionally prints the per-phase table (reference bench parity)
         to stderr (open protocol only).
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
# Throughput mode: the TPU-native RngBitGenerator PRNG is ~6% faster
# end-to-end than threefry (488k vs 460k proofs/s). The library default
# stays threefry (JAX's standard, key-stable across versions); the bench
# measures the recommended high-throughput deployment configuration.
os.environ.setdefault("JAX_DEFAULT_PRNG_IMPL", "rbg")

import jax
import jax.numpy as jnp


def _time_fn(fn, args, iters, windows=5):
    """Median-of-windows timing: ``windows`` back-to-back windows of
    ``iters`` dispatches each; report the median window.

    The axon-tunneled TPU backend has multi-second dispatch-rate swings
    (shared remote chip + tunnel queueing): a single window can read 20%
    below the sustained rate. The median over 5 windows is stable run to
    run, which is what makes the headline driver-reproducible.

    Returns (median_dt, sorted list of all window dts).
    """
    out = fn(*args)
    jax.block_until_ready(out)  # compile
    for _ in range(3):          # warm the dispatch path
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
    return times[len(times) // 2], times


def _time_fetch_forced(fn, args, iters):
    """One window timed to an actual D2H fetch of the result (np.asarray of
    a small leaf), catching block_until_ready under-reporting (observed 50x
    on this backend for argument-heavy programs -- BENCHMARKS.md). Must run
    AFTER all block_until_ready windows: the fetch itself can permanently
    degrade subsequent tunnel dispatch."""
    import numpy as np

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)  # the ONE D2H, inside the timed region
    return (time.perf_counter() - t0) / iters


def _engine_fingerprint():
    """The active engine configuration, for the JSON record."""
    flags = {
        k: v for k, v in sorted(os.environ.items()) if k.startswith("RINGZK_")
    }
    dev = jax.devices()[0]
    return {
        "flags": flags,
        "prng": os.environ.get("JAX_DEFAULT_PRNG_IMPL", "threefry"),
        "platform": dev.platform,
        "device": str(getattr(dev, "device_kind", dev)),
    }


SUM_VL = 4  # reference bench's summand count (/root/reference/benches/bench.rs:200)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--protocol", choices=("open", "linear", "sum"), default="open")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--full", action="store_true")
    ap.add_argument(
        "--chains",
        type=int,
        default=None,
        help="split the batch into C independent roundtrip chains inside "
        "one jit (any protocol): the chains share no data, so XLA overlaps "
        "one chain's MXU matvec phases with another's VPU transform phases "
        "across the protocol's sequential dependency walls. Same total "
        "work and per-proof semantics; each chain draws its own key. "
        "Default 2 (measured wins: open +7.9%, linear +3.2%, sum +14.8% "
        "over single-chain; open saturates at 2 -- chains=4 measured the "
        "same). --chains 1 restores the single chain.",
    )
    args = ap.parse_args()
    if args.chains is None:
        args.chains = 2  # measured win for all three protocols (BENCHMARKS.md)

    from ringzk_tpu import Params, keygen
    from ringzk_tpu.protocols import linear as linear_mod
    from ringzk_tpu.protocols import open as open_mod
    from ringzk_tpu.protocols import sum as sum_mod

    params = Params()
    n_deg = args.n
    # per-protocol default batches: linear does ~2.5x and sum (VL=4) ~5x the
    # open proof's work per item; smaller batches keep the dispatch trains
    # comparable without exceeding the tunnel's compile payload
    b = args.batch or {"open": 8192, "linear": 4096, "sum": 2048}[args.protocol]
    kk, kx, kg, kp = jax.random.split(jax.random.PRNGKey(0), 4)
    ck = keygen(kk, params, n_deg)

    def rand_poly(key, shape):
        return jax.random.randint(
            key, shape, -params.q, params.q + 1, dtype=jnp.int32
        )

    if args.protocol == "open":
        c = args.chains
        x = rand_poly(kx, (b, params.l, n_deg))
        step = jax.jit(
            lambda k, x: open_mod.roundtrip(k, ck, x, params, chains=c)
        )
        fargs = (kp, x)
        suffix = f", chains={c}" if c > 1 else ""
        label = f"verified open proofs/s per chip (N={n_deg}, batch={b}{suffix})"
    elif args.protocol == "linear":
        c = args.chains
        x = rand_poly(kx, (b, params.l, n_deg))
        g = rand_poly(kg, (b, n_deg))
        step = jax.jit(
            lambda k, g, x: linear_mod.roundtrip(k, ck, g, x, params, chains=c)
        )
        fargs = (kp, g, x)
        suffix = f", chains={c}" if c > 1 else ""
        label = f"verified linear proofs/s per chip (N={n_deg}, batch={b}{suffix})"
    else:
        c = args.chains
        xs = rand_poly(kx, (b, SUM_VL, params.l, n_deg))
        gs = rand_poly(kg, (b, SUM_VL, n_deg))
        step = jax.jit(
            lambda k, gs, xs: sum_mod.roundtrip(k, ck, gs, xs, params, chains=c)
        )
        fargs = (kp, gs, xs)
        suffix = f", chains={c}" if c > 1 else ""
        label = (
            f"verified sum proofs/s per chip (N={n_deg}, VL={SUM_VL}, "
            f"batch={b}{suffix})"
        )

    dt, window_dts = _time_fn(step, fargs, args.iters)
    ok, op_ok = step(*fargs)
    if not (bool(ok.all()) and bool(op_ok.all())):
        print(json.dumps({"error": "verification failed"}))
        sys.exit(1)

    proofs_per_s = b / dt
    target = 1e5  # north-star: >= 1e5 verified open proofs/s per host, N=512

    if args.full and args.protocol == "open":
        _full_table(params, ck, fargs[1], kp, n_deg, b, args.iters)

    # LAST: the fetch-forced cross-check window (its D2H can degrade
    # subsequent dispatch on this backend)
    dt_ff = _time_fetch_forced(step, fargs, args.iters)

    print(
        json.dumps(
            {
                "metric": label,
                "value": round(proofs_per_s, 1),
                "unit": "proofs/s",
                "vs_baseline": round(proofs_per_s / target, 3),
                "windows": {
                    "min": round(b / window_dts[-1], 1),
                    "median": round(proofs_per_s, 1),
                    "max": round(b / window_dts[0], 1),
                },
                "fetch_forced": round(b / dt_ff, 1),
                "engine": _engine_fingerprint(),
            }
        )
    )


def _full_table(params, ck, x, key, n_deg, b, iters):
    """Per-phase timings mirroring the reference's Criterion groups
    (/root/reference/benches/bench.rs): commit / generate_challenge /
    create_response / verify, per proof."""
    from ringzk_tpu.protocols import open as open_mod

    k1, k2 = jax.random.split(key)
    commit_f = jax.jit(lambda k, x: open_mod.prover_commit(k, ck, x, params))
    rctx, pcom = commit_f(k1, x)
    chal_f = jax.jit(lambda k, pc: open_mod.generate_challenge(k, pc, params))
    vctx, chal = chal_f(k2, pcom)
    resp_f = jax.jit(lambda rc, ch: open_mod.create_response(rc, ch, params))
    resp = resp_f(rctx, chal)
    verify_f = jax.jit(lambda r, v: open_mod.verify(ck, r, v, params))

    rows = [
        ("open_proof_commit", commit_f, (k1, x)),
        ("open_proof_generate_challenge", chal_f, (k2, pcom)),
        ("open_proof_create_response", resp_f, (rctx, chal)),
        ("open_proof_verify", verify_f, (resp, vctx)),
    ]
    for name, fn, fargs in rows:
        dt, _ = _time_fn(fn, fargs, iters)
        print(
            f"{name:32s} {dt / b * 1e9:12.1f} ns/proof "
            f"({b / dt:12.1f} proofs/s batch={b})",
            file=sys.stderr,
        )
    _ntt_roofline(params, n_deg, b, iters)


def _ntt_roofline(params, n_deg, b, iters):
    """NTT throughput report: butterflies/s, ns/transform, effective HBM
    bandwidth of the fused kernel (one int32 read + NUM_PRIMES uint32
    writes per forward transform).

    No %-of-peak figure is printed: on this remote (axon-tunneled) backend,
    elementwise micro-kernels measure dispatch/memory behavior rather than
    sustained VPU rate (calibration chains report physically impossible
    op/s), so any "roofline fraction" derived from them would be fiction.
    scripts/calibrate_vpu.py documents the attempts.
    """
    from ringzk_tpu.ops.ntt import NUM_PRIMES, get_ring

    ring = get_ring(n_deg, params.modulus)
    polys = b * params.k
    x = jax.random.randint(
        jax.random.PRNGKey(2), (polys, n_deg), -params.q, params.q + 1, jnp.int32
    )
    fwd_f = jax.jit(lambda v: ring.fwd(v))
    dt, _ = _time_fn(fwd_f, (x,), iters)
    logn = n_deg.bit_length() - 1
    bflies = polys * NUM_PRIMES * (n_deg // 2) * logn
    rate = bflies / dt
    gbps = x.size * 4 * (1 + NUM_PRIMES) / dt / 1e9
    print(
        f"{'ntt_fwd_butterflies/s':32s} {rate:12.3e} "
        f"({dt / polys * 1e9:8.1f} ns/transform, {gbps:7.1f} GB/s effective)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
