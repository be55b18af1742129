"""Self-diagnosing benchmark timing helpers, shared by every driver surface
(bench.py, scripts/bench_all.py, scripts/baseline_configs.py).

The axon-tunneled TPU backend has two documented measurement failure modes
(BENCHMARKS.md "Measurement caveats"):

  * multi-second dispatch-rate swings -- a single timing window can read
    20% under the sustained rate, so every row reports the MEDIAN of
    ``windows`` back-to-back windows plus the min/max spread (a wide spread
    means tunnel drift, not a code regression);
  * ``block_until_ready`` under-reporting for argument-heavy programs
    (observed 50x) -- every row gets a fetch-forced cross-check window
    timed to an actual D2H of the result. A fetch can itself degrade
    subsequent dispatch on this backend, so multi-row tables must run ALL
    median-window timings first and the fetch-forced passes LAST, in row
    order (:func:`fetch_forced_pass`); each row records its position in
    that pass (``ff_order``) so a degradation cascade is visible in the
    record instead of silently poisoning later rows.

The reference's Criterion benches need none of this (local CPU, Criterion's
own statistics -- /root/reference/benches/bench.rs:11-27); it is the price
of benchmarking through a remote-tunneled chip.
"""

from __future__ import annotations

import os
import time


def timed_row(fn, args, iters, windows=5, warmup=3):
    """Median-of-windows timing: compile + warm the dispatch path, then
    ``windows`` back-to-back windows of ``iters`` dispatches each, synced
    once per window (throughput timing -- for latency semantics see
    scripts/latency_bench.py).

    Returns (median_dt, sorted window dts ascending)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile
    for _ in range(warmup):
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


def fetch_forced_dt(fn, args, iters):
    """One window timed to an actual D2H fetch of the result (np.asarray of
    a small leaf), catching block_until_ready under-reporting. Run AFTER
    all block_until_ready windows -- the fetch can permanently degrade
    subsequent tunnel dispatch (see module doc)."""
    import jax
    import numpy as np

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)  # the ONE D2H, inside the timed region
    return (time.perf_counter() - t0) / iters


def fetch_forced_pass(rows, iters):
    """Run the fetch-forced cross-check for a list of already-timed rows,
    LAST and in order. ``rows`` is a list of (record_dict, fn, args, batch);
    each record gains ``fetch_forced`` (ops/s) and ``ff_order`` in place.
    A degradation cascade (fetch k poisoning dispatch for fetch k+1) shows
    up as monotonically collapsing fetch_forced with increasing ff_order --
    readers should weight low-ff_order rows accordingly."""
    for order, (rec, fn, args, batch) in enumerate(rows):
        dt = fetch_forced_dt(fn, args, iters)
        rec["fetch_forced"] = round(batch / dt, 1)
        rec["ff_order"] = order


def windows_record(batch, median_dt, window_dts):
    """The per-row spread record: ops/s at the min/median/max window."""
    return {
        "min": round(batch / window_dts[-1], 1),
        "median": round(batch / median_dt, 1),
        "max": round(batch / window_dts[0], 1),
    }


def engine_fingerprint():
    """The active engine configuration (RINGZK_* flags + PRNG impl +
    backend), so a flag-default regression is visible in every record."""
    import jax

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
