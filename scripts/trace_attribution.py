#!/usr/bin/env python
"""Capture a device trace of the headline program and attribute time.

The roofline model (scripts/roofline_model.py) says the binding compute
unit could deliver ~4M proofs/s against ~600k measured -- ~86% of the MXU
idle. This script asks WHERE the time actually goes: it runs the headline
roundtrip (batch 8192, chains=2) under jax.profiler with a perfetto trace,
then aggregates device-track event durations by (a) the protocol-phase
named_scope prefixes that utils/profiling.annotate puts on every HLO op and
(b) coarse op category (fusion/convolution/custom-call/copy), printing both
tables. Host-side tracks are ignored.

On the tunneled axon backend the profiler may capture no device plane at
all (the chip is remote); in that case the script says so explicitly --
that is a recorded environment limitation, not silence.

Run on TPU: plain `python scripts/trace_attribution.py` (background).
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_DEFAULT_PRNG_IMPL", "rbg")

import jax
import jax.numpy as jnp

PHASES = (
    "commit_scheme/keygen", "commit_scheme/commit", "commit_scheme/verify",
    "open_proof/commit", "open_proof/generate_challenge",
    "open_proof/create_response", "open_proof/verify",
)


def main():
    logdir = "/tmp/ringzk_trace_r5"
    import shutil

    shutil.rmtree(logdir, ignore_errors=True)

    from ringzk_tpu import Params, keygen
    from ringzk_tpu.protocols import open as open_mod

    params = Params()
    b, n_deg = 8192, 512
    kk, kx, kp = jax.random.split(jax.random.PRNGKey(0), 3)
    ck = keygen(kk, params, n_deg)
    x = jax.random.randint(kx, (b, params.l, n_deg), -params.q, params.q + 1,
                           dtype=jnp.int32)
    step = jax.jit(lambda k, x: open_mod.roundtrip(k, ck, x, params, chains=2))
    out = step(kp, x)
    jax.block_until_ready(out)
    for _ in range(3):
        out = step(kp, x)
    jax.block_until_ready(out)

    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    for _ in range(3):
        out = step(kp, x)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    traces = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        print("NO perfetto trace produced -- profiler capture unavailable "
              "on this backend")
        return
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device tracks: process names containing TPU/device (tid/pid metadata)
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, nm in names.items()
                   if "TPU" in nm or "/device" in nm.lower() or "XLA" in nm}
    print("process tracks:", sorted(set(names.values())), file=sys.stderr)

    by_phase = collections.Counter()
    by_cat = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0)  # microseconds
        nm = e.get("name", "")
        args_name = (e.get("args") or {}).get("long_name", "") or nm
        total += dur
        hit = next((p for p in PHASES if p in args_name or p in nm), None)
        by_phase[hit or "(unattributed)"] += dur
        cat = nm.split(".")[0].split("(")[0][:40]
        by_cat[cat] += dur

    if total == 0:
        print("perfetto trace has no device events -- capture is host-only "
              "on this backend (recorded limitation)")
        return
    print(f"total device time: {total/1e3:.2f} ms over 3 iterations")
    print("\n-- by protocol phase (named_scope) --")
    for k, v in by_phase.most_common():
        print(f"{k:40s} {v/1e3:10.2f} ms {100*v/total:5.1f}%")
    print("\n-- by op bucket (top 15) --")
    for k, v in by_cat.most_common(15):
        print(f"{k:40s} {v/1e3:10.2f} ms {100*v/total:5.1f}%")


if __name__ == "__main__":
    main()
