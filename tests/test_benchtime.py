"""utils/benchtime.py: the shared self-diagnosing timing helpers every
driver surface uses (bench.py, scripts/bench_all.py,
scripts/baseline_configs.py). The helpers' records must be shaped exactly
as BENCHMARKS.md documents them -- a silent format drift would strand the
next round's band attribution."""

import jax.numpy as jnp

from ringzk_tpu.utils import benchtime


def test_timed_row_and_windows_record():
    calls = []

    def fn(x):
        calls.append(1)
        return x + 1

    dt, dts = benchtime.timed_row(fn, (jnp.ones(4),), iters=2, windows=3)
    # compile + warmup(3) + 3 windows x 2 iters
    assert len(calls) == 1 + 3 + 6
    assert dts == sorted(dts) and dt == dts[1]
    rec = benchtime.windows_record(100, dt, dts)
    assert set(rec) == {"min", "median", "max"}
    assert rec["min"] <= rec["median"] <= rec["max"]
    assert rec["median"] == round(100 / dt, 1)


def test_fetch_forced_pass_orders_and_annotates():
    def fn(x):
        return x * 2

    recs = [({}, fn, (jnp.ones(3),), 10), ({}, fn, (jnp.ones(3),), 20)]
    benchtime.fetch_forced_pass(recs, iters=1)
    assert recs[0][0]["ff_order"] == 0 and recs[1][0]["ff_order"] == 1
    assert recs[0][0]["fetch_forced"] > 0 and recs[1][0]["fetch_forced"] > 0


def test_engine_fingerprint_shape(monkeypatch):
    monkeypatch.setenv("RINGZK_TESTFLAG", "1")
    fp = benchtime.engine_fingerprint()
    assert fp["flags"].get("RINGZK_TESTFLAG") == "1"
    assert set(fp) == {"flags", "prng", "platform", "device"}
    assert fp["platform"] == "cpu"  # the pytest-cpu env
