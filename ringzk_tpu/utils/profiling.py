"""Tracing/profiling hooks (SURVEY.md section 5.1: absent in the reference
beyond Criterion timing). Every protocol phase function in
protocols/{commit,open,linear,sum}.py is wrapped with :func:`annotate`, so
phase names appear (a) as named_scope prefixes on every HLO op they trace --
visible in xprof/tensorboard device traces even inside one fused jit program
-- and (b) as host TraceAnnotations around eager dispatches."""

from __future__ import annotations

import contextlib
import functools
import os
import time

import jax


def annotate(name: str):
    """Decorator: runs the function under ``jax.named_scope(name)`` (op-name
    prefix at trace time, so the phase is attributable inside compiled
    programs) plus a ``jax.profiler.TraceAnnotation`` (host-side span for
    eager/dispatch profiling)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with jax.named_scope(name), jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        return wrapper

    return deco


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/ringzk_trace"):
    """Capture a device trace around a block: view with xprof/tensorboard."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock phase timer with a report() table (host-side; for
    device-accurate numbers use device_trace)."""

    def __init__(self):
        self.phases = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.phases.values()) or 1.0
        lines = [
            f"{k:32s} {v * 1e3:10.2f} ms {100 * v / total:5.1f}%"
            for k, v in sorted(self.phases.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)
