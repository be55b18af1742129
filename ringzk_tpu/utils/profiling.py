"""Tracing/profiling hooks (SURVEY.md section 5.1: absent in the reference
beyond Criterion timing; here every protocol phase is annotated for the
jax profiler, and a context manager captures device traces)."""

from __future__ import annotations

import contextlib
import os
import time

import jax


def annotate(name: str):
    """Decorator: wraps a function in a jax profiler TraceAnnotation so the
    phase shows up named in xprof/tensorboard traces."""

    def deco(fn):
        def wrapper(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        wrapper.__name__ = getattr(fn, "__name__", name)
        wrapper.__doc__ = fn.__doc__
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
