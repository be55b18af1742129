"""Test configuration: force the CPU backend with an 8-device virtual mesh.

Tests exercise the full sharding/collective paths (the reference has no
distributed anything -- SURVEY.md section 2.2 -- so the multi-device story is
validated here on a simulated mesh) without requiring TPU hardware. This must
run before the first `import jax` in any test module.

Note: on this machine the axon TPU plugin registers itself at interpreter
startup via sitecustomize and can take minutes to dial its tunnel. Prefer
`scripts/pytest-cpu`, which unsets PALLAS_AXON_POOL_IPS before python starts.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=8 " + flags
    ).strip()

assert "jax" not in sys.modules or True  # jax may be imported lazily below

import contextlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260817)


@contextlib.contextmanager
def env_override(var, value):
    """Set an env var for the block, restoring any pre-existing value
    (a bare ``del`` would clobber a runner-pinned RINGZK_* setting)."""
    prev = os.environ.get(var)
    os.environ[var] = value
    try:
        yield
    finally:
        if prev is None:
            del os.environ[var]
        else:
            os.environ[var] = prev


# persistent compilation cache: protocol programs are large, recompiling on
# every pytest run dominates wall-clock otherwise
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
