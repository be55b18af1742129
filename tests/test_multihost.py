"""Degenerate (1-process) exercise of the multi-host entry point
(parallel/multihost.py): the host-sharded config-5 runner compiles and
verifies on the 8-device virtual mesh, and init_distributed is a no-op for
single-process runs. Real multi-host scaling awaits hardware (BASELINE.md
north-star: >=80% efficiency to 4 hosts)."""

import jax
import pytest

import ringzk_tpu as rz
from ringzk_tpu.parallel import multihost


def test_init_distributed_single_process_noop():
    idx, count = multihost.init_distributed()
    assert (idx, count) == (0, 1)


def test_batch_verify_run_degenerate():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (run via scripts/pytest-cpu)")
    out = multihost.batch_verify_run(
        total_batch=32, n_deg=16, iters=1, seed=3
    )
    assert out["all_ok"] is True
    assert out["n_devices"] == 8
    assert out["n_processes"] == 1
    assert out["proofs_per_s"] > 0


def test_batch_verify_run_checks_divisibility():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    with pytest.raises(ValueError, match="divisible"):
        multihost.batch_verify_run(total_batch=9, n_deg=16, iters=1)
