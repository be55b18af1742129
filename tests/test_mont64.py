"""ops/mont64 unit tests: uint32-limb 64-bit Montgomery vs bigint goldens.

Every wide-ring mod-q product rides Mont64Ctx.redc_small (the Garner fold,
ops/ntt.py), so its exactness across the full odd-q < 2^63 domain -- and
the carry paths of the limb add/sub/centering helpers -- is load-bearing
for every wide-ring protocol result.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ringzk_tpu.ops.mont64 import Mont64Ctx

MODULI = [
    2**32 + 15,                  # just past the narrow ceiling
    2**33 + 9,
    3_515_337_053,               # the default (narrow) modulus also works
    (1 << 62) + 11,
    9223372036854775783,         # largest prime < 2^63
]


def _pairs(vals):
    return (
        jnp.asarray([int(v) & 0xFFFFFFFF for v in vals], jnp.uint32),
        jnp.asarray([int(v) >> 32 for v in vals], jnp.uint32),
    )


def _ints(lo, hi):
    return np.asarray(lo).astype(object) + (np.asarray(hi).astype(object) << 32)


@pytest.mark.parametrize("q", MODULI)
def test_redc_small_exact(q):
    ctx = Mont64Ctx.make(q)
    rng = np.random.default_rng(hash(q) % 2**32)
    vs = rng.integers(0, 2**32, size=512, dtype=np.uint64).astype(np.uint32)
    for K in [0, 1, 2, q - 1, int(rng.integers(0, q)), int(rng.integers(0, q))]:
        k_lo, k_hi = ctx.h_to_mont(K)
        lo, hi = ctx.redc_small(jnp.asarray(vs), k_lo, k_hi)
        got = _ints(lo, hi)
        want = (vs.astype(object) * K) % q
        assert (got == want).all(), K


@pytest.mark.parametrize("q", MODULI)
def test_add_sub_center_roundtrip(q):
    ctx = Mont64Ctx.make(q)
    rng = np.random.default_rng(1 + hash(q) % 2**32)
    a = rng.integers(0, q, size=512).astype(object)
    b = rng.integers(0, q, size=512).astype(object)
    # include the wrap edges
    a[:3] = [0, q - 1, q // 2]
    b[:3] = [q - 1, q - 1, q // 2 + 1]
    alo, ahi = _pairs(a)
    blo, bhi = _pairs(b)
    s = _ints(*ctx.add(alo, ahi, blo, bhi))
    assert (s == (a + b) % q).all()
    d = _ints(*ctx.sub(alo, ahi, blo, bhi))
    assert (d == (a - b) % q).all()
    with jax.enable_x64(True):
        c = ctx.to_centered_i64(alo, ahi)
        want = np.where(a > q // 2, a - q, a)
        assert (np.asarray(c).astype(object) == want).all()
        lo2, hi2 = Mont64Ctx.split_i64(c)
        back = np.asarray(lo2).astype(object) + (
            np.asarray(hi2).astype(object) * (1 << 32)
        )
        assert (back == want).all()


def test_make_rejects_bad_moduli():
    for bad in (0, 1, 2, 2**32 + 2, 2**63 + 1, 2**64):
        with pytest.raises(ValueError):
            Mont64Ctx.make(bad)
