"""Fused Pallas TPU kernel for challenge-space support selection.

The challenge sampler (ops/sampling.py `challenge`) needs the top-kappa
lanes of an iid-uint32 key row -- a uniform kappa-subset of the N
coefficient positions (reference semantics: Fisher-Yates shuffle,
/root/reference/src/challenge_space.rs:22-31). The XLA path uses
`lax.top_k`, which lowers to a full per-row sort on TPU and dominates the
generate_challenge phase (~16% of the whole open-proof roundtrip at the
headline batch).

This kernel replaces the sort with a binary search for the kappa-th
largest key value: 32 rounds of (broadcast-compare + lane reduction) on a
[TILE, N] block pinned in VMEM, followed by one log2(N) prefix scan to
break ties at the threshold value by ascending lane -- the *identical*
selection rule as stable `top_k` (largest values first; equal values in
lane order), so the produced challenge polynomials are bit-identical to
the XLA path (validated in tests/test_pallas.py, including crafted
duplicate-key ties). One HBM read of the keys + signs, one write of the
ternary challenge, no sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt_kernel import _tile_for


def _challenge_kernel(kappa: int, n: int, u_ref, s_ref, o_ref):
    u = u_ref[...]
    kap = jnp.int32(kappa)
    # Binary search (MSB first) for the largest threshold T with
    # count(u >= T) >= kappa; T is then exactly the kappa-th largest value.
    thr = jnp.zeros(u.shape[:-1] + (1,), jnp.uint32)
    for bit in range(31, -1, -1):
        cand = thr | np.uint32(1 << bit)
        # dtype pinned: under jax x64 (wide rings) jnp.sum would promote
        # to int64, which Mosaic cannot lower
        cnt = jnp.sum(
            (u >= cand).astype(jnp.int32), axis=-1, keepdims=True,
            dtype=jnp.int32,
        )
        thr = jnp.where(cnt >= kap, cand, thr)
    gt = u > thr
    eq = u == thr
    # Exactly kappa lanes: all strictly-above lanes, plus the first
    # (kappa - #above) threshold ties in ascending lane order -- the stable
    # top_k tie rule. Tie ranks via a Hillis-Steele inclusive scan.
    need = kap - jnp.sum(
        gt.astype(jnp.int32), axis=-1, keepdims=True, dtype=jnp.int32
    )
    eqi = eq.astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, u.shape, u.ndim - 1)
    r = eqi
    off = 1
    while off < n:
        # shift pinned to int32: a Python int traces as an i64 scalar
        # under jax x64 and tpu.dynamic_rotate rejects it
        shifted = pltpu.roll(r, jnp.int32(off), axis=r.ndim - 1)
        r = r + jnp.where(lane >= off, shifted, jnp.zeros((), jnp.int32))
        off <<= 1
    rank = r - eqi  # exclusive prefix count of ties
    mask = gt | (eq & (rank < need))
    o_ref[...] = jnp.where(mask, s_ref[...], jnp.zeros((), jnp.int32))


def challenge_select_pallas(u, signs, kappa: int, interpret: bool = False):
    """Ternary challenge rows: signs where lane's key is in the top-kappa.

    u: uint32 [..., N] iid keys; signs: int32 [..., N] (+-1). Returns
    int32 [..., N] equal to the XLA stable-top_k path bit for bit.
    Requires 1 <= kappa < N (the kappa >= N clamp is the caller's).
    """
    n = u.shape[-1]
    assert signs.shape == u.shape, (u.shape, signs.shape)
    assert 1 <= kappa < n, kappa
    lead = u.shape[:-1]
    u2 = u.reshape((-1, n))
    s2 = signs.reshape((-1, n))
    rows = u2.shape[0]
    tile = _tile_for(n, rows)
    pad = (-rows) % tile
    if pad:
        u2 = jnp.pad(u2, ((0, pad), (0, 0)))
        s2 = jnp.pad(s2, ((0, pad), (0, 0)))
    # index maps return np.int32 zeros: a Python 0 literal traces as an
    # i64 scalar under jax x64 (wide rings) and Mosaic rejects the index
    # map's (i32, i64) func.return
    zero = np.int32(0)
    out = pl.pallas_call(
        functools.partial(_challenge_kernel, kappa, n),
        grid=(pl.cdiv(u2.shape[0], tile),),
        in_specs=[
            pl.BlockSpec((tile, n), lambda i: (i, zero), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, zero), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n), lambda i: (i, zero), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((u2.shape[0], n), jnp.int32),
        interpret=interpret,
    )(u2, s2)
    return out[:rows].reshape(lead + (n,))
