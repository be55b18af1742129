"""Tensor-parallel CRT: the prime axis P=3 sharded across a "tp" mesh axis.

The NTT-domain image of every polynomial is a [P, ..., N] stack of
*independent* residue channels (one per CRT prime -- ops/ntt.py). That
independence is a tensor-parallel axis: under ``polymul_tp`` each device of a
size-3 "tp" axis runs only its own prime's forward NTT, pointwise product,
and inverse NTT (``lax.switch`` on ``axis_index`` selects the prime's
Montgomery constants and twiddle planes), and the per-prime residues come
back as a [P, ..., N] global array with P sharded over tp. The only
cross-prime communication in the whole pipeline is the final Garner
mixed-radix reconstruction, which mixes residues pointwise -- XLA inserts
the single all-gather over tp there, exactly the "per-prime NTTs are
embarrassingly parallel, only Garner gathers" story promised in
parallel/mesh.py's module docstring.

Composes with the dp proof-batch axis (mesh ("dp", "tp"), pass
``batch_axis="dp"``): prime channels split over tp inside each dp group.

This axis is demonstrative parallelism for the arithmetic layer (P=3 caps
its width); the production scaling axes remain dp (parallel/mesh.py) and sp
(parallel/ring_sp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import ntt as ntt_mod
from ..ops.ntt import NUM_PRIMES
from ..ops.ntt import _fwd_one, _inv_one


def make_tp_mesh(dp: int = 1, devices=None) -> Mesh:
    """("dp", "tp") mesh with the tp axis sized NUM_PRIMES (= 3)."""
    devs = devices if devices is not None else jax.devices()
    need = dp * NUM_PRIMES
    if need > len(devs):
        raise ValueError(f"need {need} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:need]).reshape(dp, NUM_PRIMES), ("dp", "tp"))


@functools.lru_cache(maxsize=None)
def _polymul_tp_fn(
    mesh: Mesh, n: int, q: int, axis: str, ndim: int, batch_axis
):
    """shard_map program: per-device single-prime fwd/pointwise/inv, output
    [P, ..., N] with the prime axis sharded over ``axis``."""
    ring = ntt_mod._get_ring_cached(n, q)
    if mesh.shape[axis] != NUM_PRIMES:
        raise ValueError(
            f"tp axis must have exactly {NUM_PRIMES} devices, "
            f"got {mesh.shape[axis]}"
        )

    lead = [batch_axis] + [None] * (ndim - 2) if batch_axis else [None] * (ndim - 1)
    in_spec = P(*(lead + [None]))          # coefficients replicated over tp
    out_spec = P(*([axis] + lead + [None]))

    def _branch(i):
        ctx = ring.mont[i]
        _, _, n_inv_scale, w_fwd, w_inv = ring._tables[i]
        # concretize even if this builder is first reached while tracing a
        # user's jit: the lru_cached closure must never capture a tracer
        # (same failure mode as the SpRing._w_tables leak)
        with jax.ensure_compile_time_eval():
            wf = jnp.asarray(w_fwd)
            wi = jnp.asarray(w_inv)

        def br(operands):
            a, b = operands
            ah = _fwd_one(ctx, wf, ctx.to_mont(ctx.reduce_i32_centered(a)))
            bh = _fwd_one(ctx, wf, ctx.reduce_i32_centered(b))
            return _inv_one(ctx, wi, n_inv_scale, ctx.mont_mul(ah, bh))

        return br

    branches = [_branch(i) for i in range(NUM_PRIMES)]

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(in_spec, in_spec), out_specs=out_spec
    )
    def body(a_blk, b_blk):
        idx = jax.lax.axis_index(axis)
        y = jax.lax.switch(idx, branches, (a_blk, b_blk))
        return y[None]  # local [1, ..., N] -> global [P, ..., N] sharded on tp

    return jax.jit(body)


def polymul_tp(
    mesh: Mesh,
    a,
    b,
    n: int,
    q: int,
    axis: str = "tp",
    batch_axis: str | None = None,
):
    """Exact negacyclic product with the CRT prime axis sharded over
    ``axis``. a (const operand), b: [..., N] centered int32.

    The per-prime residues are computed tp-locally; the Garner CRT fold
    (ring._crt_to_centered) runs on the tp-sharded [P, ..., N] stack as
    ordinary pointwise code, and XLA materializes the one all-gather over
    tp that mixing the residues requires.
    """
    if q >= 2**32:
        # wide rings extend past NUM_PRIMES=3 (their CRT range needs more
        # primes) and carry int64 residues -- this fixed-width tp=3 program
        # would silently truncate both. Mirrors SpRing.__post_init__.
        raise ValueError(
            f"polymul_tp supports narrow rings only (q < 2^32), got q={q}"
        )
    ring = ntt_mod._get_ring_cached(n, q)
    a = jnp.asarray(a, jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    if a.ndim != b.ndim:
        raise ValueError(f"rank mismatch: {a.shape} vs {b.shape}")
    if batch_axis and a.ndim < 2:
        raise ValueError("batch_axis requires a leading batch dim")
    yhat = _polymul_tp_fn(mesh, n, q, axis, a.ndim, batch_axis)(a, b)
    return ring._crt_to_centered([yhat[i] for i in range(NUM_PRIMES)])
