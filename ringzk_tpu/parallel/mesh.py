"""Multi-device sharding of proof batches over a jax mesh.

The reference is single-threaded CPU (SURVEY.md section 2.2); this module
*introduces* the distributed story TPU-natively:

  * data parallelism: the proof batch axis shards over the mesh "dp" axis
    (across chips via ICI, across hosts via DCN) -- thousands of independent
    sigma-protocol round trips run as one pjit program;
  * tensor parallelism: the CRT prime axis (P=3 independent NTT residue
    channels, the leading axis of every NTT-domain array) can shard over a
    "tp" axis -- per-prime NTTs are embarrassingly parallel and only the
    final Garner reconstruction gathers the three residues;
  * batch-verify reduction: verifier accept bits are AND-reduced with a psum
    over the mesh, the collective analog of the reference's per-proof bool.

Shardings are expressed with NamedSharding/PartitionSpec; XLA inserts the
collectives (all-gather for the CRT gather, psum for the verdict reduce).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import Params
from ..protocols import open as open_mod
from ..protocols.commit import CommitmentKey, keygen


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    """1-D device mesh over the proof-batch axis."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return Mesh(np.asarray(devs[:n_devices]).reshape(n_devices), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Place a pytree of batch-leading arrays with the batch axis sharded."""

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. the commitment key) across the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def batched_open_prove_verify(
    mesh: Mesh,
    key,
    ck: CommitmentKey,
    x,
    params: Params,
    axis: str = "dp",
):
    """Full open-proof round trip for a sharded batch x: [B, l, N].

    Returns (ok: bool[B] sharded, all_ok: bool scalar replicated). The
    all-reduce of the accept bits is the psum batch-verify of
    BASELINE.json config 5.
    """
    b = x.shape[0]
    nd = mesh.devices.size
    if b % nd:
        raise ValueError(f"batch {b} not divisible by {nd} devices")

    x = shard_batch(mesh, x, axis)
    ck = replicate(mesh, ck)
    step = open_step_fn(mesh, ck, params, axis)
    return step(key, x)


def open_step_fn(mesh: Mesh, ck: CommitmentKey, params: Params, axis: str = "dp"):
    """The 'training step' analog: one jitted sharded program running the
    complete prove->challenge->respond->verify pipeline over a batch.

    `roundtrip` is natively batch-parallel (leading axes everywhere), so no
    vmap is needed: the batch axis of x is sharded, the RNG key and ck are
    replicated, and XLA partitions the whole pipeline; the final jnp.all is
    the cross-device psum(AND) reduction.

    Returns a function (key, x[B, l, N]) -> (ok[B] sharded, all_ok scalar).
    """

    ck_repl = replicate(mesh, ck)

    @partial(
        jax.jit,
        in_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P(axis)),
        ),
        out_shardings=(NamedSharding(mesh, P(axis)), NamedSharding(mesh, P())),
    )
    def step(key, x):
        ok, op_ok = open_mod.roundtrip(key, ck_repl, x, params)
        ok = ok & op_ok
        return ok, jnp.all(ok)

    return step
