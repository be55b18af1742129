"""Suspend/resume of protocol state (SURVEY.md section 5.4).

The reference's checkpointing story is "every protocol state object is
serde-serializable" (contexts can be persisted mid-protocol); here the same
holds via the RZK1 wire format, plus typed reload. A prover can emit its
move-1 message, save the response context to disk, and a different process
can later load it, receive the challenge, and answer -- exercised in
tests/test_checkpoint.py.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from . import serial


def save(path: str, obj) -> None:
    """Persist any protocol pytree (NamedTuple of arrays) atomically."""
    blob = serial.dumps(obj)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load(path: str, cls, max_array_bytes: int = 2**31):
    """Load a protocol object saved by :func:`save` as ``cls`` (NamedTuple),
    converting leaves to jnp arrays.

    The per-array allocation cap defaults to loads()'s 2 GiB: nothing in
    this signature proves the file is self-written (checkpoints get copied
    between machines), so the wire path's attacker-sized-allocation bound
    applies here too. An honest checkpoint of a huge mostly-zero array
    (trimmed varints decode to many times their payload size) can
    legitimately exceed it -- pass an explicitly larger cap for such
    trusted local files."""
    with open(path, "rb") as f:
        data = serial.loads(f.read(), max_array_bytes=max_array_bytes)
    data = {k: (None if v is None else jnp.asarray(v)) for k, v in data.items()}
    return serial.rebuild(cls, data)
