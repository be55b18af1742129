"""Object API mirroring the reference crate's public surface.

A ring-zk user finds the same names and call shapes here
(/root/reference/src/lib.rs:5-24): `Params` + `CommitmentKey` +
{Open,Linear,Sum}Proof{Prover,Verifier} with
commit / generate_challenge / create_response / verify, exchanging the same
message/context families. Differences, by design:

  * randomness is an explicit `jax.random` key argument (functional JAX
    style) instead of a mutable &mut Rng;
  * every method is batched: leading axes on the message arrays are proof
    batches, and the wrappers are thin -- the functional modules
    (protocols.open/linear/sum) remain the jit-able source of truth;
  * `prepare_value` / `prepare_scalar` (the reference's input wrapping,
    /root/reference/src/params.rs:67-91) become coefficient-list -> padded
    int32 array helpers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..params import Params
from . import linear as _linear
from . import open as _open
from . import sum as _sum
from .commit import CommitmentKey, keygen


def prepare_value(params: Params, value, n_deg: int):
    """Wrap a list of l coefficient vectors into an [l, N] int32 message
    (reference: /root/reference/src/params.rs:67-77). Batched input
    (list of lists of lists) yields [..., l, N]. Coefficients are reduced
    mod q into the centered range, like the reference's ``Into<ZqI64<Q>>``."""
    arr = _pad_coeffs(value, n_deg, params.modulus)
    if arr.shape[-2] != params.l:
        raise ValueError(f"value must have {params.l} rows, got {arr.shape[-2]}")
    return arr


def prepare_scalar(params: Params, scalar, n_deg: int):
    """Wrap a coefficient vector into an [N] int32 polynomial
    (reference: /root/reference/src/params.rs:89-91), coefficients reduced
    mod q into the centered range."""
    return _pad_coeffs(scalar, n_deg, params.modulus)


def _pad_coeffs(obj, n_deg: int, modulus: int):
    def pad_leaf(seq):
        a = np.asarray(seq, dtype=np.int64)
        if a.shape[-1] > n_deg:
            raise ValueError(f"too many coefficients for N={n_deg}")
        # centered mod-q reduction (ZqI64::from semantics,
        # /root/reference/src/params.rs:67-91): an out-of-range input maps
        # to its ring residue in [-(q-1)/2, q/2] instead of silently
        # wrapping through the int32 cast
        a = np.mod(a, modulus)
        a = np.where(a > modulus // 2, a - modulus, a)
        out = np.zeros(a.shape[:-1] + (n_deg,), np.int64)
        out[..., : a.shape[-1]] = a
        return out

    # wide rings (modulus >= 2^32) carry centered int64 residues
    dtype = jnp.int64 if modulus >= 2**32 else jnp.int32
    a = np.asarray(obj, dtype=object)
    try:
        flat = np.asarray(obj, dtype=np.int64)
        return jnp.asarray(pad_leaf(flat), dtype)
    except (ValueError, TypeError):
        # ragged: pad each innermost vector
        stacked = np.stack([pad_leaf(v) for v in a])
        return jnp.asarray(stacked, dtype)


class _ProverVerifierBase:
    def __init__(self, ck: CommitmentKey, params: Params):
        self.ck = ck
        self.params = params


class OpenProofProver(_ProverVerifierBase):
    """/root/reference/src/prove/open.rs:56-118"""

    def commit(self, key, x):
        return _open.prover_commit(key, self.ck, x, self.params)

    def create_response(self, context, challenge):
        return _open.create_response(context, challenge, self.params)


class OpenProofVerifier(_ProverVerifierBase):
    """/root/reference/src/prove/open.rs:122-175"""

    def generate_challenge(self, key, commitment):
        return _open.generate_challenge(key, commitment, self.params)

    def verify(self, response, context):
        return _open.verify(self.ck, response, context, self.params)


class LinearProofProver(_ProverVerifierBase):
    """/root/reference/src/prove/linear.rs:59-160"""

    def commit(self, key, g, x):
        return _linear.prover_commit(key, self.ck, g, x, self.params)

    def create_response(self, context, challenge):
        return _linear.create_response(context, challenge, self.params)


class LinearProofVerifier(_ProverVerifierBase):
    """/root/reference/src/prove/linear.rs:163-251"""

    def generate_challenge(self, key, commitment):
        return _linear.generate_challenge(key, commitment, self.params)

    def verify(self, response, context):
        return _linear.verify(self.ck, response, context, self.params)


class SumProofProver(_ProverVerifierBase):
    """/root/reference/src/prove/sum.rs:72-201"""

    def commit(self, key, gs, xs):
        return _sum.prover_commit(key, self.ck, gs, xs, self.params)

    def create_response(self, context, challenge):
        return _sum.create_response(context, challenge, self.params)


class SumProofVerifier(_ProverVerifierBase):
    """/root/reference/src/prove/sum.rs:204-321"""

    def generate_challenge(self, key, commitment):
        return _sum.generate_challenge(key, commitment, self.params)

    def verify(self, response, context):
        return _sum.verify(self.ck, response, context, self.params)


def generate_commitment_key(key, params: Params, n_deg: int) -> CommitmentKey:
    """Reference: Params::generate_commitment_key
    (/root/reference/src/params.rs:49-54)."""
    return keygen(key, params, n_deg)
