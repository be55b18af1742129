"""ringzk_tpu: a TPU-native lattice zero-knowledge library (JAX/Pallas).

Brand-new implementation of the BDLOP commitment scheme and sigma protocols
("More Efficient Commitments from Structured Lattice Assumptions",
eprint 2016/997) with the capabilities of the Rust `ring-zk` crate, designed
arrays-first for TPU: batched proofs as leading axes, exact mod-q arithmetic
on uint32 lanes, CRT-NTT polynomial products, jit/vmap/pjit throughout.
"""

from .params import Params, DEFAULT_PARAMS
from .protocols.commit import Commitment, CommitmentKey, Opening, commit, keygen, verify
from .protocols import open as open_proof

__all__ = [
    "Params",
    "DEFAULT_PARAMS",
    "Commitment",
    "CommitmentKey",
    "Opening",
    "commit",
    "keygen",
    "verify",
    "open_proof",
]
__version__ = "0.1.0"
