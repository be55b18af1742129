"""The "model zoo" of this framework is its protocol family: alias package.

In an ML framework the `models/` package holds model families; for a lattice
ZK framework the analog is the protocol families built on the commitment
scheme. This package re-exports them under the conventional name; the
implementations live in ringzk_tpu/protocols/.
"""

from ..protocols import commit, open, linear, sum  # noqa: F401
from ..protocols.api import (  # noqa: F401
    LinearProofProver,
    LinearProofVerifier,
    OpenProofProver,
    OpenProofVerifier,
    SumProofProver,
    SumProofVerifier,
)
