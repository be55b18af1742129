#!/usr/bin/env python
"""Custom parameter sets: the genericity envelope in user code.

The reference is generic over the coefficient type and the const modulus Q
(/root/reference/src/params.rs:18) but ships one instantiation
(ZqI64<3515337053>). Here the modulus is a runtime Params field: any odd
modulus < 2^32 with any power-of-two ring degree works, engine selection
included -- small moduli keep the int8 MXU digit key path, moduli within
~16.8M of 2^32 exceed the 4-digit capacity and transparently fall back to the
exact CRT-NTT key path (protocols/commit.py keygen gate). Norm bounds,
challenge structure, and all three sigma protocols are modulus-agnostic.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/custom_modulus.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

import ringzk_tpu as rz
from ringzk_tpu.protocols import open as open_mod

N = 64

CONFIGS = [
    ("reference default (q ~ 2^31.7)", rz.Params()),
    ("small 15-bit prime", rz.Params(q=32749 // 2, modulus=32749)),
    ("2^32 - 5 (Montgomery carry regime)",
     rz.Params(q=4294967291 // 2, modulus=4294967291)),
    ("wider key matrix, 2 msg rows", rz.Params(n=2, k=6, l=2)),
]


def main():
    for name, params in CONFIGS:
        params.validate()
        kk, kx, kp = jax.random.split(jax.random.PRNGKey(1), 3)
        ck = rz.keygen(kk, params, N)
        x = jax.random.randint(
            kx, (16, params.l, N), -params.q, params.q + 1, dtype=jnp.int32
        )
        ok, opening_ok = jax.jit(
            lambda k, xx: open_mod.roundtrip(k, ck, xx, params)
        )(kp, x)
        engine = "MXU int8 digits" if ck.a1_dig is not None else "CRT-NTT"
        print(
            f"{name:40s} modulus={params.modulus:>10d} "
            f"sigma={params.standard_deviation(N):>6d} key engine={engine:15s} "
            f"16/16 proofs ok={bool(ok.all() & opening_ok.all())}"
        )


if __name__ == "__main__":
    main()
