"""Randomness policy and the OS-entropy key helper.

Security model vs the reference
-------------------------------
The Rust reference draws ALL randomness -- commitment keys, commitment
randomness r, prover masks y, and verifier challenges d -- from
``rand::rng()`` (/root/reference/tests/test.rs:13 and every sampler in
/root/reference/src/), the OS-seeded ChaCha12 CSPRNG of rand 0.10. Two of
those draws carry the scheme's security:

* the challenge ``d`` must be unpredictable to the prover BEFORE move 3
  (soundness: a prover who predicts d can forge without knowing an opening);
* keygen and the commitment randomness ``r`` must be uniformly random
  (hiding/binding rest on the uniformity of A1'/A2' and r).

This build instead threads explicit ``jax.random`` keys through every
sampler (counter-based threefry by default). That is a *deterministic*
PRNG: given the key, every draw is reproducible -- which is exactly what
the library's transcript goldens, interop vectors, and benchmarks rely on,
and exactly what a deployment must NOT use with a constant key. Threefry
is a cryptographic permutation (Threefish-derived, Salmon et al. 2011) but
jax.random is NOT audited or specified as a CSPRNG, and JAX documents no
security guarantees for it; the ``rbg`` impl that bench.py recommends for
throughput is additionally documented by JAX as backend-dependent and
potentially key-unstable across versions.

Deployment guidance (the library's contract):

* Seed every party's root key from OS entropy via :func:`fresh_key` (the
  analog of the reference's ``rand::rng()`` seeding), then derive per-draw
  keys with ``jax.random.split`` / ``fold_in`` as the examples do.
* The verifier's challenge key must be fresh per protocol run and never
  shared with or derivable by the prover. For non-interactive use, a
  Fiat-Shamir transform (hash the move-1 transcript) replaces it -- not
  implemented here, matching the reference, which is interactive-only.
* Constant seeds (``PRNGKey(0)``) are for tests, goldens, and benchmarks
  only.
* If your threat model requires an audited CSPRNG end-to-end, draw the
  sample bytes outside JAX (e.g. ``secrets``/OS entropy), load them as
  arrays, and use the protocol functions' recorded-randomness replay paths
  (utils/testvectors.py) -- the protocols are pure functions of their
  inputs, so externally-sourced randomness drops in without code changes.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def fresh_key(extra: int | None = None) -> jax.Array:
    """A jax.random key seeded from OS entropy (``os.urandom``),
    **pinned to the threefry implementation** regardless of the session's
    ``jax_default_prng_impl``.

    Folds 128 bits of OS entropy into the PRNG key through four
    ``fold_in`` rounds -- ``jax.random.PRNGKey(seed)`` alone truncates the
    seed to 32 bits under the default x32 config, which would cap the whole
    transcript's unpredictability at 2^32 regardless of how the seed was
    drawn.

    The pin exists because the entropy injection rides the key impl's own
    ``fold_in`` mixing: threefry's is a fixed, version-stable cryptographic
    permutation, while ``rbg`` (the impl bench.py recommends for raw
    throughput) is documented by JAX as backend-dependent and potentially
    key-unstable across versions -- unspecified mixing is the wrong place
    to stand a security helper. Policy: **threefry for key material, rbg
    for throughput benchmarks** (constant ``PRNGKey(0)`` seeds only). The
    returned typed key carries its impl with it, so every draw derived from
    it (``split``/``fold_in``/samplers) stays threefry even in an
    rbg-configured process.

    ``extra``: optional caller-supplied domain-separation integer (e.g. a
    party id), folded in last.
    """
    key = jax.random.key(0, impl="threefry2x32")
    for word in np.frombuffer(os.urandom(16), np.uint32):
        key = jax.random.fold_in(key, int(word))
    if extra is not None:
        key = jax.random.fold_in(key, extra)
    return key
