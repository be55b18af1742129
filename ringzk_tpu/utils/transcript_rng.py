"""ChaCha stream RNG core for Rust-transcript replay (docs/INTEROP.md).

The bit-exact north-star needs ring-zk's randomness stream replayed: Rust
``rand 0.10``'s ``StdRng`` is ChaCha with 12 rounds (``rand_chacha``), and
every sampler in the reference draws from it. This module implements the
ChaCha block function (rounds parameterized) and a word-stream RNG with
``rand_chacha``'s conventions:

  * seed = 32-byte key; stream id (= nonce words) 0; block counter starts 0;
  * the keystream is consumed as little-endian u32 words in state order;
  * ``next_u32`` pops one word; ``next_u64`` pops two (lo then hi);
  * ``fill_bytes`` serializes words little-endian.

Validation status (this image has no cargo and zero egress -- be precise
about what is and is not proven):

  * the quarter-round and 20-round block function are unit-tested against
    RFC 8439's published test vectors (tests/test_transcript_rng.py), so the
    permutation core is right; ChaCha12 is the identical core at 6 double
    rounds;
  * ``seed_from_u64``'s SplitMix64 expansion matches the published
    SplitMix64 reference outputs (tested);
  * the *rand layer conventions* above (word order, counter start) cannot
    be validated here without rand's sources or outputs. This module
    therefore ships ONLY the validated core: rand's higher distribution
    samplers (uniform range, Fisher-Yates, ziggurat Normal) are
    deliberately absent -- an earlier self-consistent implementation was
    removed because nothing consumed it and nothing could validate it
    offline. Cross-validation path: run scripts/rust_vector_gen on a cargo
    machine (it records all sampled values, so interop testing does not
    depend on this module at all -- see utils/testvectors.check_vector);
    reintroduce distribution helpers only together with recorded rand
    outputs to pin them against.
"""

from __future__ import annotations

import struct

_MASK32 = 0xFFFFFFFF

# "expand 32-byte k"
_SIGMA = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)


def _rotl(x: int, n: int) -> int:
    x &= _MASK32
    return ((x << n) | (x >> (32 - n))) & _MASK32


def quarter_round(a: int, b: int, c: int, d: int):
    """RFC 8439 section 2.1 quarter round on four u32 words."""
    a = (a + b) & _MASK32
    d = _rotl(d ^ a, 16)
    c = (c + d) & _MASK32
    b = _rotl(b ^ c, 12)
    a = (a + b) & _MASK32
    d = _rotl(d ^ a, 8)
    c = (c + d) & _MASK32
    b = _rotl(b ^ c, 7)
    return a, b, c, d


def chacha_block(key_words, counter_words, nonce_words, rounds: int = 20):
    """One ChaCha block: 16 output u32 words (state + input, RFC 8439 2.3).

    key_words: 8 u32; counter_words + nonce_words: 4 u32 total (the 32-bit
    counter layout uses 1 counter word + 3 nonce words; rand_chacha's
    64-bit-counter layout uses 2 + 2 -- pass whichever split applies).
    ``rounds`` counts single rounds (20 for ChaCha20, 12 for ChaCha12).
    """
    ctr_nonce = tuple(counter_words) + tuple(nonce_words)
    if len(ctr_nonce) != 4 or len(tuple(key_words)) != 8:
        raise ValueError("need 8 key words and 4 counter+nonce words")
    state = list(_SIGMA) + [w & _MASK32 for w in key_words] + list(ctr_nonce)
    x = state[:]
    for _ in range(rounds // 2):
        # column rounds
        x[0], x[4], x[8], x[12] = quarter_round(x[0], x[4], x[8], x[12])
        x[1], x[5], x[9], x[13] = quarter_round(x[1], x[5], x[9], x[13])
        x[2], x[6], x[10], x[14] = quarter_round(x[2], x[6], x[10], x[14])
        x[3], x[7], x[11], x[15] = quarter_round(x[3], x[7], x[11], x[15])
        # diagonal rounds
        x[0], x[5], x[10], x[15] = quarter_round(x[0], x[5], x[10], x[15])
        x[1], x[6], x[11], x[12] = quarter_round(x[1], x[6], x[11], x[12])
        x[2], x[7], x[8], x[13] = quarter_round(x[2], x[7], x[8], x[13])
        x[3], x[4], x[9], x[14] = quarter_round(x[3], x[4], x[9], x[14])
    return [(x[i] + state[i]) & _MASK32 for i in range(16)]


class ChaChaRng:
    """Word-stream RNG over the ChaCha block (rand_chacha conventions).

    seed: 32 bytes. rounds=12 gives rand 0.10's StdRng core. Uses the
    64-bit block counter layout (2 counter words, 2 stream words), counter
    and stream starting at 0, words consumed in state order.
    """

    def __init__(self, seed: bytes, rounds: int = 12, stream: int = 0):
        if len(seed) != 32:
            raise ValueError("seed must be 32 bytes")
        self.key = struct.unpack("<8I", seed)
        self.rounds = rounds
        self.stream = stream
        self.counter = 0
        self._buf: list[int] = []

    @classmethod
    def seed_from_u64(cls, state: int, rounds: int = 12) -> "ChaChaRng":
        """rand's SeedableRng::seed_from_u64: seeds a SplitMix64 generator
        and takes 32 bytes of its output as the seed (the documented
        rand_core::SeedableRng default)."""
        seed = bytearray()
        s = state & 0xFFFFFFFFFFFFFFFF
        for _ in range(4):
            s = (s + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            z = s
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            z = z ^ (z >> 31)
            seed += struct.pack("<Q", z)
        return cls(bytes(seed), rounds=rounds)

    def _refill(self):
        ctr = (self.counter & _MASK32, (self.counter >> 32) & _MASK32)
        nonce = (self.stream & _MASK32, (self.stream >> 32) & _MASK32)
        self._buf = chacha_block(self.key, ctr, nonce, self.rounds)
        self.counter += 1

    def next_u32(self) -> int:
        if not self._buf:
            self._refill()
        return self._buf.pop(0)

    def next_u64(self) -> int:
        lo = self.next_u32()
        hi = self.next_u32()
        return lo | (hi << 32)

    def fill_bytes(self, n: int) -> bytes:
        out = bytearray()
        while len(out) < n:
            out += struct.pack("<I", self.next_u32())
        return bytes(out[:n])
