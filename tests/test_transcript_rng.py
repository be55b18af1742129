"""ChaCha core validation against RFC 8439's published test vectors, plus
self-consistency of the stream RNG layer (see transcript_rng's module
docstring for exactly what is and is not cross-validated offline)."""

import struct

from ringzk_tpu.utils import transcript_rng as tr


def test_quarter_round_rfc8439_2_1_1():
    a, b, c, d = tr.quarter_round(0x11111111, 0x01020304, 0x9B8D6F43, 0x01234567)
    assert a == 0xEA2A92F4
    assert b == 0xCB1CF8CE
    assert c == 0x4581472E
    assert d == 0x5881C4BB


def test_chacha20_block_rfc8439_2_3_2():
    """Full 20-round block function vector (RFC 8439 section 2.3.2):
    key 00..1f, counter 1, nonce 00:00:00:09:00:00:00:4a:00:00:00:00."""
    key = struct.unpack("<8I", bytes(range(32)))
    counter = (1,)
    nonce = struct.unpack("<3I", bytes([0, 0, 0, 9, 0, 0, 0, 0x4A, 0, 0, 0, 0]))
    out = tr.chacha_block(key, counter, nonce, rounds=20)
    expect = [
        0xE4E7F110, 0x15593BD1, 0x1FDD0F50, 0xC47120A3,
        0xC7F4D1C7, 0x0368C033, 0x9AAA2204, 0x4E6CD4C3,
        0x466482D2, 0x09AA9F07, 0x05D7C214, 0xA2028BD9,
        0xD19C12B5, 0xB94E16DE, 0xE883D0CB, 0x4E3C50A2,
    ]
    assert out == expect


def test_chacha12_stream_properties():
    """ChaCha12 (StdRng core): deterministic, seed-sensitive, full-period
    word stream with the documented counter layout."""
    r1 = tr.ChaChaRng(bytes(32), rounds=12)
    r2 = tr.ChaChaRng(bytes(32), rounds=12)
    s1 = [r1.next_u32() for _ in range(64)]
    s2 = [r2.next_u32() for _ in range(64)]
    assert s1 == s2
    r3 = tr.ChaChaRng(bytes([1]) + bytes(31), rounds=12)
    assert [r3.next_u32() for _ in range(16)] != s1[:16]
    # next_u64 == two consecutive u32 words, lo first
    r4 = tr.ChaChaRng(bytes(32), rounds=12)
    v = r4.next_u64()
    assert v == (s1[0] | (s1[1] << 32))


def test_seed_from_u64_splitmix():
    """SplitMix64 expansion golden: seed_from_u64(0)'s first state word.
    SplitMix64(0) first output is 0xE220A8397B1DCDAF (published SplitMix64
    reference value), so the first 8 seed bytes are its LE encoding."""
    rng = tr.ChaChaRng.seed_from_u64(0)
    assert rng.key[0] | (rng.key[1] << 32) == 0xE220A8397B1DCDAF


def test_fill_bytes_is_le_word_stream():
    rng = tr.ChaChaRng(bytes(32), rounds=12)
    ref = tr.ChaChaRng(bytes(32), rounds=12)
    words = [ref.next_u32() for _ in range(3)]
    got = rng.fill_bytes(10)
    want = struct.pack("<3I", *words)[:10]
    assert got == want


def test_fresh_key_entropy_and_shape():
    """fresh_key: valid jax.random key (usable by split/normal), distinct
    across calls (OS entropy), and domain-separated by `extra`."""
    import jax
    import numpy as np

    import ringzk_tpu as rz

    k1, k2 = rz.fresh_key(), rz.fresh_key()
    assert not np.array_equal(
        jax.random.key_data(k1), jax.random.key_data(k2)
    )
    # usable downstream
    a, b = jax.random.split(k1)
    assert a.shape == k1.shape
    # extra acts as domain separation on top of the entropy words
    k3 = rz.fresh_key(extra=7)
    assert k3.shape == k1.shape


def test_fresh_key_pinned_to_threefry():
    """fresh_key returns a typed key pinned to threefry even when the
    session default impl is rbg (the bench throughput configuration): the
    security helper's entropy mixing must never ride rbg's unspecified,
    backend-dependent fold_in (rng.py policy)."""
    import jax

    import ringzk_tpu as rz

    with jax.default_prng_impl("rbg"):
        k = rz.fresh_key()
    assert "threefry" in str(jax.random.key_impl(k))
    # derived draws stay threefry: split output carries the same impl
    a, _ = jax.random.split(k)
    assert "threefry" in str(jax.random.key_impl(a))
