"""Wire-format tests: the reference's serde tier (C8 in SURVEY.md) --
round-trips of every protocol message/context type, cross-checks of the
native C++ codec against the pure-numpy fallback, and a wire-size
regression in the spirit of /root/reference/src/mat.rs:425-438."""

import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ringzk_tpu as rz
from ringzk_tpu.protocols import linear as linear_mod
from ringzk_tpu.protocols import open as open_mod
from ringzk_tpu.protocols import sum as sum_mod
from ringzk_tpu.utils import serial

N = 16
PARAMS = rz.Params()


def _np_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


@pytest.fixture(scope="module")
def proof_objects():
    kk, kx, kp, kc = jax.random.split(jax.random.PRNGKey(0), 4)
    ck = rz.keygen(kk, PARAMS, N)
    x = jax.random.randint(kx, (3, PARAMS.l, N), -PARAMS.q, PARAMS.q + 1, dtype=jnp.int32)
    rctx, pcom = open_mod.prover_commit(kp, ck, x, PARAMS)
    vctx, chal = open_mod.generate_challenge(kc, pcom, PARAMS)
    resp = open_mod.create_response(rctx, chal, PARAMS)
    return ck, rctx, pcom, vctx, chal, resp


def test_roundtrip_all_message_types(proof_objects):
    ck, rctx, pcom, vctx, chal, resp = proof_objects
    for obj in (rctx, pcom, vctx, chal, resp):
        blob = serial.dumps(obj)
        back = serial.loads(blob)
        flat = dict(serial._flatten_with_paths(obj))
        for path, leaf in flat.items():
            if leaf is None:
                assert back[path] is None
            else:
                np.testing.assert_array_equal(back[path], np.asarray(leaf))


def test_rebuild_response(proof_objects):
    *_, resp = proof_objects
    back = serial.loads(serial.dumps(resp))
    rebuilt = serial.rebuild(open_mod.OpenProofResponse, back)
    np.testing.assert_array_equal(rebuilt.z, np.asarray(resp.z))


def test_rebuild_nested_context(proof_objects):
    _, rctx, *_ = proof_objects
    back = serial.loads(serial.dumps(rctx))
    rebuilt = serial.rebuild(open_mod.OpenProofResponseContext, back)
    np.testing.assert_array_equal(rebuilt.y, np.asarray(rctx.y))
    np.testing.assert_array_equal(rebuilt.opening.x, np.asarray(rctx.opening.x))
    assert rebuilt.opening.f is None


def _tree_equal(a, b):
    la = dict(serial._flatten_with_paths(a))
    lb = dict(serial._flatten_with_paths(b))
    assert la.keys() == lb.keys()
    for k in la:
        if la[k] is None:
            assert lb[k] is None
        else:
            np.testing.assert_array_equal(np.asarray(la[k]), np.asarray(lb[k]))


@pytest.fixture(scope="module")
def linear_objects(proof_objects):
    ck = proof_objects[0]
    kx, kg, kp, kc = jax.random.split(jax.random.PRNGKey(1), 4)
    x = jax.random.randint(kx, (2, PARAMS.l, N), -PARAMS.q, PARAMS.q + 1, dtype=jnp.int32)
    g = jax.random.randint(kg, (2, N), -PARAMS.q, PARAMS.q + 1, dtype=jnp.int32)
    rctx, pcom = linear_mod.prover_commit(kp, ck, g, x, PARAMS)
    vctx, chal = linear_mod.generate_challenge(kc, pcom, PARAMS)
    resp = linear_mod.create_response(rctx, chal, PARAMS)
    return rctx, pcom, vctx, chal, resp


@pytest.fixture(scope="module")
def sum_objects(proof_objects):
    ck = proof_objects[0]
    kx, kg, kp, kc = jax.random.split(jax.random.PRNGKey(2), 4)
    xs = jax.random.randint(
        kx, (2, 3, PARAMS.l, N), -PARAMS.q, PARAMS.q + 1, dtype=jnp.int32
    )
    gs = jax.random.randint(kg, (2, 3, N), -PARAMS.q, PARAMS.q + 1, dtype=jnp.int32)
    rctx, pcom = sum_mod.prover_commit(kp, ck, gs, xs, PARAMS)
    vctx, chal = sum_mod.generate_challenge(kc, pcom, PARAMS)
    resp = sum_mod.create_response(rctx, chal, PARAMS)
    return rctx, pcom, vctx, chal, resp


_OPEN_TYPES = (
    open_mod.OpenProofResponseContext,
    open_mod.OpenProofCommitment,
    open_mod.OpenProofVerificationContext,
    open_mod.OpenProofChallenge,
    open_mod.OpenProofResponse,
)
_LINEAR_TYPES = (
    linear_mod.LinearProofResponseContext,
    linear_mod.LinearProofCommitment,
    linear_mod.LinearProofVerificationContext,
    linear_mod.LinearProofChallenge,
    linear_mod.LinearProofResponse,
)
_SUM_TYPES = (
    sum_mod.SumProofResponseContext,
    sum_mod.SumProofCommitment,
    sum_mod.SumProofVerificationContext,
    sum_mod.SumProofChallenge,
    sum_mod.SumProofResponse,
)


@pytest.mark.parametrize("idx", range(5))
def test_typed_rebuild_open(proof_objects, idx):
    """Typed round-trip for every open-proof message/context family
    (reference serde surface: /root/reference/src/prove/open.rs:180-228)."""
    obj = proof_objects[1 + idx]
    rebuilt = serial.rebuild(_OPEN_TYPES[idx], serial.loads(serial.dumps(obj)))
    assert type(rebuilt) is _OPEN_TYPES[idx]
    _tree_equal(obj, rebuilt)


@pytest.mark.parametrize("idx", range(5))
def test_typed_rebuild_linear(linear_objects, idx):
    """Typed round-trip for every linear-proof family
    (/root/reference/src/prove/linear.rs:256-325; note the reference
    *forgets* serde on LinearProofResponse -- an inconsistency SURVEY.md C8
    documents; here all five types round-trip)."""
    obj = linear_objects[idx]
    rebuilt = serial.rebuild(_LINEAR_TYPES[idx], serial.loads(serial.dumps(obj)))
    assert type(rebuilt) is _LINEAR_TYPES[idx]
    _tree_equal(obj, rebuilt)


@pytest.mark.parametrize("idx", range(5))
def test_typed_rebuild_sum(sum_objects, idx):
    """Typed round-trip for every sum-proof family
    (/root/reference/src/prove/sum.rs:327-391)."""
    obj = sum_objects[idx]
    rebuilt = serial.rebuild(_SUM_TYPES[idx], serial.loads(serial.dumps(obj)))
    assert type(rebuilt) is _SUM_TYPES[idx]
    _tree_equal(obj, rebuilt)


def test_typed_rebuild_nested_types(proof_objects):
    """Nested objects come back as their proper types, not dicts."""
    from ringzk_tpu.protocols.commit import Commitment, Opening

    _, rctx, pcom, *_ = proof_objects
    r2 = serial.rebuild(
        open_mod.OpenProofResponseContext, serial.loads(serial.dumps(rctx))
    )
    assert type(r2.opening) is Opening and r2.opening.f is None
    p2 = serial.rebuild(
        open_mod.OpenProofCommitment, serial.loads(serial.dumps(pcom))
    )
    assert type(p2.c) is Commitment


def test_prepare_value_reduces_mod_q():
    """Out-of-range coefficients reduce mod q (centered), matching
    ZqI64::from (/root/reference/src/params.rs:67-91) -- not a silent
    int32 wraparound."""
    m = PARAMS.modulus
    vals = [2**31, m, m + 5, -m - 7, 2**62]
    out = np.asarray(rz.prepare_scalar(PARAMS, vals, N))
    for i, v in enumerate(vals):
        expect = v % m
        if expect > m // 2:
            expect -= m
        assert out[i] == expect, (v, out[i], expect)
    x = np.asarray(rz.prepare_value(PARAMS, [[m + 3]], N))
    assert x[0, 0] == 3


def test_native_matches_numpy(rng):
    """Cross-check the C++ codec against the numpy fallback. Builds
    libcodec.so on demand (it is gitignored) so this never silently tests
    numpy against itself; skips loudly only if no compiler is available."""
    if serial._native() is None:
        import os

        script = os.path.join(
            os.path.dirname(__file__), "..", "scripts", "build_native.sh"
        )
        build = subprocess.run(
            ["bash", script], capture_output=True, text=True
        )
        if build.returncode != 0:
            pytest.skip(f"native codec build failed:\n{build.stderr}")
        serial._LIB = None  # force re-probe of the freshly built .so
        assert serial._native() is not None, "built libcodec.so but load failed"
    a = rng.integers(-(2**31), 2**31 - 1, size=(17, 32), dtype=np.int64).astype(np.int32)
    a[:, 20:] = 0  # exercise trailing-zero trimming
    enc_native = serial.encode_rows(a)
    enc_py = serial._encode_rows_numpy(a.reshape(-1, 32))
    assert enc_native == enc_py
    dec = serial.decode_rows(enc_native, a.shape)
    np.testing.assert_array_equal(dec, a)
    dec_py, _ = serial._decode_rows_numpy(memoryview(enc_py), 17, 32)
    np.testing.assert_array_equal(dec_py, a)


def test_wire_size_regression():
    """Compactness golden value (bincode-analog): a [1,2,3,4] message padded
    to N=16 must cost 4 (count) + 4 (varints) bytes of payload per row."""
    x = rz.prepare_value(PARAMS, [[1, 2, 3, 4]], N)
    enc = serial.encode_rows(np.asarray(x))
    assert len(enc) == 8, len(enc)


def test_corrupt_input_rejected():
    with pytest.raises(ValueError):
        serial.loads(b"XXXX" + b"\0" * 16)
    with pytest.raises(ValueError):
        serial.decode_rows(b"\xff\xff\xff\xff", (1, 4))


def test_native_mt_encode_matches_single_thread(rng):
    """The multithreaded native encoder must produce byte-identical output
    to the single-threaded one (and to numpy) on a large payload."""
    if serial._native() is None:
        pytest.skip("native codec unavailable")
    lib = serial._native()
    if not hasattr(lib, "rzk_encode_rows_mt"):
        pytest.skip("libcodec.so predates rzk_encode_rows_mt; rebuild")
    import ctypes

    a = rng.integers(-(2**31), 2**31 - 1, size=(9000, 16), dtype=np.int64).astype(
        np.int32
    )
    a[:, 10:] = 0
    a2d = np.ascontiguousarray(a)
    bound = lib.rzk_encode_bound(a2d.shape[0], a2d.shape[1])
    data = a2d.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    out_st = (ctypes.c_uint8 * bound)()
    n_st = lib.rzk_encode_rows(data, a2d.shape[0], a2d.shape[1], out_st)
    out_mt = (ctypes.c_uint8 * bound)()
    n_mt = lib.rzk_encode_rows_mt(data, a2d.shape[0], a2d.shape[1], out_mt, 7)
    assert n_mt == n_st
    assert bytes(bytearray(out_mt)[:n_mt]) == bytes(bytearray(out_st)[:n_st])
    # the public path (>= _MT_ROWS rows routes through mt) round-trips
    enc = serial.encode_rows(a)
    assert enc == bytes(bytearray(out_st)[:n_st])
    np.testing.assert_array_equal(serial.decode_rows(enc, a.shape), a)


def test_truncated_input_rejected(rng):
    """Every truncation point of a valid container must raise ValueError
    (failure detection: clean exception, never a leaked struct/index error
    or silent garbage)."""
    from ringzk_tpu.protocols.open import OpenProofResponse

    full = serial.dumps(OpenProofResponse(
        z=np.asarray(rng.integers(-5, 6, size=(2, 3, 8)), np.int32)))
    for cut in sorted({5, 9, 11, len(full) // 2, len(full) - 1}):
        with pytest.raises(ValueError):
            serial.loads(full[:cut])
    # oversized payload length field must not read past the buffer
    with pytest.raises(ValueError):
        serial.loads(full[:-4])


def test_hostile_shape_and_encoding_rejected(rng):
    """A corrupt header must not trigger attacker-sized allocations or a
    silently wrong dtype: oversized declared shapes, varint encoding paired
    with a non-int32 dtype code, and unknown encodings all raise."""
    import struct

    from ringzk_tpu.protocols.open import OpenProofResponse

    z = np.asarray(rng.integers(-5, 6, size=(2, 3, 8)), np.int32)
    full = bytearray(serial.dumps(OpenProofResponse(z=z)))
    # entry layout after the 10-byte container header:
    #   u16 path_len | path | u8 code | u8 enc | u8 ndim | u32 dims[ndim]...
    plen = struct.unpack_from("<H", full, 10)[0]
    meta = 12 + plen                      # offset of (code, enc, ndim)
    dims = meta + 3
    assert full[meta + 2] == 3            # ndim

    bomb = bytearray(full)
    struct.pack_into("<III", bomb, dims, 2**31, 2**31, 2**31)
    with pytest.raises(ValueError, match="max_array_bytes|payload"):
        serial.loads(bytes(bomb))

    wrong_dtype = bytearray(full)
    wrong_dtype[meta] = 1                 # uint32 + varint encoding
    with pytest.raises(ValueError, match="varint encoding requires int32"):
        serial.loads(bytes(wrong_dtype))

    bad_enc = bytearray(full)
    bad_enc[meta + 1] = 7
    with pytest.raises(ValueError, match="unknown encoding"):
        serial.loads(bytes(bad_enc))

    # row-count-vs-payload guard: shape claiming more rows than the payload
    # could possibly prefix (4 bytes per row) must raise, not allocate
    many_rows = bytearray(full)
    struct.pack_into("<III", many_rows, dims, 2**20, 2**10, 8)
    with pytest.raises(ValueError, match="row count|max_array_bytes"):
        serial.loads(bytes(many_rows))

    # the untampered container still round-trips
    back = serial.rebuild(OpenProofResponse, serial.loads(bytes(full)))
    np.testing.assert_array_equal(np.asarray(back.z), z)
