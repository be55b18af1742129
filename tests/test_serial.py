"""Wire-format tests: the reference's serde tier (C8 in SURVEY.md) --
round-trips of every protocol message/context type, cross-checks of the
native C++ codec against the pure-numpy fallback, and a wire-size
regression in the spirit of /root/reference/src/mat.rs:425-438."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ringzk_tpu as rz
from ringzk_tpu.protocols import open as open_mod
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


def test_native_matches_numpy(rng):
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
