#!/usr/bin/env python
"""Two-process prover/verifier over the RZK1 wire format.

The reference passes owned structs between prover and verifier in one
process (/root/reference/tests/test.rs:25-29); in deployment the three-move
sigma protocol crosses a network. This example runs prover and verifier as
separate OS processes exchanging serialized messages over pipes -- the
message types on the wire are exactly the reference's ✉ hand-off points
(SURVEY.md section 3.3).

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/two_party.py
"""

import os
import struct
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def send(fd, blob: bytes):
    os.write(fd, struct.pack("<Q", len(blob)))
    off = 0
    while off < len(blob):
        off += os.write(fd, blob[off : off + 1 << 20])


def recv(fd) -> bytes:
    n = struct.unpack("<Q", os.read(fd, 8))[0]
    chunks = []
    while n:
        c = os.read(fd, min(n, 1 << 20))
        chunks.append(c)
        n -= len(c)
    return b"".join(chunks)


def prover_proc(ck_blob, to_v, from_v):
    import jax
    import jax.numpy as jnp
    import ringzk_tpu as rz
    from ringzk_tpu.protocols import open as open_mod
    from ringzk_tpu.utils import serial

    params = rz.Params()
    ckd = serial.loads(ck_blob)
    ck = rz.CommitmentKey(
        a1=jnp.asarray(ckd["a1"]), a2=jnp.asarray(ckd["a2"]),
        a1_hat=jnp.asarray(ckd["a1_hat"]), a2_hat=jnp.asarray(ckd["a2_hat"]),
    )
    n = ck.a1.shape[-1]
    x = rz.prepare_value(params, [[1, 2, 3, 4]], n)

    rctx, pcom = open_mod.prover_commit(jax.random.PRNGKey(11), ck, x, params)
    send(to_v, serial.dumps(pcom))                      # move 1 ✉
    chal = serial.rebuild(
        open_mod.OpenProofChallenge, serial.loads(recv(from_v))
    )                                                    # move 2 ✉
    resp = open_mod.create_response(
        rctx, open_mod.OpenProofChallenge(d=jnp.asarray(chal.d)), params
    )
    send(to_v, serial.dumps(resp))                      # move 3 ✉
    os.close(to_v)


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import ringzk_tpu as rz
    from ringzk_tpu.protocols import open as open_mod
    from ringzk_tpu.utils import serial

    params = rz.Params()
    n = 64
    ck = rz.keygen(jax.random.PRNGKey(0), params, n)
    # wire codec carries int32/uint32; ship the int32 matrices + NTT caches,
    # drop the derivable int8 MXU operators (rebuilt locally if wanted)
    ck_blob = serial.dumps(
        {"a1": ck.a1, "a2": ck.a2, "a1_hat": ck.a1_hat, "a2_hat": ck.a2_hat}
    )

    p2v_r, p2v_w = os.pipe()
    v2p_r, v2p_w = os.pipe()
    pid = os.fork()
    if pid == 0:  # child: prover
        os.close(p2v_r)
        os.close(v2p_w)
        prover_proc(ck_blob, p2v_w, v2p_r)
        os._exit(0)

    os.close(p2v_w)
    os.close(v2p_r)
    # verifier side
    pcom_d = serial.loads(recv(p2v_r))                  # move 1 ✉
    pcom = open_mod.OpenProofCommitment(
        c=rz.Commitment(c=jnp.asarray(pcom_d["c.c"])), t=jnp.asarray(pcom_d["t"])
    )
    vctx, chal = open_mod.generate_challenge(jax.random.PRNGKey(99), pcom, params)
    send(v2p_w, serial.dumps(chal))                     # move 2 ✉
    resp_d = serial.loads(recv(p2v_r))                  # move 3 ✉
    resp = open_mod.OpenProofResponse(z=jnp.asarray(resp_d["z"]))
    ok = open_mod.verify(ck, resp, vctx, params)
    os.waitpid(pid, 0)
    print("two-party open proof verified:", bool(np.asarray(ok)))
    assert bool(np.asarray(ok))


if __name__ == "__main__":
    main()
