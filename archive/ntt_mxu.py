"""Four-step negacyclic NTT on the MXU via balanced int8 digit matmuls.

The roll-form butterfly NTT (ops/ntt.py, ops/pallas/ntt_kernel.py) is
VPU-bound: ~24 lane ops x log2(N) stages per lane. This module computes the
SAME transform (bit-identical values in the same bit-reversed storage
order) as two exact int8 matrix multiplications on the systolic MXU, where
measured int8 throughput on the target chip is ~100x the VPU's uint32 rate:

  N = N1*N2, j = j1 + N1*j2, k = k2 + N2*k1 (classic four-step / Bailey
  decomposition of the psi-twisted DFT):
    1. pre-twist  y_j = x_j * psi^j (elementwise Shoup)
    2. step 1     A[j1, c] = sum_j2 Y[j2, j1] * W2'[j2, c]      (matmul)
    3. step 2     out[c, d] = sum_j1 W~[c, d, j1] * A[j1, c]    (matmul,
                  batched over c; the inter-step twiddle om^{j1*k2} AND the
                  bit-reversal storage permutation are absorbed into the
                  constant matrices, so there is no elementwise work and no
                  modular reduction between the two matmuls)

Exactness: operands are decomposed into balanced base-256 digits (int8);
scaled constant matrices 256^s * W mod p absorb the digit weights so
digit-pair products accumulate in int32 with proven headroom (asserted at
table-build time), and a single Montgomery fold per transform returns to
[0, p). The intermediate A is carried as ``din`` unreduced int32 planes
(bound contraction * 128^2 ~ 2^20) and re-digitized -- no mod-p reduction
between steps.

Replaces nothing by default: enable with RINGZK_NTT=mxu (RingContext.fwd /
inv dispatch). Bit-identical to the stage-chain paths for every prime and
N (tests/test_ntt_mxu.py), including the inverse (which absorbs N^{-1} and
the psi^{-j} un-twist into its step-2 matrices).

Measured end-to-end (open-proof roundtrip, N=512, batch 8192): dense path
290k proofs/s, four-step 247k, vs 455k for the default Pallas butterfly
chain. The profiler shows the dense int8 matmuls sustaining only ~55 TOPS
in situ (vs ~320 TOPS for the key-operator matvecs) plus relayout copies
around the digitize/fold glue -- the XLA-chosen conv lowering and int8
layouts leave most of the MXU headroom unused. Kept as the engine of
record for hardware/toolchains where the matmul path wins, and as the
scaling story for very large N (four-step's matmul volume grows as
N*sqrt(N) vs the dense path's N^2).

Reference parity: this is the TPU-native replacement for the reference's
O(N^2) schoolbook ring multiply (poly-ring-xnp1 `*`, used via
/root/reference/src/mat.rs:95-115).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .conv_mxu import balanced_digits, digits_for_bound
from .montgomery import MontCtx


def _bal_digits_host(a: np.ndarray, nd: int) -> np.ndarray:
    v = a.astype(object).copy()
    out = np.empty((nd,) + a.shape, np.int64)
    for i in range(nd):
        d = ((v + 128) % 256) - 128
        out[i] = d.astype(np.int64)
        v = (v - d) // 256
    assert (v == 0).all(), "digit capacity exceeded"
    return out


def _split(n: int):
    logn = n.bit_length() - 1
    n1 = 1 << ((logn + 1) // 2)
    return n1, n // n1


@functools.lru_cache(maxsize=None)
def _tables_mxu(p: int, g: int, n: int):
    """Host-built constant tables for modulus p, degree n. Returns dict of
    numpy arrays (converted to device constants at trace time)."""
    from .ntt import _bit_reverse as rev

    n1, n2 = _split(n)
    logn1, logn2 = n1.bit_length() - 1, n2.bit_length() - 1
    ctx = MontCtx.make(p)
    psi = pow(g, (p - 1) // (2 * n), p)
    psi_i = pow(psi, -1, p)
    om = pow(psi, 2, p)
    om_i = pow(om, -1, p)
    om1, om2 = pow(om, n2, p), pow(om, n1, p)
    om1_i, om2_i = pow(om_i, n2, p), pow(om_i, n1, p)
    n_inv = pow(n, -1, p)

    din = digits_for_bound(p - 1)          # input digit count (4 for ~2^30)
    dout = din                             # matrix-entry digit count

    # ---- forward ----
    # pre-twist plane psi^j with Shoup companions
    tw = np.array([pow(psi, j, p) for j in range(n)], np.uint32)
    tw_shoup = ((tw.astype(object) << 32) // p).astype(np.uint32)

    w2p = np.array(
        [[pow(om2, j2 * rev(c, logn2), p) for c in range(n2)] for j2 in range(n2)],
        np.int64,
    )
    m1 = np.zeros((din * n2, dout * n2), np.int64)
    for u in range(din):
        dg = _bal_digits_host((pow(256, u, p) * w2p) % p, dout)
        for v in range(dout):
            m1[u * n2 : (u + 1) * n2, v * n2 : (v + 1) * n2] = dg[v]
    bound1 = din * n2 * 128 * 128          # |A_v| after step 1
    gdig = digits_for_bound(bound1)
    assert din * n2 * 128 * 128 < 2**31

    wt = np.zeros((n2, n1, n1), np.int64)  # [c, d, j1]
    for c in range(n2):
        rc = rev(c, logn2)
        for d in range(n1):
            rd = rev(d, logn1)
            for j1 in range(n1):
                wt[c, d, j1] = pow(om1, rd * j1, p) * pow(om, j1 * rc, p) % p
    m2 = np.zeros((n2, dout * gdig * n1, dout * n1), np.int64)
    for c in range(n2):
        for v in range(dout):
            for gg in range(gdig):
                dgw = _bal_digits_host((pow(256, v + gg, p) * wt[c]) % p, dout)
                r0 = (v * gdig + gg) * n1
                for w in range(dout):
                    m2[c, r0 : r0 + n1, w * n1 : (w + 1) * n1] = dgw[w].T
    assert dout * gdig * n1 * 128 * 128 < 2**31

    # ---- inverse ----
    v1 = np.array(
        [[pow(om1_i, j1 * rev(d, logn1), p) for d in range(n1)] for j1 in range(n1)],
        np.int64,
    )
    m1i = np.zeros((din * n1, dout * n1), np.int64)
    for u in range(din):
        dg = _bal_digits_host((pow(256, u, p) * v1) % p, dout)
        for v in range(dout):
            m1i[u * n1 : (u + 1) * n1, v * n1 : (v + 1) * n1] = dg[v].T
    bound1i = din * n1 * 128 * 128
    gdigi = digits_for_bound(bound1i)
    psi32_i = pow(psi_i, n1, p)
    m2i = np.zeros((n1, dout * gdigi * n2, dout * n2), np.int64)
    for j1 in range(n1):
        v2 = np.zeros((n2, n2), np.int64)
        for c in range(n2):
            rc = rev(c, logn2)
            for j2 in range(n2):
                v2[c, j2] = (
                    pow(om_i, j1 * rc, p)
                    * pow(om2_i, j2 * rc, p)
                    * pow(psi_i, j1, p)
                    * pow(psi32_i, j2, p)
                    * n_inv
                ) % p
        for v in range(dout):
            for gg in range(gdigi):
                dgw = _bal_digits_host((pow(256, v + gg, p) * v2) % p, dout)
                r0 = (v * gdigi + gg) * n2
                for w in range(dout):
                    m2i[j1, r0 : r0 + n2, w * n2 : (w + 1) * n2] = dgw[w]
    assert dout * gdigi * n2 * 128 * 128 < 2**31

    shift16 = ctx.h_to_mont(65536)
    shifts_mont = tuple(ctx.h_to_mont(pow(256, w, p)) for w in range(dout))
    return dict(
        n1=n1, n2=n2, din=din, dout=dout, gdig=gdig, gdigi=gdigi,
        tw=tw, tw_shoup=tw_shoup,
        m1=m1.astype(np.int8), m2=m2.astype(np.int8),
        m1i=m1i.astype(np.int8), m2i=m2i.astype(np.int8),
        shift16=shift16, shifts_mont=shifts_mont,
    )


def _dot8(a, b):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _bdot8(a, b):
    """Batched: a [B, R, K] @ b [B, K, M] -> [B, R, M] int32."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32
    )


def _fold16(ctx: MontCtx, shift16: int, hw):
    """hw: [..., dout(=4), M] int32 digit-plane stack -> [0, p) uint32 via
    pairwise int32 combine + one Montgomery fold.

    SAFETY: the pairwise combine h_lo + 256*h_hi is only exact when
    257 * max|h| < 2^31 -- callers must assert their accumulation bound
    against _PAIR_FOLD_LIMIT (the four-step path does; the dense path at
    N >= 128 canNOT and uses _fold_planes instead)."""
    p0 = hw[..., 0, :] + 256 * hw[..., 1, :]
    p1 = hw[..., 2, :] + 256 * hw[..., 3, :]
    return ctx.add(
        ctx.reduce_i32_centered(p0),
        ctx.mont_mul(ctx.reduce_i32_centered(p1), np.uint32(shift16)),
    )


_PAIR_FOLD_LIMIT = 2**31 // 257  # max |plane| for the paired int32 combine


def _fold_planes(ctx: MontCtx, shifts_mont, hw):
    """Wrap-safe digit fold: hw [..., dout, M] int32 -> [0, p) uint32.

    Reduces every plane mod p *before* weighting (one REDC + one Montgomery
    multiply per plane), so it is exact for any int32 plane values -- the
    dense NTT's step-1 sums can reach din*N*128^2 (~2^25 at N=512), where
    the paired combine in _fold16 could wrap for adversarially aligned
    digit patterns (e.g. verifier-side transforms of attacker-chosen wire
    values). shifts_mont[w] = 256^w * R mod p."""
    acc = ctx.reduce_i32_centered(hw[..., 0, :])
    for w in range(1, hw.shape[-2]):
        acc = ctx.add(
            acc,
            ctx.mont_mul(
                ctx.reduce_i32_centered(hw[..., w, :]),
                np.uint32(shifts_mont[w]),
            ),
        )
    return acc


# ---------------------------------------------------------------------------
# Dense NTT-as-matmul: for moderate N the MXU's int8 MAC rate (~100x the
# VPU's uint32 op rate on the target chip) makes the O(N^2) transform-as-
# matrix-product CHEAPER than the O(N log N) butterfly chain. Everything --
# the psi pre-twist, the bit-reversed storage permutation, the digit weights
# 256^u, and (inverse) N^{-1} and the psi^{-j} un-twist -- is absorbed into
# one constant int8 matrix [din*N, dout*N] per prime per direction, so a
# transform is: balanced-digitize (closed form, ~12 lane ops), one int8
# matmul with exact int32 accumulation (contraction din*N <= 2^31 bound
# asserted), one Montgomery fold (~25 lane ops). No reduction mod p of the
# input is needed: the matmul accumulates the true integer combination of
# centered digits, which the fold reduces exactly.
# ---------------------------------------------------------------------------

DENSE_MAX_N = 1024  # [4N, 4N] int8 tables: 4 MB at N=512, 16 MB at N=1024


@functools.lru_cache(maxsize=None)
def _tables_dense(p: int, g: int, n: int):
    from .ntt import _bit_reverse as rev

    ctx = MontCtx.make(p)
    logn = n.bit_length() - 1
    psi = pow(g, (p - 1) // (2 * n), p)
    psi_i = pow(psi, -1, p)
    om = pow(psi, 2, p)
    om_i = pow(om, -1, p)
    n_inv = pow(n, -1, p)
    # 4 balanced digits cover |v| <= 2.139e9: every centered mod-q residue
    # (q < 2^32 - 16M) and every [0, p) hat value. NOT the full int32 range;
    # the ring API contract (centered residues) guarantees the bound.
    din = 4
    dout = digits_for_bound(p - 1)
    assert din * n * 128 * 128 < 2**31, "dense contraction overflows int32"

    # fwd: stored[i] = sum_j x_j * psi^j * om^(j*rev(i))
    kk = [rev(i, logn) for i in range(n)]
    base = np.empty((n, n), np.int64)       # [j, i]
    for j in range(n):
        pj = pow(psi, j, p)
        for i in range(n):
            base[j, i] = pj * pow(om, j * kk[i], p) % p
    mf = np.zeros((din * n, dout * n), np.int64)
    for u in range(din):
        dg = _bal_digits_host((pow(256, u, p) * base) % p, dout)
        for w in range(dout):
            mf[u * n : (u + 1) * n, w * n : (w + 1) * n] = dg[w]

    # inv: out[j] = n_inv * psi^{-j} * sum_i stored[i] * om^{-j*rev(i)}
    for i in range(n):
        ri = kk[i]
        for j in range(n):
            base[i, j] = n_inv * pow(psi_i, j, p) * pow(om_i, j * ri, p) % p
    mi = np.zeros((din * n, dout * n), np.int64)
    for u in range(din):
        dg = _bal_digits_host((pow(256, u, p) * base) % p, dout)
        for w in range(dout):
            mi[u * n : (u + 1) * n, w * n : (w + 1) * n] = dg[w]

    return dict(
        din=din, dout=dout,
        mf=mf.astype(np.int8), mi=mi.astype(np.int8),
        shift16=ctx.h_to_mont(65536),
        shifts_mont=tuple(ctx.h_to_mont(pow(256, w, p)) for w in range(dout)),
    )


def _dense_apply(ctx: MontCtx, t, x_i32, n: int):
    """digitize -> one int8 matmul -> fold. x_i32: int32 [..., N] with
    |value| within 4-digit balanced capacity (2.139e9: any centered mod-q
    residue or [0, p) value). Digit planes are concatenated along the minor
    axis (matching the (u, j) row order of the table) -- no transposes."""
    lead = x_i32.shape[:-1]
    din, dout = t["din"], t["dout"]
    x2 = x_i32.reshape((-1, n))
    bias = sum(128 << (8 * i) for i in range(din))
    ub = jax.lax.bitcast_convert_type(x2, jnp.uint32) + np.uint32(bias)
    lhs = jnp.concatenate(
        [
            (
                ((ub >> np.uint32(8 * u)) & np.uint32(255)).astype(jnp.int32)
                - np.int32(128)
            ).astype(jnp.int8)
            for u in range(din)
        ],
        axis=-1,
    )  # [R, din*N], columns ordered (u, j)
    r = x2.shape[0]
    h = _dot8(lhs, t["m"]).reshape(r, dout, n)
    # |h| can reach din*N*128^2 (~2^25 at N=512): the paired fold could
    # wrap for adversarially aligned digits, so fold plane-by-plane
    return _fold_planes(ctx, t["shifts_mont"], h).reshape(lead + (n,))


def fwd_one_dense(ring, i: int, x):
    """Dense-matmul forward NTT of prime i: int32 [..., N] (centered, or any
    int32) -> [0, p) uint32 [..., N], bit-identical to ntt._fwd_one. Routes
    through the fused Pallas digitize/matmul/fold kernel on TPU backends
    (pallas/ntt_dense_kernel.py); composed XLA ops elsewhere."""
    from .ntt import GENERATORS, PRIMES, _use_pallas

    n = x.shape[-1]
    t = _tables_dense(PRIMES[i], GENERATORS[i], n)
    table = {"din": t["din"], "dout": t["dout"], "m": jnp.asarray(t["mf"]),
             "shifts_mont": t["shifts_mont"]}
    x32 = jnp.asarray(x, jnp.int32)
    if _use_pallas():
        from .pallas import ntt_dense_kernel

        if ntt_dense_kernel.fits_vmem(n):
            return ntt_dense_kernel.dense_apply_pallas(
                ring.mont[i], table, x32, n
            )
    return _dense_apply(ring.mont[i], table, x32, n)


def inv_one_dense(ring, i: int, xh):
    """Dense-matmul inverse NTT of prime i (incl. N^{-1}, psi un-twist):
    [0, p) uint32 [..., N] -> [0, p) uint32, bit-identical to ntt._inv_one.
    Fused Pallas kernel on TPU (see fwd_one_dense)."""
    from .ntt import GENERATORS, PRIMES, _use_pallas

    n = xh.shape[-1]
    t = _tables_dense(PRIMES[i], GENERATORS[i], n)
    table = {"din": t["din"], "dout": t["dout"], "m": jnp.asarray(t["mi"]),
             "shifts_mont": t["shifts_mont"]}
    xi = jax.lax.bitcast_convert_type(xh, jnp.int32)
    if _use_pallas():
        from .pallas import ntt_dense_kernel

        if ntt_dense_kernel.fits_vmem(n):
            return ntt_dense_kernel.dense_apply_pallas(
                ring.mont[i], table, xi, n
            )
    return _dense_apply(ring.mont[i], table, xi, n)


def fwd_one(ring, i: int, x):
    """MXU forward NTT of prime i: dense matmul for N <= DENSE_MAX_N
    (table memory), four-step above."""
    if x.shape[-1] <= DENSE_MAX_N:
        return fwd_one_dense(ring, i, x)
    return fwd_one_mxu(ring, i, x)


def inv_one(ring, i: int, xh):
    """MXU inverse NTT of prime i (see fwd_one)."""
    if xh.shape[-1] <= DENSE_MAX_N:
        return inv_one_dense(ring, i, xh)
    return inv_one_mxu(ring, i, xh)


def fwd_one_mxu(ring, i: int, x):
    """Forward NTT of prime i: centered int32 [..., N] -> [0, p) uint32
    [..., N], bit-identical values/order to ntt._fwd_one."""
    from .ntt import GENERATORS, PRIMES

    n = x.shape[-1]
    t = _tables_mxu(PRIMES[i], GENERATORS[i], n)
    ctx = ring.mont[i]
    n1, n2, din, dout, gdig = t["n1"], t["n2"], t["din"], t["dout"], t["gdig"]
    lead = x.shape[:-1]
    xr = ctx.reduce_i32_centered(x.reshape((-1, n)))
    y = ctx.shoup_mul(jnp.asarray(t["tw"]), jnp.asarray(t["tw_shoup"]), xr)
    r = y.shape[0]
    yd = balanced_digits(
        jax.lax.bitcast_convert_type(y, jnp.int32).reshape(r, n2, n1), din
    )  # [u, R, j2, j1]
    lhs1 = jnp.transpose(yd, (1, 3, 0, 2)).reshape(r * n1, din * n2)
    av = _dot8(lhs1, jnp.asarray(t["m1"])).reshape(r, n1, dout, n2)
    gd = balanced_digits(av, gdig)  # [g, R, j1, v, c]
    lhs2 = jnp.transpose(gd, (4, 1, 3, 0, 2)).reshape(n2, r, dout * gdig * n1)
    h = _bdot8(lhs2, jnp.asarray(t["m2"])).reshape(n2, r, dout, n1)
    out = _fold_planes(ctx, t["shifts_mont"], h)  # [c, R, d] uint32
    return jnp.transpose(out, (1, 0, 2)).reshape(lead + (n,))


def inv_one_mxu(ring, i: int, xh):
    """Inverse NTT of prime i (incl. N^{-1} and psi^{-j} un-twist):
    [0, p) uint32 [..., N] -> [0, p) uint32 [..., N] natural order,
    bit-identical to ntt._inv_one."""
    from .ntt import GENERATORS, PRIMES

    n = xh.shape[-1]
    t = _tables_mxu(PRIMES[i], GENERATORS[i], n)
    ctx = ring.mont[i]
    n1, n2, din, dout, gdigi = t["n1"], t["n2"], t["din"], t["dout"], t["gdigi"]
    lead = xh.shape[:-1]
    s = jax.lax.bitcast_convert_type(xh.reshape((-1, n)), jnp.int32)
    r = s.shape[0]
    sd = balanced_digits(s.reshape(r, n2, n1), din)  # [u, R, c, d]
    lhs1 = jnp.transpose(sd, (1, 2, 0, 3)).reshape(r * n2, din * n1)
    uv = _dot8(lhs1, jnp.asarray(t["m1i"])).reshape(r, n2, dout, n1)
    gd = balanced_digits(uv, gdigi)  # [g, R, c, v, j1]
    lhs2 = jnp.transpose(gd, (4, 1, 3, 0, 2)).reshape(n1, r, dout * gdigi * n2)
    h = _bdot8(lhs2, jnp.asarray(t["m2i"])).reshape(n1, r, dout, n2)
    out = _fold_planes(ctx, t["shifts_mont"], h)  # [j1, R, j2] uint32
    return jnp.transpose(out, (1, 2, 0)).reshape(lead + (n,))
