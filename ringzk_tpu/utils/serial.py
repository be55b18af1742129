"""Deterministic packed wire format for protocol pytrees.

The reference serializes every protocol state/message type with serde
(bincode wire: length-prefixed coefficient vectors, trailing zeros trimmed
-- /root/reference/src/mat.rs:425-438 asserts the 36-byte golden encoding).
Here every protocol object is a NamedTuple pytree of int32 arrays, so the
wire format is a flat, deterministic container of named arrays:

  header:  b"RZK1" | u16 version | u32 n_entries
  entry:   u16 path_len | path utf-8 | u8 dtype | u8 encoding
           u8 ndim | u32 dims[ndim] | u64 payload_len | payload

encodings: 0 = raw little-endian; 1 = per-row trailing-zero-trimmed zigzag
varints (the bincode-analog compact form; rows are the innermost N axis).
Encoding 1 uses the native C++ codec (runtime/codec.cpp via ctypes) when
built, with a pure-numpy fallback.

This doubles as the suspend/resume story (SURVEY.md section 5.4: the
reference's serde-serializable contexts are its de-facto checkpointing) and
as the prover<->verifier interchange format for multi-host deployments.
"""

from __future__ import annotations

import ctypes
import os
import struct
import typing
from typing import Any

import numpy as np

_MAGIC = b"RZK1"
_VERSION = 1
# code 3 (int64) carries wide-ring residues (modulus >= 2^32); RAW-encoded
# only -- the varint path (and its C codec) stays int32-native
_DTYPES = {0: np.int32, 1: np.uint32, 2: np.bool_, 3: np.int64}
_DTYPE_CODES = {
    np.dtype(np.int32): 0,
    np.dtype(np.uint32): 1,
    np.dtype(np.bool_): 2,
    np.dtype(np.int64): 3,
}

RAW = 0
TRIMMED_VARINT = 1

_LIB = None


def _native():
    global _LIB
    if _LIB is None:
        so = os.path.join(os.path.dirname(__file__), "..", "runtime", "libcodec.so")
        so = os.path.abspath(so)
        if os.path.exists(so):
            lib = ctypes.CDLL(so)
            lib.rzk_encode_bound.restype = ctypes.c_uint64
            lib.rzk_encode_bound.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
            lib.rzk_encode_rows.restype = ctypes.c_uint64
            lib.rzk_encode_rows.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_uint64, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.rzk_decode_rows.restype = ctypes.c_uint64
            lib.rzk_decode_rows.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_uint64, ctypes.c_uint64,
            ]
            if hasattr(lib, "rzk_encode_rows_mt"):
                lib.rzk_encode_rows_mt.restype = ctypes.c_uint64
                lib.rzk_encode_rows_mt.argtypes = [
                    ctypes.POINTER(ctypes.c_int32), ctypes.c_uint64,
                    ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_uint32,
                ]
            _LIB = lib
        else:
            _LIB = False
    return _LIB or None


# -- row codec (bincode-analog) ---------------------------------------------


def _encode_rows_numpy(a2d: np.ndarray) -> bytes:
    out = bytearray()
    for row in a2d:
        nz = np.nonzero(row)[0]
        kept = int(nz[-1]) + 1 if nz.size else 0
        out += struct.pack("<I", kept)
        for v in row[:kept]:
            z = (int(v) << 1) ^ (int(v) >> 31)
            z &= 0xFFFFFFFF
            while z >= 0x80:
                out.append((z & 0x7F) | 0x80)
                z >>= 7
            out.append(z)
    return bytes(out)


def _decode_rows_numpy(buf: memoryview, n_rows: int, row_len: int):
    data = np.zeros((n_rows, row_len), np.int32)
    pos = 0
    for r in range(n_rows):
        kept = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        if kept > row_len:
            raise ValueError("corrupt row: kept > row_len")
        for i in range(kept):
            z = 0
            shift = 0
            while True:
                if shift > 28:
                    raise ValueError("corrupt varint")
                b = buf[pos]
                pos += 1
                z |= (b & 0x7F) << shift
                if not (b & 0x80):
                    break
                shift += 7
            val = (z >> 1) ^ ((-(z & 1)) & 0xFFFFFFFF)  # un-zigzag, uint32
            data[r, i] = val - 2**32 if val >= 2**31 else val
    return data, pos


# Row count past which the native encoder fans out across threads (the
# multi-host interchange path serializes 10^4..10^5 proofs at once).
_MT_ROWS = 4096


def encode_rows(a: np.ndarray) -> bytes:
    """Trailing-zero-trimmed zigzag varint encoding of [..., N] int32."""
    a2d = np.ascontiguousarray(a, np.int32).reshape(-1, a.shape[-1])
    lib = _native()
    if lib is not None:
        bound = lib.rzk_encode_bound(a2d.shape[0], a2d.shape[1])
        out = (ctypes.c_uint8 * bound)()
        data = a2d.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        if a2d.shape[0] >= _MT_ROWS and hasattr(lib, "rzk_encode_rows_mt"):
            n = lib.rzk_encode_rows_mt(
                data, a2d.shape[0], a2d.shape[1], out,
                min(8, os.cpu_count() or 1),
            )
        else:
            n = lib.rzk_encode_rows(data, a2d.shape[0], a2d.shape[1], out)
        return bytes(bytearray(out)[:n])
    return _encode_rows_numpy(a2d)


def decode_rows(buf: bytes, shape) -> np.ndarray:
    n_rows = int(np.prod(shape[:-1], dtype=np.int64)) if len(shape) > 1 else 1
    row_len = shape[-1]
    lib = _native()
    if lib is not None:
        data = np.zeros((n_rows, row_len), np.int32)
        bb = (ctypes.c_uint8 * len(buf)).from_buffer_copy(buf)
        n = lib.rzk_decode_rows(
            bb, len(buf),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_rows, row_len,
        )
        if n == 0:
            raise ValueError("corrupt wire payload")
        return data.reshape(shape)
    try:
        data, _ = _decode_rows_numpy(memoryview(buf), n_rows, row_len)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt wire payload: {e}") from e
    return data.reshape(shape)


# -- container ---------------------------------------------------------------


def _flatten_with_paths(tree, prefix=""):
    """Deterministic (path, leaf) flattening of NamedTuple/dict/list pytrees."""
    if hasattr(tree, "_fields"):  # NamedTuple
        for f in tree._fields:
            yield from _flatten_with_paths(getattr(tree, f), f"{prefix}{f}.")
    elif isinstance(tree, dict):
        for k in sorted(tree):
            yield from _flatten_with_paths(tree[k], f"{prefix}{k}.")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten_with_paths(v, f"{prefix}{i}.")
    elif tree is None:
        yield (prefix + "__none__", None)
    else:
        yield (prefix.rstrip("."), np.asarray(tree))


def dumps(tree: Any, compact: bool = True) -> bytes:
    """Serialize a protocol pytree to the RZK1 wire format."""
    entries = list(_flatten_with_paths(tree))
    out = bytearray()
    out += _MAGIC
    out += struct.pack("<HI", _VERSION, len(entries))
    for path, leaf in entries:
        pb = path.encode()
        out += struct.pack("<H", len(pb)) + pb
        if leaf is None:
            out += struct.pack("<BBB", 255, 0, 0) + struct.pack("<Q", 0)
            continue
        code = _DTYPE_CODES.get(leaf.dtype)
        if code is None:
            raise TypeError(f"unsupported dtype {leaf.dtype} at {path}")
        enc = TRIMMED_VARINT if (compact and code == 0 and leaf.ndim >= 1) else RAW
        out += struct.pack("<BBB", code, enc, leaf.ndim)
        out += b"".join(struct.pack("<I", d) for d in leaf.shape)
        payload = (
            encode_rows(leaf) if enc == TRIMMED_VARINT
            else np.ascontiguousarray(leaf).astype(leaf.dtype, copy=False).tobytes()
        )
        out += struct.pack("<Q", len(payload)) + payload
    return bytes(out)


def loads(buf: bytes, max_array_bytes: int = 2**31) -> dict:
    """Deserialize to a {path: np.ndarray} dict (structure-agnostic; use
    restore() helpers or NamedTuple(**...) to rebuild typed objects).

    Raises ValueError on any malformed input (bad magic/version, truncated
    header or payload, corrupt varint stream, inconsistent dtype/encoding
    pair, RAW payload length not matching its declared shape, or a declared
    array larger than ``max_array_bytes``) -- failure detection is a clean
    exception, never silent garbage, a leaked struct/index error, or an
    attacker-sized allocation. ``max_array_bytes`` (default 2 GiB, ~5x the
    64K-proof interchange payloads) bounds the decoded size a hostile shape
    header can demand *before* any allocation happens; callers moving
    larger checkpoints pass a higher limit explicitly. Note a varint entry's
    payload can be legitimately much smaller than its decoded array (all-
    zero rows trim to 4 bytes each), so the allocation bound is the shape
    header, not the payload length.
    """
    if buf[:4] != _MAGIC:
        raise ValueError("bad magic")
    try:
        return _loads_body(buf, max_array_bytes)
    except (struct.error, IndexError, UnicodeDecodeError) as e:
        raise ValueError(f"truncated or corrupt RZK1 container: {e}") from e


def _loads_body(buf: bytes, max_array_bytes: int) -> dict:
    version, n = struct.unpack_from("<HI", buf, 4)
    if version != _VERSION:
        raise ValueError(f"unsupported version {version}")
    pos = 10
    out = {}
    for _ in range(n):
        (plen,) = struct.unpack_from("<H", buf, pos)
        pos += 2
        path = buf[pos : pos + plen].decode()
        pos += plen
        code, enc, ndim = struct.unpack_from("<BBB", buf, pos)
        pos += 3
        if code == 255:
            pos += 8
            out[path] = None
            continue
        if code not in _DTYPES:
            raise ValueError(f"unknown dtype code {code} at {path}")
        if enc not in (RAW, TRIMMED_VARINT):
            raise ValueError(f"unknown encoding {enc} at {path}")
        if enc == TRIMMED_VARINT and code != 0:
            raise ValueError(f"varint encoding requires int32 at {path}")
        shape = tuple(
            struct.unpack_from("<I", buf, pos + 4 * i)[0] for i in range(ndim)
        )
        pos += 4 * ndim
        (plen8,) = struct.unpack_from("<Q", buf, pos)
        pos += 8
        if pos + plen8 > len(buf):
            raise ValueError(f"payload of {path} extends past the buffer")
        nbytes = int(np.prod(shape, dtype=object)) * np.dtype(_DTYPES[code]).itemsize
        if nbytes > max_array_bytes:
            raise ValueError(
                f"declared array at {path} is {nbytes} bytes "
                f"(> max_array_bytes={max_array_bytes})"
            )
        if enc == TRIMMED_VARINT and shape:
            n_rows = int(np.prod(shape[:-1], dtype=object)) if len(shape) > 1 else 1
            if n_rows * 4 > plen8:
                raise ValueError(f"row count of {path} exceeds its payload")
        if enc == RAW and plen8 != nbytes:
            raise ValueError(
                f"RAW payload of {path} is {plen8} bytes, expected {nbytes}"
            )
        payload = buf[pos : pos + plen8]
        pos += plen8
        if enc == TRIMMED_VARINT:
            out[path] = decode_rows(payload, shape)
        else:
            out[path] = np.frombuffer(payload, _DTYPES[code]).reshape(shape).copy()
    return out


def _unwrap_optional(typ):
    """Optional[T] / Union[T, None] -> T; anything else unchanged."""
    if typing.get_origin(typ) is typing.Union:
        args = [a for a in typing.get_args(typ) if a is not type(None)]
        if len(args) == 1:
            return args[0]
    return typ


def rebuild(cls, data: dict, prefix: str = ""):
    """Rebuild a typed NamedTuple (possibly nested) from a loads() dict.

    Fully generic over the protocol surface: field types are resolved from
    the class's annotations, and any field whose (Optional-unwrapped) type
    is itself a NamedTuple -- Commitment, Opening, or a whole message family
    -- is rebuilt recursively. Covers all 15 message/context types of the
    three protocols (the reference derives serde on each of them, e.g.
    /root/reference/src/prove/linear.rs:256-309, sum.rs:327-391).
    """
    try:
        hints = typing.get_type_hints(cls)
    except Exception:  # pragma: no cover - unresolvable forward refs
        hints = dict(getattr(cls, "__annotations__", {}))
    kwargs = {}
    for f in cls._fields:
        key = f"{prefix}{f}"
        sub_prefix = f"{prefix}{f}."
        inner = _unwrap_optional(hints.get(f))
        if isinstance(inner, type) and hasattr(inner, "_fields"):
            if f"{sub_prefix}__none__" in data:
                kwargs[f] = None
            else:
                kwargs[f] = rebuild(inner, data, sub_prefix)
        elif key in data:
            kwargs[f] = data[key]
        elif f"{sub_prefix}__none__" in data:
            kwargs[f] = None
        else:
            raise KeyError(f"missing field {key}")
    return cls(**kwargs)
