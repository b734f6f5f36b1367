"""Vectorized XXH64 — bit-compatible with Spark's ``xxhash64`` expression.

Spark's ``xxhash64`` is the standard xxHash64 with seed 42, applied to the
8-byte little-endian value for LongType and to the UTF-8 bytes for
StringType/BinaryType (org.apache.spark.sql.catalyst.expressions.XXH64).
Re-implementing it whole-column in numpy lets the python-scan fast path
(operators/pyscan.py) compute bucket/chunk membership without a JVM hop:
``pmod(xxh64(key), n)`` here equals ``F.pmod(F.xxhash64(key), n)`` bit for
bit (pinned by tests against Spark's own output).

Strings are hashed length-grouped: all values of one byte length form a
(k, L) matrix processed with the scalar algorithm unrolled over word
index, vectorized over rows — web keys cluster on a few dozen distinct
lengths, so the group count stays tiny.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_U64 = np.uint64

_err = np.seterr  # numpy wraps uint64 arithmetic; silence overflow warnings


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _round(acc, lane):
    return _rotl(acc + lane * _P2, 31) * _P1


def _merge_round(h, acc):
    return (h ^ _round(np.uint64(0), acc)) * _P1 + _P4


def _avalanche(h):
    h = h ^ (h >> _U64(33))
    h = h * _P2
    h = h ^ (h >> _U64(29))
    h = h * _P3
    h = h ^ (h >> _U64(32))
    return h


def xxh64_int64(values: np.ndarray, seed: int = 42) -> np.ndarray:
    """XXH64 of each int64 value's 8 LE bytes (Spark LongType hashing).
    Returns int64 (Spark's signed result domain)."""
    old = np.seterr(over="ignore")
    try:
        v = np.ascontiguousarray(values, dtype=np.int64).view(_U64)
        h = _U64(seed) + _P5 + _U64(8)
        h = h ^ _round(np.uint64(0), v)
        h = _rotl(h, 27) * _P1 + _P4
        return _avalanche(h).view(np.int64)
    finally:
        np.seterr(**old)


def _hash_len_group(mat: np.ndarray, length: int, seed: int) -> np.ndarray:
    """XXH64 of k byte-rows of exact byte length ``length``; ``mat`` is
    (k, ceil8(length)) uint8 zero-padded."""
    words = mat.view("<u8")  # (k, ceil8/8)
    k = mat.shape[0]
    s = _U64(seed)
    pos = 0
    if length >= 32:
        a1 = s + _P1 + _P2
        a2 = s + _P2
        a3 = s.copy() if hasattr(s, "copy") else _U64(seed)
        a4 = s - _P1
        acc1 = np.full(k, a1, _U64)
        acc2 = np.full(k, a2, _U64)
        acc3 = np.full(k, a3, _U64)
        acc4 = np.full(k, a4, _U64)
        while pos + 32 <= length:
            w = pos // 8
            acc1 = _round(acc1, words[:, w])
            acc2 = _round(acc2, words[:, w + 1])
            acc3 = _round(acc3, words[:, w + 2])
            acc4 = _round(acc4, words[:, w + 3])
            pos += 32
        h = _rotl(acc1, 1) + _rotl(acc2, 7) + _rotl(acc3, 12) + _rotl(acc4, 18)
        h = _merge_round(h, acc1)
        h = _merge_round(h, acc2)
        h = _merge_round(h, acc3)
        h = _merge_round(h, acc4)
    else:
        h = np.full(k, s + _P5, _U64)
    h = h + _U64(length)
    while pos + 8 <= length:
        h = h ^ _round(np.uint64(0), words[:, pos // 8])
        h = _rotl(h, 27) * _P1 + _P4
        pos += 8
    if pos + 4 <= length:
        u32 = mat[:, pos : pos + 4].copy().view("<u4")[:, 0].astype(_U64)
        h = h ^ (u32 * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        pos += 4
    while pos < length:
        h = h ^ (mat[:, pos].astype(_U64) * _P5)
        h = _rotl(h, 11) * _P1
        pos += 1
    return _avalanche(h)


def xxh64_bytes_bo(blob: np.ndarray, offs: np.ndarray, seed: int = 42) -> np.ndarray:
    """XXH64 of each value of a (blob, offs) byte-column (Spark
    String/BinaryType hashing of the raw bytes).  Returns int64[n]."""
    old = np.seterr(over="ignore")
    try:
        n = offs.size - 1
        out = np.empty(n, dtype=_U64)
        lens = np.diff(offs)
        for length in np.unique(lens):
            L = int(length)
            idx = np.flatnonzero(lens == L)
            k = idx.size
            pad = -(-max(L, 1) // 8) * 8
            mat = np.zeros((k, pad), dtype=np.uint8)
            if L:
                src = offs[idx]
                gather = src[:, None] + np.arange(L)[None, :]
                mat[:, :L] = blob[gather]
            out[idx] = _hash_len_group(mat, L, seed)
        return out.view(np.int64)
    finally:
        np.seterr(**old)


def pmod(h: np.ndarray, n: int) -> np.ndarray:
    """Spark's pmod for a signed int64 hash and positive literal n."""
    r = h % np.int64(n)  # numpy % already yields sign-of-divisor
    return r
