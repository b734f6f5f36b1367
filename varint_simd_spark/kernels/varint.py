"""Whole-column LEB128/varint codec kernels (pure numpy, no Spark).

Bit-compatible with ``as-com/varint-simd``'s wire format:

* little-endian base-128, 7 payload bits per byte, MSB = continuation bit
  (reference: src/decode/mod.rs:151-157, README.md:37);
* the encoder always emits the *minimal* length — ``300 -> [0xAC, 0x02]``,
  ``0 -> [0x00]``, ``u64::MAX -> [0xFF*9, 0x01]`` (src/lib.rs:89-185,
  src/encode/mod.rs:78-81);
* per-width limits ``MAX_VARINT_BYTES`` / ``MAX_LAST_VARINT_BYTE``
  (src/num.rs:50-51, 131-132, 213-214, 301-302);
* safe decode rejects Overflow / NotEnoughBytes exactly like
  src/decode/mod.rs:42-51; unsafe decode truncates to the target width like
  ``VarIntTarget::cast_u32/cast_u64`` (src/num.rs:74-81) and accepts
  non-minimal encodings (``[0x80, 0x00] -> (0, 2)``).

The reference is scalar/SIMD N-at-a-time; here every kernel is whole-column:
one call encodes/decodes an entire Arrow batch worth of values.  The
structure deliberately mirrors the reference's branchless math —
lengths from bit positions rather than loops (src/encode/mod.rs:78-81),
boundary finding from the continuation-bit mask (src/decode/mod.rs:151-157,
583-590), and a cumulative-sum of lengths standing in for the SIMD prefix
sum of src/decode/mod.rs:855-859.
"""

from __future__ import annotations

import numpy as np

from .errors import NotEnoughBytes, Overflow

__all__ = [
    "MAX_VARINT_BYTES",
    "MAX_LAST_VARINT_BYTE",
    "encode",
    "encode_single",
    "decode",
    "decode_single",
    "varint_len",
    "decode_lens",
]

# Per-width wire-format constants (reference: src/num.rs:50-51, 131-132,
# 213-214, 301-302).
MAX_VARINT_BYTES = {8: 2, 16: 3, 32: 5, 64: 10}
MAX_LAST_VARINT_BYTE = {8: 0x01, 16: 0x03, 32: 0x0F, 64: 0x01}

_U64 = np.uint64
_SEVEN = _U64(7)
_LOW7 = _U64(0x7F)
_CONT = np.uint8(0x80)

# Thresholds 128^k for k=1..9: a u64 value v needs 1 + (#thresholds <= v)
# bytes.  This is the branchless-length rule of src/encode/mod.rs:78-81
# (``8 - (leading_zeros(stage1) - 1) / 8``) restated on whole arrays.
_LEN_THRESHOLDS = (_U64(1) << (_SEVEN * np.arange(1, 10, dtype=_U64))).astype(_U64)

_SHIFTS10 = (_SEVEN * np.arange(10, dtype=_U64)).astype(_U64)


def _as_u64(values: np.ndarray) -> np.ndarray:
    """Reinterpret/convert an integer array to uint64 without value change.

    Signed inputs are viewed two's-complement (the engine carries unsigned
    64-bit values in Spark's signed LongType; the kernel edge undoes that).
    """
    a = np.asarray(values)
    if a.dtype == np.uint64:
        return a
    if a.dtype == np.int64:
        return a.view(np.uint64)
    if a.dtype.kind == "i":
        return a.astype(np.int64).view(np.uint64)
    return a.astype(np.uint64)


def varint_len(values: np.ndarray) -> np.ndarray:
    """Minimal encoded length (1..10) per value, vectorized.

    Mirrors ``encode_unsafe``'s leading_zeros length computation
    (reference: src/encode/mod.rs:78-81): len = max(1, ceil(bit_length/7)).
    """
    v = _as_u64(values)
    lens = np.ones(v.shape, dtype=np.int64)
    for t in _LEN_THRESHOLDS:
        lens += (v >= t).astype(np.int64)
    return lens


def encode(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode a whole column of unsigned ints to one adjacent varint stream.

    Returns ``(payload, lengths)``.  Equivalent to looping the reference's
    ``encode_to_slice`` (src/encode/mod.rs:53-58) over the column, but
    computed as one branchless matrix operation (the numpy analog of the
    PDEP 7-bit spread in src/num.rs:92-95 + MSB OR-merge in
    src/encode/mod.rs:84-87).
    """
    v = _as_u64(np.ascontiguousarray(values))
    n = v.shape[0]
    if n == 0:
        return b"", np.zeros(0, dtype=np.int64)
    lens = varint_len(v)
    # (n, 10) matrix of 7-bit groups: groups[i, k] = (v[i] >> 7k) & 0x7F
    groups = ((v[:, None] >> _SHIFTS10[None, :]) & _LOW7).astype(np.uint8)
    pos = np.arange(10, dtype=np.int64)
    keep = pos[None, :] < lens[:, None]
    # continuation bit on every byte but the last of each value
    cont = pos[None, :] < (lens[:, None] - 1)
    groups |= cont.astype(np.uint8) << 7
    payload = groups[keep]  # row-major boolean pick = adjacent varints
    return payload.tobytes(), lens


def encode_single(value: int) -> bytes:
    """Scalar convenience wrapper (reference ``encode``, src/encode/mod.rs:23-25)."""
    payload, _ = encode(np.array([value], dtype=np.uint64))
    return payload


def _boundaries(buf: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Find varint boundaries in a byte stream.

    The numpy analog of the reference's movemask + trailing_zeros length
    scan (src/decode/mod.rs:151-157, 583-590): a byte ends a varint iff its
    continuation bit is clear.
    """
    ends = np.flatnonzero((buf & _CONT) == 0)
    starts = np.empty_like(ends)
    if ends.size:
        starts[0] = 0
        starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    return starts, ends, lens


def decode_lens(payload: bytes | np.ndarray) -> np.ndarray:
    """Length-only scan of an adjacent varint stream (reference
    ``decode_len``, src/decode/mod.rs:69-83, batched)."""
    buf = np.frombuffer(payload, dtype=np.uint8) if isinstance(payload, (bytes, bytearray, memoryview)) else payload
    _, _, lens = _boundaries(buf)
    return lens


def decode(
    payload: bytes | np.ndarray,
    count: int | None = None,
    width: int = 64,
    safe: bool = True,
) -> np.ndarray:
    """Decode a whole adjacent-varint stream into a uint64 column.

    ``safe=True`` reproduces the reference's checked ``decode``
    (src/decode/mod.rs:28-54): raises :class:`Overflow` when a varint is
    longer than ``MAX_VARINT_BYTES[width]`` or exactly that long with a
    final byte above ``MAX_LAST_VARINT_BYTE[width]``; raises
    :class:`NotEnoughBytes` when the stream ends mid-varint (trailing
    continuation bit) or fewer than ``count`` varints are present.

    ``safe=False`` mirrors the ``*_unsafe`` family (src/decode/mod.rs:135-137,
    776-788): no validation, values truncated to ``width`` bits like
    ``cast_u32/cast_u64`` (src/num.rs:74-81).

    Non-minimal encodings decode fine in both modes — length comes purely
    from continuation bits (src/decode/mod.rs:151-157).
    """
    buf = (
        np.frombuffer(payload, dtype=np.uint8)
        if isinstance(payload, (bytes, bytearray, memoryview))
        else np.asarray(payload, dtype=np.uint8)
    )
    if buf.size == 0:
        if count:
            raise NotEnoughBytes(f"expected {count} varints, stream is empty")
        return np.zeros(0, dtype=np.uint64)

    starts, ends, lens = _boundaries(buf)
    n = starts.size

    if safe:
        trailing = buf.size - 1 - (ends[-1] if n else -1)
        if trailing:
            raise NotEnoughBytes(
                f"stream ends mid-varint ({trailing} dangling continuation bytes)"
            )
        if count is not None and n < count:
            raise NotEnoughBytes(f"expected {count} varints, found {n}")
        max_bytes = MAX_VARINT_BYTES[width]
        too_long = lens > max_bytes
        if too_long.any():
            raise Overflow(
                f"varint #{int(np.argmax(too_long))} is {int(lens[np.argmax(too_long)])} "
                f"bytes; max for u{width} is {max_bytes}"
            )
        at_max = lens == max_bytes
        if at_max.any():
            bad = buf[ends[at_max]] > MAX_LAST_VARINT_BYTE[width]
            if bad.any():
                raise Overflow(
                    f"final byte exceeds MAX_LAST_VARINT_BYTE=0x{MAX_LAST_VARINT_BYTE[width]:02X} for u{width}"
                )

    if count is not None and n > count:
        # decode only the first `count` varints (caller knows the chunk size)
        starts, ends, lens = starts[:count], ends[:count], lens[:count]
        n = count
        last = ends[-1] + 1 if n else 0
        buf = buf[:last]

    if n == 0:
        return np.zeros(0, dtype=np.uint64)

    # 7-bit gather: payload bits shifted to position, summed per varint.
    # The vectorized analog of the reference's PEXT gather
    # (src/num.rs:69-71) + two-word recombine (src/decode/mod.rs:169-201):
    # np.add.reduceat over value boundaries is the whole-column "shuffle".
    payload7 = (buf & np.uint8(0x7F)).astype(np.uint64)
    idx = np.arange(buf.size, dtype=np.int64)
    starts_rep = np.repeat(starts, lens)
    shifts = (idx - starts_rep).astype(np.uint64) * _SEVEN
    if not safe:
        # unchecked mode may see absurd lengths; drop bits shifted past 63
        # (they cannot contribute to a u64 anyway)
        over = shifts > _U64(63)
        if over.any():
            payload7 = np.where(over, _U64(0), payload7)
            shifts = np.where(over, _U64(0), shifts)
    contrib = payload7 << shifts
    values = np.add.reduceat(contrib, starts)

    if width < 64:
        mask = _U64((1 << width) - 1)
        if safe:
            # lengths/final-byte already validated => values fit; mask is a
            # no-op but keeps the dtype story uniform.
            values &= mask
        else:
            values &= mask  # truncating cast (src/num.rs:74-81)
    return values


def decode_single(payload: bytes, width: int = 64, safe: bool = True) -> tuple[int, int]:
    """Decode one varint; returns ``(value, consumed_bytes)``.

    Scalar analog of reference ``decode`` (src/decode/mod.rs:28-54).
    """
    buf = np.frombuffer(payload, dtype=np.uint8)
    if buf.size == 0:
        raise NotEnoughBytes("empty input")
    ends = np.flatnonzero((buf & _CONT) == 0)
    if ends.size == 0:
        raise NotEnoughBytes("no varint terminator in input")
    length = int(ends[0]) + 1
    value = decode(buf[:length], count=1, width=width, safe=safe)[0]
    return int(value), length
