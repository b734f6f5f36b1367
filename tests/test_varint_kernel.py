"""Kernel-level unit tests: golden vectors, boundary sets, overflow,
truncation, zigzag — ported from the reference test suite
(/root/reference/src/lib.rs:89-353) plus differential property tests
against a pure-Python LEB128 oracle (the analog of the reference's
fuzz targets, fuzz/fuzz_targets/fuzz_target_{1,2,3}.rs)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from varint_simd_spark.kernels import (
    NotEnoughBytes,
    Overflow,
    decode,
    decode_lens,
    decode_single,
    encode,
    encode_single,
    unzigzag,
    varint_len,
    zigzag,
)

# ---------------------------------------------------------------------------
# pure-Python oracle (independent implementation, like the reference's
# differential fuzzing vs the integer-encoding crate)


def py_encode(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def py_decode_stream(buf: bytes) -> list[int]:
    vals, v, shift = [], 0, 0
    for b in buf:
        v |= (b & 0x7F) << shift
        shift += 7
        if not (b & 0x80):
            vals.append(v & ((1 << 64) - 1))
            v, shift = 0, 0
    return vals


# ---------------------------------------------------------------------------
# golden vectors (src/lib.rs:89-185, borrowed from prost)

GOLDEN = [
    (0, b"\x00"),
    (1, b"\x01"),
    (2**7 - 1, b"\x7f"),
    (2**7, b"\x80\x01"),
    (300, b"\xac\x02"),
    (2**14 - 1, b"\xff\x7f"),
    (2**14, b"\x80\x80\x01"),
    (2**21 - 1, b"\xff\xff\x7f"),
    (2**21, b"\x80\x80\x80\x01"),
    (2**28 - 1, b"\xff\xff\xff\x7f"),
    (2**28, b"\x80\x80\x80\x80\x01"),
    (2**35 - 1, b"\xff\xff\xff\xff\x7f"),
    (2**35, b"\x80\x80\x80\x80\x80\x01"),
    (2**42 - 1, b"\xff\xff\xff\xff\xff\x7f"),
    (2**42, b"\x80\x80\x80\x80\x80\x80\x01"),
    (2**49 - 1, b"\xff\xff\xff\xff\xff\xff\x7f"),
    (2**49, b"\x80\x80\x80\x80\x80\x80\x80\x01"),
    (2**56 - 1, b"\xff\xff\xff\xff\xff\xff\xff\x7f"),
    (2**56, b"\x80\x80\x80\x80\x80\x80\x80\x80\x01"),
    (2**63 - 1, b"\xff\xff\xff\xff\xff\xff\xff\xff\x7f"),
    (2**63, b"\x80\x80\x80\x80\x80\x80\x80\x80\x80\x01"),
    (2**64 - 1, b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"),
]

# boundary sets NUMS_* (src/lib.rs:297-353)
NUMS_U8 = [0, 1, 2**7 - 1, 2**7, 255]
NUMS_U16 = [0, 1, 2**7 - 1, 2**7, 300, 2**14 - 1, 2**14, 2**16 - 1]
NUMS_U32 = NUMS_U16[:-1] + [2**21 - 1, 2**21, 2**28 - 1, 2**28, 2**32 - 1]
NUMS_U64 = NUMS_U32[:-1] + [
    2**35 - 1, 2**35, 2**42 - 1, 2**42, 2**49 - 1, 2**49,
    2**56 - 1, 2**56, 2**63 - 1, 2**63, 2**64 - 1,
]


def width_for(v: int) -> int:
    for w in (8, 16, 32, 64):
        if v < (1 << w):
            return w
    raise AssertionError


@pytest.mark.parametrize("value,expected", GOLDEN)
def test_golden_encode_decode(value, expected):
    """The `check` helper of src/lib.rs:71-85: encode bytes, decode value,
    decode length, and decode_len all agree."""
    enc = encode_single(value)
    assert enc == expected
    w = width_for(value)
    val, consumed = decode_single(expected, width=w)
    assert val == value
    assert consumed == len(expected)
    assert list(decode_lens(expected)) == [len(expected)]
    assert varint_len(np.array([value], dtype=np.uint64))[0] == len(expected)


@pytest.mark.parametrize(
    "nums,width",
    [(NUMS_U8, 8), (NUMS_U16, 16), (NUMS_U32, 32), (NUMS_U64, 64)],
)
def test_nums_column_roundtrip(nums, width):
    arr = np.array(nums, dtype=np.uint64)
    payload, lens = encode(arr)
    assert len(payload) == int(lens.sum())
    out = decode(payload, count=len(nums), width=width)
    np.testing.assert_array_equal(out, arr)
    # stream bytes equal oracle concatenation
    assert payload == b"".join(py_encode(v) for v in nums)


def test_adjacency_cross_product_2x_4x():
    """check_decode_2x / 4x (src/lib.rs:224-295): adjacent varints of mixed
    widths decode correctly from one stream."""
    for a in NUMS_U8:
        for b in NUMS_U64:
            payload, lens = encode(np.array([a, b], dtype=np.uint64))
            out = decode(payload, count=2, width=64)
            assert out.tolist() == [a, b]
    quad = [NUMS_U8[2], NUMS_U16[4], NUMS_U32[-1], NUMS_U64[-1]]
    payload, lens = encode(np.array(quad, dtype=np.uint64))
    out = decode(payload, count=4, width=64)
    assert out.tolist() == quad
    assert lens.tolist() == [len(py_encode(v)) for v in quad]


def test_eight_u8_batch():
    """check_decode_8x_u8-style: 8 adjacent u8 varints (src/lib.rs:751-841,
    sampled not exhaustive — full cross-product covered by hypothesis)."""
    vals = [0, 1, 127, 128, 255, 0, 255, 128]
    payload, _ = encode(np.array(vals, dtype=np.uint64))
    out = decode(payload, count=8, width=8)
    assert out.tolist() == vals


# overflow tests (src/lib.rs:187-209)
@pytest.mark.parametrize("width", [8, 16, 32])
def test_overflow_width(width):
    enc = encode_single((1 << width))  # T::MAX + 1 in the wider type
    with pytest.raises(Overflow):
        decode(enc, count=1, width=width)


def test_overflow_u64_final_byte():
    # 10-byte varint with final byte 0x02 (src/lib.rs:206-209)
    bad = b"\xff" * 9 + b"\x02"
    with pytest.raises(Overflow):
        decode(bad, count=1, width=64)


def test_overflow_too_long():
    # 11-byte varint is over MAX_VARINT_BYTES for u64
    bad = b"\xff" * 10 + b"\x01"
    with pytest.raises(Overflow):
        decode(bad, count=1, width=64)


# truncation tests (src/lib.rs:211-222)
def test_truncated_every_prefix():
    for i in range(1, 10):
        enc = encode_single(1 << (7 * i))
        for j in range(0, i + 1):
            with pytest.raises(NotEnoughBytes):
                decode(enc[:j], count=1, width=64)


def test_non_minimal_encoding_accepted():
    """[0x80, 0x00] decodes to (0, 2) — length from continuation bits only
    (src/decode/mod.rs:151-157)."""
    val, consumed = decode_single(b"\x80\x00", width=64)
    assert (val, consumed) == (0, 2)


def test_unsafe_truncating_cast():
    """unsafe decode truncates to width like cast_u32/cast_u64
    (src/num.rs:74-81)."""
    enc = encode_single(0x1FF)  # 511: over u8
    out = decode(enc, count=1, width=8, safe=False)
    assert out[0] == 0x1FF & 0xFF


# zigzag (src/num.rs:118-126 … 473-481; -20 -> 0x27 src/encode/mod.rs:34-35)
def test_zigzag_spot_values():
    n = np.array([0, -1, 1, -20, 2**63 - 1, -(2**63)], dtype=np.int64)
    z = zigzag(n)
    assert z.tolist() == [0, 1, 2, 39, 2**64 - 2, 2**64 - 1]
    np.testing.assert_array_equal(unzigzag(z), n)
    payload, _ = encode(zigzag(np.array([-20], dtype=np.int64)))
    assert payload == b"\x27"


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=200))
def test_property_encode_matches_oracle(vals):
    arr = np.array(vals, dtype=np.uint64)
    payload, lens = encode(arr)
    assert payload == b"".join(py_encode(v) for v in vals)
    out = decode(payload, count=len(vals), width=64)
    assert out.tolist() == vals
    assert lens.tolist() == [len(py_encode(v)) for v in vals]


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_property_decode_matches_oracle_on_wellformed(buf):
    """Any byte soup whose final byte terminates decodes identically to the
    oracle (non-minimal encodings included) in unsafe mode."""
    if buf and (buf[-1] & 0x80):
        buf = buf + b"\x00"
    expect = py_decode_stream(buf)
    out = decode(buf, width=64, safe=False)
    got = out.tolist()
    # unsafe mode ignores per-value overflow; oracle masks to 64 bits too
    assert got == expect


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=0, max_size=100))
def test_property_zigzag_roundtrip(vals):
    n = np.array(vals, dtype=np.int64)
    payload, _ = encode(zigzag(n))
    back = unzigzag(decode(payload, count=len(vals), width=64))
    assert back.tolist() == vals


def test_exhaustive_8x_u8_cross_product():
    """The reference's check_decode_8x_u8 (src/lib.rs:751-841): all 5^8 =
    390,625 8-tuples over NUMS_U8, vectorized — every tuple's 8 adjacent
    varints concatenated into one stream, decoded once, compared."""
    vals = np.array(NUMS_U8, dtype=np.uint64)
    grids = np.meshgrid(*([vals] * 8), indexing="ij")
    tuples = np.stack([g.ravel() for g in grids], axis=1)  # (390625, 8)
    flat = tuples.ravel()
    payload, lens = encode(flat)
    out = decode(payload, count=flat.size, width=8)
    np.testing.assert_array_equal(out.reshape(-1, 8), tuples)
    # per-value lengths match the scalar rule
    expect_lens = np.where(flat >= 128, 2, 1)
    np.testing.assert_array_equal(lens, expect_lens)
