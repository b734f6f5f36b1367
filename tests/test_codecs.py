"""Codec-layer round-trip tests: every codec, every dtype tag, nulls,
empties, adversarial strings — all bit-identical (north-rule invariant)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from varint_simd_spark.codecs import (
    INT_CODECS,
    STR_CODECS,
    choose_codec,
    decode_column,
    encode_column,
)
from varint_simd_spark.codecs.container import pack_sections, unpack_sections

rng = np.random.default_rng(42)

INT_FIXTURES = {
    "small": np.arange(1000, dtype=np.int64),
    "negatives": rng.integers(-(10**6), 10**6, 500).astype(np.int64),
    "sorted_ts": np.cumsum(rng.integers(0, 120_000_000, 2000)).astype(np.int64),
    "back_jumps": np.cumsum(rng.integers(-5_000_000, 120_000_000, 2000)).astype(np.int64),
    "runs": np.repeat(rng.integers(0, 5, 50), rng.integers(1, 40, 50)).astype(np.int64),
    "extremes": np.array([0, -1, 1, 2**63 - 1, -(2**63), 300, -300], dtype=np.int64),
    "single": np.array([42], dtype=np.int64),
    "empty": np.zeros(0, dtype=np.int64),
    "constant": np.full(777, 123456789, dtype=np.int64),
}


@pytest.mark.parametrize("codec", list(INT_CODECS))
@pytest.mark.parametrize("fixture", list(INT_FIXTURES))
def test_int_codec_roundtrip(codec, fixture):
    v = INT_FIXTURES[fixture]
    impl = INT_CODECS[codec]
    payload, params = impl.encode(v)
    out = impl.decode(payload, params, len(v))
    np.testing.assert_array_equal(out, v)


STR_FIXTURES = {
    "plain": [b"hello", b"world", b"hello", b"spark"],
    "empty_vals": [b"", b"a", b"", b"", b"bb"],
    "unicode": ["héllo wörld".encode(), "中文测试".encode(), "🎉emoji".encode()],
    "runs": [b"en"] * 50 + [b"de"] * 30 + [b"en"] * 20,
    "binary_soup": [bytes(rng.integers(0, 256, rng.integers(0, 100))) for _ in range(50)],
    "escape_heavy": [b"\xff\xff\xff", b"a\xffb", b"\xff"],
    "long_text": [(("the quick brown fox jumps over the lazy dog " * 20).encode()) for _ in range(10)],
    "single": [b"only"],
    "empty": [],
}


@pytest.mark.parametrize("codec", list(STR_CODECS))
@pytest.mark.parametrize("fixture", list(STR_FIXTURES))
def test_str_codec_roundtrip(codec, fixture):
    vals = STR_FIXTURES[fixture]
    impl = STR_CODECS[codec]
    payload, params = impl.encode(vals)
    out = impl.decode(payload, params, len(vals))
    assert out == vals


def test_fsst_compresses_english():
    text = [("the quick brown fox jumps over the lazy dog " * 50).encode()] * 20
    payload, params = STR_CODECS["fsst"].encode(text)
    raw = sum(len(t) for t in text)
    assert len(payload) < 0.8 * raw, f"fsst ratio {len(payload)/raw:.2f}"


def test_fsst_learns_long_symbols():
    """True FSST trains multi-byte symbols (up to 8 bytes): on repetitive
    html the table must contain symbols longer than 2 bytes (the round-2
    digram codec could only reach that via layer stacking) and the ratio
    must beat what 2-byte digrams alone can achieve (>0.5 is impossible to
    beat by much with pure digrams on high-entropy fillers)."""
    from varint_simd_spark.codecs.strings import FsstStr

    text = [
        (f"<html><head><title>host{i % 7}.example.com</title></head><body>"
         f"<p>the quick brown fox jumps over the lazy dog {i}</p></body></html>").encode()
        for i in range(800)
    ]
    impl = FsstStr()
    payload, params = impl.encode(text)
    assert impl.decode(payload, params, len(text)) == text
    raw = sum(len(t) for t in text)
    assert len(payload) < 0.35 * raw, f"ratio {len(payload)/raw:.3f}"
    # inspect the persisted symbol table: section 0 = per-symbol lengths
    from varint_simd_spark.codecs.container import unpack_sections

    sym_lens = np.frombuffer(unpack_sections(payload)[0], dtype=np.uint8)
    assert int(sym_lens.max()) >= 5, f"longest symbol {sym_lens.max()}B"


def test_fsst_window_boundary_and_escape_edges():
    """Values straddling the parse window and escape-heavy bytes roundtrip:
    lengths exactly at/around WINDOW, runs of 0xFF, and high-entropy
    binary that trains an empty-ish table."""
    from varint_simd_spark.codecs.strings import FsstStr

    impl = FsstStr()
    w = impl.WINDOW
    rng = np.random.default_rng(3)
    vals = [
        b"a" * (w - 1), b"b" * w, b"c" * (w + 1), b"d" * (3 * w + 5),
        b"\xff" * (w + 3), b"x\xff" * (w // 2 + 1),
        rng.integers(0, 256, 2 * w, dtype=np.uint8).tobytes(),
        b"", b"\xff",
    ]
    payload, params = impl.encode(vals)
    assert impl.decode(payload, params, len(vals)) == vals


def test_container_roundtrip():
    secs = [b"", b"abc", bytes(range(256)), b"x" * 100000]
    assert unpack_sections(pack_sections(secs)) == secs


SERIES_FIXTURES = {
    "i64": pd.Series([1, -5, 2**40, 0], dtype=np.int64),
    "i32": pd.Series([1, -5, 1000, 0], dtype=np.int32),
    "f64": pd.Series([1.5, -0.0, float("inf"), 3.14159, float("nan")]),
    "ts": pd.Series(pd.to_datetime(["2024-10-08", "2024-10-09 12:34:56.789123", "1999-01-01"], format="mixed")),
    "str": pd.Series(["a", "bb", None, "ddd"], dtype=object),
    "bool": pd.Series([True, False, True]),
    "date": pd.Series(pd.to_datetime(["2024-10-08", "1992-01-01"]).date, dtype=object),
}


@pytest.mark.parametrize("name", list(SERIES_FIXTURES))
def test_encode_decode_column_auto(name):
    s = SERIES_FIXTURES[name]
    codec, reason, _ = choose_codec(s)
    tag, payload, params = encode_column(s, codec)
    out = decode_column(tag, codec, payload, params, len(s))
    if name == "f64":
        # bit-identical incl. NaN / -0.0
        a = s.to_numpy(dtype=np.float64).view(np.int64)
        b = out.to_numpy(dtype=np.float64).view(np.int64)
        np.testing.assert_array_equal(a, b)
    elif name == "str":
        assert list(out) == list(s)
    else:
        assert list(out) == list(s), f"codec={codec} reason={reason}"


def test_nulls_roundtrip_int():
    s = pd.Series([1, None, 3, None, 5], dtype="float64").astype(object)
    s = pd.Series([1, None, 3, None, 5], dtype=object).astype("object")
    s = pd.Series([1.0, None, 3.0], dtype=np.float64)
    tag, payload, params = encode_column(s, "raw64")
    out = decode_column(tag, "raw64", payload, params, len(s))
    assert out.isna().tolist() == s.isna().tolist()


def test_choose_picks_sensible():
    ts = pd.Series(np.cumsum(rng.integers(0, 120, 5000)).astype("datetime64[us]"))
    codec, _, _ = choose_codec(ts)
    assert codec in ("delta_zz_varint", "delta_zz_bitpack", "for_bitpack")
    lang = pd.Series(["en"] * 900 + ["de"] * 100, dtype=object)
    codec, _, _ = choose_codec(lang)
    assert codec in ("rle_str", "dict_str")
    ids = pd.Series(rng.integers(0, 100, 5000).astype(np.int64))
    codec, _, _ = choose_codec(ids)
    assert codec in ("for_bitpack", "varint")


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=60), min_size=0, max_size=60))
def test_property_fsst_roundtrip(vals):
    impl = STR_CODECS["fsst"]
    payload, params = impl.encode(vals)
    assert impl.decode(payload, params, len(vals)) == vals


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=0, max_size=80),
    st.sampled_from(list(INT_CODECS)),
)
def test_property_int_codecs(vals, codec):
    v = np.array(vals, dtype=np.int64)
    impl = INT_CODECS[codec]
    payload, params = impl.encode(v)
    np.testing.assert_array_equal(impl.decode(payload, params, len(v)), v)


def test_varint_codec_width_specialization():
    """The codec records the narrowest fitting width and the decoder
    enforces that width's overflow rules (reference monomorphization,
    src/num.rs:48-299)."""
    from varint_simd_spark.kernels.errors import Overflow

    impl = INT_CODECS["varint"]
    small = np.array([0, 100, 255], dtype=np.int64)
    payload, params = impl.encode(small)
    assert params["width"] == "8"
    np.testing.assert_array_equal(impl.decode(payload, params, 3), small)
    # a payload carrying a too-wide value under a narrow descriptor errors
    big_payload, _ = impl.encode(np.array([300], dtype=np.int64))
    with pytest.raises(Overflow):
        impl.decode(big_payload, {"width": "8"}, 1)
    for vals, w in [([65535], "16"), ([2**20], "32"), ([2**40], "64"), ([-1], "64")]:
        _, p = impl.encode(np.array(vals, dtype=np.int64))
        assert p["width"] == w, (vals, p)


# --------------------------------------------------------------------------
# row-selected decode (filter-pushdown random access)


def _mk_bo(values):
    from varint_simd_spark.codecs.strings import list_to_bo

    return list_to_bo(values)


@pytest.mark.parametrize("codec", ["raw_str", "dict_str", "rle_str", "fsst"])
def test_str_decode_selected_matches_full(codec):
    """decode_bo_selected(idx) must equal decode_bo()[idx] for every string
    codec — the contract behind the filter-pushdown decode's tier 2b."""
    from varint_simd_spark.codecs.strings import STR_CODECS, bo_to_list

    rng = np.random.default_rng(5)
    vals = []
    for i in range(300):
        if codec == "rle_str":
            vals.append(b"run%d" % (i // 17))  # long runs
        elif codec == "dict_str":
            vals.append(b"dict%d" % (i % 7))
        else:
            vals.append(bytes(rng.integers(97, 123, rng.integers(0, 40), dtype=np.uint8)))
    impl = STR_CODECS[codec]
    payload, params = impl.encode_bo(_mk_bo(vals))
    full = bo_to_list(impl.decode_bo(payload, params, len(vals)))
    for idx in ([], [0], [299], [0, 1, 2], list(range(0, 300, 7)), list(range(300))):
        got = bo_to_list(impl.decode_bo_selected(payload, params, len(vals), np.array(idx, dtype=np.int64)))
        assert got == [full[i] for i in idx], (codec, idx[:5])


def test_decode_column_arrow_selected_nulls_and_ints():
    import pyarrow as pa

    from varint_simd_spark.codecs.base import (
        decode_column_arrow,
        decode_column_arrow_selected,
        encode_column_arrow,
    )

    arr = pa.array([1, None, 3, None, 5, 6, 7, None], type=pa.int64())
    tag, payload, params = encode_column_arrow(arr, "varint")
    idx = np.array([1, 2, 4, 7])
    got = decode_column_arrow_selected(tag, "varint", payload, params, len(arr), idx)
    assert got.to_pylist() == [None, 3, 5, None]
    sarr = pa.array(["a", None, "ccc", "dd", None], type=pa.string())
    tag, payload, params = encode_column_arrow(sarr, "raw_str")
    got = decode_column_arrow_selected(tag, "raw_str", payload, params, 5, np.array([0, 1, 4]))
    assert got.to_pylist() == ["a", None, None]
    full = decode_column_arrow(tag, "raw_str", payload, params, 5)
    assert full.to_pylist() == sarr.to_pylist()


def test_fsst_legacy_payload_clear_error():
    """A store written by the retired digram codec must fail with a
    descriptive error, not a numpy shape error."""
    from varint_simd_spark.codecs.strings import STR_CODECS

    with pytest.raises(ValueError, match="legacy fsst payload"):
        STR_CODECS["fsst"].decode_bo(b"\x02\x01\x01ab", {"pairs": "3", "rounds": "2"}, 1)


def test_stats_exclude_and_where_helpers():
    from varint_simd_spark.operators.encode import _apply_where, _normalize_where, _stats_exclude

    conds = _normalize_where([("x", ">=", 10), ("s", "==", "en")])
    assert _stats_exclude(conds, {"x": {"min": 0, "max": 9}})  # provably empty
    assert not _stats_exclude(conds, {"x": {"min": 0, "max": 10}})
    assert not _stats_exclude(conds, {})  # no stats -> never prune
    import pyarrow as pa

    decoded = {"x": pa.array([5, 10, 20]), "s": pa.array(["en", "en", "de"])}
    mask = _apply_where(decoded, conds)
    assert mask.to_pylist() == [False, True, False]
    # in / between
    conds2 = _normalize_where([("x", "in", [5, 20]), ("x", "between", (5, 25))])
    assert _apply_where(decoded, conds2).to_pylist() == [True, False, True]
    assert _stats_exclude(_normalize_where([("x", "in", [100, 200])]), {"x": {"min": 0, "max": 50}})
    assert not _stats_exclude(_normalize_where([("x", "in", [100, 20])]), {"x": {"min": 0, "max": 50}})
    assert _stats_exclude(_normalize_where([("x", "between", (60, 70))]), {"x": {"min": 0, "max": 50}})
    with pytest.raises(ValueError, match="unsupported predicate op"):
        _normalize_where([("x", "like", "a%")])


def test_ensure_shared_parquet_self_heals_crashed_destination(tmp_path):
    """A half-written destination (exists, no _SUCCESS — a crashed prior
    writer) must be replaced, not left to poison every future read; a
    committed destination must never be rewritten."""
    import os

    from varint_simd_spark.driver_tmp import ensure_shared_parquet

    dest = str(tmp_path / "corpus")
    os.makedirs(dest)
    open(f"{dest}/garbage.parquet", "w").write("junk")

    def writer(staging):
        os.makedirs(staging)
        open(f"{staging}/part-0.parquet", "w").write("good")
        open(f"{staging}/_SUCCESS", "w").write("")

    ensure_shared_parquet(dest, writer)
    assert os.path.exists(f"{dest}/_SUCCESS")
    assert not os.path.exists(f"{dest}/garbage.parquet")

    calls = []
    ensure_shared_parquet(dest, lambda s: calls.append(s))
    assert calls == []  # committed copy: writer not invoked


def test_fsst_emit_offset_dtype_guard():
    """_emit picks int64 offsets when a tile's token count could overflow
    int32 output offsets (a single >=1 GiB value can exceed the tile
    budget because tiles never split values)."""
    import numpy as np

    from varint_simd_spark.codecs.strings import FsstStr

    codec = FsstStr()
    small = np.arange(10, dtype=np.int64)
    # behavioral pin at small scale plus the dtype selection rule itself
    code = np.full(10, 0xFF, dtype=np.uint8)
    blob = np.arange(10, dtype=np.uint8)
    offs = np.array([0, 10], dtype=np.int64)
    out, lens = codec._emit(blob, offs, code, small)
    assert lens.dtype == np.int64 and int(lens[0]) == 20  # all escapes: 2B each
