"""Unified column codec dispatch: pandas Series <-> (codec, params, payload).

Type tags carried in the encoded-chunk rows (FIXTURES.md §4) so decode can
rebuild the exact pandas/Spark column:

    i64      int64 (also int32/16/8 upcast — tag records the physical width)
    f64      float64, bit-preserved via uint64 view
    ts_us    timestamp -> epoch micros int64
    date_d   date32 -> epoch days int64
    str      utf-8 string (byte-identical round trip)
    bin      binary
    bool     boolean -> int64 0/1

Null handling (engine extension; the reference has no nulls): a validity
bitmap section is prepended when nulls exist; null slots encode as 0/b"".
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .container import pack_sections, unpack_sections
from .integer import INT_CODECS
from .strings import STR_CODECS

INT_TAGS = {"i64", "i32", "i16", "i8", "ts_us", "date_d", "bool", "f64"}
STR_TAGS = {"str", "bin"}


def dtype_tag(s: pd.Series) -> str:
    dt = s.dtype
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "ts_us"
    if dt == np.int64:
        return "i64"
    if dt == np.int32:
        return "i32"
    if dt == np.int16:
        return "i16"
    if dt == np.int8:
        return "i8"
    if dt == np.float64 or dt == np.float32:
        return "f64"
    if dt == np.bool_:
        return "bool"
    if dt == object:
        probe = next((v for v in s if v is not None), None)
        if isinstance(probe, (bytes, bytearray)):
            return "bin"
        if isinstance(probe, str):
            return "str"
        import datetime

        if isinstance(probe, datetime.date):
            return "date_d"
        raise TypeError(f"unsupported object column element: {type(probe)}")
    if str(dt) == "string":
        return "str"
    raise TypeError(f"unsupported dtype {dt}")


def to_int64(s: pd.Series, tag: str) -> np.ndarray:
    """Lossless map of a typed column into the int64 codec domain."""
    if tag == "ts_us":
        return s.astype("datetime64[us]").astype(np.int64).to_numpy(copy=False)
    if tag == "date_d":
        return pd.to_datetime(s).to_numpy(dtype="datetime64[D]").astype(np.int64)
    if tag == "f64":
        return s.to_numpy(dtype=np.float64, copy=False).view(np.int64)
    if tag == "bool":
        return s.to_numpy(dtype=np.bool_).astype(np.int64)
    return s.to_numpy(dtype=np.int64, copy=False)


def from_int64(v: np.ndarray, tag: str) -> pd.Series:
    if tag == "ts_us":
        return pd.Series(v.view(np.int64).astype("datetime64[us]"))
    if tag == "date_d":
        return pd.Series(v.astype("datetime64[D]").astype("datetime64[us]")).dt.date
    if tag == "f64":
        return pd.Series(v.view(np.float64))
    if tag == "bool":
        return pd.Series(v.astype(np.bool_))
    if tag == "i32":
        return pd.Series(v.astype(np.int32))
    if tag == "i16":
        return pd.Series(v.astype(np.int16))
    if tag == "i8":
        return pd.Series(v.astype(np.int8))
    return pd.Series(v.astype(np.int64))


def to_bytes_list(s: pd.Series, tag: str) -> list[bytes]:
    if tag == "bin":
        return [bytes(v) if v is not None else b"" for v in s]
    return [v.encode("utf-8") if v is not None else b"" for v in s]


def from_bytes_list(vals: list[bytes], tag: str) -> pd.Series:
    if tag == "bin":
        return pd.Series(vals, dtype=object)
    return pd.Series([v.decode("utf-8") for v in vals], dtype=object)


def encode_column(s: pd.Series, codec: str) -> tuple[str, bytes, dict]:
    """Encode one pandas column with the named codec.  Returns
    (dtype_tag, payload, params).  Nulls produce a validity section."""
    tag = dtype_tag(s)
    nulls = s.isna()
    has_nulls = bool(nulls.any())
    if has_nulls:
        s = s.copy()
        if tag in STR_TAGS:
            s[nulls] = b"" if tag == "bin" else ""
        else:
            s[nulls] = pd.Timestamp(0) if tag == "ts_us" else 0

    if tag in STR_TAGS or (tag in ("str", "bin")):
        impl = STR_CODECS[codec]
        payload, params = impl.encode(to_bytes_list(s, tag))
    else:
        impl = INT_CODECS[codec]
        payload, params = impl.encode(to_int64(s, tag))

    if has_nulls:
        bitmap = np.packbits(nulls.to_numpy(dtype=np.bool_))
        payload = pack_sections([bitmap.tobytes(), payload])
        params = dict(params, nulls="1")
    return tag, payload, params


def decode_column(tag: str, codec: str, payload: bytes, params: dict, n: int) -> pd.Series:
    nulls = None
    if params.get("nulls") == "1":
        bitmap_b, payload = unpack_sections(payload)
        nulls = np.unpackbits(np.frombuffer(bitmap_b, dtype=np.uint8))[:n].astype(bool)

    if tag in STR_TAGS:
        vals = STR_CODECS[codec].decode(payload, params, n)
        out = from_bytes_list(vals, tag)
    else:
        v = INT_CODECS[codec].decode(payload, params, n)
        out = from_int64(v, tag)

    if nulls is not None:
        out = out.astype(object) if tag in STR_TAGS or tag == "date_d" else out
        out[np.asarray(nulls)] = None
    return out
