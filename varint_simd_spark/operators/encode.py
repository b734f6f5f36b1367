"""encode_table / decode_table — the engine's main Spark operators.

Lifecycle (SURVEY.md §3.4): scan -> bucket (one shuffle, url-hash) ->
``applyInPandas`` per bucket -> one encoded row per (chunk, column).
Everything inside the UDF is whole-column numpy (codecs/), Arrow-batched —
no per-row Python (input_hint requirement).

Scale notes (designed for ~100 TB / 1000 executors, tested on local[32]):
* chunk membership is ``pmod(xxhash64(key), n_chunks)`` — deterministic in
  data only, so resume/verify work identically at any parallelism;
* the groupBy shuffle is the ONLY shuffle in the encode path; AQE coalesces
  small post-shuffle partitions and splits skewed ones;
* ``n_chunks`` should be sized so a chunk's pandas materialization fits an
  executor core's memory (target ~32-64 MB of raw column data per chunk);
  helpers below compute it from a row-size estimate;
* decode is shuffle-free: each encoded row group (chunk) is already one
  task's worth of work.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import choose_codec, decode_column, dtype_tag, encode_column
from ..codecs.base import STR_TAGS, to_bytes_list, to_int64
from ..kernels import varint
from ..kernels.zigzag import zigzag

ENCODED_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.LongType()),
        T.StructField("col_idx", T.IntegerType()),
        T.StructField("column", T.StringType()),
        T.StructField("dtype", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("params", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_values", T.LongType()),
        T.StructField("raw_bytes", T.LongType()),
        T.StructField("ref_bytes", T.LongType()),
        T.StructField("enc_bytes", T.LongType()),
        T.StructField("reason", T.StringType()),
    ]
)

_TAG_TO_SPARK = {
    "i64": T.LongType(),
    "i32": T.IntegerType(),
    "i16": T.ShortType(),
    "i8": T.ByteType(),
    "f64": T.DoubleType(),
    "ts_us": T.TimestampType(),
    "date_d": T.DateType(),
    "str": T.StringType(),
    "bin": T.BinaryType(),
    "bool": T.BooleanType(),
}


def _reference_bytes(s: pd.Series, tag: str) -> int:
    """Size the reference encoder would produce for this column: minimal
    LEB128 of zigzag(v) for integer domains (encode_zigzag,
    reference src/encode/mod.rs:40-42), raw utf-8 + varint lengths for
    strings (the reference has no string codec; framing is ours)."""
    if tag in STR_TAGS:
        vals = to_bytes_list(s.fillna("" if tag == "str" else b""), tag)
        lens = np.fromiter((len(v) for v in vals), dtype=np.uint64, count=len(vals))
        return int(lens.sum() + varint.varint_len(lens).sum())
    sn = s.fillna(0) if s.isna().any() else s
    v = to_int64(sn, tag)
    return int(varint.varint_len(zigzag(v)).sum())


def _raw_bytes(s: pd.Series, tag: str) -> int:
    if tag in STR_TAGS:
        vals = to_bytes_list(s.fillna("" if tag == "str" else b""), tag)
        return int(sum(len(v) for v in vals))
    return 8 * len(s)


def make_encode_chunk_fn(columns: list[str], codecs: dict[str, str], sort_key: str | None):
    """Build the applyInPandas chunk encoder (closure shipped to executors)."""

    def encode_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        chunk_id = int(pdf["__chunk"].iloc[0])
        if sort_key is not None:
            pdf = pdf.sort_values(sort_key, kind="stable", ignore_index=True)
        rows = []
        for idx, col in enumerate(columns):
            s = pdf[col]
            want = codecs.get(col, "auto")
            if want == "auto":
                codec, reason, _stats = choose_codec(s)
            else:
                codec, reason = want, "forced"
            tag, payload, params = encode_column(s, codec)
            rows.append(
                {
                    "chunk_id": chunk_id,
                    "col_idx": idx,
                    "column": col,
                    "dtype": tag,
                    "codec": codec,
                    "params": json.dumps(params),
                    "payload": payload,
                    "n_values": len(s),
                    "raw_bytes": _raw_bytes(s, tag),
                    "ref_bytes": _reference_bytes(s, tag),
                    "enc_bytes": len(payload),
                    "reason": reason,
                }
            )
        return pd.DataFrame(rows)

    return encode_chunk


def encode_table(
    df: DataFrame,
    key: str,
    columns: list[str] | None = None,
    codecs: dict[str, str] | None = None,
    n_chunks: int = 32,
    sort_within_chunk: bool = True,
) -> DataFrame:
    """Encode ``df`` into the encoded-chunk DataFrame (FIXTURES.md §4).

    ``key``: chunk-assignment column (url at production scale) — chunk id is
    ``pmod(xxhash64(key), n_chunks)``, deterministic in data only.
    ``codecs``: per-column codec name or "auto" (default: auto for all).
    ``sort_within_chunk``: sort chunk rows by ``key`` before encoding —
    deterministic value order (resume/verify) and better run/delta locality.
    """
    columns = columns or df.columns
    codecs = codecs or {}
    chunk = F.pmod(F.xxhash64(F.col(key)), F.lit(n_chunks)).alias("__chunk")
    fn = make_encode_chunk_fn(columns, codecs, key if sort_within_chunk else None)
    return (
        df.select(*columns, chunk)
        .groupBy("__chunk")
        .applyInPandas(fn, schema=ENCODED_SCHEMA)
    )


def decode_table(enc: DataFrame) -> DataFrame:
    """Inverse of :func:`encode_table`: encoded chunks -> original rows.

    Self-describing (schema from the dtype tags); shuffle only on chunk_id
    (already the storage partitioning, so at scale this is a local groupBy
    after a bucketed read)."""
    meta = (
        enc.select("col_idx", "column", "dtype").distinct().orderBy("col_idx").collect()
    )
    columns = [r["column"] for r in meta]
    tags = {r["column"]: r["dtype"] for r in meta}
    out_schema = T.StructType(
        [T.StructField("__chunk", T.LongType())]
        + [T.StructField(r["column"], _TAG_TO_SPARK[r["dtype"]]) for r in meta]
    )

    def decode_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        n = int(pdf["n_values"].iloc[0])
        out = {"__chunk": np.full(n, int(pdf["chunk_id"].iloc[0]), dtype=np.int64)}
        by_col = {r.column: r for r in pdf.itertuples()}
        for col in columns:
            r = by_col[col]
            out[col] = decode_column(tags[col], r.codec, bytes(r.payload), json.loads(r.params), n)
        return pd.DataFrame(out)

    return enc.groupBy("chunk_id").applyInPandas(decode_chunk, schema=out_schema)


def chunk_metrics(enc: DataFrame) -> DataFrame:
    """Per-column compression lineage rollup (sizes + ratios + codec mix)."""
    return (
        enc.groupBy("column", "dtype", "codec")
        .agg(
            F.count("*").alias("chunks"),
            F.sum("n_values").alias("values"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("ref_bytes").alias("ref_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
        )
        .withColumn("ratio_vs_raw", F.col("enc_bytes") / F.col("raw_bytes"))
        .withColumn("ratio_vs_ref", F.col("enc_bytes") / F.col("ref_bytes"))
        .orderBy("column", "codec")
    )
