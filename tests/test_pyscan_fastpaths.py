"""Round-6 optimization internals: the python-scan fast paths and the
fragment-merge encode topology must be RESULT-IDENTICAL to the JVM-scan
paths, and the numpy XXH64 kernel must match Spark's xxhash64 bit for bit
(bucket/chunk membership depends on it)."""

from __future__ import annotations

import os
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR


@pytest.fixture()
def no_pyscan():
    os.environ["VSS_PYSCAN"] = "0"
    yield
    os.environ["VSS_PYSCAN"] = "1"


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_xxh64_matches_spark_long(spark):
    from varint_simd_spark.kernels.xxh64 import pmod, xxh64_int64

    vals = [0, 1, -1, 42, 2**62, -(2**63), 7_777_777_777, 2**63 - 1]
    rows = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v", F.xxhash64("v").alias("h"), F.pmod(F.xxhash64("v"), F.lit(8)).alias("p")
    ).collect()
    got = xxh64_int64(np.array(vals, dtype=np.int64))
    assert [int(g) for g in got] == [r["h"] for r in rows]
    assert [int(g) for g in pmod(got, 8)] == [r["p"] for r in rows]


def test_xxh64_matches_spark_strings(spark):
    from varint_simd_spark.kernels.xxh64 import xxh64_bytes_bo

    random.seed(11)
    strs = ["", "a", "abc", "x" * 31, "y" * 32, "z" * 100, "日本語"]
    strs += ["".join(random.choice("ab:/.") for _ in range(random.randint(0, 90)))
             for _ in range(64)]
    exp = {
        r["s"]: r["h"]
        for r in spark.createDataFrame([(s,) for s in strs], "s string")
        .select("s", F.xxhash64("s").alias("h")).collect()
    }
    bts = [s.encode() for s in strs]
    lens = np.array([len(b) for b in bts], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    blob = np.frombuffer(b"".join(bts), dtype=np.uint8)
    got = xxh64_bytes_bo(blob, offs)
    assert all(int(g) == exp[s] for g, s in zip(got, strs))


def test_decode_colocated_pyscan_equivalence(spark, tmp_path):
    from varint_simd_spark.operators import (
        column_meta,
        decode_table_colocated,
        encode_table,
    )
    from varint_simd_spark.operators.encode import decode_aggregate

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    enc = encode_table(df, key="doc_id", n_chunks=8)
    enc.write.partitionBy("chunk_id").parquet(str(tmp_path / "store"))
    st = spark.read.parquet(str(tmp_path / "store"))
    meta = column_meta(st)
    for kw in (
        {},
        {"where": [("lang", "==", "en")]},
    ):
        os.environ["VSS_PYSCAN"] = "0"
        a = _rows(decode_table_colocated(st, meta=meta, **kw))
        os.environ["VSS_PYSCAN"] = "1"
        b = _rows(decode_table_colocated(st, meta=meta, **kw))
        assert a == b and a
    os.environ["VSS_PYSCAN"] = "0"
    a = _rows(decode_aggregate(st, use_stats=False))
    os.environ["VSS_PYSCAN"] = "1"
    b = _rows(decode_aggregate(st, use_stats=False))
    assert a == b and a


def test_agg_analytic_rows_match_decode(spark, tmp_path):
    """The analytic aggregate shortcuts (string byte totals / RLE sums from
    payload structure) must equal the materializing decode path, nulls
    included."""
    from varint_simd_spark.operators import encode_table
    from varint_simd_spark.operators.encode import decode_aggregate

    df = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id",
        F.when(F.col("user_id") % 7 != 0, F.col("event_type")).alias("t_null"),
        F.when(F.col("value") > 0.5, F.col("value")).alias("v_null"),
        "props",
    )
    enc = encode_table(
        df, key="event_id", n_chunks=4,
        codecs={"t_null": "rle_str", "props": "fsst", "event_id": "rle_varint"},
    )
    got = {r["column"]: r for r in decode_aggregate(enc, use_stats=False).collect()}
    exp = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("t_null").isNull().cast("long")).alias("tn"),
        F.sum(F.length(F.col("t_null"))).alias("tb"),
        F.sum(F.lit(0) + F.length("props")).alias("pb"),
        F.sum("event_id").alias("es"),
        F.min("event_id").alias("emin"),
        F.max("event_id").alias("emax"),
    ).collect()[0]
    assert got["t_null"]["n_rows"] == exp["n"]
    assert got["t_null"]["n_nulls"] == exp["tn"]
    assert got["t_null"]["sum_bytes"] == exp["tb"]
    assert got["props"]["sum_bytes"] == exp["pb"]
    assert got["event_id"]["sum_exact"] == str(exp["es"])
    assert got["event_id"]["min_exact"] == str(exp["emin"])
    assert got["event_id"]["max_exact"] == str(exp["emax"])


def test_fragment_merge_equivalence(spark, tmp_path):
    """Fragment-merge encode (integer-gated) must produce the same chunk
    membership, satisfy the ref bound, and decode identically."""
    from varint_simd_spark.operators import decode_table, encode_table

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    # force enough python-scan groups by rewriting as several small files
    li.repartition(6).write.option("maxRecordsPerFile", 1000).parquet(
        str(tmp_path / "li")
    )
    src = spark.read.parquet(str(tmp_path / "li"))
    os.environ["VSS_PYSCAN"] = "0"
    enc_jvm = encode_table(src, key="l_orderkey", n_chunks=8)
    meta_jvm = {
        (r["chunk_id"], r["column"]): (r["n_values"], r["dtype"])
        for r in enc_jvm.collect()
    }
    dec_jvm = _rows(decode_table(enc_jvm).drop("__chunk"))
    os.environ["VSS_PYSCAN"] = "1"
    enc_fm = encode_table(src, key="l_orderkey", n_chunks=8)
    rows = enc_fm.collect()
    meta_fm = {
        (r["chunk_id"], r["column"]): (r["n_values"], r["dtype"]) for r in rows
    }
    assert meta_fm == meta_jvm
    assert all(0 < r["enc_bytes"] <= r["ref_bytes"] for r in rows)
    assert _rows(decode_table(enc_fm).drop("__chunk")) == dec_jvm


def test_encode_table_remap_preserves_chunk_ids(spark):
    from varint_simd_spark.operators import encode_table

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    enc = encode_table(df, key="doc_id", n_chunks=8)
    got = sorted({r["chunk_id"] for r in enc.select("chunk_id").distinct().collect()})
    exp = sorted(
        r[0]
        for r in df.select(F.pmod(F.xxhash64("doc_id"), F.lit(8))).distinct().collect()
    )
    assert got == exp
