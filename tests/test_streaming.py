"""Structured Streaming incremental encode: two file drops -> stream
catches up -> decoded store equals the full accumulated table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from varint_simd_spark.operators import decode_table
from varint_simd_spark.sources.checkpoint import EncodedStore
from varint_simd_spark.sources.web_pages import generate_web_pages
from varint_simd_spark.streaming.incremental import encode_stream


def test_incremental_encode_stream(spark, tmp_path):
    inp = str(tmp_path / "in")
    store = EncodedStore(spark, str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt")

    all_pages = generate_web_pages(spark, 1200, seed=42).cache()
    first = all_pages.filter(F.xxhash64("url") % 2 == 0)
    second = all_pages.filter(F.xxhash64("url") % 2 != 0)
    schema = all_pages.schema

    first.write.mode("append").parquet(inp)
    q = encode_stream(spark, inp, store, schema, key="url", n_chunks=8,
                      checkpoint_dir=ckpt, available_now=True)
    q.awaitTermination(300)
    n1 = decode_table(store.read_encoded()).count()
    assert n1 == first.count()

    # drop two: stream restart catches up; chunks with new rows re-encode
    second.write.mode("append").parquet(inp)
    q = encode_stream(spark, inp, store, schema, key="url", n_chunks=8,
                      checkpoint_dir=ckpt, available_now=True)
    q.awaitTermination(300)

    dec = decode_table(store.read_encoded()).drop("__chunk")
    out = dec.toPandas().sort_values("url", ignore_index=True)
    src = all_pages.toPandas().sort_values("url", ignore_index=True)
    assert len(out) == len(src)
    assert (out["text"] == src["text"]).all()
