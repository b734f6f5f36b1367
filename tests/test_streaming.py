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
    snap0_set = set(store.manifest().toPandas()["snapshot_id"])
    assert len(snap0_set) == 1
    snap0 = snap0_set.pop()

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

    # batch work is bounded to new data: batch 1 (second drop) owns its own
    # hashed chunk-id set and did NOT touch batch 0's chunks — batch-0
    # manifest rows keep their original snapshot, one commit per chunk
    from varint_simd_spark.streaming.incremental import _stream_chunk_id

    ids0 = {_stream_chunk_id(0, 8, i) for i in range(8)}
    ids1 = {_stream_chunk_id(1, 8, i) for i in range(8)}
    m = store.manifest().toPandas()
    batch0 = m[m["chunk_id"].isin(ids0)]
    batch1 = m[m["chunk_id"].isin(ids1)]
    assert len(batch0) == 8 and len(batch1) == 8 and len(m) == 16
    assert set(batch0["snapshot_id"]) == {snap0}
    assert m.groupby("chunk_id").size().max() == 1

    # n_chunks is locked to the store: a restart with a different value
    # must fail fast instead of re-keying a replay
    import pytest as _pytest

    with _pytest.raises(ValueError, match="locked"):
        encode_stream(spark, inp, store, schema, key="url", n_chunks=4,
                      checkpoint_dir=ckpt, available_now=True)


def test_compact_store(spark, tmp_path):
    """Compaction folds per-batch ingest chunks into the canonical url-hash
    chunking without changing the decoded table."""
    from varint_simd_spark.streaming.incremental import compact_store

    inp = str(tmp_path / "in")
    store = EncodedStore(spark, str(tmp_path / "store"))
    pages = generate_web_pages(spark, 600, seed=7).cache()
    pages.write.mode("append").parquet(inp)
    q = encode_stream(spark, inp, store, pages.schema, key="url", n_chunks=8,
                      checkpoint_dir=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(300)

    dest = EncodedStore(spark, str(tmp_path / "compacted"))
    compact_store(store, dest, key="url", n_chunks=4)
    chunks = {r["chunk_id"] for r in dest.read_encoded().select("chunk_id").distinct().collect()}
    assert chunks == {0, 1, 2, 3}
    out = decode_table(dest.read_encoded()).drop("__chunk").toPandas().sort_values("url", ignore_index=True)
    src = pages.toPandas().sort_values("url", ignore_index=True)
    assert (out["text"] == src["text"]).all() and len(out) == len(src)
