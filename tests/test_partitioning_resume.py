"""M4/M5 tests: hot-host salting bounds chunk skew; checkpointed encode
resumes idempotently from the last committed chunk set."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from varint_simd_spark.operators import decode_table
from varint_simd_spark.plans.partitioning import (
    encode_table_salted,
    plan_salts,
    salted_chunk_column,
    skew_report,
)
from varint_simd_spark.sources.checkpoint import EncodedStore, encode_resumable
from varint_simd_spark.sources.web_pages import generate_web_pages


@pytest.fixture(scope="module")
def web_pages(spark):
    df = generate_web_pages(spark, 4000, seed=42)
    df.cache().count()
    return df


def test_salt_plan_detects_hot_hosts(web_pages):
    plan = plan_salts(web_pages, target_rows_per_chunk=200).toPandas()
    top = skew_report(web_pages).toPandas()
    assert len(plan) >= 1  # zipf skew => at least the hottest host flagged
    assert top["count"].iloc[0] > 200
    hot = set(plan["__host"])
    assert top["host"].iloc[0] in hot
    # salts sized ~ rows/target
    for _, r in plan.iterrows():
        assert r["__n_salts"] == -(-r["__host_rows"] // 200)


def test_salted_chunks_bounded(web_pages):
    n_chunks = 16
    df2 = salted_chunk_column(web_pages, n_chunks, target_rows_per_chunk=200)
    sizes = df2.groupBy("__chunk").count().toPandas()["count"]
    # without salting the hottest host (~1400 rows) would be one chunk;
    # with salting no chunk should be much above target + cold-host noise
    assert sizes.max() < 1000, sizes.describe()


def test_salted_roundtrip(web_pages, spark):
    enc = encode_table_salted(web_pages, n_chunks=16, target_rows_per_chunk=200)
    out = decode_table(enc).drop("__chunk").toPandas().sort_values("url", ignore_index=True)
    src = web_pages.toPandas().sort_values("url", ignore_index=True)
    assert (out["text"] == src["text"]).all()
    assert (out["url"] == src["url"]).all()


def test_resume_idempotent(web_pages, spark, tmp_path):
    store = EncodedStore(spark, str(tmp_path / "store"))

    snap1, n1 = encode_resumable(store, web_pages, key="url", n_chunks=8)
    assert snap1 is not None and n1 == 8

    # second run: everything committed -> no-op
    snap2, n2 = encode_resumable(store, web_pages, key="url", n_chunks=8)
    assert snap2 is None and n2 == 0

    # drop 3 chunks from the manifest (simulate partial failure) -> resume
    # re-encodes exactly those
    m = spark.read.parquet(store.manifest_path)
    kept = m.filter(~F.col("chunk_id").isin([1, 3, 5]))
    kept.write.mode("overwrite").parquet(str(tmp_path / "m2"))
    spark.read.parquet(str(tmp_path / "m2")).write.mode("overwrite").parquet(store.manifest_path)

    snap3, n3 = encode_resumable(store, web_pages, key="url", n_chunks=8)
    assert snap3 is not None and n3 == 3

    # decoded result == source (full table, bit-identical text per url)
    dec = decode_table(store.read_encoded()).drop("__chunk")
    out = dec.toPandas().sort_values("url", ignore_index=True)
    src = web_pages.toPandas().sort_values("url", ignore_index=True)
    assert len(out) == len(src)
    assert (out["text"] == src["text"]).all()
    micros = lambda s: s.astype("datetime64[us]").astype(np.int64).to_numpy()
    assert (micros(out["warc_ts"]) == micros(src["warc_ts"])).all()


def test_resume_no_duplicate_rows(web_pages, spark, tmp_path):
    """Re-committing a chunk overwrites (dynamic partition overwrite), never
    duplicates."""
    store = EncodedStore(spark, str(tmp_path / "store2"))
    encode_resumable(store, web_pages, key="url", n_chunks=4)
    # force a full re-encode by wiping the manifest only
    spark.createDataFrame([], "chunk_id long").write.mode("overwrite").parquet(store.manifest_path)
    encode_resumable(store, web_pages, key="url", n_chunks=4)
    dec = decode_table(store.read_encoded())
    assert dec.count() == web_pages.count()


def test_decode_colocated_matches_shuffled(web_pages, spark, tmp_path):
    """Shuffle-free decode over the store layout must equal the shuffled
    decode and contain zero exchanges in its plan."""
    from varint_simd_spark.operators import decode_table_colocated

    store = EncodedStore(spark, str(tmp_path / "store3"))
    encode_resumable(store, web_pages, key="url", n_chunks=6)
    enc = store.read_encoded()
    a = decode_table(enc).drop("__chunk").toPandas().sort_values("url", ignore_index=True)
    dfb = decode_table_colocated(enc)

    def n_data_exchanges(df):
        # exchanges excluding broadcast and the tiny manifest-distinct one
        plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
        return plan.replace("BroadcastExchange", "").count("Exchange")

    shuffled = decode_table(enc)
    # colocated decode drops the big-side groupBy exchange: exactly one
    # fewer exchange than the shuffled path (the remaining one is the tiny
    # manifest distinct feeding the broadcast semi-join)
    assert n_data_exchanges(dfb) == n_data_exchanges(shuffled) - 1
    b = dfb.drop("__chunk").toPandas().sort_values("url", ignore_index=True)
    assert (a["text"] == b["text"]).all() and len(a) == len(b)


def test_snapshot_scoped_read(web_pages, spark, tmp_path):
    """Manifest snapshots gate chunk membership: reading as-of the first
    snapshot excludes chunks committed later."""
    from pyspark.sql import functions as F

    store = EncodedStore(spark, str(tmp_path / "store4"))
    snap1, _ = encode_resumable(store, web_pages, key="url", n_chunks=6)

    # simulate losing 2 chunks, then a second snapshot recommits them
    m = store.manifest()
    kept = m.filter(~F.col("chunk_id").isin([0, 1]))
    kept.write.mode("overwrite").parquet(str(tmp_path / "mkeep"))
    spark.read.parquet(str(tmp_path / "mkeep")).write.mode("overwrite").parquet(store.manifest_path)
    snap2, n2 = encode_resumable(store, web_pages, key="url", n_chunks=6)
    assert snap2 is not None and n2 == 2

    chunks1 = {
        r["chunk_id"]
        for r in store.read_encoded(as_of_snapshot=snap1)
        .select("chunk_id").distinct().collect()
    }
    chunks2 = {
        r["chunk_id"]
        for r in store.read_encoded(as_of_snapshot=snap2)
        .select("chunk_id").distinct().collect()
    }
    assert chunks1 == {2, 3, 4, 5}  # snap1's surviving membership
    assert chunks2 == {0, 1, 2, 3, 4, 5}  # full set as of the recommit

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown snapshot"):
        store.read_encoded(as_of_snapshot="nope")


def test_commit_lineage_covers_only_this_run(web_pages, spark, tmp_path):
    """A commit's manifest rows cover exactly the chunks that run touched —
    NOT the whole store (at 100 TB a commit must be O(run), not O(store))."""
    from varint_simd_spark.operators import encode_table

    store = EncodedStore(spark, str(tmp_path / "store6"))
    # commit 1: chunks 0..3 (4 chunks)
    enc1 = encode_table(web_pages, key="url", n_chunks=4)
    snap1 = store.commit(enc1)
    m1 = store.manifest().toPandas()
    assert len(m1) == 4 and set(m1["snapshot_id"]) == {snap1}

    # commit 2: re-encode ONLY chunk 2 (public commit(), no expected_chunks)
    enc2 = encode_table(web_pages, key="url", n_chunks=4).filter(F.col("chunk_id") == 2)
    snap2 = store.commit(enc2)
    m2 = store.manifest().toPandas()
    # exactly ONE new row, attributed to snap2, for chunk 2 only — no
    # re-attribution of untouched chunks to the new snapshot
    assert len(m2) == 5
    new = m2[m2["snapshot_id"] == snap2]
    assert list(new["chunk_id"]) == [2]
    # and the untouched chunks' rows still carry the old snapshot
    assert set(m2[m2["chunk_id"] != 2]["snapshot_id"]) == {snap1}


def test_iceberg_backend_interface_parity(spark, tmp_path):
    """The Iceberg backend shares the exact EncodedStore interface; in this
    sandbox (no iceberg-spark-runtime jar) requesting it fails FAST with an
    actionable error instead of surfacing an executor-time ClassNotFound."""
    import inspect

    import pytest as _pytest

    from varint_simd_spark.sources.checkpoint import iceberg_runtime_available

    sig = inspect.signature(EncodedStore.__init__)
    assert "iceberg_table" in sig.parameters
    if iceberg_runtime_available(spark):
        _pytest.skip("iceberg runtime present; parquet-fallback gate not applicable")
    with _pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        EncodedStore(spark, str(tmp_path / "ice"), iceberg_table="engine.db.enc")


def test_empty_chunks_commit_liveness(spark, tmp_path):
    """Chunks that receive no rows still get zero-row manifest entries, so
    resume converges instead of re-planning them forever."""
    from varint_simd_spark.sources.web_pages import generate_web_pages

    tiny = generate_web_pages(spark, 100, seed=42).limit(3)
    store = EncodedStore(spark, str(tmp_path / "store5"))
    _, n1 = encode_resumable(store, tiny, key="url", n_chunks=8)
    _, n2 = encode_resumable(store, tiny, key="url", n_chunks=8)
    assert n1 == 8 and n2 == 0
    assert decode_table(store.read_encoded()).count() == 3


def test_corrupt_manifest_raises_not_empty(web_pages, spark, tmp_path):
    """A corrupt/unreadable manifest must raise, not silently read as
    "nothing committed" (which would trigger a full re-encode at scale).
    A missing manifest path still reads as empty (first run)."""
    store = EncodedStore(spark, str(tmp_path / "storec"))
    assert store.committed_chunks().count() == 0  # missing path: first run

    encode_resumable(store, web_pages, key="url", n_chunks=2)
    assert store.committed_chunks().count() == 2

    # corrupt every manifest parquet file in place
    import pathlib

    for f in pathlib.Path(store.manifest_path).glob("*.parquet"):
        f.write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        store.committed_chunks().count()


def test_ingest_layout_guard(web_pages, spark, tmp_path):
    """ingest_to_store locks the layout-determining params to the store:
    a re-ingest with a different key/target_chunk_bytes/input set fails
    fast instead of re-keying every chunk (silent duplication)."""
    from varint_simd_spark.sources.checkpoint import ingest_to_store

    inp = str(tmp_path / "wp_guard_in")
    web_pages.write.mode("overwrite").parquet(inp)
    df = spark.read.parquet(inp)

    store = EncodedStore(spark, str(tmp_path / "guard_store"))
    ingest_to_store(store, df, key="url", target_chunk_bytes=1 << 20)
    n0 = store.read_encoded().count()

    # identical layout: idempotent re-run allowed (crash recovery)
    ingest_to_store(store, df, key="url", target_chunk_bytes=1 << 20)
    assert store.read_encoded().count() == n0

    # different chunking param: re-keyed layout -> fail fast
    with pytest.raises(ValueError, match="layout"):
        ingest_to_store(store, df, key="url", target_chunk_bytes=2 << 20)

    # different input set -> fail fast
    inp2 = str(tmp_path / "wp_guard_in2")
    web_pages.limit(100).write.mode("overwrite").parquet(inp2)
    with pytest.raises(ValueError, match="layout"):
        ingest_to_store(store, spark.read.parquet(inp2), key="url",
                        target_chunk_bytes=1 << 20)


def test_ingest_to_store_roundtrip(web_pages, spark, tmp_path):
    """Per-split ingest into the store: zero-exchange encode, committed
    manifest, bit-identical decode through the manifest-gated read."""
    from varint_simd_spark.sources.checkpoint import ingest_to_store

    # write input to parquet first (per-split ids are layout-deterministic)
    inp = str(tmp_path / "wp_in")
    web_pages.write.mode("overwrite").parquet(inp)
    df = spark.read.parquet(inp)

    store = EncodedStore(spark, str(tmp_path / "ingest_store"))
    snap = ingest_to_store(store, df, key="url", target_chunk_bytes=1 << 20)
    assert snap is not None

    out = decode_table(store.read_encoded()).drop("__chunk").toPandas().sort_values("url", ignore_index=True)
    src = df.toPandas().sort_values("url", ignore_index=True)
    assert len(out) == len(src)
    assert (out["text"] == src["text"]).all()

    # manifest rows == chunks written, once each
    m = store.manifest().toPandas()
    n_chunks = store.read_encoded().select("chunk_id").distinct().count()
    assert len(m) == n_chunks and m["chunk_id"].is_unique
