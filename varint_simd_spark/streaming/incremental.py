"""Incremental encoding via Structured Streaming.

New web-page files appear continuously at crawl scale; this module wires
the encode pipeline into a file-source stream:

    readStream(parquet dir) -> foreachBatch: encode THIS batch's rows only

Chunk-id scheme: every micro-batch owns the disjoint id range
``[batch_id*n_chunks, (batch_id+1)*n_chunks)``; within the range rows are
placed by url-hash exactly like the batch path.  Consequences:

* **work per batch is O(batch)** — no re-read of the accumulated table, no
  re-encode of historical chunks (a chunk is a function of one batch's
  rows only);
* **the manifest is append-only** — no rewrite window, nothing to swap
  atomically, no crash can lose committed rows;
* **exactly-once at chunk granularity** — foreachBatch replays a crashed
  batch with the same batch_id and the same rows, so the replay targets
  the same chunk ids: ids whose manifest row committed are skipped
  (anti-join), the rest re-encode and atomically overwrite their own
  partition directories.

The trade-off is the classic streaming-ingest one: many small per-batch
chunks instead of few big ones.  :func:`compact_store` is the scheduled
background fix (decode + re-encode into the canonical url-hash chunking),
the same pattern as Iceberg's rewrite_data_files.

``trigger(availableNow=True)`` gives catch-up-then-stop semantics (the
batch-incremental mode a crawl pipeline actually runs); leaving the
default trigger runs continuously.  Spark's checkpointLocation tracks file
progress; the manifest tracks chunk commits — two complementary levels of
resume.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..sources.checkpoint import EncodedStore


def encode_stream(
    spark: SparkSession,
    input_path: str,
    store: EncodedStore,
    schema: StructType,
    key: str = "url",
    n_chunks: int = 32,
    codecs: dict[str, str] | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Start the incremental encode stream; returns the StreamingQuery.

    ``n_chunks`` here is chunks *per micro-batch*; size it so one batch's
    rows / n_chunks is a healthy chunk (~32-64 MB raw at crawl scale)."""

    from ..operators.encode import ENCODED_SCHEMA, make_encode_chunk_fn

    def process_batch(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        base = int(batch_id) * n_chunks
        committed = {
            r["chunk_id"]
            for r in store.committed_chunks()
            .filter(F.col("chunk_id").between(base, base + n_chunks - 1))
            .collect()
        }
        pending = [base + i for i in range(n_chunks) if base + i not in committed]
        if not pending:
            return  # full replay of an already-committed batch
        columns = [f.name for f in schema.fields]
        fn = make_encode_chunk_fn(columns, codecs or {}, key)
        df2 = batch_df.withColumn(
            "__chunk", F.lit(base) + F.pmod(F.xxhash64(F.col(key)), F.lit(n_chunks))
        )
        enc = (
            df2.select(*columns, "__chunk")
            .filter(F.col("__chunk").isin(pending))
            .groupBy("__chunk")
            .applyInArrow(fn, schema=ENCODED_SCHEMA)
        )
        store.commit(enc, expected_chunks=pending)

    stream = spark.readStream.schema(schema).parquet(input_path)
    writer = stream.writeStream.foreachBatch(process_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_store(
    src: EncodedStore,
    dest: EncodedStore,
    key: str = "url",
    n_chunks: int = 32,
    codecs: dict[str, str] | None = None,
) -> str:
    """Re-chunk an (ingest-fragmented) store into the canonical url-hash
    layout: decode committed chunks, re-encode with ``encode_table``,
    commit to ``dest``.  Run as a scheduled maintenance job — the analog of
    Iceberg's rewrite_data_files; O(store) by design, which is why ingest
    itself never pays it."""
    from ..operators.encode import decode_table, encode_table

    full = decode_table(src.read_encoded()).drop("__chunk")
    enc = encode_table(full, key=key, n_chunks=n_chunks, codecs=codecs)
    return dest.commit(enc, expected_chunks=list(range(n_chunks)))
