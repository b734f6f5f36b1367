"""Incremental encoding via Structured Streaming.

New web-page files appear continuously at crawl scale; this module wires
the encode pipeline into a file-source stream:

    readStream(parquet dir) -> foreachBatch: encode_resumable(...)

Each micro-batch encodes only the chunks its rows touch that are not yet
committed (the same manifest anti-join as the batch path), so the stream
is exactly-once at chunk granularity: a replayed micro-batch after a crash
re-encodes and atomically overwrites the same chunk files (idempotent —
chunk membership is a pure function of the data).

``trigger(availableNow=True)`` gives catch-up-then-stop semantics (the
batch-incremental mode a crawl pipeline actually runs); leaving the
default trigger runs continuously.  Spark's checkpointLocation tracks file
progress; the manifest tracks chunk commits — two complementary levels of
resume.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
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

    Note on n_chunks at stream scale: chunk ids partition the *entire*
    accumulated table, so a chunk is re-encoded (overwritten) whenever a
    micro-batch adds rows to it.  For append-mostly crawls choose the key
    so new data lands in new chunks (e.g. include a date bucket in the
    key), keeping micro-batch work proportional to new data."""

    def process_batch(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        # the manifest gates chunk-level redo; committed chunks whose data
        # grew must be re-encoded, so drop their manifest rows first
        from pyspark.sql import functions as F

        touched = (
            batch_df.select(
                F.pmod(F.xxhash64(F.col(key)), F.lit(n_chunks)).alias("chunk_id")
            )
            .distinct()
        )
        try:
            manifest = store.manifest()
            keep = manifest.join(F.broadcast(touched), "chunk_id", "left_anti")
            keep.write.mode("overwrite").parquet(store.manifest_path + "_tmp")
            spark.read.parquet(store.manifest_path + "_tmp").write.mode(
                "overwrite"
            ).parquet(store.manifest_path)
        except Exception:
            pass  # first batch: no manifest yet

        from ..sources.checkpoint import encode_resumable

        # re-encode touched/missing chunks against the full accumulated
        # table (a chunk is a function of ALL its rows, not just new ones)
        full = spark.read.schema(schema).parquet(input_path)
        encode_resumable(store, full, key=key, n_chunks=n_chunks, codecs=codecs)

    stream = (
        spark.readStream.schema(schema).parquet(input_path)
    )
    writer = stream.writeStream.foreachBatch(process_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
