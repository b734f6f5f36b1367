"""Encoded-table store with checkpointed, idempotently-resumable commits.

Production target is an Iceberg table (snapshot isolation, atomic append,
time travel); this sandbox has no Iceberg runtime jar, so the store runs on
the parquet fallback behind the same interface:

* encoded chunks land under ``<root>/encoded/`` partitioned by ``chunk_id``
  with dynamic partition overwrite — re-encoding a chunk atomically
  replaces exactly that chunk's files (crash-safe: a chunk is visible only
  once its manifest row commits);
* ``<root>/manifest/`` is an append-only parquet log of committed chunks
  (chunk_id, snapshot_id, wall time, sizes) — the analog of Iceberg's
  snapshot metadata, and the lineage table required by the north rule;
* resume = left-anti join of planned chunk ids against the manifest: only
  missing/failed chunks are re-encoded (idempotent — chunk membership is a
  pure function of the data, see operators/encode.py).

To run on a real cluster with Iceberg, pass ``iceberg_table=`` and the
store uses ``writeTo(...).append()`` under the same API (config documented
in ICEBERG_CONF below; requires the spark-iceberg runtime jar).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Config a production deployment would add for the Iceberg path (public
# Iceberg quickstart settings; unusable here without the runtime jar).
ICEBERG_CONF = {
    "spark.sql.extensions": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    "spark.sql.catalog.engine": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.engine.type": "hadoop",
    # "spark.sql.catalog.engine.warehouse": "<warehouse path>",
}


def iceberg_runtime_available(spark: SparkSession) -> bool:
    """True when the iceberg-spark-runtime jar is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class EncodedStore:
    """``iceberg_table``: route writes through an Iceberg table (requires
    the iceberg-spark-runtime jar + ICEBERG_CONF catalog settings).  This
    sandbox has no jar, so ONLY the parquet backend is runtime-verified;
    the Iceberg path is interface-checked and fails fast with a clear
    error when the runtime is absent."""

    def __init__(self, spark: SparkSession, root: str, iceberg_table: str | None = None):
        self.spark = spark
        self.root = root.rstrip("/")
        self.enc_path = f"{self.root}/encoded"
        self.manifest_path = f"{self.root}/manifest"
        self.iceberg_table = iceberg_table
        if iceberg_table is not None and not iceberg_runtime_available(spark):
            raise RuntimeError(
                "Iceberg backend requested but the iceberg-spark-runtime jar "
                "is not on the classpath; add it (and ICEBERG_CONF catalog "
                "settings) or use the parquet backend (iceberg_table=None)"
            )

    # -- manifest -----------------------------------------------------------

    def committed_chunks(self) -> DataFrame:
        """Distinct committed chunk ids (empty DataFrame on first run).

        Only a missing manifest path reads as "nothing committed"; any
        other failure (corrupt/unreadable manifest) raises — silently
        treating it as empty would trigger a full re-encode of the store."""
        from pyspark.errors import AnalysisException

        try:
            m = self.spark.read.parquet(self.manifest_path)
        except AnalysisException as e:
            msg = str(e)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                return self.spark.createDataFrame([], "chunk_id long")
            raise
        return m.select("chunk_id").distinct()

    def manifest(self) -> DataFrame:
        return self.spark.read.parquet(self.manifest_path)

    # -- commit -------------------------------------------------------------

    def commit(self, enc: DataFrame, expected_chunks: list[int] | None = None) -> str:
        """Write encoded chunks, then commit them to the manifest.

        Data files first (dynamic overwrite of touched chunk partitions),
        manifest append second — a crash in between leaves orphan data
        files that the next resume simply overwrites.

        ``expected_chunks``: chunk ids this run planned; ids that produced
        NO rows (empty chunks) still get a zero-row manifest entry so
        resume does not re-plan them forever."""
        snapshot_id = uuid.uuid4().hex[:16]
        # Persist so the encode computes ONCE: the write below materializes
        # the cache and the lineage rollup reads it back — no re-encode and,
        # critically, no re-read of the whole store (at 100 TB a commit must
        # cost O(this run), not O(store)).
        enc = enc.persist()
        try:
            if self.iceberg_table is not None:
                # Iceberg path (UNVERIFIED in this sandbox — no runtime jar;
                # the constructor fails fast when the jar is absent): atomic
                # partition-overwrite append with snapshot isolation for free.
                # First commit creates the table partitioned by chunk_id;
                # overwritePartitions on a missing table would fail.
                w = enc.repartition("chunk_id").writeTo(self.iceberg_table)
                if self.spark.catalog.tableExists(self.iceberg_table):
                    w.overwritePartitions()
                else:
                    w.partitionedBy(F.col("chunk_id")).create()
            else:
                (
                    enc.repartition("chunk_id")
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("chunk_id")
                    .parquet(self.enc_path)
                )
            lineage = enc.groupBy("chunk_id").agg(
                F.sum("n_values").alias("n_values"),
                F.sum("raw_bytes").alias("raw_bytes"),
                F.sum("enc_bytes").alias("enc_bytes"),
                F.count("*").alias("n_columns"),
            )
            if expected_chunks is not None:
                planned = self.spark.createDataFrame(
                    [(int(c),) for c in expected_chunks], "chunk_id long"
                )
                lineage = planned.join(lineage, "chunk_id", "left").fillna(
                    0, subset=["n_values", "raw_bytes", "enc_bytes", "n_columns"]
                )
            lineage = lineage.withColumn("snapshot_id", F.lit(snapshot_id)).withColumn(
                "committed_at", F.lit(time.time())
            )
            lineage.write.mode("append").parquet(self.manifest_path)
        finally:
            # a failed write must not pin gigabytes of encoded payload in
            # the block manager for the rest of the session
            enc.unpersist()
        return snapshot_id

    def read_encoded(self, as_of_snapshot: str | None = None) -> DataFrame:
        """Committed encoded chunks only (manifest-gated read).

        ``as_of_snapshot``: restrict to the chunk set committed at or
        before that snapshot (membership time travel — the manifest is the
        snapshot log).  Chunk *content* history is not retained by the
        parquet backend (dynamic overwrite replaces files); full
        content-level time travel is what the Iceberg backend adds."""
        if self.iceberg_table is not None:
            enc = self.spark.table(self.iceberg_table)
        else:
            enc = self.spark.read.parquet(self.enc_path)
        committed = self.manifest() if as_of_snapshot is not None else None
        if as_of_snapshot is not None:
            cutoff = (
                committed.filter(F.col("snapshot_id") == as_of_snapshot)
                .agg(F.max("committed_at"))
                .collect()[0][0]
            )
            if cutoff is None:
                raise ValueError(f"unknown snapshot {as_of_snapshot!r}")
            chunks = (
                committed.filter(F.col("committed_at") <= cutoff)
                .select("chunk_id")
                .distinct()
            )
        else:
            chunks = self.committed_chunks()
        return enc.join(F.broadcast(chunks), on="chunk_id", how="left_semi")


def _check_ingest_conf(store: EncodedStore, df: DataFrame, layout: dict) -> None:
    """Lock the layout-determining ingest params (and the scan-split knobs
    plus the input file list) to the store.  Per-split chunk ids hash
    (partitionId, ordinal, first_key, n_rows), so a recovery re-run with a
    different parallelism, maxPartitionBytes, or input set would re-key
    every chunk and silently duplicate all rows; fail fast instead."""
    import hashlib
    import json
    import os

    layout = dict(layout)
    for k in ("spark.sql.files.maxPartitionBytes", "spark.sql.files.openCostInBytes"):
        layout[k] = store.spark.conf.get(k)  # both have built-in defaults
    files = sorted(df.inputFiles())
    layout["input_files_sha"] = hashlib.sha256("\n".join(files).encode()).hexdigest()
    layout["n_input_files"] = len(files)

    if "://" in store.root and not store.root.startswith("file:"):
        # the layout lock is read/written with local-filesystem calls; on a
        # remote store root (s3://, hdfs://) those would silently write a
        # dead local file and never guard recovery re-runs.  A remote
        # deployment should route this sidecar through the Hadoop
        # FileSystem API; fail fast until it does.
        raise NotImplementedError(
            f"ingest layout lock requires a local store root, got {store.root!r}"
        )
    os.makedirs(store.root, exist_ok=True)
    conf_path = f"{store.root}/_ingest_conf.json"
    if os.path.exists(conf_path):
        with open(conf_path) as f:
            stored = json.load(f)
        diff = {k: (stored.get(k), v) for k, v in layout.items() if stored.get(k) != v}
        if diff:
            raise ValueError(
                "ingest layout differs from this store's locked layout "
                f"({diff}); per-split chunk ids are a function of the scan "
                "layout, so re-ingesting with a different layout would "
                "re-key every chunk and duplicate rows.  Use a fresh store "
                "root, or re-run with the original layout to recover."
            )
    else:
        with open(conf_path, "w") as f:
            json.dump(layout, f)


def ingest_to_store(
    store: EncodedStore,
    df: DataFrame,
    key: str = "url",
    codecs: dict[str, str] | None = None,
    target_chunk_bytes: int = 32 << 20,
) -> str:
    """One-shot ingest: shuffle-free per-split encode straight into the
    store (zero exchanges — the 100 TB ingest configuration).

    Crash safety: chunk ids are deterministic for a fixed input layout —
    which ``_check_ingest_conf`` locks to the store (params + scan-split
    knobs + input file list), failing fast on mismatch — so a re-run after
    a crash overwrites its own partial chunk files (dynamic partition
    overwrite) and commits once, no duplicates.  Unlike
    :func:`encode_resumable` there is no chunk-level skip list (ids are
    not known before the encode runs); for incremental arrival use the
    streaming path, and re-cluster with ``compact_store`` when the
    url-hash layout is needed."""
    from ..operators.encode import encode_table_per_split

    _check_ingest_conf(
        store, df, {"key": key, "target_chunk_bytes": target_chunk_bytes}
    )
    enc = encode_table_per_split(
        df, key=key, codecs=codecs, target_chunk_bytes=target_chunk_bytes
    )
    return store.commit(enc)


def encode_resumable(
    store: EncodedStore,
    df: DataFrame,
    key: str = "url",
    n_chunks: int = 32,
    codecs: dict[str, str] | None = None,
    salted: bool = False,
    target_rows_per_chunk: int = 50_000,
) -> tuple[str | None, int]:
    """Encode only the chunks not yet committed; returns (snapshot_id or
    None if nothing to do, number of chunks encoded this run).

    The planned chunk universe is 0..n_chunks-1; the pending set is the
    DataFrame anti-join of that range against the manifest, and the
    big-side row filter is a BROADCAST SEMI-JOIN against it — no
    driver-side id list in the plan, so the path holds at millions of
    chunks (an ``isin`` literal of the pending ids would not).  Only the
    commit's expected-chunk bookkeeping collects ids, and only while the
    pending set is small enough to enumerate."""
    spark = df.sparkSession
    universe = spark.range(n_chunks).select(F.col("id").alias("chunk_id"))
    # persist: one manifest scan + anti-join feeds the count, the
    # bookkeeping collect, AND the semi-join below (also pins one
    # consistent pending snapshot against concurrent committers)
    pending_df = universe.join(store.committed_chunks(), "chunk_id", "left_anti").persist()
    try:
        n_pending = pending_df.count()
        if n_pending == 0:
            return None, 0
        # expected-chunks manifest bookkeeping (zero-row entries for empty
        # chunks): a driver list is metadata, not a plan element — enumerate
        # it only while small; past that, empty-chunk re-planning is the
        # lesser cost and the semi-join below stays fully distributed
        pending = (
            [r["chunk_id"] for r in pending_df.collect()] if n_pending <= 100_000 else None
        )

        if salted:
            from ..plans.partitioning import salted_chunk_column

            df2 = salted_chunk_column(df, n_chunks, key, target_rows_per_chunk)
        else:
            df2 = df.withColumn("__chunk", F.pmod(F.xxhash64(F.col(key)), F.lit(n_chunks)))

        from ..operators.encode import ENCODED_SCHEMA, make_encode_chunk_fn

        columns = df.columns
        fn = make_encode_chunk_fn(columns, codecs or {}, key)
        enc = (
            df2.select(*columns, "__chunk")
            .join(
                F.broadcast(pending_df.select(F.col("chunk_id").alias("__chunk"))),
                "__chunk",
                "left_semi",
            )
            .groupBy("__chunk")
            .applyInArrow(fn, schema=ENCODED_SCHEMA)
        )
        snapshot_id = store.commit(enc, expected_chunks=pending)
        return snapshot_id, int(n_pending)
    finally:
        pending_df.unpersist()
