"""Decompose encode_web_pages wall time: scan+shuffle+IPC vs kernels vs write."""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
from pyspark.sql import functions as F
from pyspark.sql import types as T

from varint_simd_spark.operators import encode_table
from varint_simd_spark.sources.session import get_spark
from varint_simd_spark.sources.web_pages import generate_web_pages

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
n_pages = int(os.environ.get("N_PAGES", "400000"))
spark = get_spark(app_name="profile_encode", master=f"local[{cpus}]",
                  shuffle_partitions=cpus * 2)
spark.sparkContext.setLogLevel("ERROR")
tmp = tempfile.mkdtemp(prefix="vss_prof_")
n_chunks = cpus * 4

wp = generate_web_pages(spark, n_pages, seed=42)
wp.write.mode("overwrite").parquet(f"{tmp}/web_pages")
wp = spark.read.parquet(f"{tmp}/web_pages")
encode_table(wp.limit(4000), key="url", n_chunks=cpus).count()

def timed(name, fn, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.2f}s", flush=True)
    return best

# 0. raw scan + count
timed("scan_only", lambda: wp.count())
timed("scan_agg_len", lambda: wp.agg(F.sum(F.length("text") + F.length("html"))).collect())

# 1. scan + chunk + shuffle + trivial applyInArrow (no codec work)
NOOP_SCHEMA = T.StructType([T.StructField("chunk_id", T.LongType()),
                            T.StructField("n", T.LongType())])
def noop(table: pa.Table) -> pa.Table:
    return pa.table({"chunk_id": [int(table["__chunk"][0].as_py())],
                     "n": [table.num_rows]})
chunk = F.pmod(F.xxhash64(F.col("url")), F.lit(n_chunks)).alias("__chunk")
timed("shuffle+IPC+noop", lambda: wp.select("*", chunk).groupBy("__chunk")
      .applyInArrow(noop, schema=NOOP_SCHEMA).count())

# 1b. same but with the chunk sort (isolates sort cost)
import pyarrow.compute as pc
def noop_sorted(table: pa.Table) -> pa.Table:
    table = table.take(pc.sort_indices(table["url"]))
    return pa.table({"chunk_id": [int(table["__chunk"][0].as_py())],
                     "n": [table.num_rows]})
timed("shuffle+IPC+sort+noop", lambda: wp.select("*", chunk).groupBy("__chunk")
      .applyInArrow(noop_sorted, schema=NOOP_SCHEMA).count())

# 2. full encode, no write
timed("encode_nowrite", lambda: encode_table(wp, key="url", n_chunks=n_chunks)
      .agg(F.sum("enc_bytes")).collect())

# 3. full encode + repartition + partitioned write (bench flow)
timed("encode_write_repart", lambda: encode_table(wp, key="url", n_chunks=n_chunks)
      .repartition("chunk_id").write.partitionBy("chunk_id")
      .mode("overwrite").parquet(f"{tmp}/wp_enc"), n=2)

# 4. encode + direct partitioned write (no repartition)
timed("encode_write_direct", lambda: encode_table(wp, key="url", n_chunks=n_chunks)
      .write.partitionBy("chunk_id")
      .mode("overwrite").parquet(f"{tmp}/wp_enc2"), n=2)

import subprocess
print(subprocess.run(["du", "-sh", f"{tmp}/wp_enc", f"{tmp}/wp_enc2"],
                     capture_output=True, text=True).stdout)
spark.stop()
