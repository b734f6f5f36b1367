"""Decompose encode_table (hash-chunk) at bench shape: scan+shuffle cost vs
kernel vs write, plus the remap's effect on reduce-stage balance."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
from pyspark.sql import functions as F
from pyspark.sql import types as T


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from varint_simd_spark.operators.encode import ENCODED_SCHEMA, encode_table
    from varint_simd_spark.sources.session import get_spark
    from varint_simd_spark.sources.web_pages import generate_web_pages

    spark = get_spark(app_name="ab_hc", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="vss_abhc_")
    wp = generate_web_pages(spark, 1_000_000, seed=42)
    wp.write.mode("overwrite").option("maxRecordsPerFile", 40_000).parquet(f"{tmp}/wp")
    wp = spark.read.parquet(f"{tmp}/wp")
    li = spark.read.parquet("/root/testdata/sf1.0/lineitem.parquet")
    n_chunks = int(cpus) * 2
    noop = lambda df: df.write.format("noop").mode("overwrite").save()
    cnt = T.StructType([T.StructField("n", T.LongType())])

    def drain(key):
        def f(table: pa.Table) -> pa.Table:
            return pa.table({"n": pa.array([table.num_rows], pa.int64())})
        return f

    qs = {
        # scan + shuffle + group materialization, no encode kernels
        "wp_shuffle_only": lambda: noop(
            wp.select(*wp.columns, F.pmod(F.xxhash64("url"), F.lit(n_chunks)).alias("__chunk"))
            .groupBy("__chunk").applyInArrow(drain("url"), schema=cnt)),
        "wp_encode_noop": lambda: noop(encode_table(wp, key="url", n_chunks=n_chunks)),
        "wp_encode_write": lambda: encode_table(wp, key="url", n_chunks=n_chunks)
            .write.partitionBy("chunk_id").mode("overwrite").parquet(f"{tmp}/wpe"),
        "li_shuffle_only": lambda: noop(
            li.select(*li.columns, F.pmod(F.xxhash64("l_orderkey"), F.lit(n_chunks)).alias("__chunk"))
            .groupBy("__chunk").applyInArrow(drain("l_orderkey"), schema=cnt)),
        "li_encode_noop": lambda: noop(encode_table(li, key="l_orderkey", n_chunks=n_chunks)),
        "li_encode_write": lambda: encode_table(li, key="l_orderkey", n_chunks=n_chunks)
            .write.partitionBy("chunk_id").mode("overwrite").parquet(f"{tmp}/lie"),
    }
    best = {k: float("inf") for k in qs}
    for _ in range(reps):
        for k, fn in qs.items():
            spark.sparkContext.setJobDescription(k)
            t0 = time.perf_counter()
            fn()
            best[k] = min(best[k], time.perf_counter() - t0)
            print(f"{k:18s} {time.perf_counter()-t0:6.2f}s", file=sys.stderr, flush=True)
    for k, v in best.items():
        print(f"BEST {k:18s} {v:6.2f}s")
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
