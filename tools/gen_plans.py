"""Capture .explain('formatted') for every bench query shape into
plans/r06/<query>_{before,after}.txt.  Run from the repo whose code should
produce the plans: `python tools/gen_plans.py <suffix> <outdir>`."""

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def main():
    suffix = sys.argv[1]
    outdir = sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    from varint_simd_spark.operators import (
        column_meta,
        decode_table_colocated,
        encode_table,
        encode_table_bucketed,
    )
    from varint_simd_spark.operators.encode import (
        decode_aggregate,
        encode_table_per_split,
    )
    from varint_simd_spark.sources.session import get_spark
    from varint_simd_spark.sources.web_pages import generate_web_pages

    spark = get_spark(app_name="plans", master="local[8]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="vss_plans_")
    wp = generate_web_pages(spark, 50_000, seed=42)
    wp.write.option("maxRecordsPerFile", 10_000).parquet(f"{tmp}/wp")
    wp = spark.read.parquet(f"{tmp}/wp")
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")

    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    def cap(name, df):
        p = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(p, "w") as f:
            f.write(df._jdf.queryExecution().explainString(jmode))
        print("wrote", p)

    cap("encode_web_pages", encode_table(wp, key="url", n_chunks=64))
    cap("encode_lineitem", encode_table(li, key="l_orderkey", n_chunks=64))
    # sf1.0 lineitem (6 row groups): the shape where the fragment-merge
    # topology engages (integer-dominated + parallelizable python scan)
    li1 = spark.read.parquet("/root/testdata/sf1.0/lineitem.parquet")
    cap("encode_lineitem_sf1", encode_table(li1, key="l_orderkey", n_chunks=64))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 << 20))
    cap("encode_web_pages_per_split", encode_table_per_split(wp, key="url"))
    cap("encode_web_pages_bucketed",
        encode_table_bucketed(wp, key="url", n_buckets=32).repartition("bucket"))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))

    encode_table(wp, key="url", n_chunks=64).write.partitionBy("chunk_id") \
        .mode("overwrite").parquet(f"{tmp}/enc")
    enc = spark.read.parquet(f"{tmp}/enc")
    meta = column_meta(enc)
    cap("decode_web_pages",
        decode_table_colocated(enc, meta=meta, check_layout=False)
        .agg(F.sum(F.length("text"))))
    cap("decode_web_pages_pruned",
        decode_table_colocated(enc, meta=meta, columns=["text"], check_layout=False)
        .agg(F.sum(F.length("text"))))
    cap("decode_web_pages_filtered",
        decode_table_colocated(enc, meta=meta, columns=["url", "text"],
                               where=[("lang", "==", "de")], check_layout=False)
        .agg(F.sum(F.length("text"))))
    cap("decode_web_pages_agg_pushdown", decode_aggregate(enc, use_stats=False))
    # grouped decode-path aggregate (the use_stats=False grouped tier)
    cap("decode_agg_grouped_decode_path",
        decode_aggregate(enc, columns=["url", "text"], group_by="lang",
                         use_stats=False))
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
