"""Decomposition of encode_table_bucketed at 10M (guide §1): stage costs
scan+IPC / sort+slice / encode kernels / fragment shuffle+write, interleaved
best-of-N to ride out tenant load."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import functions as F
from pyspark.sql import types as T


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from varint_simd_spark.operators.encode import encode_table_bucketed
    from varint_simd_spark.sources.session import get_spark

    spark = get_spark(app_name="ab_bucketed", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    in10 = f"{tempfile.gettempdir()}/vss_bench_10m_in"
    tmp = tempfile.mkdtemp(prefix="vss_abb_")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 << 20))
    wp10 = spark.read.parquet(in10)
    key, n_buckets = "url", 32
    columns = wp10.columns
    bucket_col = F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).alias("__bucket")
    cnt_schema = T.StructType([T.StructField("n", T.LongType())])

    def sort_slice_only(batches):
        batches = list(batches)
        if not batches:
            return
        table = pa.Table.from_batches(batches)
        table = table.take(pc.sort_indices(table, [("__bucket", "ascending"), (key, "ascending")]))
        bv = table["__bucket"].to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.flatnonzero(bv[1:] != bv[:-1]) + 1, [len(bv)]])
        n = 0
        for a, b in zip(starts[:-1], starts[1:]):
            frag = table.slice(a, b - a)
            n += frag.num_rows
        yield pa.RecordBatch.from_arrays([pa.array([n], type=pa.int64())], names=["n"])

    noop = lambda df: df.write.format("noop").mode("overwrite").save()
    qs = {
        "scan_sort_slice": lambda: noop(
            wp10.select(*columns, bucket_col).mapInArrow(sort_slice_only, schema=cnt_schema)),
        "encode_noop": lambda: noop(encode_table_bucketed(wp10, key=key, n_buckets=n_buckets)),
        "encode_shuffle_write": lambda: encode_table_bucketed(wp10, key=key, n_buckets=n_buckets)
            .repartition("bucket").write.partitionBy("bucket")
            .mode("overwrite").parquet(f"{tmp}/b"),
    }
    best = {k: float("inf") for k in qs}
    for _ in range(reps):
        for k, fn in qs.items():
            spark.sparkContext.setJobDescription(k)
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best[k] = min(best[k], dt)
            print(f"{k:22s} {dt:6.2f}s", file=sys.stderr, flush=True)
    for k, v in best.items():
        print(f"BEST {k:22s} {v:6.2f}s")
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
