"""Interleaved A/B: JVM scan vs pyscan fast path, same process, best-of-N.

Tenant load on this box skews serial comparisons (BASELINE.md); alternating
the two configs inside one session makes noise hit both equally.
Usage: python tools/ab_pyscan.py [n_pages] [reps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from varint_simd_spark.operators import column_meta, decode_table_colocated
    from varint_simd_spark.operators.encode import (
        encode_table_per_split,
        decode_aggregate,
    )
    from varint_simd_spark.sources.session import get_spark

    spark = get_spark(app_name="ab_pyscan", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")

    in10 = f"{tempfile.gettempdir()}/vss_bench_10m_in"
    tmp = tempfile.mkdtemp(prefix="vss_ab_")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 << 20))
    wp10 = spark.read.parquet(in10)

    # one warm encode to build the store (also warms page cache)
    os.environ["VSS_PYSCAN"] = "0"
    encode_table_per_split(wp10, key="url").write.partitionBy("chunk_id") \
        .mode("overwrite").parquet(f"{tmp}/enc")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))
    enc10 = spark.read.parquet(f"{tmp}/enc")
    meta10 = column_meta(enc10)

    def q_decode():
        decode_table_colocated(enc10, meta=meta10, check_layout=False) \
            .agg(F.sum(F.length("text"))).collect()

    def q_agg():
        decode_aggregate(enc10, use_stats=False).collect()

    def q_encode():
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 << 20))
        encode_table_per_split(wp10, key="url").write.partitionBy("chunk_id") \
            .mode("overwrite").parquet(f"{tmp}/enc2")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))

    results: dict[str, dict[str, float]] = {}
    for name, fn in [("decode", q_decode), ("agg_pushdown", q_agg), ("encode_per_split", q_encode)]:
        results[name] = {"jvm": float("inf"), "pyscan": float("inf")}
        for _ in range(n_reps):
            for mode in ("jvm", "pyscan"):
                os.environ["VSS_PYSCAN"] = "0" if mode == "jvm" else "1"
                spark.sparkContext.setJobDescription(f"{name}:{mode}")
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                results[name][mode] = min(results[name][mode], dt)
                print(f"{name:18s} {mode:7s} {dt:6.2f}s", file=sys.stderr, flush=True)
        a, b = results[name]["jvm"], results[name]["pyscan"]
        print(f"BEST {name:18s} jvm {a:6.2f}  pyscan {b:6.2f}  ratio {b/a:.2f}",
              flush=True)

    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
