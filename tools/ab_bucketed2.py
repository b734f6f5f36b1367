"""Interleaved A/B of encode_table_bucketed: JVM scan vs pyscan+numpy-XXH64."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from varint_simd_spark.operators.encode import encode_table_bucketed
    from varint_simd_spark.sources.session import get_spark

    spark = get_spark(app_name="ab_bkt", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    in10 = f"{tempfile.gettempdir()}/vss_bench_10m_in"
    tmp = tempfile.mkdtemp(prefix="vss_abb2_")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 << 20))
    wp10 = spark.read.parquet(in10)
    best = {"jvm": float("inf"), "pyscan": float("inf")}
    for _ in range(reps):
        for mode in ("jvm", "pyscan"):
            os.environ["VSS_PYSCAN"] = "0" if mode == "jvm" else "1"
            spark.sparkContext.setJobDescription(f"bucketed:{mode}")
            t0 = time.perf_counter()
            encode_table_bucketed(wp10, key="url", n_buckets=32) \
                .repartition("bucket").write.partitionBy("bucket") \
                .mode("overwrite").parquet(f"{tmp}/b")
            dt = time.perf_counter() - t0
            best[mode] = min(best[mode], dt)
            print(f"bucketed {mode:7s} {dt:6.2f}s", file=sys.stderr, flush=True)
    print(f"BEST jvm {best['jvm']:.2f}  pyscan {best['pyscan']:.2f}  ratio {best['pyscan']/best['jvm']:.2f}")
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
