"""Production job entrypoint — run with spark-submit:

    cd /root/repo && zip -qr /tmp/vss.zip varint_simd_spark
    spark-submit --master local[32] --py-files /tmp/vss.zip \
        tools/run_pipeline.py --input synthetic:100000 \
        --store /tmp/vss_store --n-chunks 128 --salted --verify

On a real cluster the same command with --master yarn/k8s and an Iceberg
warehouse config (varint_simd_spark.sources.checkpoint.ICEBERG_CONF) is
the deployment path the north rule describes.  The job is resumable:
re-running after a failure encodes only uncommitted chunks.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# spark-submit ships the package via --py-files; a direct `python
# tools/run_pipeline.py` run finds it relative to this file instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="parquet dir of web_pages, or synthetic:<n_rows>")
    p.add_argument("--store", required=True, help="encoded store root")
    p.add_argument("--n-chunks", type=int, default=128)
    p.add_argument("--key", default="url")
    p.add_argument("--salted", action="store_true",
                   help="host-locality chunking with hot-host salting")
    p.add_argument("--target-rows-per-chunk", type=int, default=50_000)
    p.add_argument("--verify", action="store_true",
                   help="decode the store and verify bit-identical text per url")
    args = p.parse_args()

    # imports deferred so --py-files distribution resolves them on executors
    from pyspark.sql import functions as F

    from varint_simd_spark.operators import chunk_metrics, decode_table
    from varint_simd_spark.sources.checkpoint import EncodedStore, encode_resumable
    from varint_simd_spark.sources.session import get_spark
    from varint_simd_spark.sources.web_pages import generate_web_pages

    spark = get_spark(app_name="vss_pipeline")
    spark.sparkContext.setLogLevel("WARN")

    if args.input.startswith("synthetic:"):
        n = int(args.input.split(":", 1)[1])
        df = generate_web_pages(spark, n, seed=42)
    else:
        df = spark.read.parquet(args.input)

    store = EncodedStore(spark, args.store)
    t0 = time.perf_counter()
    snapshot_id, n_encoded = encode_resumable(
        store, df, key=args.key, n_chunks=args.n_chunks,
        salted=args.salted, target_rows_per_chunk=args.target_rows_per_chunk,
    )
    wall = time.perf_counter() - t0

    metrics = chunk_metrics(store.read_encoded()).toPandas()
    report = {
        "snapshot_id": snapshot_id,
        "chunks_encoded": n_encoded,
        "encode_sec": round(wall, 2),
        "enc_bytes": int(metrics["enc_bytes"].sum()),
        "raw_bytes": int(metrics["raw_bytes"].sum()),
        "ref_bytes": int(metrics["ref_bytes"].sum()),
        "ratio_vs_ref": round(float(metrics["enc_bytes"].sum() / max(1, metrics["ref_bytes"].sum())), 4),
    }

    if args.verify:
        dec = decode_table(store.read_encoded())
        src_cnt = df.count()
        join = dec.select("url", F.col("text").alias("t2")).join(
            df.select("url", "text"), "url"
        )
        ok = join.filter(F.col("t2") == F.col("text")).count()
        report["verify_rows"] = src_cnt
        report["verify_text_identical"] = ok == src_cnt
        if ok != src_cnt:
            print(json.dumps(report))
            sys.exit(2)

    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
