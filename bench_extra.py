"""Decomposition benchmarks (guide §1.4): isolate scan / IPC-in / kernel /
IPC-out / write costs of the expensive 10M-page queries with noop sinks.
Supplementary evidence for OPTIMIZATION_r06.md — bench.py stays the frozen
measurement harness.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyarrow as pa


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from varint_simd_spark.operators import column_meta, decode_table_colocated
    from varint_simd_spark.operators.encode import (
        ENCODED_SCHEMA,
        encode_table_per_split,
        decode_aggregate,
    )
    from varint_simd_spark.sources.session import get_spark

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    res = {}

    def timed(name, fn, reps=2):
        best = float("inf")
        for _ in range(reps):
            sc.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        res[name] = round(best, 3)
        log(f"{name}: {best:.2f}s")

    noop = lambda df: df.write.format("noop").mode("overwrite").save()

    in10 = f"{tempfile.gettempdir()}/vss_bench_10m_in"
    if not os.path.isdir(in10):
        log("10M input missing; run bench.py once first")
        return
    tmp = tempfile.mkdtemp(prefix="vss_bx_")

    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 << 20))
    wp10 = spark.read.parquet(in10)

    # --- encode_per_split decomposition ---------------------------------
    # 1) pure scan + JVM-side consume (no python)
    timed("scan_only_native", lambda: noop(wp10))
    # 2) scan + Arrow IPC to python + discard (no kernel, tiny IPC-out)
    empty_schema = T.StructType([T.StructField("n", T.LongType())])

    def passthrough(it):
        n = 0
        for b in it:
            n += b.num_rows
        yield pa.RecordBatch.from_arrays([pa.array([n], type=pa.int64())], names=["n"])

    timed("scan_ipc_in", lambda: noop(wp10.mapInArrow(passthrough, schema=empty_schema)))
    # 3) full per-split encode, noop sink (scan + IPC-in + kernel + tiny out)
    timed("encode_per_split_noop", lambda: noop(encode_table_per_split(wp10, key="url")))
    # 4) full per-split encode with the real partitioned parquet write
    timed("encode_per_split_write", lambda: encode_table_per_split(wp10, key="url")
          .write.partitionBy("chunk_id").mode("overwrite").parquet(f"{tmp}/enc"))

    # --- decode decomposition -------------------------------------------
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))
    enc10 = spark.read.parquet(f"{tmp}/enc")
    meta10 = column_meta(enc10)
    # 1) scan the encoded store only (JVM)
    timed("enc_scan_native", lambda: noop(enc10))
    # 2) scan + IPC-in of encoded rows + discard
    timed("enc_scan_ipc_in", lambda: noop(enc10.mapInArrow(passthrough, schema=empty_schema)))
    # 3) decode kernels but emit only row counts (no IPC-out of decoded data)
    from varint_simd_spark.operators.encode import _iter_enc_rows
    import json as _json
    from varint_simd_spark.codecs.base import decode_column_arrow

    def decode_discard(batches):
        import zlib
        pending, counts = {}, {}
        tags = {r["column"]: r["dtype"] for r in meta10}
        ncols = len(tags)
        total = 0
        for batch in batches:
            for name, codec, payload, params, crc, cid, nv in _iter_enc_rows(batch):
                pending.setdefault(cid, {})[name] = (codec, payload, _json.loads(params))
                counts[cid] = nv
                if len(pending[cid]) == ncols:
                    cols = pending.pop(cid)
                    n = counts.pop(cid)
                    for c, (codec_, payload_, params_) in cols.items():
                        arr = decode_column_arrow(tags[c], codec_, payload_, params_, n)
                        total += len(arr)
        yield pa.RecordBatch.from_arrays([pa.array([total], type=pa.int64())], names=["n"])

    timed("decode_kernel_only", lambda: noop(enc10.mapInArrow(decode_discard, schema=empty_schema)))
    # 4) full decode, noop sink (kernels + IPC-out of all columns)
    timed("decode_full_noop", lambda: noop(
        decode_table_colocated(enc10, meta=meta10, check_layout=False)))
    # 5) the bench's exact decode query (agg + collect)
    timed("decode_full_agg", lambda: decode_table_colocated(
        enc10, meta=meta10, check_layout=False).agg(F.sum(F.length("text"))).collect())
    # 6) agg pushdown decode path
    timed("decode_agg_pushdown", lambda: decode_aggregate(enc10, use_stats=False).collect())

    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
