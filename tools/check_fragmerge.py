import os
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from varint_simd_spark.operators import decode_table, encode_table
from varint_simd_spark.operators.pyscan import byte_array_fraction, parquet_scan_info
from varint_simd_spark.sources.session import get_spark

spark = get_spark(app_name="fragmerge", master="local[8]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.01"

for table, key in [("lineitem", "l_orderkey"), ("orders", "o_orderkey"), ("events", "event_id")]:
    df = spark.read.parquet(f"{sf}/{table}.parquet")
    scan = parquet_scan_info(df)
    print(f"{table}: byte_array_fraction={byte_array_fraction(scan[0]):.3f}")

li = spark.read.parquet(f"{sf}/lineitem.parquet")
os.environ["VSS_PYSCAN"] = "0"
enc_jvm = encode_table(li, key="l_orderkey", n_chunks=8)
rows_jvm = {(r["chunk_id"], r["column"]): (r["n_values"], r["dtype"]) for r in enc_jvm.collect()}
dec_jvm = sorted(tuple(r) for r in decode_table(enc_jvm).drop("__chunk").collect())
os.environ["VSS_PYSCAN"] = "1"
enc_fm = encode_table(li, key="l_orderkey", n_chunks=8)
got = enc_fm.collect()
rows_fm = {(r["chunk_id"], r["column"]): (r["n_values"], r["dtype"]) for r in got}
print("chunk/column/n_values/dtype identical:", rows_jvm == rows_fm, len(rows_fm))
print("ref bound holds:", all(r["enc_bytes"] <= r["ref_bytes"] and r["enc_bytes"] > 0 for r in got))
dec_fm = sorted(tuple(r) for r in decode_table(enc_fm).drop("__chunk").collect())
print("decoded rows identical:", dec_jvm == dec_fm, len(dec_fm))

# forced codecs + nulls through the fragment path (events is int-heavy?)
ev = spark.read.parquet(f"{sf}/events.parquet")
df2 = ev.select("event_id", F.when(F.col("value") > 0.5, F.col("value")).alias("v_nullable"))
# df2 is not a bare scan (projection) -> row path; test forced codecs on lineitem instead
enc_f = encode_table(li, key="l_orderkey", n_chunks=8,
                     codecs={"l_orderkey": "for_bitpack", "l_quantity": "raw64"})
cc = {r["column"]: r["codec"] for r in enc_f.collect() if r["column"] in ("l_orderkey", "l_quantity")}
print("forced codecs respected:", cc == {"l_orderkey": "for_bitpack", "l_quantity": "raw64"})
dec_f = sorted(tuple(r) for r in decode_table(enc_f).drop("__chunk").collect())
print("forced roundtrip identical:", dec_f == dec_jvm)

# grouped stats through the fragment path
from varint_simd_spark.operators.encode import decode_aggregate
docs_like = li.select("l_orderkey", "l_linenumber", "l_returnflag")
# need a bare scan: write + read
import shutil
root = "/tmp/fragmerge_t"
shutil.rmtree(root, ignore_errors=True)
docs_like.write.parquet(f"{root}/in")
src = spark.read.parquet(f"{root}/in")
print("frac of int subset:", byte_array_fraction(parquet_scan_info(src)[0]))
enc_g = encode_table(src, key="l_orderkey", n_chunks=8, stats_group_by="l_returnflag")
a = sorted(tuple(r) for r in decode_aggregate(enc_g, group_by="l_returnflag").collect())
os.environ["VSS_PYSCAN"] = "0"
enc_g2 = encode_table(src, key="l_orderkey", n_chunks=8, stats_group_by="l_returnflag")
b = sorted(tuple(r) for r in decode_aggregate(enc_g2, group_by="l_returnflag").collect())
print("grouped stats identical:", a == b)
spark.stop()
