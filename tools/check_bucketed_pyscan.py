import os
import shutil
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from varint_simd_spark.operators import decode_table_colocated, encode_table_bucketed, lookup_by_key
from varint_simd_spark.sources.session import get_spark

spark = get_spark(app_name="bkt", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")
root = "/tmp/bkt_pyscan_test"
shutil.rmtree(root, ignore_errors=True)
df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
df.write.parquet(f"{root}/in")
src = spark.read.parquet(f"{root}/in")

stores = {}
for mode in ("0", "1"):
    os.environ["VSS_PYSCAN"] = mode
    enc = encode_table_bucketed(src, key="doc_id", n_buckets=8)
    enc.repartition("bucket").write.partitionBy("bucket").parquet(f"{root}/store{mode}")
    stores[mode] = spark.read.parquet(f"{root}/store{mode}")

os.environ["VSS_PYSCAN"] = "1"
# bucket membership must be identical (bucket = pmod(xxhash64(doc_id), 8))
a = sorted([tuple(r) for r in stores["0"].select("column", "n_values", "bucket", "crc32").collect()])
b = sorted([tuple(r) for r in stores["1"].select("column", "n_values", "bucket", "crc32").collect()])
print("bucket/crc rows identical:", a == b, len(a))
orig = sorted([tuple(r) for r in df.collect()])
got = sorted([tuple(r) for r in decode_table_colocated(stores["1"]).drop("__chunk").collect()])
print("pyscan bucketed roundtrip:", orig == got)
lk = lookup_by_key(stores["1"], "doc_id", 137, n_buckets=8).collect()
print("lookup:", len(lk) == 1 and lk[0]["doc_id"] == 137)

# string key + null key handling
df2 = df.withColumn("skey", F.when(F.col("doc_id") % 17 == 0, None).otherwise(F.concat(F.lit("k"), F.col("doc_id").cast("string"))))
df2.write.parquet(f"{root}/in2")
src2 = spark.read.parquet(f"{root}/in2")
for mode in ("0", "1"):
    os.environ["VSS_PYSCAN"] = mode
    enc = encode_table_bucketed(src2, key="skey", n_buckets=8)
    enc.repartition("bucket").write.partitionBy("bucket").parquet(f"{root}/s2{mode}")
x = sorted([tuple(r) for r in spark.read.parquet(f"{root}/s20").select("column","n_values","bucket","crc32").collect()])
y = sorted([tuple(r) for r in spark.read.parquet(f"{root}/s21").select("column","n_values","bucket","crc32").collect()])
print("string+null key buckets identical:", x == y, len(x))
spark.stop()
