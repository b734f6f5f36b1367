import random
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
from pyspark.sql import functions as F

from varint_simd_spark.kernels.xxh64 import pmod, xxh64_bytes_bo, xxh64_int64
from varint_simd_spark.sources.session import get_spark

spark = get_spark(app_name="xxh", master="local[4]")
spark.sparkContext.setLogLevel("ERROR")
vals = [0, 1, -1, 42, 2**62, -(2**63), 123456789012345]
rows = spark.createDataFrame([(v,) for v in vals], "v long").select(
    "v", F.xxhash64("v").alias("h"), F.pmod(F.xxhash64("v"), F.lit(32)).alias("p")
).collect()
got = xxh64_int64(np.array(vals, dtype=np.int64))
gotp = pmod(got, 32)
print("int64 hash match:", all(int(g) == r["h"] for g, r in zip(got, rows)))
print("pmod match:", all(int(g) == r["p"] for g, r in zip(gotp, rows)))
random.seed(7)
strs = ["", "a", "ab", "abc", "abcd", "abcde", "https://host1.example.com/p/123456",
        "x" * 31, "y" * 32, "z" * 33, "w" * 100, "日本語テスト", " "]
strs += ["".join(random.choice("abcdefgh:/.") for _ in range(random.randint(0, 120)))
         for _ in range(200)]
rows = spark.createDataFrame([(s,) for s in strs], "s string").select(
    "s", F.xxhash64("s").alias("h")
).collect()
exp = {r["s"]: r["h"] for r in rows}
bts = [s.encode("utf-8") for s in strs]
lens = np.array([len(b) for b in bts], dtype=np.int64)
offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
blob = np.frombuffer(b"".join(bts), dtype=np.uint8)
got = xxh64_bytes_bo(blob, offs)
ok = all(int(g) == exp[s] for g, s in zip(got, strs))
print("string hash match:", ok)
if not ok:
    for g, s in zip(got, strs):
        if int(g) != exp[s]:
            print("MISMATCH", repr(s[:20]), len(s.encode()), int(g), exp[s])
            break
spark.stop()
