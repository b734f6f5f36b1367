import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from varint_simd_spark.kernels.xxh64 import pmod, xxh64_int64
from varint_simd_spark.operators.encode import _encode_columns_to_rows

t0 = time.perf_counter()
tab = pq.read_table("/root/testdata/sf1.0/lineitem.parquet")
print(f"read sf1.0 lineitem: {time.perf_counter()-t0:.2f}s {tab.num_rows} rows")
# simulate ONE split of ~188k rows
split = tab.slice(0, 188000).combine_chunks()
cols = split.column_names
n_chunks = 64

t0 = time.perf_counter()
karr = split["l_orderkey"].combine_chunks()
h = xxh64_int64(karr.cast(pa.int64()).to_numpy(zero_copy_only=False))
code = pmod(h, n_chunks)
print(f"hash: {time.perf_counter()-t0:.3f}s")
t0 = time.perf_counter()
order = np.argsort(code, kind="stable")
split2 = split.take(pa.array(order))
cv = code[order]
starts = np.concatenate([[0], np.flatnonzero(cv[1:] != cv[:-1]) + 1, [len(cv)]])
print(f"sort+take: {time.perf_counter()-t0:.3f}s  fragments={len(starts)-1}")
t0 = time.perf_counter()
encs = []
for a, b in zip(starts[:-1], starts[1:]):
    frag = split2.slice(a, b - a)
    encs.append(_encode_columns_to_rows(frag, cols, {}, int(cv[a])))
dt = time.perf_counter() - t0
print(f"fragment encode: {dt:.3f}s ({(len(starts)-1)} frags, {dt/(len(starts)-1)*1000:.1f}ms each)")
# per-fragment breakdown on one fragment
frag = split2.slice(starts[0], starts[1] - starts[0])
from varint_simd_spark.codecs.choose import choose_codec_arrow
from varint_simd_spark.codecs.base import encode_column_arrow
import cProfile, pstats, io
pr = cProfile.Profile(); pr.enable()
for a, b in zip(starts[:20], starts[1:21]):
    _encode_columns_to_rows(split2.slice(a, b - a), cols, {}, 0)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(15)
print(s.getvalue())
