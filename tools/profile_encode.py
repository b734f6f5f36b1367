"""Standalone per-chunk cost profile of the encode/decode kernels (no Spark).

Reads real testdata parquet, slices a representative chunk, and times the
stages of _encode_columns_to_rows / decode_column_arrow one by one so
optimization effort goes where the wall time is (guide §1).
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from varint_simd_spark.codecs.base import arrow_tag, decode_column_arrow
from varint_simd_spark.operators.encode import (
    _encode_columns_to_rows,
    _ref_and_raw_bytes,
    _zone_map_dict,
)
from varint_simd_spark.codecs.choose import choose_codec_arrow
from varint_simd_spark.codecs.base import encode_column_arrow


def t(fn, reps=3):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def profile_table(path: str, name: str, n_rows: int, sort_col: str):
    tab = pq.read_table(path)
    tab = tab.slice(0, n_rows)
    tab = tab.take(pc.sort_indices(tab[sort_col]))
    tab = tab.combine_chunks()
    print(f"\n=== {name}: {tab.num_rows} rows x {tab.num_columns} cols, {tab.nbytes/1e6:.1f} MB arrow ===")

    total_enc, _ = t(lambda: _encode_columns_to_rows(tab, tab.column_names, {}, 0))
    print(f"  _encode_columns_to_rows total: {total_enc*1000:.1f} ms")

    enc_rows = _encode_columns_to_rows(tab, tab.column_names, {}, 0)

    per_col = {}
    for col in tab.column_names:
        arr = tab[col].combine_chunks()
        tag = arrow_tag(arr.type)
        tc, res = t(lambda a=arr: choose_codec_arrow(a))
        codec, reason, stats = res
        cache = (stats.get("_cache") or {})
        te, encres = t(lambda a=arr, c=codec, ca=cache: encode_column_arrow(a, c, cache=dict(ca) or None))
        tr, _ = t(lambda a=arr, g=tag: _ref_and_raw_bytes(a, g))
        tz, _ = t(lambda a=arr, g=tag: _zone_map_dict(a, g))
        _tag, payload, params = encres
        td, _ = t(lambda g=_tag, c=codec, p=payload, pr=params, n=len(arr): decode_column_arrow(g, c, p, pr, n))
        per_col[col] = (tag, codec, tc, te, tr, tz, td, len(payload))
    print(f"  {'col':14s} {'tag':6s} {'codec':16s} {'choose':>8s} {'encode':>8s} {'refbytes':>8s} {'zonemap':>8s} {'decode':>8s} {'KB':>8s}")
    for col, (tag, codec, tc, te, tr, tz, td, nb) in per_col.items():
        print(f"  {col:14s} {tag:6s} {codec:16s} {tc*1000:8.1f} {te*1000:8.1f} {tr*1000:8.1f} {tz*1000:8.1f} {td*1000:8.1f} {nb/1024:8.0f}")
    s = [sum(x[i] for x in per_col.values()) for i in (2, 3, 4, 5, 6)]
    print(f"  {'TOTAL':14s} {'':6s} {'':16s} {s[0]*1000:8.1f} {s[1]*1000:8.1f} {s[2]*1000:8.1f} {s[3]*1000:8.1f} {s[4]*1000:8.1f}")
    return tab


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    profile_table(f"{sf}/lineitem.parquet", "lineitem chunk(94k)", 94000, "l_orderkey")

    # web_pages: generate a synthetic chunk matching the bench generator
    from varint_simd_spark.sources.web_pages import generate_web_pages  # needs spark; skip
    # instead read documents table as a string-heavy proxy
    profile_table(f"{sf}/documents.parquet", "documents", 10**9, "doc_id")

    if "--cprofile" in sys.argv:
        tab = pq.read_table(f"{sf}/lineitem.parquet").slice(0, 94000)
        tab = tab.take(pc.sort_indices(tab["l_orderkey"])).combine_chunks()
        pr = cProfile.Profile()
        pr.enable()
        for _ in range(3):
            _encode_columns_to_rows(tab, tab.column_names, {}, 0)
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
        print(s.getvalue())


if __name__ == "__main__":
    main()
