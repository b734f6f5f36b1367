"""/verify driver-gate mirror: run queries() vs oracle_sql() via duckdb on
real testdata, comparing values by COLUMN NAME (the driver's semantics)."""

import sys

sys.path.insert(0, "/root/repo")
import duckdb

import __spark_entry__ as e
from varint_simd_spark.sources.session import get_spark

CHECK = [
    "auto_roundtrip_lineitem", "fsst_roundtrip_documents_text",
    "decode_aggregate_documents", "decode_aggregate_by_lang_documents",
    "filtered_decode_documents", "store_roundtrip_colocated",
    "bucketed_roundtrip_documents", "dedup_clusters_documents",
    "nulls_roundtrip_events", "rle_roundtrip_lineitem_flags",
    "for_bitpack_roundtrip_lineitem", "varint_roundtrip_orders_keys",
    "varint_zz_roundtrip_events_value", "delta_zz_roundtrip_events_ts",
    "delta_bitpack_roundtrip_events", "props_roundtrip_events",
    "streaming_encode_documents", "key_lookup_documents",
    "zone_map_prune_events", "filtered_in_between_documents",
    "dict_roundtrip_documents", "verify_roundtrip_documents",
]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    print("entry rows:", e.entry(spark).count())
    Q, O = e.queries(), e.oracle_sql()
    fails = 0
    for q in CHECK:
        df = Q[q](spark, sf)
        got_rows = df.collect()
        cols = df.columns
        oracle = con.sql(O[q])
        exp_cols = oracle.columns
        exp_rows = oracle.fetchall()
        # compare as name->value dicts (driver compares by name, not position)
        def norm(rows, names):
            return sorted(
                tuple(str(dict(zip(names, r))[c]) for c in sorted(names))
                for r in rows
            )
        a = norm([tuple(r) for r in got_rows], cols)
        b = norm(exp_rows, exp_cols)
        ok = set(cols) == set(exp_cols) and a == b
        print(("OK  " if ok else "FAIL"), q, f"({len(a)} rows)")
        if not ok:
            fails += 1
            print("  got:", a[:2])
            print("  exp:", b[:2])
    print("FAILS:", fails)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
