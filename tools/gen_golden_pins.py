"""Regenerate varint_simd_spark/golden_pins.py.

The simhash / doc-fingerprint / minhash / ANN / IVF operators are
xxhash64- or float-reduction-based and therefore not expressible in DuckDB
SQL — but they ARE deterministic functions of their fixed inputs.  This
tool computes them once and emits a VALUES-table oracle ("golden pin"):
the driver's side-by-side comparison then verifies cross-run/cross-process
determinism and the exact output values, rather than recording a weaker
rows-only check.

Two pin classes:
* corpus pins (documents/embeddings tables) — valid ONLY at the sf0.01
  grading scale; each carries a cardinality GUARD that raises a
  descriptive DuckDB error at any other scale instead of a silent false
  failure;
* generator pins (fixed-seed web_pages corpus) — scale-independent, no
  guard needed.

Rerun after any intentional semantics change:  python tools/gen_golden_pins.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from varint_simd_spark.sources.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "varint_simd_spark", "golden_pins.py")


# content fingerprint per corpus table: row counts collide across scales
# (sf0.001 and sf0.01 both have 500 rows with different contents), so the
# guard must hash values, not count them
FINGERPRINT_SQL = {
    "documents": "sum(hash(doc_id::VARCHAR || '|' || text))",
    "embeddings": "sum(hash(vec_id::VARCHAR || '|' || embedding::VARCHAR))",
}


def values_sql(rows: list[tuple], cols: str, guard: tuple[str, int] | None = None) -> str:
    def lit(v):
        if isinstance(v, float):
            return f"CAST({v!r} AS DOUBLE)"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if v is None:
            return "NULL"
        return str(v)

    body = ",\n".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    sql = f"SELECT t.* FROM (VALUES\n{body}\n) AS t({cols})"
    if guard is not None:
        # WHERE, not an unused cross join: the optimizer prunes a joined
        # 1-row guard whose columns are never referenced, but a filter
        # subquery must evaluate
        tbl, fp = guard
        sql += (
            f" WHERE (SELECT CASE WHEN (SELECT {FINGERPRINT_SQL[tbl]} FROM {tbl}) "
            f"= {fp} THEN true ELSE error('golden pin guard mismatch for {tbl}: "
            "different corpus scale, OR a duckdb upgrade changed hash(); "
            "regenerate with tools/gen_golden_pins.py') END)"
        )
    return sql


def main() -> None:
    from varint_simd_spark.functions.text import shingle_fingerprint, simhash_df

    import duckdb

    con = duckdb.connect()
    fps = {
        t: con.execute(
            f"SELECT {FINGERPRINT_SQL[t]} FROM '{SF_DIR}/{t}.parquet'"
        ).fetchone()[0]
        for t in FINGERPRINT_SQL
    }
    DOCS, EMB = ("documents", fps["documents"]), ("embeddings", fps["embeddings"])

    spark = get_spark(app_name="gen_golden_pins", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    sh = [(r["doc_id"], r["simhash"])
          for r in simhash_df(docs, "doc_id", "text").orderBy("doc_id").collect()]
    fp = [(r["doc_id"], r["fingerprint"])
          for r in docs.select("doc_id", shingle_fingerprint("text", k=8)
                               .alias("fingerprint")).orderBy("doc_id").collect()]
    # the graded near-dup queries themselves (seeded-input variants):
    # outputs are deterministic (xxhash64 + exact k/32 fractions)
    from varint_simd_spark.driver_queries_pipeline import (
        q_ann_topk_lsh,
        q_ivf_topk,
        q_minhash_lsh_dups,
        q_minhash_lsh_dups_arrow,
        q_multimodal_features,
        q_multimodal_stages,
        q_simhash_near_dups,
    )

    from varint_simd_spark.driver_queries_pipeline import _cluster_seed_pairs

    mh = [(r["id_a"], r["id_b"], r["est_jaccard"])
          for r in q_minhash_lsh_dups(spark, SF_DIR).orderBy("id_a", "id_b").collect()]
    # seeded LSH pair set feeding the dedup_clusters query — the cluster
    # oracle derives components from these edges via a recursive CTE
    dcp = [(r["id_a"], r["id_b"])
           for r in _cluster_seed_pairs(spark, SF_DIR).orderBy("id_a", "id_b").collect()]
    mha = [(r["id_a"], r["id_b"], r["est_jaccard"])
           for r in q_minhash_lsh_dups_arrow(spark, SF_DIR).orderBy("id_a", "id_b").collect()]
    sn = [(r["id_a"], r["id_b"], r["hamming"])
          for r in q_simhash_near_dups(spark, SF_DIR).orderBy("id_a", "id_b").collect()]
    # stored-index LSH ANN + quantized-centroid IVF: deterministic (seeded
    # xxhash64 hyperplanes / 1e-6-rounded canonical centroids, exact
    # double-precision re-rank, vec_id tiebreak)
    ann = [(r["vec_id"], r["cos"]) for r in q_ann_topk_lsh(spark, SF_DIR).collect()]
    ivf = [(r["vec_id"], r["cos"]) for r in q_ivf_topk(spark, SF_DIR).collect()]
    # fixed-seed web_pages corpus: scale-independent pins (no guard)
    feat = [tuple(r) for r in q_multimodal_features(spark, SF_DIR)
            .orderBy("id").collect()]
    stages = [tuple(r) for r in q_multimodal_stages(spark, SF_DIR)
              .orderBy("stage", "id", "idx").collect()]
    spark.stop()

    pins = [
        ("SIMHASH_DOCS_SF001_SQL", sh, "doc_id, simhash", DOCS),
        ("DOC_FP_SF001_SQL", fp, "doc_id, fingerprint", DOCS),
        ("MINHASH_PAIRS_SF001_SQL", mh, "id_a, id_b, est_jaccard", DOCS),
        ("DEDUP_PAIRS_SF001_SQL", dcp, "id_a, id_b", DOCS),
        ("MINHASH_PAIRS_ARROW_SF001_SQL", mha, "id_a, id_b, est_jaccard", DOCS),
        ("SIMHASH_PAIRS_SF001_SQL", sn, "id_a, id_b, hamming", DOCS),
        ("ANN_TOPK_SF001_SQL", ann, "vec_id, cos", EMB),
        ("IVF_TOPK_SF001_SQL", ivf, "vec_id, cos", EMB),
        ("MULTIMODAL_FEATURES_SQL", feat,
         "id, format, n_bytes, f00, f01, f02, f03, feat_sum", None),
        ("MULTIMODAL_STAGES_SQL", stages,
         "stage, id, idx, meta, n_bytes, payload_hash", None),
    ]
    with open(OUT, "w") as f:
        f.write('"""GENERATED by tools/gen_golden_pins.py — do not hand-edit.\n\n'
                "Golden-pin oracles for hash/float-reduction operators:\n"
                "deterministic expected outputs emitted as DuckDB VALUES tables.\n"
                "Corpus pins are guarded to the sf0.01 grading scale; web_pages\n"
                "generator pins are scale-independent.\n"
                '"""\n\n')
        for name, rows, cols, guard in pins:
            f.write(f"{name} = '''\\\n" + values_sql(rows, cols, guard) + "'''\n\n")
    print(f"wrote {OUT}: " + ", ".join(f"{len(r)} {n.split('_SQL')[0].lower()}"
                                       for n, r, _, _ in pins))


if __name__ == "__main__":
    main()
