"""Driver-contract queries for the training-data pipeline operators
(dedup / similarity / text analysis / multimodal) — SURVEY.md §2 extension
set.  Oracle-expressible ones get DuckDB SQL; hash-dependent ones are
rows-only."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import golden_pins as _golden
from .functions.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_allpairs,
    simhash_near_dups,
)
from .functions.multimodal import binary_meta, extract_features
from .functions.similarity import brute_force_topk, cosine_dup_pairs, ann_topk_lsh
from .functions.text import (
    bpe_token_count_sql_duckdb,
    lang_id,
    lang_id_sql_duckdb,
    quality_score,
    quality_score_sql_duckdb,
    shingle_fingerprint,
    simhash_df,
    stopword_ratio,
    stopword_ratio_sql_duckdb,
    token_count,
    token_count_sql_duckdb,
)

QUERY_VEC = [0.1 if i % 3 else -0.1 for i in range(64)]  # fixed ANN query
_QV_SQL = "[" + ", ".join(f"{x}::DOUBLE" for x in QUERY_VEC) + "]"


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_token_count(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )


def q_bpe_token_count(spark, sf_dir):
    from .functions.text import bpe_token_count

    return _docs(spark, sf_dir).select(
        "doc_id", bpe_token_count("text").cast("long").alias("n_bpe_tokens")
    )


def q_quality_score(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.round(quality_score("text"), 6).alias("quality"),
        F.round(stopword_ratio("text"), 6).alias("stopword_ratio"),
    )


def q_lang_id(spark, sf_dir):
    return _docs(spark, sf_dir).select("doc_id", lang_id("text").alias("lang_pred"))


def q_exact_dedup(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return exact_dedup(ev, "event_type", "event_id")


def q_ngram_jaccard_pairs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return (
        ngram_jaccard_allpairs(docs, "doc_id", "text", k=3)
        .filter(F.col("jaccard") >= 0.2)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def q_ngram_jaccard_pairs_lsh(spark, sf_dir):
    """The 100 TB n-gram dedup plan, graded against the SAME exact-SQL
    oracle as the all-pairs gate: banded MinHash-LSH candidates (bucket
    equi-join — only band-colliding rows shuffle, never the cross
    product), then exact word-3-gram jaccard verification of candidates
    only.  Green iff LSH recalls every qualifying pair (verified at
    sf0.001 and sf0.01; 16 bands x 2 rows, est threshold 0.05)."""
    from varint_simd_spark.functions.dedup import minhash_lsh_pairs, ngram_jaccard

    docs = _docs(spark, sf_dir)
    cand = minhash_lsh_pairs(
        docs, "doc_id", "text", n_hashes=32, n_bands=16, jaccard_threshold=0.05
    ).select("id_a", "id_b")
    return (
        ngram_jaccard(cand, docs, "doc_id", "text", k=3)
        .filter(F.col("jaccard") >= 0.2)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def q_cosine_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = brute_force_topk(emb, QUERY_VEC, k=10)
    return out.select("vec_id", F.round("cos", 6).alias("cos"))


def q_cosine_dup_pairs(spark, sf_dir):
    """Graded through the SCALE path (exact=False): multi-table LSH bucket
    join + exact cosine re-filter, against the all-pairs SQL oracle —
    green iff LSH recalls every pair above the threshold.  5 planes x 8
    tables is the recall-tuned config for this low threshold (0.5 cosine
    needs coarse buckets; a 0.95-threshold dedup would use more planes for
    selectivity).  Verified: recall 1.0 at sf0.001 and sf0.01."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (
        cosine_dup_pairs(emb, threshold=0.5, exact=False, n_planes=5, n_tables=8)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


# ---- rows-only (hash-dependent / synthetic-input) operators --------------


def q_minhash_lsh_dups(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    # seed near-duplicates so the operator has positives to find: docs
    # unioned with truncated copies of themselves
    seeded = docs.select("doc_id", "text").unionAll(
        docs.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        )
    )
    return minhash_lsh_pairs(seeded, "doc_id", "text", jaccard_threshold=0.5)


def q_minhash_lsh_dups_arrow(spark, sf_dir):
    """Arrow-batched minhash (the 100 TB path) over the same seeded input."""
    from .functions.minhash_arrow import minhash_lsh_pairs_arrow

    docs = _docs(spark, sf_dir)
    seeded = docs.select("doc_id", "text").unionAll(
        docs.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        )
    )
    return minhash_lsh_pairs_arrow(seeded, "doc_id", "text", jaccard_threshold=0.5)


def q_simhash_near_dups(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    seeded = docs.select("doc_id", "text").unionAll(
        docs.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" x")).alias("text"),
        )
    )
    return simhash_near_dups(seeded, "doc_id", "text", max_hamming=3)


def q_simhash_fingerprints(spark, sf_dir):
    return simhash_df(_docs(spark, sf_dir), "doc_id", "text")


def q_doc_fingerprints(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", shingle_fingerprint("text", k=8).alias("fingerprint")
    )


def q_ann_topk_lsh(spark, sf_dir):
    """Stored-index ANN: write the multi-table LSH index (partitioned by
    bucket), probe it — the scan prunes to probe buckets via
    PartitionFilters instead of computing signatures for every row."""
    import hashlib
    import os
    import tempfile

    from .functions.similarity import ann_topk_indexed, write_ann_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # stable per-(sf_dir) path (mode=overwrite) — no /tmp accumulation
    tag = hashlib.blake2b(f"{sf_dir}:{os.getpid()}".encode(), digest_size=6).hexdigest()
    path = f"{tempfile.gettempdir()}/vss_ann_{tag}/idx"
    write_ann_index(emb, path, n_planes=10, n_tables=6)
    idx = spark.read.parquet(path)
    out = ann_topk_indexed(idx, QUERY_VEC, k=10, n_planes=10, n_tables=6)
    return out.select("vec_id", F.round("cos", 6).alias("cos"))


def q_ivf_topk(spark, sf_dir):
    """IVF ANN (k-means coarse quantizer): write the cell-partitioned
    index + centroid sidecar, probe the 3 nearest cells, exact re-rank.
    Rows-only check (k-means is not DuckDB-expressible)."""
    import hashlib
    import os
    import tempfile

    from .functions.similarity import ivf_topk, read_ivf_centroids, write_ivf_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tag = hashlib.blake2b(f"{sf_dir}:{os.getpid()}".encode(), digest_size=6).hexdigest()
    path = f"{tempfile.gettempdir()}/vss_ivf_{tag}/idx"
    write_ivf_index(emb, path, n_cells=16)
    idx = spark.read.parquet(path)
    out = ivf_topk(idx, read_ivf_centroids(path), QUERY_VEC, k=10, nprobe=3)
    return out.select("vec_id", F.round("cos", 6).alias("cos"))


def _binary_meta_src_path() -> str:
    """Materialized (url, html) parquet for the binary_meta oracle: the
    Spark query writes it, the DuckDB oracle reads the same files — both
    sides then derive (n_bytes, format) independently from identical
    bytes.  pid-scoped (concurrent runs don't race)."""
    import os
    import tempfile

    return f"{tempfile.gettempdir()}/vss_binmeta_{os.getpid()}"


def q_binary_meta(spark, sf_dir):
    from .sources.web_pages import generate_web_pages

    path = _binary_meta_src_path()
    generate_web_pages(spark, 2000, seed=42).select("url", "html").write.mode(
        "overwrite"
    ).parquet(path)
    wp = spark.read.parquet(path)
    return binary_meta(wp, "html", "url").select(
        "url", F.col("n_bytes").cast("long").alias("n_bytes"), "format"
    )


def _binary_meta_oracle_sql() -> str:
    from .functions.multimodal import MAGIC

    case = "CASE"
    # mirror sniff_format: distinct prefixes, so match order is irrelevant
    for magic, fmt in MAGIC.items():
        case += f" WHEN starts_with(lower(hex(html)), '{magic}') THEN '{fmt}'"
    case += " ELSE 'unknown' END"
    return (
        f"SELECT url, CAST(octet_length(html) AS BIGINT) AS n_bytes, "
        f"{case} AS format "
        f"FROM read_parquet('{_binary_meta_src_path()}/*.parquet')"
    )


def q_multimodal_features(spark, sf_dir):
    """Feature extraction over the binary column; the graded projection
    flattens the feature vector into scalar columns (rounded) so the
    driver's canonicalizer can sort/hash it — arrays are not hashable."""
    from .sources.web_pages import generate_web_pages

    wp = generate_web_pages(spark, 2000, seed=42).withColumn(
        "page_id", F.xxhash64("url")
    )
    feats = extract_features(wp, "html", "page_id")
    return feats.select(
        "id",
        "format",
        "n_bytes",
        *[
            F.round(F.element_at("features", i + 1).cast("double"), 5).alias(f"f{i:02d}")
            for i in range(4)
        ],
        F.round(
            F.aggregate(
                F.col("features").cast("array<double>"),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            5,
        ).alias("feat_sum"),
    )


def q_resize_images(spark, sf_dir):
    """Multimodal resize stage (decode stubbed, plumbing real): graded
    projection hashes the pixel buffer (raw binary is not canonicalizer-
    friendly) and checks dims/sizes."""
    from .functions.multimodal import resize_images
    from .sources.web_pages import generate_web_pages

    wp = generate_web_pages(spark, 1000, seed=42).withColumn("page_id", F.xxhash64("url"))
    out = resize_images(wp, "html", "page_id", w=16, h=16)
    return out.select(
        "id", "width", "height",
        F.length("pixels").alias("n_pixels"),
        F.xxhash64("pixels").alias("pixels_hash"),
    )


def q_sample_frames(spark, sf_dir):
    """Multimodal frame-sampling stage (1-to-N exploding UDF shape)."""
    from .functions.multimodal import sample_frames
    from .sources.web_pages import generate_web_pages

    wp = generate_web_pages(spark, 500, seed=42).withColumn("page_id", F.xxhash64("url"))
    out = sample_frames(wp, "html", "page_id", n_frames=4)
    return out.select(
        "id", "frame_idx", "frame_offset",
        F.length("frame").alias("n_bytes"),
        F.xxhash64("frame").alias("frame_hash"),
    )


PIPELINE_QUERIES = {
    "token_count_documents": q_token_count,
    "bpe_token_count_documents": q_bpe_token_count,
    "quality_score_documents": q_quality_score,
    "lang_id_documents": q_lang_id,
    "exact_dedup_events_type": q_exact_dedup,
    "ngram_jaccard_pairs_documents": q_ngram_jaccard_pairs,
    "ngram_jaccard_pairs_lsh_documents": q_ngram_jaccard_pairs_lsh,
    "cosine_topk_embeddings": q_cosine_topk,
    "cosine_dup_pairs_embeddings": q_cosine_dup_pairs,
    "minhash_lsh_dups_documents": q_minhash_lsh_dups,
    "minhash_lsh_dups_arrow_documents": q_minhash_lsh_dups_arrow,
    "simhash_near_dups_documents": q_simhash_near_dups,
    "simhash_fingerprints_documents": q_simhash_fingerprints,
    "doc_fingerprints_documents": q_doc_fingerprints,
    "ann_topk_lsh_embeddings": q_ann_topk_lsh,
    "ivf_topk_embeddings": q_ivf_topk,
    "binary_meta_web_pages": q_binary_meta,
    "multimodal_features_web_pages": q_multimodal_features,
    "resize_images_web_pages": q_resize_images,
    "sample_frames_web_pages": q_sample_frames,
}

PIPELINE_ORACLES = {
    "token_count_documents": (
        f"SELECT doc_id, CAST({token_count_sql_duckdb('text')} AS BIGINT) AS n_tokens FROM documents"
    ),
    "bpe_token_count_documents": (
        f"SELECT doc_id, CAST({bpe_token_count_sql_duckdb('text')} AS BIGINT) "
        "AS n_bpe_tokens FROM documents"
    ),
    "quality_score_documents": (
        f"SELECT doc_id, round({quality_score_sql_duckdb('text')}, 6) AS quality, "
        f"round({stopword_ratio_sql_duckdb('text')}, 6) AS stopword_ratio FROM documents"
    ),
    "lang_id_documents": (
        f"SELECT doc_id, {lang_id_sql_duckdb('text')} AS lang_pred FROM documents"
    ),
    "exact_dedup_events_type": (
        "SELECT CAST(min(event_id) AS BIGINT) AS event_id, event_type, "
        "COUNT(*) AS dup_count FROM events GROUP BY event_type"
    ),
    "ngram_jaccard_pairs_documents": """
        WITH sh AS (
          SELECT doc_id, list_distinct([
            array_to_string(toks[i:i+2], ' ')
            FOR i IN range(1, greatest(len(toks) - 2, 1) + 1)
          ]) AS grams
          FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                FROM documents)
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
          AND CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
              / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.2
    """,
    "ngram_jaccard_pairs_lsh_documents": """
        WITH sh AS (
          SELECT doc_id, list_distinct([
            array_to_string(toks[i:i+2], ' ')
            FOR i IN range(1, greatest(len(toks) - 2, 1) + 1)
          ]) AS grams
          FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                FROM documents)
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
          AND CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
              / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.2
    """,
    "cosine_topk_embeddings": (
        f"SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], {_QV_SQL}), 6) AS cos "
        "FROM embeddings ORDER BY cos DESC, vec_id LIMIT 10"
    ),
    "cosine_dup_pairs_embeddings": (
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos "
        "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id "
        "AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.5"
    ),
    # independent derivation from the same materialized bytes (see
    # _binary_meta_oracle_sql) — graduates binary_meta from rows-only
    "binary_meta_web_pages": _binary_meta_oracle_sql(),
    # golden pins: xxhash64-based operators are not SQL-expressible but ARE
    # deterministic over the fixed corpus — the VALUES oracle verifies the
    # exact output values (tools/gen_golden_pins.py regenerates)
    "simhash_fingerprints_documents": _golden.SIMHASH_DOCS_SF001_SQL,
    "doc_fingerprints_documents": _golden.DOC_FP_SF001_SQL,
}
