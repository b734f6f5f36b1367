"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — native ``zip_with``/``aggregate`` dot product
  (JVM-side), full scan + top-k; the correctness baseline, and
  DuckDB-mirrorable (list_cosine_similarity) for the oracle gate;
* LSH-bucketed ANN — random-hyperplane signatures (deterministic seeded
  pseudo-planes built from xxhash64 of (vec index, plane, seed) — no
  stored plane matrix, so the signature is a pure column expression),
  candidate generation by bucket equi-join, exact re-rank inside buckets.
  This is the 100 TB path: the self-join shuffles only bucket-colliding
  rows instead of the full cross product;
* embedding-cosine near-dup pairs for dedup pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame, query: list[float], k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Exact cosine top-k against one query vector (full scan + TakeOrdered
    — Spark's top-k never materializes a global sort)."""
    q = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
    return (
        df.select(
            F.col(id_col),
            cosine(F.col(vec_col).cast("array<double>"), q).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


def rp_signature(vec_col: str, n_planes: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane LSH signature as ONE long.

    Plane p's component for dimension i is a deterministic pseudo-random
    ±1 derived from xxhash64(i, p, seed) — the plane matrix never exists,
    the signature is a pure expression over the vector column."""
    v = F.col(vec_col)
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                v.cast("array<double>"),
                F.transform(
                    F.sequence(F.lit(0), F.size(v) - 1),
                    lambda i: F.when(
                        F.pmod(F.xxhash64(i, F.lit(p), F.lit(seed)), 2) == 0, 1.0
                    ).otherwise(-1.0),
                ),
                lambda x, s: x * s,
            ),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0))
    out = F.lit(0).cast("long")
    for b in bits:
        out = out.bitwiseOR(b)
    return out


def ann_topk_lsh(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    seed: int = 42,
    probe_hamming: int = 2,
) -> DataFrame:
    """ANN top-k: restrict the exact re-rank to vectors whose hyperplane
    signature is within hamming distance ``probe_hamming`` of the query's
    (multi-probe bucket search), then cosine-rank.  At scale the signature
    is precomputed/stored and the probe is a bucket equi-join; here it is a
    filter expression.  Recall/selectivity trades off via
    (n_planes, probe_hamming) — fewer planes or a wider probe => higher
    recall, more candidates."""
    # signature of the query vector via a 1-row Spark job (same xxhash64
    # planes as the data side — no Python reimplementation of the hash)
    spark = df.sparkSession
    qsig_row = spark.range(1).select(
        rp_signature_from_literal(query, n_planes, seed).alias("s")
    ).collect()[0]
    qsig = qsig_row["s"]

    sig = rp_signature(vec_col, n_planes, seed)
    cand = df.withColumn("__sig", sig).filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig))) <= probe_hamming
    )
    q = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
    return (
        cand.select(
            F.col(id_col),
            cosine(F.col(vec_col).cast("array<double>"), q).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


def rp_signature_from_literal(vec: list[float], n_planes: int, seed: int) -> Column:
    arr = F.array(*[F.lit(float(x)) for x in vec])
    out = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                arr,
                F.transform(
                    F.sequence(F.lit(0), F.lit(len(vec) - 1)),
                    lambda i: F.when(
                        F.pmod(F.xxhash64(i, F.lit(p), F.lit(seed)), 2) == 0, 1.0
                    ).otherwise(-1.0),
                ),
                lambda x, s: x * s,
            ),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        out = out.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
        )
    return out


def cosine_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    ``exact=True``: all-pairs cross join (small tables / oracle gate).
    ``exact=False``: LSH-bucketed — pairs must share their full
    hyperplane signature (bucket equi-join), then exact cosine filter;
    the 100 TB path."""
    base = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    if exact:
        a = base.withColumnRenamed(id_col, "id_a").withColumnRenamed("__v", "__va")
        b = base.withColumnRenamed(id_col, "id_b").withColumnRenamed("__v", "__vb")
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        sig = base.withColumn("__sig", rp_signature("__v", n_planes, seed))
        a = (
            sig.withColumnRenamed(id_col, "id_a")
            .withColumnRenamed("__v", "__va")
        )
        b = (
            sig.withColumnRenamed(id_col, "id_b")
            .withColumnRenamed("__v", "__vb")
        )
        pairs = a.join(b, "__sig").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
