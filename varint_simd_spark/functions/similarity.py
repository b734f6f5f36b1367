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


def build_ann_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """The ANN index relation: one row per (vector, hash table) with the
    table's bucket signature — standard multi-table LSH (recall compounds
    across independent tables: a true neighbor is found if ANY table
    buckets it with the query).  Table t's planes are seeded ``seed + t``.

    Persist with :func:`write_ann_index` so queries prune to probe buckets.
    Storage is n_tables x the base table; at very large scale store only
    (id, __table, __sig) and join back to the base table for the re-rank."""
    tables = F.explode(F.array(*[F.lit(t) for t in range(n_tables)])).alias("__table")
    base = df.select(F.col(id_col), F.col(vec_col), tables)
    sig = F.lit(0).cast("long")
    for t in range(n_tables):
        sig = F.when(
            F.col("__table") == t, rp_signature(vec_col, n_planes, seed + t)
        ).otherwise(sig)
    return base.withColumn("__sig", sig)


def write_ann_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 42,
) -> None:
    """Persist the ANN index partitioned by (table, signature bucket): a
    probe (``(__table, __sig) IN ...``) becomes a parquet PartitionFilter —
    only the probed buckets' files are ever read.  This is the 100 TB query
    path: query cost is O(probed buckets), not O(table).

    The pre-write repartition colocates each bucket into one task so the
    file count is O(buckets), not O(tasks x buckets)."""
    build_ann_index(df, vec_col, id_col, n_planes, n_tables, seed).repartition(
        "__table", "__sig"
    ).write.partitionBy("__table", "__sig").mode("overwrite").parquet(path)


def probe_signatures(qsig: int, n_planes: int, probe_hamming: int) -> list[int]:
    """Multi-probe expansion: every signature within hamming distance
    ``probe_hamming`` of the query's (sum of C(n_planes, d) buckets)."""
    from itertools import combinations

    probes = []
    for d in range(probe_hamming + 1):
        for bits in combinations(range(n_planes), d):
            s = qsig
            for b in bits:
                s ^= 1 << b
            probes.append(s)
    return probes


def query_signatures(spark, query: list[float], n_planes: int, n_tables: int, seed: int) -> list[int]:
    """Per-table signatures of the query vector via ONE tiny Spark job
    (same xxhash64 planes as the data side — no Python reimplementation of
    the hash)."""
    row = spark.range(1).select(
        *[
            rp_signature_from_literal(query, n_planes, seed + t).alias(f"s{t}")
            for t in range(n_tables)
        ]
    ).collect()[0]
    return [row[f"s{t}"] for t in range(n_tables)]


def ann_topk_indexed(
    index: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k over a stored index (:func:`write_ann_index` layout):
    enumerate each table's multi-probe bucket set driver-side (tiny —
    n_tables x C(n_planes, <=probe_hamming) ints), prune the index scan to
    those buckets (the OR-of-IN predicate reaches parquet as a
    PartitionFilter), dedupe candidates across tables, exact cosine
    re-rank.  Recall/selectivity trades off via (n_tables, n_planes,
    probe_hamming): more tables or a wider probe => higher recall, more
    candidates."""
    spark = index.sparkSession
    qsigs = query_signatures(spark, query, n_planes, n_tables, seed)
    # A literal OR-of-IN predicate is deliberately used at EVERY probe-set
    # size: it prunes the partitioned scan STATICALLY (PartitionFilters at
    # plan time), and Catalyst converts long IN lists to O(1) InSet.  The
    # alternative — broadcast semi-join against a probe DataFrame — was
    # measured NOT to trigger dynamic partition pruning on an in-memory
    # build side (no Filter-over-scan on the build side), i.e. it scans
    # every bucket.  Probe-set size is bounded by
    # n_tables x sum(C(n_planes, d<=probe_hamming)) — a few hundred ints at
    # any practical multi-probe setting.
    pred = F.lit(False)
    for t, qs in enumerate(qsigs):
        pred = pred | (
            (F.col("__table") == t)
            & F.col("__sig").isin(probe_signatures(qs, n_planes, probe_hamming))
        )
    cand = index.filter(pred).dropDuplicates([id_col])
    q = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
    return (
        cand.select(
            F.col(id_col),
            cosine(F.col(vec_col).cast("array<double>"), q).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


def ann_topk_lsh(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k without a stored index: builds the multi-table signatures
    inline and probes them.  Same semantics as :func:`ann_topk_indexed` but
    pays a full scan to compute signatures — use the stored-index path at
    scale."""
    return ann_topk_indexed(
        build_ann_index(df, vec_col, id_col, n_planes, n_tables, seed),
        query, k, vec_col, id_col, n_planes, n_tables, seed, probe_hamming,
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
    n_tables: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    ``exact=True``: all-pairs cross join (small tables / oracle gate).
    ``exact=False``: multi-table LSH — a pair is a candidate when it
    shares a bucket in ANY of ``n_tables`` independent hyperplane tables
    (recall compounds across tables, fixing the single-signature variant's
    recall gap), then exact cosine filter.  The 100 TB path: only
    bucket-colliding rows shuffle, never the cross product."""
    base = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    if exact:
        a = base.withColumnRenamed(id_col, "id_a").withColumnRenamed("__v", "__va")
        b = base.withColumnRenamed(id_col, "id_b").withColumnRenamed("__v", "__vb")
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        sig = build_ann_index(base, "__v", id_col, n_planes, n_tables, seed)
        a = (
            sig.withColumnRenamed(id_col, "id_a")
            .withColumnRenamed("__v", "__va")
        )
        b = sig.select(
            F.col(id_col).alias("id_b"),
            F.col("__v").alias("__vb"),
            "__table",
            "__sig",
        )
        pairs = (
            a.join(b, ["__table", "__sig"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    return (
        pairs.withColumn("cos", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means-quantizer alternative to LSH


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid cell assignment as one vectorized mapInArrow pass
    (numpy matmul over the Arrow list buffers — no per-row Python).
    Assignments are a pure row-local function of (vector, centroids), so
    they are bit-stable across partitionings/parallelism — unlike the
    k-means model's own transform, whose centroids carry run-order float
    noise."""
    import numpy as np
    import pyarrow as pa

    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=np.float64)
    cnorm = (C * C).sum(axis=1)
    base = df.select(F.col(id_col), F.col(vec_col))
    schema = T.StructType(base.schema.fields + [T.StructField("__cell", T.IntegerType())])

    def fn(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            emb = batch.column(1)
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            if emb.null_count:
                # flatten() would silently drop null slots and shift every
                # later row into the wrong cell — fail loudly instead
                raise ValueError("assign_cells: null embeddings are not assignable")
            flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            if flat.size != len(emb) * C.shape[1]:
                raise ValueError(
                    f"assign_cells: ragged embeddings (got {flat.size} values "
                    f"for {len(emb)} rows of dim {C.shape[1]})"
                )
            V = flat.reshape(len(emb), -1)
            # argmin_c |v-c|^2 = argmin_c (|c|^2 - 2 v.c); ties -> lowest
            # cell index (centroids are canonically ordered)
            cell = np.argmin(cnorm[None, :] - 2.0 * (V @ C.T), axis=1).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1), pa.array(cell, type=pa.int32())],
                schema=pa.schema(
                    [batch.schema.field(0), batch.schema.field(1), pa.field("__cell", pa.int32())]
                ),
            )

    return base.mapInArrow(fn, schema=schema)


def build_ivf_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    seed: int = 42,
):
    """IVF coarse quantizer: k-means cells over the embedding column.

    Returns ``(index_df, centroids)`` where index_df = (id, vector, __cell)
    and centroids is a small driver-side list (ship it with the index —
    :func:`write_ivf_index` stores it as a JSON sidecar).  Complementary to
    the LSH index: IVF adapts to the data distribution (clustered
    embeddings get tight cells), LSH is data-independent.

    Determinism: the trained centroids are QUANTIZED (round 1e-6) and
    canonically ordered (lexicographic), and cell membership is recomputed
    from the quantized centroids (:func:`assign_cells`).  K-means float
    reductions vary in the last bits with partition order; rounding
    absorbs that noise, so the index, probe set, and query results are
    bit-stable run to run — which is what lets ``ivf_topk`` carry a
    value-checked oracle instead of a rows-only check."""
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__feat"),
    )
    model = KMeans(k=n_cells, seed=seed, featuresCol="__feat", predictionCol="__cell").fit(feat)
    C = np.round(np.asarray([c for c in model.clusterCenters()], dtype=np.float64), 6)
    C = C[np.lexsort(C.T[::-1])]  # canonical cell numbering
    centroids = [c.tolist() for c in C]
    index = assign_cells(df, centroids, vec_col, id_col)
    return index, centroids


def write_ivf_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    seed: int = 42,
) -> None:
    """Persist the IVF index partitioned by cell (probes become parquet
    PartitionFilters) plus a ``_centroids.json`` sidecar."""
    import json
    import os

    index, centroids = build_ivf_index(df, vec_col, id_col, n_cells, seed)
    index.write.partitionBy("__cell").mode("overwrite").parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump(centroids, f)


def read_ivf_centroids(path: str) -> list[list[float]]:
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        return json.load(f)


def ivf_topk(
    index: DataFrame,
    centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    nprobe: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k over an IVF index: rank cells by centroid distance
    driver-side (tiny — n_cells vectors), scan only the ``nprobe`` nearest
    cells (``__cell IN (...)`` prunes the partitioned index scan), exact
    cosine re-rank inside."""
    import numpy as np

    q = np.asarray(query, dtype=np.float64)
    C = np.asarray(centroids, dtype=np.float64)
    d2 = ((C - q) ** 2).sum(axis=1)
    probe_cells = [int(i) for i in np.argsort(d2)[:nprobe]]
    cand = index.filter(F.col("__cell").isin(probe_cells))
    qc = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
    return (
        cand.select(
            F.col(id_col),
            cosine(F.col(vec_col).cast("array<double>"), qc).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )
