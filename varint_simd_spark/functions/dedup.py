"""Deduplication operators for training-data pipelines.

Exact dedup, MinHash+LSH near-dup, SimHash near-dup, n-gram Jaccard
verification, embedding-cosine near-dup — each expressed shuffle-minimally:

* exact: ONE groupBy on a content hash (map-side combine);
* MinHash+LSH: signatures are pure per-row native exprs (no shuffle);
  candidate pairs come from a self-equi-join on (band, band_hash) —
  Catalyst plans a shuffled hash join on the band key, which is the
  textbook LSH bucket join and scales linearly with bucket sizes;
* verification joins are equi-joins on doc ids (broadcast when small).

All hashing uses Spark's xxhash64 (JVM, WSCG).  Hash-dependent outputs are
engine-defined, so their driver checks are rows-only; the *verification*
operators (exact jaccard on shingle sets) are oracle-expressible and are
checked value-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def content_hash(col: str) -> Column:
    """Exact-dup key: xxhash64 of the raw content."""
    return F.xxhash64(F.col(col))


def exact_dedup(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per exact content; one shuffle."""
    return (
        df.groupBy(F.col(col).alias("__content"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .select(id_col, F.col("__content").alias(col), "dup_count")
    )


def char_shingles(col: str, k: int = 8) -> Column:
    """All k-char shingles of a string (native transform/sequence)."""
    c = F.col(col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substring(c, i, k))


def word_shingles(col: str, k: int = 3) -> Column:
    """All k-word shingles (native)."""
    t = tokens(col)
    n = F.greatest(F.size(t) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(t, i + 1, k), " "),
    )


# deterministic odd multipliers/offsets for derived universal hashing
# (splitmix64-style constants folded into int64 range)
def _mh_consts(n: int) -> tuple[list[int], list[int]]:
    a, b, x = [], [], 0x9E3779B97F4A7C15
    for _ in range(n):
        x = (x * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (1 << 64)
        a.append(((x | 1) % (1 << 63)))  # odd, fits signed long
        x = (x * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (1 << 64)
        b.append(x % (1 << 63))
    return a, b


_MH_A, _MH_B = _mh_consts(64)


def _perm(j: int):
    """Cheap bijective scramble of a 64-bit hash for permutation j:
    rotate + xor a per-j constant.  Overflow-free (ANSI-safe), one base
    xxhash64 pass shared by all permutations.  NB: returns a 1-param
    closure — F.transform treats a 2-param lambda as (element, index)."""
    r = (j * 17 + 13) % 63 + 1
    c = F.lit(_MH_B[j] ^ _MH_A[j])

    def f(h):
        rot = F.shiftleft(h, r).bitwiseOR(F.shiftrightunsigned(h, 64 - r))
        return rot.bitwiseXOR(c)

    return f


def minhash_signature(col: str, n_hashes: int = 32, k: int = 8) -> Column:
    """MinHash signature: n_hashes minima over the k-char shingle set.

    ONE xxhash64 per shingle, then derived universal hashes
    ``h*A_j + B_j`` (wrapping 64-bit) — 32x fewer hash evaluations than
    seeding xxhash64 per permutation, same minwise property.  Pure per-row
    expression — no shuffle."""
    base = F.transform(char_shingles(col, k), lambda s: F.xxhash64(s))
    return F.array(
        *[F.array_min(F.transform(base, _perm(j))) for j in range(n_hashes)]
    )


def lsh_bands(sig_col: str, n_bands: int = 8, rows_per_band: int = 4) -> Column:
    """Band hashes: array of n_bands xxhash64 values over signature slices."""
    return F.array(
        *[
            F.xxhash64(
                *[F.col(sig_col).getItem(b * rows_per_band + r) for r in range(rows_per_band)]
            )
            for b in range(n_bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    n_bands: int = 8,
    k: int = 8,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH, filtered by
    the signature-estimated jaccard.  Returns (id_a, id_b, est_jaccard)
    with id_a < id_b."""
    rows_per_band = n_hashes // n_bands
    # materialize the base hash array first so the 32 permutations reuse
    # one xxhash64 pass (guaranteed, independent of expression CSE)
    hashed = df.select(
        F.col(id_col),
        F.transform(char_shingles(text_col, k), lambda s: F.xxhash64(s)).alias("__h"),
    )
    sigs = hashed.select(
        F.col(id_col),
        F.array(
            *[
                F.array_min(F.transform("__h", _perm(j)))
                for j in range(n_hashes)
            ]
        ).alias("__sig"),
    ).withColumn("__bands", lsh_bands("__sig", n_bands, rows_per_band))
    exploded = sigs.select(
        id_col, "__sig", F.posexplode("__bands").alias("__band", "__bh")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bh") == F.col("b.__bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.__sig").alias("__sa"),
            F.col("b.__sig").alias("__sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.aggregate(
            F.zip_with("__sa", "__sb", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(float(n_hashes))
    )
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Exact word-k-gram jaccard verification of candidate pairs
    (broadcast-joins the doc table when small; equi-joins on ids)."""
    sh = docs.select(
        F.col(id_col), F.array_distinct(word_shingles(text_col, k)).alias("__sh")
    )
    out = (
        df_pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("__sh", "__sha"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("__sh", "__shb"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("__sha", "__shb"))
            / F.size(F.array_union("__sha", "__shb")),
        )
    )
    return out.select("id_a", "id_b", "jaccard")


def ngram_jaccard_allpairs(docs: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Exact all-pairs word-k-gram jaccard (small tables / oracle gate —
    the scale path is minhash_lsh_pairs + ngram_jaccard)."""
    sh = docs.select(F.col(id_col), F.array_distinct(word_shingles(text_col, k)).alias("__sh"))
    a = sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("__sh", "__sha")
    b = sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("__sh", "__shb")
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("__sha", "__shb"))
            / F.size(F.array_union("__sha", "__shb")),
        )
        .select("id_a", "id_b", "jaccard")
    )


def dedup_clusters(
    pairs: DataFrame, max_iter: int = 20, scores: DataFrame | None = None
) -> DataFrame:
    """Near-dup PAIRS -> dup CLUSTERS: connected components over the pair
    graph via iterative min-label propagation, plus canonical-document
    selection — the step every real dedup pipeline needs after LSH (keep
    one doc per cluster, drop the rest).

    ``pairs``: (id_a, id_b) near-duplicate edges (e.g. from
    :func:`minhash_lsh_pairs`).  Returns one row per vertex:
    (doc_id, cluster_id, cluster_size, is_canonical) where ``cluster_id``
    is the component's minimum doc id and the canonical doc is its holder
    — unless ``scores`` is given: a 2-column (id, score) DataFrame (e.g.
    from quality_score) that switches canonical selection to the
    best-scoring doc per cluster (ties -> min id; missing scores rank
    lowest).

    Algorithm (100 TB-safe): labels start as each vertex's own id; each
    round propagates labels across edges with ONE equi-join + min-groupBy
    (both shuffle on the id key — no driver-side graph, no cross
    products), converging in O(component diameter) rounds — near-dup
    clusters are shallow (a hub document connects its variants), so this
    is 2-4 rounds in practice.  ``localCheckpoint`` truncates the
    iterative lineage each round (on a real cluster use
    ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` for
    fault-tolerant truncation).  Raises after ``max_iter`` rounds rather
    than returning a half-converged labeling."""
    e = pairs.select(
        F.col("id_a").cast("long").alias("src"),
        F.col("id_b").cast("long").alias("dst"),
    )
    edges = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = edges.join(labels, edges["src"] == labels["id"]).select(
            F.col("dst").alias("id"), "label"
        )
        # convergence detection rides the SAME propagation aggregate: the
        # old label travels as __old (unique per id; prop rows carry NULL),
        # so `changed = new < old` needs no second join job per round —
        # the probe is a narrow scan of the checkpointed result
        new_labels = (
            labels.withColumn("__old", F.col("label"))
            .unionByName(prop.withColumn("__old", F.lit(None).cast("long")))
            .groupBy("id")
            .agg(F.min("label").alias("label"), F.max("__old").alias("__old"))
            .withColumn("__changed", F.col("label") < F.col("__old"))
            .localCheckpoint()
        )
        improved = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.select("id", "label")
        if improved == 0:
            break
    else:
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter)"
        )
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    out = labels.join(sizes, "label").select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
        (F.col("id") == F.col("label")).alias("is_canonical"),
    )
    if scores is None:
        return out
    # quality-based canonical selection: keep the best-scoring doc per
    # cluster (ties broken by min id for determinism) — one equi-join +
    # max-groupBy, no window over the whole table
    sc = scores.select(
        F.col(scores.columns[0]).cast("long").alias("doc_id"),
        # NaN orders above every real double in Spark — map it (like a
        # missing score) to -inf so it can never win canonical selection
        F.nanvl(
            F.col(scores.columns[1]).cast("double"), F.lit(float("-inf"))
        ).alias("__score"),
    )
    # a doc id appearing twice in `scores` would fan out duplicate output
    # rows through the left join — keep one (max) score per id
    sc = sc.groupBy("doc_id").agg(F.max("__score").alias("__score"))
    scored = out.join(sc, "doc_id", "left").withColumn(
        "__score", F.coalesce("__score", F.lit(float("-inf")))
    )
    # pick = (max score, then min id) encoded as one orderable struct so a
    # single max-groupBy selects it (argmax without a window function)
    pick = (
        scored.groupBy("cluster_id")
        .agg(F.max(F.struct(F.col("__score"), (-F.col("doc_id")).alias("__nid"))).alias("__p"))
        .select("cluster_id", (-F.col("__p.__nid")).alias("__canon_id"))
    )
    return (
        scored.join(pick, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("__canon_id")).alias("is_canonical"),
        )
    )


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: 4x16-bit block LSH (two fingerprints within
    hamming distance d<=3 share at least one of 4 blocks exactly), then
    exact hamming filter via bit_count(xor)."""
    from .text import simhash_df

    sh = simhash_df(df, id_col, text_col)
    blocks = sh.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).cast("long")
                for i in range(4)
            ])
        ).alias("__blk", "__bv"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col("a.__bv") == F.col("b.__bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("__ha"),
            F.col("b.simhash").alias("__hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
