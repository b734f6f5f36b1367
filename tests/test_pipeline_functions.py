"""Training-data pipeline operator tests: dedup finds seeded duplicates,
similarity search agrees with brute force, text metrics behave, multimodal
plumbing produces the contracted shapes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from varint_simd_spark.functions.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash_near_dups,
)
from varint_simd_spark.functions.multimodal import FEATURE_DIM, binary_meta, extract_features
from varint_simd_spark.functions.similarity import ann_topk_lsh, brute_force_topk, cosine_dup_pairs
from varint_simd_spark.functions.text import lang_id, quality_score, simhash_df, token_count

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def seeded_dups(spark, docs):
    """Documents + lightly-perturbed copies (known near-duplicates)."""
    dup = docs.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    out = docs.select("doc_id", "text").unionAll(dup)
    out.cache().count()
    return out


def test_exact_dedup(spark, docs):
    doubled = docs.select("doc_id", "text").unionAll(
        docs.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    )
    out = exact_dedup(doubled, "text", "doc_id").toPandas()
    assert len(out) == docs.count()
    assert (out["dup_count"] == 2).all()
    assert (out["doc_id"] < 10_000).all()  # min-id representative kept


def test_minhash_finds_seeded_dups(spark, seeded_dups, docs):
    pairs = minhash_lsh_pairs(seeded_dups, "doc_id", "text", jaccard_threshold=0.4).toPandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    hit = sum((i, i + 10_000) in found for i in ids)
    assert hit >= 0.9 * len(ids), f"minhash recall {hit}/{len(ids)}"


def test_ngram_jaccard_verifies(spark, seeded_dups):
    cand = spark.createDataFrame(
        [(0, 10_000), (0, 1)], "id_a long, id_b long"
    )
    out = ngram_jaccard(cand, seeded_dups, "doc_id", "text", k=3).toPandas()
    j = dict(zip(zip(out["id_a"], out["id_b"]), out["jaccard"]))
    assert j[(0, 10_000)] > 0.5  # true near-dup
    assert j[(0, 1)] < 0.5  # unrelated pair


def test_simhash_near_dups_recall(spark, seeded_dups, docs):
    pairs = simhash_near_dups(seeded_dups, "doc_id", "text", max_hamming=3).toPandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    hit = sum((i, i + 10_000) in found for i in ids)
    assert hit >= 0.5 * len(ids), f"simhash recall {hit}/{len(ids)}"


def test_simhash_shuffle_free_matches_grouped(spark, docs):
    """The per-row HOF simhash equals the explode->groupBy formulation bit
    for bit, and its plan contains ZERO exchanges (no (id, token-hash)
    shuffle stream at scale)."""
    from varint_simd_spark.functions.text import simhash_df_grouped

    a = simhash_df(docs, "doc_id", "text").toPandas().sort_values("doc_id", ignore_index=True)
    b = simhash_df_grouped(docs, "doc_id", "text").toPandas().sort_values("doc_id", ignore_index=True)
    # equivalence holds on rows both emit: the HOF form emits simhash=0 for
    # zero-token docs, the grouped form drops them (explode yields nothing)
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert len(merged) == len(b) and (merged["simhash_a"] == merged["simhash_b"]).all()
    plan = simhash_df(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan


def test_simhash_deterministic(spark, docs):
    a = simhash_df(docs, "doc_id", "text").orderBy("doc_id").toPandas()
    b = simhash_df(docs, "doc_id", "text").orderBy("doc_id").toPandas()
    assert (a["simhash"] == b["simhash"]).all()


def _clustered_embeddings(spark):
    """embeddings + a seeded near-duplicate cluster around vec 0.  ANN's
    real workload has neighbor structure; the raw synthetic embeddings are
    uniform-random (top-10 cos ~0.25-0.39), which NO index can beat a scan
    on — so recall is measured on the structured part."""
    import numpy as np

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    base = np.array(emb.limit(1).collect()[0]["embedding"], dtype=np.float64)
    rng = np.random.default_rng(7)
    jittered = [
        (10_000 + i, (base + rng.normal(0, 0.02, base.size)).tolist())
        for i in range(12)
    ]
    extra = spark.createDataFrame(jittered, "vec_id long, embedding array<double>")
    return emb.unionAll(extra), base.tolist()


def test_ann_indexed_scale_multiprobe(spark, tmp_path):
    """VERDICT round-2 item 8: the probe path at larger scale — 100k
    vectors, probe_hamming=2 (222 probe buckets).  Must keep recall@10
    >= 0.8, prune the scan via PartitionFilters (static OR-of-IN — the
    broadcast-join alternative measurably does NOT trigger dynamic
    partition pruning on an in-memory build side), and read only a small
    fraction of the table."""
    import re

    import numpy as np
    import pandas as pd

    from varint_simd_spark.functions.similarity import ann_topk_indexed, write_ann_index

    rng = np.random.default_rng(5)
    n, dim = 100_000, 16
    V = rng.normal(0, 1, (n, dim))
    q = rng.normal(0, 1, dim)
    V[:15] = q + rng.normal(0, 0.05, (15, dim))  # seeded near-neighbors
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(V.tolist())})
    )
    path = str(tmp_path / "ann_big")
    write_ann_index(df, path, n_planes=8, n_tables=6)
    idx = spark.read.parquet(path)

    res = ann_topk_indexed(idx, q.tolist(), k=10, n_planes=8, n_tables=6, probe_hamming=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*__sig", plan), plan[:2000]

    exact = set(brute_force_topk(df, q.tolist(), k=10).toPandas()["vec_id"])
    approx = set(res.toPandas()["vec_id"])
    assert len(exact & approx) >= 8, (exact, approx)


def test_ann_indexed_recall_and_pruning(spark, tmp_path):
    """VERDICT round-1 item 5: the stored index must (a) reach >=0.8
    recall@10 vs brute force, (b) prune the scan to probe buckets
    (PartitionFilters, not a full-scan filter), (c) read well under the
    full table."""
    from varint_simd_spark.functions.similarity import (
        ann_topk_indexed,
        probe_signatures,
        query_signatures,
        write_ann_index,
    )

    data, q = _clustered_embeddings(spark)
    path = str(tmp_path / "ann_idx")
    write_ann_index(data, path, n_planes=10, n_tables=6)
    idx = spark.read.parquet(path)

    exact = set(brute_force_topk(data, q, k=10).toPandas()["vec_id"])
    res = ann_topk_indexed(idx, q, k=10, n_planes=10, n_tables=6, probe_hamming=1)
    approx = set(res.toPandas()["vec_id"])
    assert len(exact & approx) >= 8, (exact, approx)

    # (b) bucket pruning reaches the parquet scan as a partition filter
    plan = res._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.search(r"PartitionFilters: \[[^\]]*__sig[^\]]*\]", plan)
    assert pf, plan[:2000]

    # (c) candidate set is a small fraction of the table (index, not scan)
    qsigs = query_signatures(spark, q, 10, 6, 42)
    pred = F.lit(False)
    for t, qs in enumerate(qsigs):
        pred = pred | (
            (F.col("__table") == t) & F.col("__sig").isin(probe_signatures(qs, 10, 1))
        )
    n_cand = idx.filter(pred).dropDuplicates(["vec_id"]).count()
    assert n_cand < 0.5 * data.count(), n_cand


def test_ivf_index_recall_and_pruning(spark, tmp_path):
    """IVF (k-means coarse quantizer) ANN: >=0.8 recall@10 on the seeded
    cluster at nprobe=2, with cell pruning reaching the parquet scan."""
    import re

    from varint_simd_spark.functions.similarity import (
        ivf_topk,
        read_ivf_centroids,
        write_ivf_index,
    )

    data, q = _clustered_embeddings(spark)
    path = str(tmp_path / "ivf")
    write_ivf_index(data, path, n_cells=8)
    idx = spark.read.parquet(path)
    cents = read_ivf_centroids(path)

    exact = set(brute_force_topk(data, q, k=10).toPandas()["vec_id"])
    res = ivf_topk(idx, cents, q, k=10, nprobe=2)
    approx = set(res.toPandas()["vec_id"])
    assert len(exact & approx) >= 8, (exact, approx)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*__cell", plan), plan[:1500]


def test_ann_inline_matches_indexed(spark, tmp_path):
    """The inline (no stored index) path returns the same result set."""
    from varint_simd_spark.functions.similarity import ann_topk_indexed, write_ann_index

    data, q = _clustered_embeddings(spark)
    path = str(tmp_path / "ann_idx2")
    write_ann_index(data, path, n_planes=10, n_tables=6)
    idx = spark.read.parquet(path)
    a = set(ann_topk_lsh(data, q, k=10).toPandas()["vec_id"])
    b = set(ann_topk_indexed(idx, q, k=10).toPandas()["vec_id"])
    assert a == b


def test_cosine_dup_pairs_lsh_vs_exact(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = cosine_dup_pairs(emb, threshold=0.5, exact=True).toPandas()
    # the LSH path must find a subset (bucket-collision requirement)
    lsh = cosine_dup_pairs(emb, threshold=0.5, exact=False, n_planes=4).toPandas()
    e = set(zip(exact["id_a"], exact["id_b"]))
    l = set(zip(lsh["id_a"], lsh["id_b"]))
    assert l <= e


def test_cosine_dup_pairs_multitable_recall(spark):
    """Multi-table LSH dup pairs must find (essentially) every true
    near-dup pair on a seeded jitter cluster — the single-signature
    variant's recall gap is what the tables fix."""
    import numpy as np

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    rng = np.random.default_rng(7)
    rows = emb.limit(20).collect()
    extra = spark.createDataFrame(
        [
            (10_000 + i, (np.array(r["embedding"]) + rng.normal(0, 0.02, 64)).tolist())
            for i, r in enumerate(rows)
        ],
        "vec_id long, embedding array<double>",
    )
    data = emb.unionAll(extra)
    e = cosine_dup_pairs(data, threshold=0.95, exact=True).toPandas()
    l = cosine_dup_pairs(data, threshold=0.95, exact=False, n_planes=8, n_tables=4).toPandas()
    es = set(zip(e["id_a"], e["id_b"]))
    ls = set(zip(l["id_a"], l["id_b"]))
    assert ls <= es and len(es) >= 20
    assert len(es & ls) >= 0.9 * len(es), (len(es), len(ls))


def test_text_metrics_shapes(spark, docs):
    out = docs.select(
        "doc_id",
        token_count("text").alias("t"),
        quality_score("text").alias("q"),
        lang_id("text").alias("l"),
    ).toPandas()
    assert (out["t"] > 0).all()
    assert out["q"].between(0, 1).all()
    assert set(out["l"]) <= {"en", "de", "fr", "es", "und"}


def test_multimodal_plumbing(spark):
    from varint_simd_spark.sources.web_pages import generate_web_pages

    wp = generate_web_pages(spark, 300, seed=42).withColumn("page_id", F.xxhash64("url"))
    meta = binary_meta(wp, "html", "page_id").toPandas()
    assert (meta["format"] == "html").all()
    assert (meta["n_bytes"] > 50).all()

    feats = extract_features(wp, "html", "page_id").toPandas()
    assert len(feats) == 300
    assert all(len(f) == FEATURE_DIM for f in feats["features"])
    s = np.array([np.sum(f) for f in feats["features"]])
    np.testing.assert_allclose(s, 1.0, rtol=1e-5)  # histogram normalized


def test_minhash_arrow_matches_recall(spark, seeded_dups, docs):
    """The Arrow-batched minhash (scale path) must find the seeded
    near-duplicates like the expression path."""
    from varint_simd_spark.functions.minhash_arrow import minhash_lsh_pairs_arrow

    pairs = minhash_lsh_pairs_arrow(
        seeded_dups, "doc_id", "text", jaccard_threshold=0.4
    ).toPandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    hit = sum((i, i + 10_000) in found for i in ids)
    assert hit >= 0.9 * len(ids), f"arrow minhash recall {hit}/{len(ids)}"


def test_minhash_arrow_shingle_hash_properties():
    """Rolling-hash invariants: same k-gram -> same hash regardless of
    position/document; different k-grams (almost surely) differ."""
    import numpy as np

    from varint_simd_spark.functions.minhash_arrow import _shingle_hashes

    blob = np.frombuffer(b"abcdefghXXabcdefgh", dtype=np.uint8)
    offs = np.array([0, 10, 18], dtype=np.int64)  # "abcdefghXX", "abcdefgh"
    h, starts = _shingle_hashes(blob, offs, k=8)
    assert starts.tolist() == [0, 3]
    # doc0 window 0 is "abcdefgh" == doc1's only window
    assert h[0] == h[3]
    # shifted windows differ
    assert h[0] != h[1] and h[1] != h[2]


def test_bpe_token_count_cross_engine(spark, docs):
    """BPE-ish regex token counts agree bit-for-bit with the DuckDB oracle
    (same pattern, Java regex vs RE2) and differ from whitespace counts."""
    import duckdb

    from varint_simd_spark.functions.text import (
        bpe_token_count,
        bpe_token_count_sql_duckdb,
    )

    a = (
        docs.select("doc_id", bpe_token_count("text").alias("n"))
        .toPandas().sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    b = con.sql(
        f"SELECT doc_id, {bpe_token_count_sql_duckdb('text')} AS n FROM documents ORDER BY doc_id"
    ).df()
    assert (a["n"].to_numpy() == b["n"].to_numpy()).all()
    # on punctuated text the BPE-ish count splits finer than whitespace
    # (the synthetic docs corpus is unpunctuated, so probe a literal here)
    probe = spark.createDataFrame([("Hello, world's 3.14 cats!",)], "text string")
    n_bpe = probe.select(bpe_token_count("text").alias("n")).collect()[0]["n"]
    n_ws = probe.select(token_count("text").alias("n")).collect()[0]["n"]
    assert n_bpe == 9 and n_ws == 4


def test_resize_and_frame_sample_plumbing(spark):
    """Resize emits fixed-size pixel buffers; frame sampling explodes 1->N
    with in-bounds offsets; both deterministic."""
    from varint_simd_spark.functions.multimodal import resize_images, sample_frames
    from varint_simd_spark.sources.web_pages import generate_web_pages

    wp = generate_web_pages(spark, 200, seed=42).withColumn("page_id", F.xxhash64("url"))
    rs = resize_images(wp, "html", "page_id", w=8, h=8).toPandas()
    assert len(rs) == 200
    assert (rs["pixels"].map(len) == 64).all()
    assert (rs["width"] == 8).all() and (rs["height"] == 8).all()

    fr = sample_frames(wp, "html", "page_id", n_frames=3).toPandas()
    assert len(fr) == 600
    assert set(fr["frame_idx"]) == {0, 1, 2}
    sizes = wp.select("page_id", F.length("html").alias("n")).toPandas().set_index("page_id")["n"]
    for _, r in fr.head(50).iterrows():
        assert 0 <= r["frame_offset"] < sizes[r["id"]]

    rs2 = resize_images(wp, "html", "page_id", w=8, h=8).toPandas()
    assert (rs.sort_values("id", ignore_index=True)["pixels"]
            == rs2.sort_values("id", ignore_index=True)["pixels"]).all()


def test_html_to_text_and_normalize_url_cross_engine(spark):
    """Markup stripping and URL canonicalization agree bit-for-bit with
    their DuckDB mirrors on adversarial inputs (tags split mid-entity,
    empty strings, fragments, mixed case, trailing-slash runs)."""
    import duckdb
    import pandas as pd

    from varint_simd_spark.functions.text import (
        html_to_text,
        html_to_text_sql_duckdb,
        normalize_url,
        normalize_url_sql_duckdb,
    )

    htmls = [
        "<html><p>Hi  there</p>& more</html>", "no tags  here", "",
        "<a href=x>L</a><b>B</b>", "< not-a-tag", "text <br/> tail ",
    ]
    urls = [
        "HTTPS://Host7.Example.COM/Path/9#frag", "http://a.b/",
        "https://X.Y/p/1///", "ftp://Q.R/no-frag", "https://plain.com",
        "https://h.com/#onlyfrag",
    ]
    con = duckdb.connect()
    a = [r["t"] for r in spark.createDataFrame(pd.DataFrame({"h": htmls}))
         .select(html_to_text("h").alias("t")).collect()]
    con.register("th", pd.DataFrame({"h": htmls}))
    b = [r[0] for r in con.sql(f"select {html_to_text_sql_duckdb('h')} from th").fetchall()]
    assert a == b, (a, b)

    a2 = [r["n"] for r in spark.createDataFrame(pd.DataFrame({"u": urls}))
          .select(normalize_url("u").alias("n")).collect()]
    con.register("tu", pd.DataFrame({"u": urls}))
    b2 = [r[0] for r in con.sql(f"select {normalize_url_sql_duckdb('u')} from tu").fetchall()]
    assert a2 == b2, (a2, b2)
    # canonicalization actually merges variants
    assert a2[1] == "http://a.b" and a2[2] == "https://x.y/p/1"


def test_ann_indexed_1m_selectivity(spark, tmp_path):
    """VERDICT round-3 item 7: the stored-index ANN probe path at 1M
    vectors, probe_hamming=2.  Asserts (a) the probe still reaches the
    parquet scan as PartitionFilters, (b) recall@10 >= 0.8 on seeded
    near-neighbors, (c) the candidate fraction stays bounded by the
    probed-bucket mass — a scale-free, config-controlled constant (4
    tables x 92 probes of 8192 buckets/table; production deepens
    n_planes with log n to hold absolute candidate counts).  Prints the
    measured selectivity so the bound is auditable."""
    import re

    import numpy as np
    import pyarrow as pa
    from pyspark.sql import types as T

    from varint_simd_spark.functions.similarity import (
        ann_topk_indexed,
        probe_signatures,
        query_signatures,
        write_ann_index,
    )

    n, dim, n_planes, n_tables = 1_000_000, 32, 13, 4
    Q = np.linspace(-1.0, 1.0, dim)

    def gen(batches):
        for b in batches:
            ids = b.column(0).to_numpy()
            rng = np.random.default_rng(int(ids[0]) if len(ids) else 0)
            V = rng.normal(0, 1, (len(ids), dim))
            near = ids < 15
            if near.any():
                V[near] = Q + rng.normal(0, 0.05, (int(near.sum()), dim))
            flat = pa.array(V.reshape(-1))
            offs = pa.array(np.arange(len(ids) + 1, dtype=np.int32) * dim)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), pa.ListArray.from_arrays(offs, flat)],
                names=["vec_id", "embedding"],
            )

    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()),
         T.StructField("embedding", T.ArrayType(T.DoubleType()))]
    )
    df = spark.range(n).mapInArrow(gen, schema=schema)
    path = str(tmp_path / "ann_1m")
    write_ann_index(df, path, n_planes=n_planes, n_tables=n_tables)
    idx = spark.read.parquet(path)

    res = ann_topk_indexed(
        idx, Q.tolist(), k=10, n_planes=n_planes, n_tables=n_tables, probe_hamming=2
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*__sig", plan), plan[:2000]
    got = set(res.toPandas()["vec_id"])
    assert len(got & set(range(15))) >= 8, sorted(got)

    qsigs = query_signatures(spark, Q.tolist(), n_planes, n_tables, 42)
    pred = F.lit(False)
    for t, qs in enumerate(qsigs):
        pred = pred | (
            (F.col("__table") == t)
            & F.col("__sig").isin(probe_signatures(qs, n_planes, 2))
        )
    n_cand = idx.filter(pred).dropDuplicates(["vec_id"]).count()
    sel = n_cand / n
    print(f"ann 1M selectivity: {n_cand} candidates / {n} = {sel:.4f}")
    # 336 of 6144 buckets probed ~ 5.5% expected; 15% is the hard bound
    assert sel < 0.15, sel


def test_minhash_arrow_100k_selectivity(spark):
    """VERDICT round-3 item 7: the Arrow minhash-LSH dedup path at 100k
    docs.  Recall on seeded near-duplicates stays 1.0 and the banded
    bucket join's candidate-pair count stays sub-quadratic (printed):
    sum C(bucket_size, 2) << C(n, 2)."""
    from varint_simd_spark.functions.minhash_arrow import (
        minhash_lsh_pairs_arrow,
        minhash_signatures_arrow,
    )
    from varint_simd_spark.sources.web_pages import generate_web_pages

    n, n_seed = 100_000, 200
    wp = generate_web_pages(spark, n, seed=11).select(
        F.xxhash64("url").alias("raw_id"), "text"
    )
    base = wp.select(
        (F.abs(F.col("raw_id")) % (10 * n)).alias("doc_id"), "text"
    ).dropDuplicates(["doc_id"])
    dups = base.limit(n_seed).select(
        (F.col("doc_id") + 10 * n).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
    )
    seeded = base.unionAll(dups)
    n_docs = seeded.count()

    pairs = minhash_lsh_pairs_arrow(
        seeded, "doc_id", "text", n_hashes=32, n_bands=8, jaccard_threshold=0.5
    )
    found = pairs.filter(
        (F.col("id_b") - F.col("id_a")) == 10 * n
    ).count()
    assert found >= int(0.95 * n_seed), (found, n_seed)

    # candidate-pair volume straight from the band buckets
    sigs = minhash_signatures_arrow(seeded, "doc_id", "text", 32, 8)
    rows_per_band = 32 // 8
    bands = F.array(
        *[
            F.xxhash64(*[F.col("sig").getItem(b * rows_per_band + r) for r in range(rows_per_band)])
            for b in range(8)
        ]
    )
    bucket_sizes = (
        sigs.select(F.posexplode(bands).alias("__band", "__bh"))
        .groupBy("__band", "__bh")
        .count()
    )
    n_cand = bucket_sizes.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs")
    ).collect()[0]["pairs"]
    frac = n_cand / (n_docs * (n_docs - 1) / 2)
    print(f"minhash 100k candidates: {int(n_cand)} pairs of C({n_docs},2) = {frac:.2e}")
    assert n_cand < 0.001 * n_docs * (n_docs - 1) / 2, n_cand


def test_dedup_clusters_label_propagation(spark):
    """dedup_clusters closes components transitively (a 6-vertex chain
    needs multiple propagation rounds), picks the min-id canonical, and
    reports exact cluster sizes; isolated pairs stay their own cluster."""
    from pyspark.sql import functions as F

    from varint_simd_spark.functions.dedup import dedup_clusters

    # chain 10-11-12-13-14-15 (diameter 5), triangle 20-21-22, pair 30-31
    edges = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15),
             (20, 21), (21, 22), (20, 22), (30, 31)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r["doc_id"]: r for r in dedup_clusters(pairs).collect()}

    assert {k: v["cluster_id"] for k, v in out.items()} == {
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10,
        20: 20, 21: 20, 22: 20, 30: 30, 31: 30,
    }
    assert out[15]["cluster_size"] == 6
    assert out[22]["cluster_size"] == 3
    assert out[30]["cluster_size"] == 2
    canon = {k for k, v in out.items() if v["is_canonical"]}
    assert canon == {10, 20, 30}

    # direction-independence: reversed edges give the same labeling
    rev = spark.createDataFrame([(b, a) for a, b in edges], "id_a long, id_b long")
    out2 = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(rev).collect()}
    assert out2 == {k: v["cluster_id"] for k, v in out.items()}

    # non-convergence guard: a chain longer than max_iter raises
    import pytest as _pytest

    long_chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40, 48)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(long_chain, max_iter=2)


def test_bmp_decode_handcrafted_exact():
    """decode_bmp_gray against a hand-assembled 2x2 bottom-up 24-bit BMP
    (row padding + BGR order + bottom-up flip all exercised) — expected
    grays computed with plain python ints, independent of the decoder."""
    import struct

    from varint_simd_spark.functions.multimodal import decode_bmp_gray, resize_real

    top = [(10, 20, 30), (40, 50, 60)]      # (B, G, R) left->right
    bottom = [(70, 80, 90), (100, 110, 120)]
    row_bytes = lambda row: b"".join(bytes(p) for p in row) + b"\x00\x00"  # stride 8
    pixel_data = row_bytes(bottom) + row_bytes(top)  # bottom-up on disk
    off = 54
    hdr = struct.pack("<2sIHHI", b"BM", off + len(pixel_data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    raw = np.frombuffer(hdr + info + pixel_data, np.uint8)

    gray = decode_bmp_gray(raw)
    exp = [[(29 * b + 150 * g + 77 * r) >> 8 for (b, g, r) in row] for row in (top, bottom)]
    assert gray.tolist() == exp

    # top-down variant (negative height): same pixel data now stored
    # top-first, so the decoder must NOT flip
    info_td = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    raw_td = np.frombuffer(hdr + info_td + row_bytes(top) + row_bytes(bottom), np.uint8)
    assert decode_bmp_gray(raw_td).tolist() == exp

    # real nearest-neighbor resize: 2x2 -> 4x4 repeats each pixel 2x2
    rz = resize_real(raw, 4, 4).reshape(4, 4)
    assert rz.tolist() == [
        [exp[0][0]] * 2 + [exp[0][1]] * 2,
        [exp[0][0]] * 2 + [exp[0][1]] * 2,
        [exp[1][0]] * 2 + [exp[1][1]] * 2,
        [exp[1][0]] * 2 + [exp[1][1]] * 2,
    ]

    # non-BMP / truncated payloads -> None (stub tier takes over)
    assert decode_bmp_gray(np.frombuffer(b"not a bmp at all" * 4, np.uint8)) is None
    assert decode_bmp_gray(raw[:40]) is None


def test_wav_decode_handcrafted_exact():
    """decode_wav_pcm16 against a hand-assembled PCM-16 WAVE with an
    odd-sized foreign chunk before data (word-alignment must be honored)."""
    import struct

    from varint_simd_spark.functions.multimodal import decode_wav_pcm16, wav_frames

    samples = [-32768, -1, 0, 1, 32767, 123]
    data = struct.pack("<6h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE"
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # odd size + pad byte
    body += b"data" + struct.pack("<I", len(data)) + data
    raw = np.frombuffer(b"RIFF" + struct.pack("<I", len(body)) + body, np.uint8)

    out = decode_wav_pcm16(raw)
    assert out is not None
    got, n_ch, rate, ds = out
    assert got.tolist() == samples and n_ch == 1 and rate == 8000
    assert raw[ds : ds + 4].tobytes() == data[:4]

    # non-PCM (ieee float fmt tag) and non-WAVE payloads -> None
    bad_fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    bad = b"RIFF" + struct.pack("<I", 30) + b"WAVE" + b"fmt " + struct.pack("<I", 16) + bad_fmt
    assert decode_wav_pcm16(np.frombuffer(bad + b"data\x00\x00\x00\x00", np.uint8)) is None
    assert decode_wav_pcm16(np.frombuffer(b"RIFFxxxxAVI " + b"\x00" * 40, np.uint8)) is None

    # real frame windows: sample-aligned offsets inside the data chunk
    frames = wav_frames(raw, 3)
    assert [off for off, _ in frames] == [ds, ds + 2 * 2, ds + 4 * 2]
    assert frames[1][1] == struct.pack("<2h", 0, 1)


def test_media_generator_and_real_features_end_to_end(spark):
    """generate_media -> extract_features: BMP rows carry the histogram of
    the REAL decoded grayscale pixels (expected derived from the
    generator's pixel formula, not the decoder), WAV rows the histogram of
    real samples; format sniff tags bmp/riff/unknown correctly."""
    from pyspark.sql import functions as F

    from varint_simd_spark.functions.multimodal import FEATURE_DIM, binary_meta, extract_features
    from varint_simd_spark.sources.media import generate_media, make_wav

    md = generate_media(spark, 30, seed=42)
    fmts = {r["media_id"]: r["format"] for r in binary_meta(md, "payload", "media_id").collect()}
    for mid, fmt in fmts.items():
        assert fmt == {0: "bmp", 1: "riff", 2: "unknown"}[mid % 3], (mid, fmt)

    feats = {r["id"]: r for r in extract_features(md, "payload", "media_id").collect()}
    # bmp: expected grayscale histogram straight from the pixel formula
    mid, seed = 6, 42
    w, h = 8 + mid % 9, 6 + mid % 5
    y, x = np.mgrid[0:h, 0:w]
    b, g, r = [((mid * 31 + x * 7 + y * 13 + c * 101 + seed) % 256) for c in range(3)]
    gray = ((29 * b + 150 * g + 77 * r) >> 8).astype(np.int64)
    exp = np.bincount(gray.ravel() >> 4, minlength=FEATURE_DIM).astype(np.float32)
    exp /= exp.sum()
    assert np.allclose(np.array(feats[mid]["features"]), exp, atol=1e-6)

    # wav: expected histogram from the generator's sample formula
    mid = 1
    n_ch = 1 + (mid // 2) % 2
    n = (256 + (mid % 7) * 64) * n_ch
    t = np.arange(n, dtype=np.int64)
    s = ((mid * 2654435761 + t * 40503 + 42 * 97) % 65536) - 32768
    expw = np.bincount((s + 32768) >> 12, minlength=FEATURE_DIM).astype(np.float32)
    expw /= expw.sum()
    assert np.allclose(np.array(feats[mid]["features"]), expw, atol=1e-6)
    assert len(make_wav(mid)) == feats[mid]["n_bytes"]


def test_dedup_clusters_100k_scale(spark):
    """Scale evidence for the clustering operator: 120k edges over 100k
    vertices forming 20k five-vertex star/chain components — label
    propagation must converge in O(diameter) rounds with exact cluster
    assignment (closed-form oracle: cluster id = vertex - vertex % 5),
    entirely via equi-joins (no driver-side graph)."""
    from pyspark.sql import functions as F

    from varint_simd_spark.functions.dedup import dedup_clusters

    base = spark.range(100_000).select(F.col("id"))
    # chain edges (v, v+1) within each 5-block + one star edge per block
    chain = base.filter(F.col("id") % 5 != 4).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    star = base.filter(F.col("id") % 5 == 3).select(
        (F.col("id") - 3).alias("id_a"), (F.col("id") + 1).alias("id_b"))
    pairs = chain.unionAll(star)

    out = dedup_clusters(pairs)
    bad = out.filter(
        F.col("cluster_id") != F.col("doc_id") - F.pmod(F.col("doc_id"), F.lit(5))
    ).count()
    assert bad == 0
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.col("is_canonical").cast("long")).alias("canon"),
        F.max("cluster_size").alias("mx"),
        F.min("cluster_size").alias("mn"),
    ).collect()[0]
    assert agg["n"] == 100_000 and agg["canon"] == 20_000
    assert agg["mx"] == 5 and agg["mn"] == 5


def test_dedup_clusters_canonical_by_score(spark):
    """scores= switches canonical selection to the best-scoring doc per
    cluster (ties -> min id; missing scores rank lowest); cluster
    assignment itself is unchanged."""
    from varint_simd_spark.functions.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21), (30, 31)], "id_a long, id_b long"
    )
    # 12 best in cluster 10; tie between 20/21 -> min id 20; 30/31
    # unscored -> min id 30
    scores = spark.createDataFrame(
        [(10, 0.1), (11, 0.5), (12, 0.9), (20, 0.7), (21, 0.7)],
        "doc_id long, q double",
    )
    out = {r["doc_id"]: r for r in dedup_clusters(pairs, scores=scores).collect()}
    assert {k for k, v in out.items() if v["is_canonical"]} == {12, 20, 30}
    assert out[12]["cluster_id"] == 10 and out[12]["cluster_size"] == 3
    assert out[31]["cluster_id"] == 30
