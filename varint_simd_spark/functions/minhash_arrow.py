"""Arrow-batched MinHash — the 100 TB path.

The expression-based minhash (functions/dedup.py) is pure Catalyst but
higher-order functions run interpreted: 32 permutations x hundreds of
shingles per row is slow at scale.  This module computes the same
signature shape in whole-column numpy over Arrow batches:

* k-char shingle hashes via a polynomial rolling hash over the
  concatenated batch blob — O(total_bytes) with wrapping uint64 prefix
  products (P odd => invertible mod 2^64, so windows divide out);
* 32 permutations = rotate+xor bijections applied to the whole shingle
  hash array at once;
* per-doc minima via ``np.minimum.reduceat`` over value boundaries.

Signature values differ from the expression implementation (different
base hash) — both are engine-defined; recall properties are equivalent.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs.strings import arrow_to_bo

_P = np.uint64(0x9E3779B97F4A7C15 | 1)  # odd => invertible mod 2^64
_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def _inv_u64(a: np.uint64) -> np.uint64:
    """Inverse of odd a mod 2^64 (Newton iteration)."""
    x = a  # 3 bits correct
    for _ in range(5):
        x = x * (np.uint64(2) - a * x)
    return x


_ROTS = [(j * 17 + 13) % 63 + 1 for j in range(64)]


def _xor_consts(n: int) -> np.ndarray:
    x, out = 0x9E3779B97F4A7C15, []
    for _ in range(n):
        x = (x * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (1 << 64)
        out.append(x)
    return np.array(out, dtype=np.uint64)


def _shingle_hashes(blob: np.ndarray, offs: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling k-gram hashes for every in-document window.

    Returns (hashes, doc_starts) where doc_starts indexes each document's
    first window in the flat hash array (documents shorter than k get one
    window covering what exists, matching 'greatest(len-k+1, 1)')."""
    nb = blob.size
    n_docs = offs.size - 1
    b = blob.astype(np.uint64)
    with np.errstate(over="ignore"):
        powers = np.empty(nb + 1, dtype=np.uint64)
        powers[0] = np.uint64(1)
        if nb:
            np.multiply.accumulate(np.full(nb, _P, dtype=np.uint64), out=powers[1:])
        inv = _inv_u64(_P)
        inv_powers = np.empty(nb + 1, dtype=np.uint64)
        inv_powers[0] = np.uint64(1)
        if nb:
            np.multiply.accumulate(np.full(nb, inv, dtype=np.uint64), out=inv_powers[1:])
        # prefix S[i] = sum_{t<i} (b[t]+1) * P^t   (wrapping)
        S = np.zeros(nb + 1, dtype=np.uint64)
        if nb:
            np.cumsum((b + np.uint64(1)) * powers[:nb], out=S[1:])
        doc_lens = np.diff(offs)
        n_windows = np.maximum(doc_lens - (k - 1), 1)
        doc_starts = np.concatenate([[0], np.cumsum(n_windows)]).astype(np.int64)
        total = int(doc_starts[-1])
        # flat window start positions in the blob
        win_pos = np.repeat(offs[:-1], n_windows) + (
            np.arange(total, dtype=np.int64) - np.repeat(doc_starts[:-1], n_windows)
        )
        win_len = np.minimum(np.repeat(doc_lens, n_windows), k).astype(np.int64)
        ends = np.minimum(win_pos + win_len, offs[-1] if offs.size else 0)
        h = (S[ends] - S[win_pos]) * inv_powers[win_pos]
        # final avalanche (splitmix64 tail) to decorrelate
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h, doc_starts[:-1]


def minhash_signatures_arrow(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    k: int = 8,
) -> DataFrame:
    """(id, signature array<long>) via mapInArrow — whole-batch numpy."""
    xors = _xor_consts(n_hashes)
    rots = np.array(_ROTS[:n_hashes], dtype=np.uint64)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).cast(pa.large_string())
            blob, offs = arrow_to_bo(texts)
            h, starts = _shingle_hashes(blob, offs, k)
            n_docs = len(ids)
            sigs = np.empty((n_docs, len(rots)), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(len(rots)):
                    r = rots[j]
                    hp = ((h << r) | (h >> (np.uint64(64) - r))) ^ xors[j]
                    sigs[:, j] = np.minimum.reduceat(hp, starts) if h.size else _SENTINEL
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(list(sigs.view(np.int64)), type=pa.list_(pa.int64())),
                ],
                names=["id", "sig"],
            )

    return df.select(F.col(id_col).cast("long"), F.col(text_col)).mapInArrow(fn, schema)


def minhash_lsh_pairs_arrow(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    n_bands: int = 8,
    k: int = 8,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Scale path of minhash_lsh_pairs: Arrow-batched signatures, then the
    same banded bucket self-join + estimated-jaccard filter."""
    rows_per_band = n_hashes // n_bands
    sigs = minhash_signatures_arrow(df, id_col, text_col, n_hashes, k)
    bands = F.array(
        *[
            F.xxhash64(*[F.col("sig").getItem(b * rows_per_band + r) for r in range(rows_per_band)])
            for b in range(n_bands)
        ]
    )
    exploded = sigs.select("id", "sig", F.posexplode(bands).alias("__band", "__bh"))
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bh") == F.col("b.__bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("__sa"),
            F.col("b.sig").alias("__sb"),
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
