"""encode_table / decode_table — the engine's main Spark operators.

Lifecycle (SURVEY.md §3.4): scan -> bucket (ONE shuffle, url-hash) ->
``applyInArrow`` per bucket -> one encoded row per (chunk, column).
Arrow end to end: Spark ships record batches over Arrow IPC, the codec
layer reads the Arrow buffers directly (zero-copy for string columns), and
every kernel is whole-column numpy — no per-row Python anywhere
(input_hint requirement).

Scale notes (designed for ~100 TB / 1000 executors, tested on local[32]):
* chunk membership is ``pmod(xxhash64(key), n_chunks)`` — deterministic in
  data only, so resume/verify work identically at any parallelism;
* the groupBy shuffle is the ONLY shuffle in the encode path; AQE coalesces
  small post-shuffle partitions and splits skewed ones;
* size ``n_chunks`` so a chunk's Arrow materialization fits an executor
  core's memory (target ~32-64 MB of raw column data per chunk);
* decode is a single groupBy on chunk_id — at scale the encoded table is
  written bucketed by chunk_id, making this a shuffle-free local sort.
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs.base import (
    STR_TAGS,
    arrow_tag,
    arrow_to_int64,
    decode_column_arrow,
    decode_column_arrow_selected,
    encode_column_arrow,
    tag_to_arrow,
)
from ..codecs.choose import choose_codec_arrow
from ..codecs.strings import arrow_to_bo
from ..kernels import varint
from ..kernels.zigzag import zigzag
from .pyscan import parquet_scan_info, pyscan_map_in_arrow

ENCODED_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.LongType()),
        T.StructField("col_idx", T.IntegerType()),
        T.StructField("column", T.StringType()),
        T.StructField("dtype", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("params", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_values", T.LongType()),
        T.StructField("raw_bytes", T.LongType()),
        T.StructField("ref_bytes", T.LongType()),
        T.StructField("enc_bytes", T.LongType()),
        T.StructField("crc32", T.LongType()),
        T.StructField("reason", T.StringType()),
        # zone map: JSON {"min": x, "max": y} in the int64 domain for
        # integer-family columns (ints/ts/date/bool/f64-as-ordered-double);
        # null for string/binary and all-null chunks
        T.StructField("stats", T.StringType()),
    ]
)

_ENC_ARROW = pa.schema(
    [
        ("chunk_id", pa.int64()),
        ("col_idx", pa.int32()),
        ("column", pa.string()),
        ("dtype", pa.string()),
        ("codec", pa.string()),
        ("params", pa.string()),
        ("payload", pa.binary()),
        ("n_values", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("ref_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("crc32", pa.int64()),
        ("reason", pa.string()),
        ("stats", pa.string()),
    ]
)

_TAG_TO_SPARK = {
    "i64": T.LongType(),
    "i32": T.IntegerType(),
    "i16": T.ShortType(),
    "i8": T.ByteType(),
    "f64": T.DoubleType(),
    "ts_us": T.TimestampType(),
    "date_d": T.DateType(),
    "str": T.StringType(),
    "bin": T.BinaryType(),
    "bool": T.BooleanType(),
}


def _ref_and_raw_bytes(arr: pa.Array, tag: str, ref_hint: int | None = None) -> tuple[int, int]:
    """(reference encoder size, raw size).  Reference = minimal LEB128 of
    zigzag(v) for integer domains (reference encode_zigzag,
    src/encode/mod.rs:40-42); raw utf-8 + varint length stream for strings
    (the reference has no string codec; framing is ours).

    ``ref_hint``: the codec chooser's exact varint_zz candidate size — the
    same quantity by definition — so auto-chosen integer columns skip the
    zigzag + length-count repeat."""
    if tag in STR_TAGS:
        if arr.null_count:
            arr = pc.fill_null(arr, "" if tag == "str" else b"")
        blob, offs = arrow_to_bo(arr)
        lens = np.diff(offs).astype(np.uint64)
        ref = int(offs[-1]) + varint.varint_len_sum(lens)
        return ref, int(offs[-1])
    if ref_hint is not None:
        return ref_hint, 8 * len(arr)
    if arr.null_count:
        arr = pc.fill_null(arr, pa.scalar(0).cast(arr.type))
    v = arrow_to_int64(arr, tag)
    return varint.varint_len_sum(zigzag(v)), 8 * len(arr)


def _to_int64_keep_nulls(arr: pa.Array, tag: str) -> pa.Array:
    """int64-domain view of an integer-family column with validity kept
    (unlike arrow_to_int64, which requires a null-free array)."""
    if tag == "ts_us":
        a = arr if arr.type == pa.timestamp("us") else arr.cast(pa.timestamp("us"))
        return a.view(pa.int64())
    if tag == "date_d":
        return arr.view(pa.int32()).cast(pa.int64())
    return arr.cast(pa.int64())


def _exact_int_sum(v: pa.Array, lo: int, hi: int) -> int:
    """Exact sum of an int64 arrow array (nulls skipped).  Arrow sums in an
    int64 accumulator, which WRAPS for realistic inputs (e.g. epoch-micros
    chunks); fast path shifts by the chunk min so the vectorized sum runs
    over the small in-chunk range, Python-int arithmetic restores it."""
    n_nonnull = len(v) - v.null_count
    if n_nonnull == 0:
        return 0
    if (hi - lo) * max(n_nonnull, 1) < (1 << 62):
        shifted = pc.subtract(v, pa.scalar(lo, pa.int64()))
        return int(pc.sum(shifted, min_count=0).as_py() or 0) + lo * n_nonnull
    vv = v.drop_null().to_numpy(zero_copy_only=False)
    return int(vv.astype(object).sum()) if vv.size else 0


def _zone_map_dict(arr: pa.Array, tag: str) -> dict:
    """Per-chunk statistics.  min/max (the zone map, int64/double
    domain — exact Spark-side comparisons) for integer-family columns;
    plus an exact integer ``sum`` (string — arbitrary precision) and
    ``n_nulls`` so aggregates can be answered from metadata alone
    (:func:`decode_aggregate`).  Strings/binary carry only n_nulls (their
    byte totals ride the raw_bytes column); f64 carries no sum (float
    addition is order-dependent).  Absent keys are always sound: pruning
    skips nothing, aggregation falls back to payload decode."""
    st: dict = {"n_nulls": int(arr.null_count)}
    if tag in STR_TAGS:
        return st
    if arr.null_count == len(arr):
        if tag != "f64":
            st["sum"] = "0"  # SQL SUM over only-nulls is NULL, but the
            # decode path reports "0" for empty domains — keep them equal
        return st
    mm = pc.min_max(arr)
    lo, hi = mm["min"], mm["max"]
    if tag == "ts_us":
        lo = lo.cast(pa.timestamp("us")).value
        hi = hi.cast(pa.timestamp("us")).value
    elif tag == "date_d":
        lo = lo.cast(pa.int32()).as_py()
        hi = hi.cast(pa.int32()).as_py()
    elif tag == "bool":
        lo, hi = int(lo.as_py()), int(hi.as_py())
    else:
        lo, hi = lo.as_py(), hi.as_py()
        if tag == "f64":
            import math

            # NaN/inf are not valid strict JSON and poison ordering
            if not (math.isfinite(lo) and math.isfinite(hi)):
                return st
    st["min"], st["max"] = lo, hi
    if tag != "f64":
        v = _to_int64_keep_nulls(arr, tag)
        st["sum"] = str(_exact_int_sum(v, lo, hi))
    return st


# per-chunk grouped statistics are written only for group columns with at
# most this many distinct values in the chunk — beyond it the stats JSON
# would stop being "metadata" (grouped aggregation falls back to the
# decode path, which handles any cardinality)
MAX_STAT_GROUPS = 64

# JSON map keys cannot be null, so null group values get this sentinel key
# (converted back to a real SQL NULL group by decode_aggregate)
NULL_GROUP_KEY = "\u0000"

# driver-side bound on the grouped-stats fast path: at most this many
# (column, group) combination rows are ever collected; beyond it the
# grouped aggregate falls back to the distributed decode path
MAX_COLLECTED_GROUP_ROWS = 65536


def _group_codes(garr: pa.Array, max_groups: int | None = MAX_STAT_GROUPS):
    """Factorize a group column into (codes int64 ndarray, keys list[str]).
    Nulls map to the NULL_GROUP_KEY sentinel; a REAL group value starting
    with NUL is escaped with one extra NUL so it can never collide with
    the sentinel (``_unescape_group_key`` reverses both).  Timestamps are
    canonicalized to epoch-micros keys first: the encode side sees
    Spark's tz-aware arrow timestamps while the decode fallback sees the
    codec layer's tz-naive ones, and their str() forms differ.  Returns
    None when the chunk exceeds ``max_groups`` distinct groups (caller
    omits grouped stats)."""
    if pa.types.is_timestamp(garr.type):
        garr = garr.cast(pa.timestamp("us")).view(pa.int64())
    d = garr.dictionary_encode()
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    keys = [
        (NULL_GROUP_KEY + k if isinstance(k, str) and k.startswith(NULL_GROUP_KEY) else k)
        if isinstance(k, str)
        else str(k)
        for k in d.dictionary.to_pylist()
    ]
    idx = d.indices
    if idx.null_count:
        codes = idx.fill_null(len(keys)).to_numpy(zero_copy_only=False).astype(np.int64)
        keys = keys + [NULL_GROUP_KEY]
    else:
        codes = idx.to_numpy(zero_copy_only=False).astype(np.int64)
    if max_groups is not None and len(keys) > max_groups:
        return None
    return codes, keys


def _unescape_group_key(k: str | None) -> str | None:
    """Inverse of the _group_codes key mapping: the bare sentinel is the
    SQL NULL group; a NUL-prefixed key drops its escape character."""
    if k == NULL_GROUP_KEY:
        return None
    if k is not None and k.startswith(NULL_GROUP_KEY):
        return k[1:]
    return k


def _group_partials(arr: pa.Array, tag: str, codes: np.ndarray, n_groups: int) -> list[dict | None]:
    """Per-group exact partials of one column: entry g is
    ``{"n", "nn"[, "sum", "min", "max"][, "bytes"]}`` (None for groups
    absent from the chunk).  ``sum`` is the exact integer sum (arbitrary precision, same
    shift-by-min guard as :func:`_exact_int_sum`); ``bytes`` is total
    utf8/binary bytes for string columns; f64 carries n/nn only (float
    addition is order-dependent)."""
    n_g = np.bincount(codes, minlength=n_groups)
    if arr.null_count:
        nulls = pc.is_null(arr).to_numpy(zero_copy_only=False)
        nn_g = np.bincount(codes[nulls], minlength=n_groups)
    else:
        nn_g = np.zeros(n_groups, np.int64)

    def base(g):
        return {"n": int(n_g[g]), "nn": int(nn_g[g])}

    if tag in STR_TAGS:
        a = pc.fill_null(arr, "" if tag == "str" else b"")
        lens = pc.binary_length(a).to_numpy(zero_copy_only=False).astype(np.int64)
        acc = np.zeros(n_groups, np.int64)
        np.add.at(acc, codes, lens)
        return [
            {**base(g), "bytes": int(acc[g])} if n_g[g] else None
            for g in range(n_groups)
        ]
    if tag == "f64":
        return [base(g) if n_g[g] else None for g in range(n_groups)]
    v = _to_int64_keep_nulls(arr, tag)
    if arr.null_count == len(arr):
        # SQL SUM over only-nulls is NULL (unlike the ungrouped chunk
        # stats, whose "0" convention predates grouping and is pinned by
        # the ungrouped oracle) — omit the key so the decimal SUM of the
        # final combine stays NULL for fully-null groups
        return [base(g) if n_g[g] else None for g in range(n_groups)]
    mm = pc.min_max(v)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    filled = pc.fill_null(v, pa.scalar(lo, pa.int64())).to_numpy(zero_copy_only=False)
    nz = n_g - nn_g
    if (hi - lo) * max(len(filled), 1) < (1 << 62):
        # nulls were filled with lo, so their shifted contribution is 0 and
        # sum_g = acc_g + lo * n_nonnull_g restores the unshifted domain
        # with Python-int arithmetic (no int64 wrap for epoch-micros etc.)
        acc = np.zeros(n_groups, np.int64)
        np.add.at(acc, codes, filled - lo)
        sums = [int(acc[g]) + lo * int(nz[g]) for g in range(n_groups)]
    else:
        acc = np.zeros(n_groups, object)
        np.add.at(acc, codes, filled.astype(object))
        sums = [int(acc[g]) - lo * int(nn_g[g]) for g in range(n_groups)]
    # per-group exact min/max over NON-NULL rows only (filling nulls with
    # lo would corrupt group minima, so the scatter runs on the compacted
    # non-null subset); sentinel-initialized slots of all-null groups are
    # never emitted (nz[g] == 0 -> no min/max/sum keys, SQL NULL)
    if arr.null_count:
        nn_mask = ~pc.is_null(arr).to_numpy(zero_copy_only=False)
        codes_nn, v_nn = codes[nn_mask], filled[nn_mask]
    else:
        codes_nn, v_nn = codes, filled
    mn = np.full(n_groups, hi, np.int64)
    mx = np.full(n_groups, lo, np.int64)
    np.minimum.at(mn, codes_nn, v_nn)
    np.maximum.at(mx, codes_nn, v_nn)
    return [
        # a group whose values are all NULL sums to SQL NULL, not 0
        (
            {**base(g), "sum": str(sums[g]), "min": int(mn[g]), "max": int(mx[g])}
            if nz[g]
            else base(g)
        )
        if n_g[g]
        else None
        for g in range(n_groups)
    ]


def _encode_columns_to_rows(
    table: pa.Table,
    columns: list[str],
    codecs: dict[str, str],
    chunk_id: int,
    shared_cache: dict | None = None,
    stats_group_by: str | None = None,
) -> pa.Table:
    """Encode ``columns`` of one (already chunk-assigned, already sorted)
    Arrow table into encoded-chunk rows — the single implementation of the
    encoded-row contract, shared by every encode topology.

    ``shared_cache``: per-column codec artifacts reused across MANY calls
    (e.g. one FSST table per (scan partition, column) in the bucketed
    topology — per-fragment training would otherwise dominate).

    ``stats_group_by``: declared low-cardinality group column — every
    encoded row additionally carries exact per-group partials
    (``stats.by = {col, groups: {g: {n, nn, sum|bytes}}}``) so
    :func:`decode_aggregate` can answer GROUP BY queries from metadata
    alone.  Omitted when a chunk exceeds MAX_STAT_GROUPS distinct groups
    (the grouped decode path remains the sound fallback)."""
    cols: dict[str, list] = {k.name: [] for k in _ENC_ARROW}
    grp = None
    if stats_group_by is not None:
        grp = _group_codes(table[stats_group_by].combine_chunks())
    for idx, col in enumerate(columns):
        arr = table[col].combine_chunks()
        want = codecs.get(col, "auto")
        cache = dict((shared_cache or {}).get(col) or {})
        if want == "auto":
            codec, reason, _stats = choose_codec_arrow(arr)
            cache.update(_stats.get("_cache") or {})
        else:
            codec, reason = want, "forced"
        tag, payload, params = encode_column_arrow(arr, codec, cache=cache or None)
        ref_b, raw_b = _ref_and_raw_bytes(
            arr, tag, ref_hint=cache.get("ref_varint_zz")
        )
        st = _zone_map_dict(arr, tag)
        if grp is not None:
            codes, keys = grp
            parts = _group_partials(arr, tag, codes, len(keys))
            st["by"] = {
                "col": stats_group_by,
                "groups": {k: p for k, p in zip(keys, parts) if p is not None},
            }
        cols["chunk_id"].append(chunk_id)
        cols["col_idx"].append(idx)
        cols["column"].append(col)
        cols["dtype"].append(tag)
        cols["codec"].append(codec)
        cols["params"].append(json.dumps(params))
        cols["payload"].append(payload)
        cols["n_values"].append(len(arr))
        cols["raw_bytes"].append(raw_b)
        cols["ref_bytes"].append(ref_b)
        cols["enc_bytes"].append(len(payload))
        cols["crc32"].append(zlib.crc32(payload))
        cols["reason"].append(reason)
        cols["stats"].append(json.dumps(st))
    return pa.table(cols, schema=_ENC_ARROW)


def make_encode_chunk_fn(
    columns: list[str],
    codecs: dict[str, str],
    sort_key: str | None,
    stats_group_by: str | None = None,
    chunk_id_map: dict[int, int] | None = None,
):
    """Build the applyInArrow chunk encoder (closure shipped to executors).
    ``chunk_id_map``: inverse of the anti-collision grouping-key remap —
    maps the shuffled magic key back to the logical chunk id."""

    def encode_chunk(table: pa.Table) -> pa.Table:
        chunk_id = int(table["__chunk"][0].as_py())
        if chunk_id_map is not None:
            chunk_id = chunk_id_map[chunk_id]
        if sort_key is not None:
            table = table.take(pc.sort_indices(table[sort_key]))
        return _encode_columns_to_rows(
            table, columns, codecs, chunk_id, stats_group_by=stats_group_by
        )

    return encode_chunk


def _murmur3_long(value: int, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32.hashLong (the hash behind HashPartitioning
    of a single LongType grouping key) — driver-side, for planning the
    anti-collision remap."""
    M = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    def mix_k1(k1):
        k1 = (k1 * 0xCC9E2D51) & M
        k1 = rotl(k1, 15)
        return (k1 * 0x1B873593) & M

    def mix_h1(h1, k1):
        h1 ^= k1
        h1 = rotl(h1, 13)
        return (h1 * 5 + 0xE6546B64) & M

    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = mix_h1(seed & M, mix_k1(v & M))
    h1 = mix_h1(h1, mix_k1((v >> 32) & M))
    h1 ^= 8
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _chunk_key_remap(n_chunks: int, n_partitions: int) -> list[int]:
    """Magic long grouping keys, one per logical chunk id, chosen so
    Spark's hash partitioning spreads the chunks EVENLY over the shuffle
    partitions (chunk i lands in partition i mod n_partitions).

    Hashing n_chunks raw ids into an equal number of partitions is the
    balls-in-bins anti-pattern of guide §2.5: ~1/e of the reduce
    partitions come up empty and the fullest holds 3-4 chunks, so the
    encode stage runs at a fraction of the cores and its wall time is the
    straggler's.  The remap is planning-time only — the emitted chunk_id
    is mapped back to the logical id, so outputs are unchanged."""
    magics: list[int] = []
    v = 0
    for i in range(n_chunks):
        target = i % n_partitions
        while True:
            p = _murmur3_long(v) % n_partitions
            if p < 0:
                p += n_partitions
            if p == target:
                magics.append(v)
                v += 1
                break
            v += 1
    return magics


def _check_stats_group_by(stats_group_by: str | None, columns: list[str]) -> None:
    if stats_group_by is not None and stats_group_by not in columns:
        raise ValueError(
            f"stats_group_by column {stats_group_by!r} must be one of the "
            f"encoded columns (grouped aggregation needs it decodable for "
            f"the fallback path)"
        )


FRAG_SCHEMA = T.StructType(
    ENCODED_SCHEMA.fields
    + [T.StructField("__gkey", T.LongType()), T.StructField("__frag", T.LongType())]
)


def _encode_fragment_rows(
    table: pa.Table, columns: list[str], chunk_id: int
) -> pa.Table:
    """Lean encoder for INTERMEDIATE fragment rows (fragment-merge
    topology): fixed cheap codec policy — for_bitpack for integer
    domains (min/max only, packs clustered keys hard), raw64 for f64,
    raw_str for strings — and no ref/zone/grouped stats (the merge
    re-encodes the whole chunk with the full machinery, so only payload
    + params + crc matter here).  ~5x cheaper than the auto-choice
    encoder, which is pure overhead for rows that live one shuffle."""
    cols: dict[str, list] = {k.name: [] for k in _ENC_ARROW}
    for idx, col in enumerate(columns):
        arr = table[col].combine_chunks()
        tag = arrow_tag(arr.type)
        codec = "raw_str" if tag in STR_TAGS else (
            "raw64" if tag == "f64" else "for_bitpack"
        )
        tag, payload, params = encode_column_arrow(arr, codec)
        cols["chunk_id"].append(chunk_id)
        cols["col_idx"].append(idx)
        cols["column"].append(col)
        cols["dtype"].append(tag)
        cols["codec"].append(codec)
        cols["params"].append(json.dumps(params))
        cols["payload"].append(payload)
        cols["n_values"].append(len(arr))
        cols["raw_bytes"].append(0)
        cols["ref_bytes"].append(0)
        cols["enc_bytes"].append(len(payload))
        cols["crc32"].append(zlib.crc32(payload))
        cols["reason"].append("fragment")
        cols["stats"].append(None)
    return pa.table(cols, schema=_ENC_ARROW)


def _encode_table_fragment_merge(
    df: DataFrame,
    scan,
    key: str,
    columns: list[str],
    codecs: dict[str, str],
    n_chunks: int,
    sort_within_chunk: bool,
    stats_group_by: str | None,
) -> DataFrame:
    """Hash-chunk encode that never shuffles raw rows (guide §8: decide
    with small rows, move big rows once — here the heavy bytes move only
    as compressed fragments).

    The one-shuffle :func:`encode_table` pays twice per value on tables
    like lineitem: the JVM row->Arrow transpose into Python (measured
    2.9 s of a 5.5 s encode at sf1.0) and the raw-row shuffle (~1.6 s).
    This topology re-orders the pipeline:

    1. python-side scan (pyscan.py): each task reads its parquet split
       directly, computes chunk membership with the bit-exact numpy XXH64
       (``pmod(xxh64(key), n_chunks)`` == Spark's expression), and encodes
       each chunk's rows as a FRAGMENT — lean fixed codecs
       (:func:`_encode_fragment_rows`), so fragments ship compressed
       (clustered integer keys pack hard under for_bitpack);
    2. ONE shuffle of the fragments (a few KB-MB rows, no transpose),
       grouped on anti-collision magic keys (guide §2.5);
    3. per chunk: decode fragments, concatenate, key-sort, and re-encode
       the whole chunk with the standard machinery — the emitted rows
       satisfy the identical contract (chunk ids, codec auto-choice,
       stats, grouped partials).

    Worth it only when decode+re-encode is cheap relative to the raw-row
    transpose+shuffle — i.e. integer-dominated tables; the caller gates
    on the parquet footers' BYTE_ARRAY byte fraction."""
    spark = df.sparkSession
    try:
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        n_part = n_chunks
    magics = _chunk_key_remap(n_chunks, max(n_part, 1))
    frag_columns = list(columns) + ([key] if key not in columns else [])

    from ..kernels.xxh64 import pmod as _pmod
    from ..kernels.xxh64 import xxh64_bytes_bo, xxh64_int64

    def frag_fn(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        batches = list(batches)
        if not batches:
            return
        table = pa.Table.from_batches(batches)
        karr = table[key].combine_chunks()
        nulls = None
        if karr.null_count:
            nulls = pc.is_null(karr).to_numpy(zero_copy_only=False)
            karr = pc.fill_null(
                karr,
                "" if pa.types.is_string(karr.type)
                or pa.types.is_large_string(karr.type)
                else b"" if pa.types.is_binary(karr.type)
                or pa.types.is_large_binary(karr.type)
                else 0,
            )
        if pa.types.is_integer(karr.type):
            h = xxh64_int64(karr.cast(pa.int64()).to_numpy(zero_copy_only=False))
        else:
            blob, offs = arrow_to_bo(karr)
            h = xxh64_bytes_bo(blob, offs)
        if nulls is not None:
            h[nulls] = 42  # xxhash64(NULL) = the seed, per Spark
        code = _pmod(h, n_chunks)
        order = np.argsort(code, kind="stable")
        table = table.take(pa.array(order))
        cv = code[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(cv[1:] != cv[:-1]) + 1, [len(cv)]]
        )
        for ordinal, (a, b) in enumerate(zip(starts[:-1], starts[1:])):
            frag = table.slice(a, b - a)
            logical = int(cv[a])
            enc = _encode_fragment_rows(frag, frag_columns, logical)
            k = enc.num_rows
            enc = enc.append_column(
                "__gkey", pa.array(np.full(k, magics[logical], np.int64))
            )
            enc = enc.append_column(
                "__frag",
                pa.array(np.full(k, (pid << 20) | ordinal, np.int64)),
            )
            yield from enc.to_batches()

    frags = pyscan_map_in_arrow(
        spark, scan, frag_fn, FRAG_SCHEMA,
        columns=frag_columns, group="split", canonical_ts=True,
    )

    def merge_fn(table: pa.Table) -> pa.Table:
        logical = int(table["chunk_id"][0].as_py())
        table = table.take(
            pc.sort_indices(
                table, [("__frag", "ascending"), ("col_idx", "ascending")]
            )
        )
        dtypes = {
            table["column"][i].as_py(): table["dtype"][i].as_py()
            for i in range(table.num_rows)
        }
        parts: dict[str, list] = {}
        for name, codec, payload, params, crc, cid, nv in _iter_enc_rows(table):
            if crc is not None and zlib.crc32(payload) != crc:
                raise IOError(
                    f"fragment corruption: chunk {cid} column {name!r} crc mismatch"
                )
            arr = decode_column_arrow(
                dtypes[name], codec, payload, json.loads(params), nv
            )
            parts.setdefault(name, []).append(arr.cast(tag_to_arrow(dtypes[name])))
        tbl = pa.table({c: pa.concat_arrays(parts[c]) for c in frag_columns})
        if sort_within_chunk:
            tbl = tbl.take(pc.sort_indices(tbl[key]))
        return _encode_columns_to_rows(
            tbl, columns, codecs, logical, stats_group_by=stats_group_by
        )

    return frags.groupBy("__gkey").applyInArrow(merge_fn, schema=ENCODED_SCHEMA)


def encode_table(
    df: DataFrame,
    key: str,
    columns: list[str] | None = None,
    codecs: dict[str, str] | None = None,
    n_chunks: int = 32,
    sort_within_chunk: bool = True,
    stats_group_by: str | None = None,
) -> DataFrame:
    """Encode ``df`` into the encoded-chunk DataFrame (FIXTURES.md §4).

    ``key``: chunk-assignment column (url at production scale) — chunk id is
    ``pmod(xxhash64(key), n_chunks)``, deterministic in data only.
    ``codecs``: per-column codec name or "auto" (default: auto for all).
    ``sort_within_chunk``: sort chunk rows by ``key`` before encoding —
    deterministic value order (resume/verify) and better run/delta locality.
    ``stats_group_by``: declared low-cardinality group column whose exact
    per-chunk per-group partials ride the stats JSON — enables
    ``decode_aggregate(group_by=...)`` to run O(chunks) from metadata.
    """
    columns = columns or df.columns
    codecs = codecs or {}
    unknown = set(codecs) - set(columns)
    if unknown:
        raise ValueError(f"codecs for unknown columns: {sorted(unknown)}")
    _check_stats_group_by(stats_group_by, columns)
    # fragment-merge fast path: integer-dominated bare parquet scans skip
    # the raw-row shuffle AND the JVM row->Arrow transpose (see
    # _encode_table_fragment_merge).  String-heavy tables stay on the
    # row-shuffle path — their decode+re-encode (FSST) would cost more
    # than the transpose saves.
    scan = parquet_scan_info(df)
    if scan is not None:
        from .pyscan import _group_by_size, byte_array_fraction

        key_type = dict(df.dtypes).get(key)
        try:
            mpb = int(df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes"))
        except Exception:
            mpb = 128 << 20
        n_groups = len(_group_by_size(
            scan[0], mpb, df.sparkSession.sparkContext.defaultParallelism
        ))
        # measured gate: the two-stage topology wins only when stage 1 can
        # actually parallelize (sf1.0 lineitem, 6 row groups: 3.3s vs 5.5s;
        # sf0.1, ONE row group: 3.6s vs 1.8s — a serial stage 1 loses)
        if (
            key_type in ("string", "binary", "bigint")
            and n_groups >= 4
            and byte_array_fraction(scan[0]) < 0.25
        ):
            return _encode_table_fragment_merge(
                df, scan, key, columns, codecs, n_chunks,
                sort_within_chunk, stats_group_by,
            )
    logical = F.pmod(F.xxhash64(F.col(key)), F.lit(n_chunks))
    # anti-collision grouping key (guide §2.5): group on a magic long per
    # chunk whose hash partition is unique/even instead of the raw chunk
    # id — n_chunks ids hashed into ~n_chunks partitions would idle ~1/e
    # of the cores and pile 3-4 chunks on the slowest task.  The encoder
    # maps the magic back to the logical id, so output rows are unchanged.
    try:
        n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        n_part = n_chunks
    magics = _chunk_key_remap(n_chunks, max(n_part, 1))
    chunk = F.element_at(
        F.array(*[F.lit(m).cast("long") for m in magics]), (logical + 1).cast("int")
    ).alias("__chunk")
    fn = make_encode_chunk_fn(
        columns, codecs, key if sort_within_chunk else None, stats_group_by,
        chunk_id_map={m: i for i, m in enumerate(magics)},
    )
    # the sort key must ride along even when not an encoded column, else the
    # chunk sort would KeyError at executor time; it is never encoded (the
    # encode loop iterates `columns` only)
    select_cols = list(columns) + ([key] if sort_within_chunk and key not in columns else [])
    return (
        df.select(*select_cols, chunk)
        .groupBy("__chunk")
        .applyInArrow(fn, schema=ENCODED_SCHEMA)
    )


def encode_table_per_split(
    df: DataFrame,
    key: str,
    columns: list[str] | None = None,
    codecs: dict[str, str] | None = None,
    target_chunk_bytes: int = 32 << 20,
    stats_group_by: str | None = None,
) -> DataFrame:
    """SHUFFLE-FREE ingest encode: each scan partition's Arrow batches are
    packed into ~``target_chunk_bytes`` chunks and encoded in place — zero
    exchanges, so encode throughput scales with scan parallelism only.

    This is the 100 TB ingest path: re-encoding a crawl table should not
    shuffle the whole table; it encodes per input split, exactly like a
    columnar writer.  The trade-offs vs :func:`encode_table`:

    * chunk membership follows the INPUT FILE LAYOUT (stable for immutable
      files, e.g. closed crawl segments), not a pure function of row
      values — use the hash-chunk path (or :func:`compact_store`) when you
      need layout-independent resume/verify identities;
    * no global clustering by key — rows are key-sorted *within* each
      chunk, so run/delta locality still holds locally.

    chunk_id = low 63 bits of blake2b(partition id || ordinal-in-partition
    || first key || n_rows) — deterministic for a fixed layout; the
    partition id makes ids unique ACROSS scan partitions (ordinal alone
    resets per task, and (first_key, n_rows) recur for duplicate-keyed
    data with uniform Arrow batch sizes)."""
    import hashlib

    from pyspark import TaskContext

    columns = columns or df.columns
    codecs = codecs or {}
    unknown = set(codecs) - set(columns)
    if unknown:
        raise ValueError(f"codecs for unknown columns: {sorted(unknown)}")
    _check_stats_group_by(stats_group_by, columns)
    select_cols = list(columns) + ([key] if key not in columns else [])

    def fn(batches):
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        buf: list[pa.RecordBatch] = []
        buf_bytes = 0
        ordinal = 0

        def flush():
            nonlocal buf, buf_bytes, ordinal
            table = pa.Table.from_batches(buf)
            buf, buf_bytes = [], 0
            table = table.take(pc.sort_indices(table[key]))
            first_key = table[key][0].as_py()
            h = hashlib.blake2b(
                repr((pid, ordinal, first_key, table.num_rows)).encode(),
                digest_size=8,
            )
            ordinal += 1
            chunk_id = int.from_bytes(h.digest(), "big") >> 1  # 63-bit, non-negative
            return _encode_columns_to_rows(
                table, columns, codecs, chunk_id, stats_group_by=stats_group_by
            ).to_batches()

        for batch in batches:
            buf.append(batch)
            buf_bytes += batch.nbytes
            if buf_bytes >= target_chunk_bytes:
                yield from flush()
        if buf:
            yield from flush()

    # python-side scan fast path (pyscan.py): when the input is a bare
    # parquet scan, read the files with pyarrow inside the task instead of
    # paying the JVM row->Arrow transpose (measured ~4.7 s per 4.9 GB scan)
    scan = parquet_scan_info(df)
    if scan is not None:
        return pyscan_map_in_arrow(
            df.sparkSession, scan, fn, ENCODED_SCHEMA,
            columns=select_cols, group="split", canonical_ts=True,
        )
    return df.select(*select_cols).mapInArrow(fn, schema=ENCODED_SCHEMA)


BUCKETED_SCHEMA = T.StructType(ENCODED_SCHEMA.fields + [T.StructField("bucket", T.LongType())])


def encode_table_bucketed(
    df: DataFrame,
    key: str,
    columns: list[str] | None = None,
    codecs: dict[str, str] | None = None,
    n_buckets: int = 32,
    stats_group_by: str | None = None,
) -> DataFrame:
    """Hash-clustered encode that shuffles COMPRESSED bytes, not raw rows.

    The one-shuffle :func:`encode_table` moves the whole raw table through
    the exchange (scan + shuffle write + shuffle read + Arrow IPC ≈ 4x the
    input over one memory bus — the measured scaling bottleneck, see
    BASELINE.md).  This staged variant keeps the url-hash clustering but
    re-orders the pipeline:

    1. per scan partition (ZERO exchanges): sort rows by (bucket, key)
       where ``bucket = pmod(xxhash64(key), n_buckets)``, slice at bucket
       boundaries, and encode each slice as its own chunk (unique
       blake2b chunk_id, ``bucket`` column carried through);
    2. the caller clusters with ``.repartition("bucket")`` +
       ``write.partitionBy("bucket", ...)`` — the only exchange ships
       encoded fragments at the compressed ratio (~0.3x), entirely
       JVM-side (no second Python hop).

    All rows of a bucket land in one partition directory, so key-equality
    lookups prune to one bucket via PartitionFilters and zone maps prune
    fragments within it.  Like :func:`encode_table_per_split`, chunk ids
    are layout-deterministic (not value-pure): lock the layout for resume
    (see ``_check_ingest_conf``) or re-cluster via ``compact_store``.

    Sizing: fragment count is (scan partitions x n_buckets) — size
    ``n_buckets`` so a bucket holds at least tens of MB (e.g.
    ``total_bytes / (64 << 20)``), and write ``partitionBy("bucket")``
    ONLY (fragments ride as rows; a two-level
    ``partitionBy("bucket", "chunk_id")`` creates P x B directories,
    measured 10x slower at small scale from filesystem metadata alone)."""
    columns = columns or df.columns
    codecs = codecs or {}
    unknown = set(codecs) - set(columns)
    if unknown:
        raise ValueError(f"codecs for unknown columns: {sorted(unknown)}")
    _check_stats_group_by(stats_group_by, columns)
    select_cols = list(columns) + ([key] if key not in columns else [])
    bucket_col = F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).alias("__bucket")

    def fn(batches):
        import hashlib

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        batches = list(batches)
        if not batches:
            return
        table = pa.Table.from_batches(batches)
        # one multi-key sort gives bucket grouping AND key order per bucket
        table = table.take(pc.sort_indices(table, [("__bucket", "ascending"), (key, "ascending")]))
        bv = table["__bucket"].to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.flatnonzero(bv[1:] != bv[:-1]) + 1, [len(bv)]])
        # train string symbol tables ONCE per (partition, column): with
        # P x n_buckets small fragments, per-fragment FSST training would
        # dominate encode cost (measured 7x slowdown without sharing).
        # Training is LAZY (memoizing thunk, fired on the first fragment
        # whose auto-chosen codec is fsst) so columns that end up
        # dict/rle/raw never pay it.
        from ..codecs.strings import STR_CODECS

        def _lazy_fsst_table(blob, offs):
            memo = {}

            def get():
                if "t" not in memo:
                    memo["t"] = STR_CODECS["fsst"]._train(blob, offs)
                return memo["t"]

            return get

        shared: dict[str, dict] = {}
        for col in columns:
            arr = table[col].combine_chunks()
            tag = arrow_tag(arr.type)
            if tag in STR_TAGS:
                if arr.null_count:
                    arr = pc.fill_null(arr, "" if tag == "str" else b"")
                blob, offs = arrow_to_bo(arr)
                shared[col] = {"fsst_table_fn": _lazy_fsst_table(blob, offs)}
        for a, b in zip(starts[:-1], starts[1:]):
            frag = table.slice(a, b - a).drop_columns("__bucket")
            bucket = int(bv[a])
            h = hashlib.blake2b(
                repr((pid, bucket, frag[key][0].as_py(), frag.num_rows)).encode(),
                digest_size=8,
            )
            chunk_id = int.from_bytes(h.digest(), "big") >> 1
            enc = _encode_columns_to_rows(
                frag, columns, codecs, chunk_id,
                shared_cache=shared, stats_group_by=stats_group_by,
            )
            enc = enc.append_column("bucket", pa.array(np.full(enc.num_rows, bucket, np.int64)))
            yield from enc.to_batches()

    # python-side scan fast path (pyscan.py): read the input files with
    # pyarrow inside the task and compute the bucket with the numpy XXH64
    # kernel (bit-identical to Spark's xxhash64 — kernels/xxh64.py, pinned
    # by tests), skipping the JVM row->Arrow transpose of the whole raw
    # table.  Only for key types whose Spark hashing the kernel replicates
    # (string/binary utf8 bytes, LongType 8-byte LE).
    scan = parquet_scan_info(df)
    key_type = dict(df.dtypes).get(key)
    if scan is not None and key_type in ("string", "binary", "bigint"):
        from ..kernels.xxh64 import pmod as _pmod
        from ..kernels.xxh64 import xxh64_bytes_bo, xxh64_int64

        def fn_with_bucket(batches):
            def gen():
                for b in batches:
                    t = pa.Table.from_batches([b])
                    karr = t[key].combine_chunks()
                    nulls = None
                    if karr.null_count:
                        nulls = pc.is_null(karr).to_numpy(zero_copy_only=False)
                        karr = pc.fill_null(
                            karr,
                            "" if pa.types.is_string(karr.type)
                            or pa.types.is_large_string(karr.type)
                            else b"" if pa.types.is_binary(karr.type)
                            or pa.types.is_large_binary(karr.type)
                            else 0,
                        )
                    if pa.types.is_integer(karr.type):
                        h = xxh64_int64(
                            karr.cast(pa.int64()).to_numpy(zero_copy_only=False)
                        )
                    else:
                        blob, offs = arrow_to_bo(karr)
                        h = xxh64_bytes_bo(blob, offs)
                    if nulls is not None:
                        h[nulls] = 42  # xxhash64(NULL) = the seed, per Spark
                    bucket = _pmod(h, n_buckets)
                    t = t.append_column("__bucket", pa.array(bucket, pa.int64()))
                    yield from t.to_batches()

            yield from fn(gen())

        return pyscan_map_in_arrow(
            df.sparkSession, scan, fn_with_bucket, BUCKETED_SCHEMA,
            columns=select_cols, group="split", canonical_ts=True,
        )
    return df.select(*select_cols, bucket_col).mapInArrow(fn, schema=BUCKETED_SCHEMA)


def column_meta(enc: DataFrame) -> list:
    """(col_idx, column, dtype) rows describing an encoded table — one tiny
    planning job; pass to decode_table to avoid re-running it."""
    return (
        enc.select("col_idx", "column", "dtype").distinct().orderBy("col_idx").collect()
    )


def _prune(enc: DataFrame, meta: list, columns: list[str] | None):
    """Column pruning through the codec layer: the encoded table is one row
    per (chunk, column), so selecting a column subset is a plain filter on
    ``column`` — which Catalyst pushes down to the encoded-store parquet
    scan (PushedFilters: In(column, ...)), skipping the pruned columns'
    payload bytes entirely.  At 100 TB this is the difference between
    reading 5 columns and reading the 1 the query needs."""
    if columns is None:
        return enc, meta
    known = {r["column"] for r in meta}
    missing = set(columns) - known
    if missing:
        raise ValueError(f"unknown columns: {sorted(missing)}")
    meta = [r for r in meta if r["column"] in set(columns)]
    return enc.filter(F.col("column").isin(list(columns))), meta


def _iter_enc_rows(batch, with_stats: bool = False):
    """Iterate encoded-chunk rows of an Arrow batch/table WITHOUT
    materializing payload bytes into Python: payloads come out as zero-copy
    memoryviews over the Arrow buffer (every decode kernel reads them via
    ``np.frombuffer``).  Yields (column, codec, payload, params_json,
    crc_or_None, chunk_id, n_values[, stats_json])."""
    cols = batch.column("column")
    codecs_a = batch.column("codec")
    payloads = batch.column("payload")
    params_a = batch.column("params")
    names = set(batch.schema.names)
    crcs = batch.column("crc32") if "crc32" in names else None
    cids = batch.column("chunk_id")
    nvals = batch.column("n_values")
    stats = batch.column("stats") if with_stats and "stats" in names else None
    if isinstance(batch, pa.Table):
        cols, codecs_a, payloads, params_a, cids, nvals = (
            a.combine_chunks() for a in (cols, codecs_a, payloads, params_a, cids, nvals)
        )
        crcs = crcs.combine_chunks() if crcs is not None else None
        stats = stats.combine_chunks() if stats is not None else None
    for i in range(len(cols)):
        crc = crcs[i].as_py() if crcs is not None else None
        row = (
            cols[i].as_py(),
            codecs_a[i].as_py(),
            memoryview(payloads[i].as_buffer()),
            params_a[i].as_py(),
            crc,
            cids[i].as_py(),
            nvals[i].as_py(),
        )
        if with_stats:
            row = row + ((stats[i].as_py() if stats is not None else None),)
        yield row


_PRED_OPS = {
    ">=": pc.greater_equal,
    ">": pc.greater,
    "<=": pc.less_equal,
    "<": pc.less,
    "==": pc.equal,
    "!=": pc.not_equal,
}


def _normalize_where(where) -> list[tuple]:
    """``where`` is a conjunction of (column, op, literal) conditions —
    the pushdown-able predicate language.  Ops: ``>= > <= < == !=``, plus
    ``in`` (literal = list of values) and ``between`` (literal =
    (lo, hi) inclusive — zone-map-prunable on both bounds)."""
    conds = []
    for cond in where or []:
        col, op, val = cond
        if op == "between":
            lo, hi = val
            conds.append((col, ">=", lo))
            conds.append((col, "<=", hi))
            continue
        if op not in _PRED_OPS and op != "in":
            raise ValueError(
                f"unsupported predicate op {op!r} (have {sorted(_PRED_OPS)} + ['in', 'between'])"
            )
        conds.append((col, op, val))
    return conds


def _stats_exclude(conds: list[tuple], stats_by_col: dict) -> bool:
    """True when any condition provably matches NO row of the chunk, per
    the per-chunk min/max zone maps (int64 domain; ts/date/bool columns
    compare against their int64 representation)."""
    def is_num(v):
        return isinstance(v, (int, float)) and not isinstance(v, bool)

    for col, op, val in conds:
        s = stats_by_col.get(col)
        if not s:
            continue
        lo, hi = s.get("min"), s.get("max")
        if lo is None or hi is None:
            continue
        if op == "in":
            if all(is_num(v) for v in val) and all(not (lo <= v <= hi) for v in val):
                return True
            continue
        if not is_num(val):
            continue
        if (
            (op in (">=", ">") and hi < val)
            or (op == ">" and hi <= val)
            or (op in ("<=", "<") and lo > val)
            or (op == "<" and lo >= val)
            or (op == "==" and not (lo <= val <= hi))
        ):
            return True
    return False


def _apply_where(decoded: dict, conds: list[tuple]):
    """AND of the conditions over decoded Arrow arrays -> bool mask (or
    None when no condition applies)."""
    mask = None
    for col, op, val in conds:
        arr = decoded[col]
        if op == "in":
            m = pc.is_in(arr, value_set=pa.array(list(val)).cast(arr.type))
        else:
            m = _PRED_OPS[op](arr, pa.scalar(val, arr.type))
        mask = m if mask is None else pc.and_(mask, m)
    return mask


def decode_table(
    enc: DataFrame,
    meta: list | None = None,
    columns: list[str] | None = None,
    where: list[tuple] | None = None,
) -> DataFrame:
    """Inverse of :func:`encode_table`: encoded chunks -> original rows.

    Self-describing (schema from the dtype tags); one groupBy on chunk_id.
    ``meta``: precomputed :func:`column_meta` (skips the planning job).
    ``columns``: decode only this subset (projection pushdown — pruned
    columns' payloads are never read, decoded, or shipped over Arrow).
    ``where``: filter pushdown — same three-tier semantics as
    :func:`decode_table_colocated` (zone-map chunk skip, predicate-first
    decode, in-UDF row filter)."""
    conds = _normalize_where(where)
    out_columns = columns
    if columns is not None and conds:
        pred_only = [c for c, _, _ in conds if c not in columns]
        columns = list(columns) + sorted(set(pred_only))
    if meta is None:
        meta = column_meta(enc)
    enc, meta = _prune(enc, meta, columns)
    columns = [r["column"] for r in meta]
    tags = {r["column"]: r["dtype"] for r in meta}
    out_cols = [c for c in columns if out_columns is None or c in set(out_columns)]
    pred_cols = list(dict.fromkeys(c for c, _, _ in conds))
    unknown_pred = set(pred_cols) - set(columns)
    if unknown_pred:
        raise ValueError(f"where references unknown columns: {sorted(unknown_pred)}")
    out_schema = T.StructType(
        [T.StructField("__chunk", T.LongType())]
        + [T.StructField(c, _TAG_TO_SPARK[tags[c]]) for c in out_cols]
    )
    # Spark-facing arrow types: 32-bit-offset string/binary, UTC timestamps
    def spark_arrow_type(tag: str) -> pa.DataType:
        if tag == "str":
            return pa.string()
        if tag == "bin":
            return pa.binary()
        if tag == "ts_us":
            return pa.timestamp("us", tz="UTC")
        return tag_to_arrow(tag)

    arrow_out = pa.schema(
        [("__chunk", pa.int64())]
        + [(c, spark_arrow_type(tags[c])) for c in out_cols]
    )

    def decode_chunk(table: pa.Table) -> pa.Table:
        n = int(table["n_values"][0].as_py())
        chunk_id = int(table["chunk_id"][0].as_py())
        by_col, stats_by_col = {}, {}
        for name, codec, payload, params, crc, _cid, _nv, st in _iter_enc_rows(
            table, with_stats=True
        ):
            if crc is not None and zlib.crc32(payload) != crc:
                raise IOError(
                    f"payload corruption: chunk {chunk_id} column {name!r} "
                    f"crc mismatch (stored {crc})"
                )
            by_col[name] = (codec, payload, json.loads(params))
            if st and conds:
                stats_by_col[name] = json.loads(st)
        empty = pa.table(
            {f.name: pa.array([], type=f.type) for f in arrow_out}, schema=arrow_out
        )
        if conds and _stats_exclude(conds, stats_by_col):
            return empty  # zone-map chunk skip: no payload decode at all
        decoded = {}
        out_set = set(out_cols)

        def get(c):
            if c not in decoded:
                codec, payload, params = by_col[c]
                arr = decode_column_arrow(tags[c], codec, payload, params, n)
                if c in out_set:
                    arr = arr.cast(arrow_out.field(c).type)
                decoded[c] = arr
            return decoded[c]

        mask = None
        sel = None
        if conds:
            for c in pred_cols:
                get(c)
            mask = pc.fill_null(_apply_where(decoded, conds), False)
            sel = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
            if sel.size == 0:
                return empty
        out = {}
        for col in out_cols:
            if sel is not None and col not in decoded:
                codec, payload, params = by_col[col]
                out[col] = decode_column_arrow_selected(
                    tags[col], codec, payload, params, n, sel
                ).cast(arrow_out.field(col).type)
            else:
                arr = get(col)
                out[col] = pc.filter(arr, mask) if mask is not None else arr
        m = len(out[out_cols[0]]) if out_cols else n
        return pa.table(
            {"__chunk": pa.array(np.full(m, chunk_id, dtype=np.int64)), **out},
            schema=arrow_out,
        )

    return enc.groupBy("chunk_id").applyInArrow(decode_chunk, schema=out_schema)


def decode_table_colocated(
    enc: DataFrame,
    meta: list | None = None,
    columns: list[str] | None = None,
    check_layout: bool = True,
    where: list[tuple] | None = None,
) -> DataFrame:
    """Shuffle-FREE decode for chunk-partitioned encoded tables.

    :func:`decode_table` groups by chunk_id (one shuffle).  When the input
    is an :class:`EncodedStore` read (written ``partitionBy(chunk_id)``, one
    parquet file of ~12 rows per chunk, never split across scan partitions),
    all rows of a chunk already arrive in the same task — so decode is a
    pure ``mapInArrow`` over the scan: zero exchanges.  This is the 100 TB
    read path: decode throughput scales with scan parallelism only.

    ``check_layout``: probe colocation first (a cheap job reading only the
    chunk_id column — payloads are column-pruned away) and fall back to the
    shuffled :func:`decode_table` when any chunk is split across scan
    partitions (e.g. tiny ``maxPartitionBytes``), instead of erroring
    mid-job.  The executor-side hard error remains as the last-resort
    guard against silent data loss when the check is skipped.

    ``columns``: projection pushdown (see :func:`decode_table`).

    ``where``: FILTER pushdown through the codec layer — a conjunction of
    ``(column, op, literal)`` conditions (ops >= > <= < == !=) evaluated
    INSIDE the decode UDF, three tiers deep:

    1. zone-map chunk skip: a chunk whose min/max stats provably exclude
       the predicate decodes NOTHING (no payload bytes touched);
    2. predicate-first decode: surviving chunks decode only the predicate
       columns, and bail before the remaining columns when no row matches;
    3. row filter: only matching rows are shipped back over Arrow IPC —
       at 100 TB the IPC-out volume is the selectivity, not the table.

    Predicate columns need not be in ``columns``; they are decoded for
    the mask and dropped from the output."""
    conds = _normalize_where(where)
    out_columns = columns
    if columns is not None and conds:
        pred_only = [c for c, _, _ in conds if c not in columns]
        columns = list(columns) + sorted(set(pred_only))
    # python-side scan fast path (pyscan.py): a bare parquet store scan is
    # executed inside the Python task (pyarrow reader, one task per
    # partition directory), skipping both the JVM row->Arrow transpose and
    # — because a directory can never split across tasks — the colocation
    # probe.  Measured gates (bench_logs A/B, 10M + sf0.1):
    # * column-subset reads stay on the JVM scan — Spark's parquet reader
    #   skips non-matching payload PAGES via the column index, which a
    #   whole-file pyarrow read cannot (pruned decode 1.3x slower there);
    # * small stores stay on the JVM scan — per-Python-task overhead beats
    #   the transpose saving below ~4 MB per directory group;
    # * a store whose files all share one directory would serialize into a
    #   single task — JVM scan.
    scan = parquet_scan_info(enc) if out_columns is None else None
    if scan is not None:
        from .pyscan import _group_by_dir, _total_bytes

        groups = _group_by_dir(scan[0])
        if len(groups) < min(4, len(scan[0])) or _total_bytes(scan[0]) < (
            4 << 20
        ) * len(groups):
            scan = None
    if check_layout and scan is None:
        split = (
            enc.select(F.spark_partition_id().alias("__p"), "chunk_id")
            .groupBy("chunk_id")
            .agg(F.countDistinct("__p").alias("__np"))
            .filter(F.col("__np") > 1)
            .limit(1)
            .count()
        )
        if split:
            import warnings

            warnings.warn(
                "encoded table is not chunk-colocated (a chunk spans scan "
                "partitions); falling back to the one-shuffle decode_table()"
            )
            return decode_table(enc, meta, out_columns, where=where)
    if meta is None:
        meta = column_meta(enc)
    enc, meta = _prune(enc, meta, columns)
    columns = [r["column"] for r in meta]
    tags = {r["column"]: r["dtype"] for r in meta}
    out_cols = [c for c in columns if out_columns is None or c in set(out_columns)]
    pred_cols = list(dict.fromkeys(c for c, _, _ in conds))
    unknown_pred = set(pred_cols) - set(columns)
    if unknown_pred:
        raise ValueError(f"where references unknown columns: {sorted(unknown_pred)}")

    def spark_arrow_type(tag: str) -> pa.DataType:
        if tag == "str":
            return pa.string()
        if tag == "bin":
            return pa.binary()
        if tag == "ts_us":
            return pa.timestamp("us", tz="UTC")
        return tag_to_arrow(tag)

    out_schema = T.StructType(
        [T.StructField("__chunk", T.LongType())]
        + [T.StructField(c, _TAG_TO_SPARK[tags[c]]) for c in out_cols]
    )
    arrow_out = pa.schema(
        [("__chunk", pa.int64())] + [(c, spark_arrow_type(tags[c])) for c in out_cols]
    )

    def fn(batches):
        pending: dict[int, dict] = {}
        counts: dict[int, int] = {}
        stats_acc: dict[int, dict] = {}

        def flush(chunk_id: int):
            cols = pending.pop(chunk_id)
            n = counts.pop(chunk_id)
            st = stats_acc.pop(chunk_id, {})
            # tier 1: zone-map chunk skip — provably-excluded chunks decode
            # nothing (their payload bytes are never touched)
            if conds and _stats_exclude(conds, st):
                return None

            decoded: dict[str, pa.Array] = {}

            out_set = set(out_cols)

            def get(c):
                if c not in decoded:
                    codec, payload, params = cols[c]
                    arr = decode_column_arrow(tags[c], codec, payload, params, n)
                    if c in out_set:
                        arr = arr.cast(arrow_out.field(c).type)
                    decoded[c] = arr
                return decoded[c]

            mask = None
            sel = None
            if conds:
                # tier 2: predicate-first decode — bail before the
                # non-predicate columns when nothing matches
                for c in pred_cols:
                    get(c)
                mask = pc.fill_null(_apply_where(decoded, conds), False)
                sel = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
                if sel.size == 0:
                    return None
            out = {}
            for c in out_cols:
                if sel is not None and c not in decoded:
                    # tier 2b: random-access decode of the SELECTED rows
                    # only — non-predicate columns never decode bytes the
                    # filter already dropped
                    codec, payload, params = cols[c]
                    out[c] = decode_column_arrow_selected(
                        tags[c], codec, payload, params, n, sel
                    ).cast(arrow_out.field(c).type)
                else:
                    arr = get(c)
                    # tier 3: only surviving rows cross Arrow IPC
                    out[c] = pc.filter(arr, mask) if mask is not None else arr
            m = len(out[out_cols[0]]) if out_cols else (sel.size if sel is not None else n)
            chunk_arr = pa.array(np.full(m, chunk_id, dtype=np.int64))
            return pa.RecordBatch.from_arrays(
                [chunk_arr] + [out[c] for c in out_cols], schema=arrow_out
            )

        for batch in batches:
            for name, codec, payload, params, crc, cid, nv, st in _iter_enc_rows(
                batch, with_stats=True
            ):
                if crc is not None and zlib.crc32(payload) != crc:
                    raise IOError(
                        f"payload corruption: chunk {cid} column {name!r} crc mismatch"
                    )
                pending.setdefault(cid, {})[name] = (codec, payload, json.loads(params))
                counts[cid] = nv
                if st and conds:
                    stats_acc.setdefault(cid, {})[name] = json.loads(st)
                if len(pending[cid]) == len(columns):
                    got = flush(cid)
                    if got is not None:
                        yield got
        # chunks missing columns at end-of-partition indicate a layout that
        # split a chunk across partitions — decode_table (shuffled) handles
        # those; here it is a hard error to avoid silent data loss
        if pending:
            raise RuntimeError(
                f"chunks {sorted(pending)} not fully co-located in one scan "
                "partition; use decode_table() instead"
            )

    if scan is not None:
        need = ["chunk_id", "column", "codec", "payload", "params",
                "n_values", "crc32"] + (["stats"] if conds else [])
        return pyscan_map_in_arrow(
            enc.sparkSession, scan, fn, out_schema,
            columns=need, column_filter=list(columns), group="dir",
        )
    return enc.mapInArrow(fn, schema=out_schema)


_AGG_SCHEMA = T.StructType(
    [
        T.StructField("column", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_nulls", T.LongType()),
        T.StructField("sum_exact", T.StringType()),
        T.StructField("min_exact", T.StringType()),
        T.StructField("max_exact", T.StringType()),
        T.StructField("sum_bytes", T.LongType()),
    ]
)

_GAGG_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType()),
        T.StructField("column", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_nulls", T.LongType()),
        T.StructField("sum_exact", T.StringType()),
        T.StructField("min_exact", T.StringType()),
        T.StructField("max_exact", T.StringType()),
        T.StructField("sum_bytes", T.LongType()),
    ]
)


def _stats_aggregate(enc: DataFrame) -> DataFrame:
    """The single metadata job of the stats fast path: per-column exact
    aggregates from the per-chunk stats JSON, plus a ``__ok`` flag (1 iff
    EVERY chunk row of the column carries the stats the dtype needs) so
    the caller can fall back per column without a separate pre-check scan.
    The payload column never appears — Catalyst prunes it from the
    encoded-store parquet scan.  The stats JSON is parsed ONCE per row
    (from_json struct; min/max stay strings because f64 zone values are
    fractional — the long cast below is input-guarded by dtype)."""
    st = F.from_json(
        "stats", "n_nulls BIGINT, sum STRING, min STRING, max STRING"
    )
    meta_cols = enc.select(
        "column", "dtype", "n_values", "raw_bytes", st.alias("__st")
    )
    nn = F.col("__st.n_nulls")
    sm = F.col("__st.sum")
    needs_sum = ~F.col("dtype").isin("str", "bin", "f64")
    ok = (nn.isNotNull() & (~needs_sum | sm.isNotNull())).cast("int")
    return (
        meta_cols.groupBy("column")
        .agg(
            F.sum("n_values").alias("n_rows"),
            F.sum(nn).alias("n_nulls"),
            F.when(
                F.max("dtype").isin("str", "bin", "f64"), F.lit(None)
            )
            .otherwise(
                F.sum(sm.cast("decimal(38,0)")).cast("string")
            )
            .alias("sum_exact"),
            # guard the INPUT, not just the output: f64 stats hold
            # fractional min/max and an unconditional ANSI cast to
            # long would error even under a when() on the result
            F.min(
                F.when(
                    ~F.col("dtype").isin("str", "bin", "f64"),
                    F.col("__st.min"),
                ).cast("long")
            )
            .cast("string")
            .alias("min_exact"),
            F.max(
                F.when(
                    ~F.col("dtype").isin("str", "bin", "f64"),
                    F.col("__st.max"),
                ).cast("long")
            )
            .cast("string")
            .alias("max_exact"),
            F.when(
                F.max("dtype").isin("str", "bin"), F.sum("raw_bytes")
            ).alias("sum_bytes"),
            F.min(ok).alias("__ok"),
        )
        .select(
            "column", "n_rows", "n_nulls", "sum_exact",
            "min_exact", "max_exact", "sum_bytes", "__ok",
        )
    )


# Spark-side schema of the per-chunk grouped partials written at encode
# time (stats.by) — from_json returns null for rows lacking them
_BY_JSON_SCHEMA = (
    "col STRING, groups MAP<STRING, "
    "STRUCT<n: BIGINT, nn: BIGINT, sum: STRING, min: BIGINT, max: BIGINT, bytes: BIGINT>>"
)


def _grouped_stats_aggregate(enc: DataFrame, group_by: str) -> DataFrame:
    """The single metadata job of the GROUPED stats fast path: explode the
    per-chunk per-group partials and combine them per (column, group).
    ``__ok`` is 1 iff every chunk row of the column carries grouped stats
    declared for this ``group_by`` column (explode_outer keeps rows
    without them, flagged 0, so the flag rides the same job).  One
    from_json parse per row: the parsed struct is materialized as its own
    projection first — referencing ``by`` from both the flag and the
    explode generator would JSON-parse every row twice (subexpression
    elimination does not span the Project/Generate operator boundary)."""
    parsed = enc.select(
        "column",
        F.from_json("stats", f"by STRUCT<{_BY_JSON_SCHEMA}>")["by"].alias("__by"),
    )
    by = F.col("__by")
    ok = (by.isNotNull() & (by["col"] == F.lit(group_by))).cast("int")
    ex = parsed.select(
        "column",
        ok.alias("__ok"),
        F.explode_outer(by["groups"]).alias("__g", "__gv"),
    )
    return ex.groupBy("column", "__g").agg(
        F.sum("__gv.n").alias("n_rows"),
        F.sum("__gv.nn").alias("n_nulls"),
        F.sum(F.col("__gv.sum").cast("decimal(38,0)")).cast("string").alias("sum_exact"),
        F.min("__gv.min").cast("string").alias("min_exact"),
        F.max("__gv.max").cast("string").alias("max_exact"),
        F.sum("__gv.bytes").alias("sum_bytes"),
        F.min("__ok").alias("__ok"),
    )


def _agg_row_analytic(tag: str, codec: str, payload, params: dict, nv: int):
    """Exact per-chunk aggregate partials computed from the PAYLOAD
    STRUCTURE without materializing decoded values (guide §1.2: don't
    compute things you throw away).  Returns the partial-row tuple
    (n_nulls, sum_exact, min_exact, max_exact, sum_bytes) or None when
    this (tag, codec) combination needs the full decode.

    Soundness per case (all against the decode-path semantics):
    * n_nulls: popcount of the validity bitmap section (== null_count of
      the decoded array by construction).
    * strings: sum_bytes is the total decoded byte count; null slots
      encode as empty values, so they contribute 0 to both paths.
      raw_str: the blob section length.  dict_str: dictionary value
      lengths gathered by index — the index stream decodes, the bytes
      never copy.  rle_str: run-value lengths dot run lengths.  fsst:
      per-token symbol lengths summed (escape pairs contribute exactly
      their literal byte) — no output gather.
    * f64: only n_nulls is reported (float sums are order-dependent).
    * rle_varint (null-free only): sum = Σ value·run_len in exact Python
      ints, min/max over the run values (every run is non-empty).  With
      nulls the excluded slots sit inside runs — fall back to decode.
    * other integer codecs: decoding IS the aggregate cost — fall back."""
    from ..codecs.container import unpack_sections

    n_nulls = 0
    if params.get("nulls") == "1":
        bitmap_b, payload = unpack_sections(payload)
        bits = np.unpackbits(np.frombuffer(bitmap_b, dtype=np.uint8))[:nv]
        n_nulls = int(bits.sum())

    if tag in STR_TAGS:
        if codec == "raw_str":
            _lens_pay, blob = unpack_sections(payload)
            return n_nulls, None, None, None, len(blob)
        if codec == "dict_str":
            dn = int(params["dict_n"])
            dlens_pay, _dblob, idx_pay = unpack_sections(payload)
            if nv == 0:
                return n_nulls, None, None, None, 0
            dlens = varint.decode(dlens_pay, count=dn, width=64).astype(np.int64)
            codes = varint.decode(idx_pay, count=nv, width=64).astype(np.int64)
            return n_nulls, None, None, None, int(dlens[codes].sum())
        if codec == "rle_str":
            runs = int(params["runs"])
            if runs == 0:
                return n_nulls, None, None, None, 0
            rlens_pay, _rblob, rl_pay = unpack_sections(payload)
            rlens = varint.decode(rlens_pay, count=runs, width=64).astype(np.int64)
            run_lens = varint.decode(rl_pay, count=runs, width=64).astype(np.int64)
            return n_nulls, None, None, None, int(rlens @ run_lens)
        if codec == "fsst":
            from ..codecs.strings import STR_CODECS

            f = STR_CODECS["fsst"]
            sym_len, _sym_bytes, _comp_lens, codes = f._parse_payload(
                payload, params, nv
            )
            lens8 = np.take(sym_len, codes, mode="clip").astype(np.int64)
            ep = np.flatnonzero(codes == 255)
            if ep.size:
                run_start = np.empty(ep.size, dtype=bool)
                run_start[0] = True
                np.greater(np.diff(ep), 1, out=run_start[1:])
                first_of = ep[np.flatnonzero(run_start)][np.cumsum(run_start) - 1]
                true_esc = ep[((ep - first_of) & 1) == 0]
                lit = true_esc + 1
                lit = lit[lit < codes.size]
                lens8[true_esc] = 1
                lens8[lit] = 0
            return n_nulls, None, None, None, int(lens8.sum())
        return None

    if tag == "f64":
        return n_nulls, None, None, None, None
    if codec == "rle_varint" and n_nulls == 0:
        runs = int(params["runs"])
        if runs == 0:
            return n_nulls, "0", None, None, None
        from ..kernels.zigzag import unzigzag

        vals_pay, lens_pay = unpack_sections(payload)
        run_vals = unzigzag(varint.decode(vals_pay, count=runs, width=64))
        run_lens = varint.decode(lens_pay, count=runs, width=64).astype(np.int64)
        total = int((run_vals.astype(object) * run_lens.astype(object)).sum())
        return (
            n_nulls,
            str(total),
            str(int(run_vals.min())),
            str(int(run_vals.max())),
            None,
        )
    return None


def _agg_decode_path(enc: DataFrame) -> DataFrame:
    """Decode-path aggregation: per-(chunk, column) partials are computed
    INSIDE the decode UDF, so no decoded rows ever cross the Python->JVM
    boundary — the UDF output is one tiny row per encoded chunk row.
    Chunks whose (dtype, codec) admits it are aggregated straight from the
    payload structure (:func:`_agg_row_analytic`) without materializing
    the decoded column at all."""

    def fn(batches):
        for batch in batches:
            out = {k.name: [] for k in _AGG_SCHEMA.fields}
            tags = batch.column("dtype")  # mapInArrow always feeds RecordBatches
            for i, (name, codec, payload, params, _crc, _cid, nv) in enumerate(
                _iter_enc_rows(batch)
            ):
                tag = tags[i].as_py()
                got = _agg_row_analytic(tag, codec, payload, json.loads(params), nv)
                if got is not None:
                    out["column"].append(name)
                    out["n_rows"].append(int(nv))
                    out["n_nulls"].append(got[0])
                    out["sum_exact"].append(got[1])
                    out["min_exact"].append(got[2])
                    out["max_exact"].append(got[3])
                    out["sum_bytes"].append(got[4])
                    continue
                arr = decode_column_arrow(
                    tag, codec, payload, json.loads(params), nv
                )
                n_nulls = arr.null_count
                sum_exact = None
                min_exact = None
                max_exact = None
                sum_bytes = None
                t = arr.type
                if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
                    sum_bytes = int(pc.sum(pc.binary_length(arr)).as_py() or 0)
                elif pa.types.is_floating(t):
                    pass  # fp sums are order-dependent; not exposed exactly
                else:
                    if pa.types.is_timestamp(t):
                        v = arr.cast(pa.int64())
                    elif pa.types.is_date(t):
                        v = arr.cast(pa.int32()).cast(pa.int64())
                    elif pa.types.is_boolean(t):
                        v = arr.cast(pa.int64())
                    else:
                        v = arr.cast(pa.int64())
                    # Arrow sums in an int64 accumulator, which WRAPS for
                    # realistic inputs (e.g. 400k epoch-micros ≈ 7e20).
                    # Exact fast path: shift by the chunk min so the Arrow
                    # sum runs over the (small) in-chunk range, then add
                    # n*min back with Python-int arithmetic — epoch-micros
                    # chunks stay vectorized instead of object-summing
                    mm = pc.min_max(v)
                    lo_, hi_ = mm["min"].as_py(), mm["max"].as_py()
                    min_exact = str(lo_) if lo_ is not None else None
                    max_exact = str(hi_) if hi_ is not None else None
                    n_nonnull = int(nv) - int(n_nulls)
                    if lo_ is None:
                        sum_exact = "0"
                    elif (hi_ - lo_) * max(n_nonnull, 1) < (1 << 62):
                        shifted = pc.subtract(v, pa.scalar(lo_, pa.int64()))
                        s = int(pc.sum(shifted, min_count=0).as_py() or 0)
                        sum_exact = str(s + lo_ * n_nonnull)
                    else:
                        vv = v.drop_null().to_numpy(zero_copy_only=False)
                        sum_exact = str(int(vv.astype(object).sum()) if vv.size else 0)
                out["column"].append(name)
                out["n_rows"].append(int(nv))
                out["n_nulls"].append(int(n_nulls))
                out["sum_exact"].append(sum_exact)
                out["min_exact"].append(min_exact)
                out["max_exact"].append(max_exact)
                out["sum_bytes"].append(sum_bytes)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out["column"], type=pa.string()),
                    pa.array(out["n_rows"], type=pa.int64()),
                    pa.array(out["n_nulls"], type=pa.int64()),
                    pa.array(out["sum_exact"], type=pa.string()),
                    pa.array(out["min_exact"], type=pa.string()),
                    pa.array(out["max_exact"], type=pa.string()),
                    pa.array(out["sum_bytes"], type=pa.int64()),
                ],
                names=[f.name for f in _AGG_SCHEMA.fields],
            )

    scan = parquet_scan_info(enc)
    if scan is not None:
        partials = pyscan_map_in_arrow(
            enc.sparkSession, scan, fn, _AGG_SCHEMA,
            columns=["chunk_id", "column", "dtype", "codec", "payload",
                     "params", "n_values"],
            group="dir",
        )
    else:
        partials = enc.mapInArrow(fn, schema=_AGG_SCHEMA)
    return partials.groupBy("column").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
        F.sum(F.col("sum_exact").cast("decimal(38,0)")).cast("string").alias("sum_exact"),
        F.min(F.col("min_exact").cast("long")).cast("string").alias("min_exact"),
        F.max(F.col("max_exact").cast("long")).cast("string").alias("max_exact"),
        F.sum("sum_bytes").alias("sum_bytes"),
    )


def _agg_decode_path_grouped(
    enc: DataFrame, group_by: str, out_columns: list[str]
) -> DataFrame:
    """Grouped decode-path aggregation: one applyInArrow per chunk decodes
    the group column plus the selected columns and emits exact per-group
    partials (same arbitrary-precision sum guard as the encode-side
    stats), combined by one native groupBy.  Handles any group
    cardinality — it is both the ``use_stats=False`` path and the
    fallback for chunks whose grouped stats are absent."""
    sub = enc.filter(F.col("column").isin(sorted(set(out_columns) | {group_by})))

    def agg_chunk(table: pa.Table) -> pa.Table:
        n = int(table["n_values"][0].as_py())
        dt = {
            table["column"][i].as_py(): table["dtype"][i].as_py()
            for i in range(table.num_rows)
        }
        if group_by not in dt:
            raise ValueError(
                f"group column {group_by!r} is not in the encoded table "
                f"(chunk {int(table['chunk_id'][0].as_py())})"
            )
        by_col = {}
        for name, codec, payload, params, crc, cid, _nv in _iter_enc_rows(table):
            if crc is not None and zlib.crc32(payload) != crc:
                raise IOError(
                    f"payload corruption: chunk {cid} column {name!r} crc mismatch"
                )
            by_col[name] = (codec, payload, json.loads(params))
        gcodec, gpayload, gparams = by_col[group_by]
        garr = decode_column_arrow(dt[group_by], gcodec, gpayload, gparams, n)
        codes, keys = _group_codes(garr, max_groups=None)
        out = {k.name: [] for k in _GAGG_SCHEMA.fields}
        for col in out_columns:
            if col not in by_col:
                continue  # pruned upstream
            arr = (
                garr
                if col == group_by
                else decode_column_arrow(dt[col], *by_col[col][:2], by_col[col][2], n)
            )
            for key, p in zip(keys, _group_partials(arr, dt[col], codes, len(keys))):
                if p is None:
                    continue
                out["group"].append(key)
                out["column"].append(col)
                out["n_rows"].append(p["n"])
                out["n_nulls"].append(p["nn"])
                out["sum_exact"].append(p.get("sum"))
                out["min_exact"].append(None if p.get("min") is None else str(p["min"]))
                out["max_exact"].append(None if p.get("max") is None else str(p["max"]))
                out["sum_bytes"].append(p.get("bytes"))
        return pa.table(
            {
                "group": pa.array(out["group"], pa.string()),
                "column": pa.array(out["column"], pa.string()),
                "n_rows": pa.array(out["n_rows"], pa.int64()),
                "n_nulls": pa.array(out["n_nulls"], pa.int64()),
                "sum_exact": pa.array(out["sum_exact"], pa.string()),
                "min_exact": pa.array(out["min_exact"], pa.string()),
                "max_exact": pa.array(out["max_exact"], pa.string()),
                "sum_bytes": pa.array(out["sum_bytes"], pa.int64()),
            }
        )

    partials = sub.groupBy("chunk_id").applyInArrow(agg_chunk, schema=_GAGG_SCHEMA)
    return partials.groupBy("group", "column").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
        F.sum(F.col("sum_exact").cast("decimal(38,0)")).cast("string").alias("sum_exact"),
        F.min(F.col("min_exact").cast("long")).cast("string").alias("min_exact"),
        F.max(F.col("max_exact").cast("long")).cast("string").alias("max_exact"),
        F.sum("sum_bytes").alias("sum_bytes"),
    )


def _degroup_null_key(df: DataFrame) -> DataFrame:
    """Spark-side :func:`_unescape_group_key`: the bare sentinel becomes a
    real SQL NULL; NUL-escaped real keys drop the escape character."""
    g = F.col("group")
    return df.withColumn(
        "group",
        F.when(g == F.lit(NULL_GROUP_KEY), F.lit(None))
        .when(g.startswith(NULL_GROUP_KEY), F.substring("group", 2, 2147483646))
        .otherwise(g),
    )


def decode_aggregate(
    enc: DataFrame,
    columns: list[str] | None = None,
    use_stats: bool = True,
    group_by: str | None = None,
) -> DataFrame:
    """Aggregate pushdown through the codec layer.

    Fast path (``use_stats``): every chunk row carries exact per-chunk
    statistics written at encode time (n_nulls; exact integer sum as an
    arbitrary-precision string; byte totals via raw_bytes), so the whole
    aggregate is ONE native JVM job over the metadata columns — the
    payload column is pruned from the parquet scan and no codec runs at
    all.  This is the footer-statistics pattern: at 100 TB the aggregate
    costs O(chunk count), not O(data).  The job doubles as the
    availability check: columns whose chunks lack the needed stats (older
    stores) are detected from the SAME job's ``__ok`` flag and re-answered
    through the decode path — no separate pre-check scan.  The stats path
    therefore runs its (single, tiny) metadata job eagerly.

    ``group_by``: GROUP BY a declared group column.  When the table was
    encoded with ``stats_group_by=<same column>``, the grouped fast path
    answers from the per-chunk per-group partials in metadata (payload
    pruned, O(chunks x groups)); otherwise — or for columns/chunks whose
    grouped stats are absent — one applyInArrow per chunk computes exact
    per-group partials from the payloads (no decoded rows cross the
    Python->JVM boundary).  Grouped results carry ``group`` (string; SQL
    NULL for null group values) plus per-group exact min/max for
    integer-family columns.

    Returns one row per column (or per (group, column)): ``n_rows`` (incl.
    nulls), ``n_nulls``, ``sum_exact`` (exact integer sum as a string —
    int64/bool/ts-micros/date-days domains; arbitrary-precision, no double
    drift; null for float/string), ``sum_bytes`` (total utf8/binary bytes,
    strings only).

    Needs no chunk colocation in the ungrouped paths; the grouped decode
    path groups by chunk_id itself."""
    if columns is not None:
        keep = set(columns) | ({group_by} if group_by is not None else set())
        enc = enc.filter(F.col("column").isin(sorted(keep)))

    if group_by is not None:
        out_columns = columns
        if out_columns is None:
            out_columns = [r["column"] for r in column_meta(enc)]
        if not use_stats:
            return _degroup_null_key(
                _agg_decode_path_grouped(enc, group_by, out_columns)
            ).filter(F.col("column").isin(out_columns)).orderBy("group", "column")
        # MAX_STAT_GROUPS bounds cardinality per CHUNK only; a sort-key-
        # correlated group column can stay under the per-chunk cap while
        # global groups grow with chunk count — cap what the driver ever
        # materializes and fall back to the distributed decode path beyond
        # it (limit() bounds the collect itself, not just the check)
        max_rows = MAX_COLLECTED_GROUP_ROWS
        rows = (
            _grouped_stats_aggregate(
                enc.filter(F.col("column").isin(out_columns)), group_by
            )
            .limit(max_rows + 1)
            .collect()
        )
        if len(rows) > max_rows:
            return _degroup_null_key(
                _agg_decode_path_grouped(enc, group_by, out_columns)
            ).filter(F.col("column").isin(out_columns)).orderBy("group", "column")
        bad = sorted({r["column"] for r in rows if r["__ok"] != 1})
        good_rows = sorted(
            (
                (
                    _unescape_group_key(r["__g"]),
                    r["column"], r["n_rows"], r["n_nulls"],
                    r["sum_exact"], r["min_exact"], r["max_exact"],
                    r["sum_bytes"],
                )
                for r in rows
                if r["column"] not in bad
            ),
            # SQL-style NULLS FIRST ordering, computed driver-side: a Spark
            # orderBy on the tiny local result would spin up a full
            # range-partitioning sample job + shuffle (measured ~0.9 s of
            # pure scheduling for 13 rows)
            key=lambda t: (t[0] is not None, t[0] or "", t[1]),
        )
        spark = enc.sparkSession
        good_df = spark.createDataFrame(good_rows, schema=_GAGG_SCHEMA)
        if bad:
            fb = _degroup_null_key(
                _agg_decode_path_grouped(enc, group_by, bad)
            ).filter(F.col("column").isin(bad))
            good_df = good_df.unionByName(fb).orderBy("group", "column")
        return good_df

    if not use_stats:
        return _agg_decode_path(enc).orderBy("column")

    rows = _stats_aggregate(enc).collect()  # the ONE metadata job
    bad = sorted(r["column"] for r in rows if r["__ok"] != 1)
    # sort driver-side: a Spark orderBy on the tiny local result would
    # spin up a range-partitioning sample job + shuffle (measured ~0.9 s
    # of pure scheduling for 13 rows)
    good_rows = sorted(
        (tuple(r)[:-1] for r in rows if r["__ok"] == 1), key=lambda t: t[0]
    )
    spark = enc.sparkSession
    good_df = spark.createDataFrame(good_rows, schema=_AGG_SCHEMA)
    if bad:
        good_df = good_df.unionByName(
            _agg_decode_path(enc.filter(F.col("column").isin(bad)))
        ).orderBy("column")
    return good_df


def prune_chunks_by_range(
    enc: DataFrame, column: str, lo=None, hi=None
) -> DataFrame:
    """Zone-map chunk pruning: drop every chunk whose [min, max] for
    ``column`` cannot intersect [lo, hi] (classic columnar range-scan
    elimination — at 100 TB a time-range query touches the handful of
    chunks whose warc_ts zone overlaps, not the table).

    Sound by construction: chunks lacking a zone map (string columns,
    all-null, pre-zone-map stores — including stores whose schema predates
    the stats field entirely) are always kept.  Values are compared in
    the zone map's int64/double domain: pass epoch MICROS for timestamps,
    epoch days for dates, the raw number otherwise.  Returns the filtered
    encoded DataFrame (all columns of surviving chunks) — decode, then
    apply the exact row-level predicate."""
    if "stats" not in enc.columns:
        return enc  # pre-zone-map store: nothing provably disjoint
    zmin = F.get_json_object("stats", "$.min").cast("double")
    zmax = F.get_json_object("stats", "$.max").cast("double")
    # double rounding slack (int64 zone values above 2^53 round in the
    # cast): widen every comparison so rounding can only KEEP extra chunks,
    # never wrongly prune — soundness over selectivity at the boundary
    def _slack(bound: float, z) -> F.Column:
        return (F.abs(z) + F.lit(abs(float(bound)))) * F.lit(2.3e-16) + F.lit(1e-9)

    keep = F.lit(True)
    if hi is not None:
        keep = keep & (zmin <= F.lit(float(hi)) + _slack(hi, zmin))
    if lo is not None:
        keep = keep & (zmax >= F.lit(float(lo)) - _slack(lo, zmax))
    has_stats = F.col("column").eqNullSafe(F.lit(column)) & F.col("stats").isNotNull()
    # chunk survives unless ITS stats row for `column` proves non-overlap
    doomed = (
        enc.filter(has_stats & ~keep).select("chunk_id").distinct()
    )
    return enc.join(F.broadcast(doomed), "chunk_id", "left_anti")


def lookup_by_key(
    enc: DataFrame,
    key: str,
    value,
    n_buckets: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Point lookup on an encoded store — the 100 TB single-row read path.

    Pruning cascade, each step eliminating work before the next runs:

    1. **bucket pruning** (bucketed stores, pass ``n_buckets``): filter to
       ``pmod(xxhash64(value), n_buckets)`` — a parquet PartitionFilter, so
       only one bucket directory is ever listed/read;
    2. **zone-map chunk pruning** (integer-family keys): drop every chunk
       whose [min, max] for ``key`` excludes the value — only the handful
       of overlapping chunks' payloads are fetched;
    3. decode the surviving chunks (column-pruned via ``columns``), then
       the exact row filter.

    The literal is cast to the key column's stored dtype so the data-side
    and probe-side xxhash64 agree (hashing int vs bigint differs)."""
    if n_buckets is not None and "bucket" in enc.columns:
        meta = {r["column"]: r["dtype"] for r in column_meta(enc)}
        probe = F.lit(value)
        if meta.get(key) in ("i64", "i32", "i16", "i8"):
            probe = probe.cast(_TAG_TO_SPARK[meta[key]])
        enc = enc.filter(F.col("bucket") == F.pmod(F.xxhash64(probe), F.lit(n_buckets)))
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        enc = prune_chunks_by_range(enc, key, lo=value, hi=value)
    cols = None if columns is None else sorted(set(columns) | {key})
    dec = decode_table(enc, columns=cols)
    return dec.filter(F.col(key) == F.lit(value)).drop("__chunk")


def chunk_metrics(enc: DataFrame) -> DataFrame:
    """Per-column compression lineage rollup (sizes + ratios + codec mix)."""
    return (
        enc.groupBy("column", "dtype", "codec")
        .agg(
            F.count("*").alias("chunks"),
            F.sum("n_values").alias("values"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("ref_bytes").alias("ref_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
        )
        .withColumn("ratio_vs_raw", F.col("enc_bytes") / F.col("raw_bytes"))
        .withColumn("ratio_vs_ref", F.col("enc_bytes") / F.col("ref_bytes"))
        .orderBy("column", "codec")
    )
