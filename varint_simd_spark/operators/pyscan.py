"""Python-side parquet scan fast path (guide §4: the JVM->Python boundary).

The engine's operators are ``mapInArrow`` functions over parquet scans.  On
the JVM path every scanned byte is decoded from parquet into Spark's
internal rows, transposed into Arrow batches, and streamed to the Python
worker — measured at ~4.7 s for a 4.9 GB scan on local[32] (bench_extra
``scan_ipc_in`` vs ``scan_only_native``), i.e. the row->Arrow transpose
costs several times the scan itself.  When the operator's input is exactly
a **bare parquet file scan** (the shape ``spark.read.parquet(path)``
produces — no filters, projections or joins), the scan can instead be
executed *inside* the Python task: ship the file list (a few KB), and let
each task read its files straight into Arrow with pyarrow's C++ parquet
reader.  Column pruning moves into the reader (``columns=``), the
JVM->Python boundary carries only paths, and the data is still read from
the parquet inputs on every run — this changes where the scan runs, not
what is computed.

Safety: the fast path engages ONLY when :func:`parquet_scan_info` can prove
the input is a bare local-file parquet relation (analyzed plan is a single
``LogicalRelation`` over ``HadoopFsRelation``/``ParquetFileFormat`` with
integer-typed partition columns); anything else — filters, limits, manifest
gates, non-local files — falls back to the JVM scan unchanged.  Disable
globally with ``VSS_PYSCAN=0``.

Layout note for decoders: files are grouped per parent directory (one task
reads a whole ``chunk_id=…``/``bucket=…`` directory), so chunk colocation
is guaranteed *structurally* — strictly stronger than the colocation probe
the JVM path needs.
"""

from __future__ import annotations

import json
import os
from urllib.parse import unquote, urlparse

import numpy as np
import pyarrow as pa

__all__ = ["parquet_scan_info", "pyscan_map_in_arrow"]

# integer partition-column types we know how to re-attach from dir names
_PART_TYPES = {"long", "integer", "short", "byte"}

_OPEN_COST = 4 << 20  # mirrors spark.sql.files.openCostInBytes


def _enabled() -> bool:
    return os.environ.get("VSS_PYSCAN", "1") != "0"


def parquet_scan_info(df) -> tuple[list[str], list[tuple[str, str]]] | None:
    """(local file paths sorted, [(partition col, spark type)]) when ``df``
    is provably a bare parquet scan of local files; else None."""
    if not _enabled():
        return None
    try:
        an = df._jdf.queryExecution().analyzed()
        if an.getClass().getSimpleName() != "LogicalRelation":
            return None
        rel = an.relation()
        if rel.getClass().getSimpleName() != "HadoopFsRelation":
            return None
        if rel.fileFormat().getClass().getSimpleName() != "ParquetFileFormat":
            return None
        part = [
            (f.name(), f.dataType().typeName())
            for f in rel.partitionSchema().fields()
        ]
        if any(t not in _PART_TYPES for _, t in part):
            return None
        uris = df.inputFiles()
        if not uris:
            return None
        paths = []
        for u in sorted(uris):
            p = urlparse(u)
            if p.scheme not in ("file", ""):
                return None
            paths.append(unquote(p.path))
        return paths, part
    except Exception:
        return None


def byte_array_fraction(paths: list[str], sample: int = 4) -> float:
    """Fraction of uncompressed bytes held by BYTE_ARRAY (string/binary)
    columns, from the parquet footers of up to ``sample`` files — a
    planning heuristic for topology choice (string-heavy tables should
    ship rows once; integer tables can ship compressed fragments).
    Returns 1.0 (string-heavy, the conservative answer) on any error."""
    import pyarrow.parquet as pq

    tot = ba = 0
    try:
        for p in paths[:sample]:
            md = pq.ParquetFile(p).metadata
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    sz = col.total_uncompressed_size
                    tot += sz
                    if col.physical_type == "BYTE_ARRAY":
                        ba += sz
    except Exception:
        return 1.0
    return ba / tot if tot else 1.0


def _total_bytes(paths: list[str]) -> int:
    total = 0
    for p in paths:
        try:
            total += os.path.getsize(p)
        except OSError:
            pass
    return total


def _group_by_dir(paths: list[str]) -> list[list]:
    groups: dict[str, list] = {}
    for p in paths:
        groups.setdefault(os.path.dirname(p), []).append([p, None])
    return [groups[d] for d in sorted(groups)]


def _group_by_size(
    paths: list[str], max_partition_bytes: int, parallelism: int
) -> list[list]:
    """Sequential first-fit packing mirroring Spark's split sizing:
    ``maxSplitBytes = min(maxPartitionBytes, max(openCost,
    (totalBytes + files*openCost) / defaultParallelism))`` — without the
    parallelism term a small table would pack into one or two oversized
    python tasks and idle the other cores.

    A file larger than the target is split at ROW-GROUP granularity
    (``[path, [rg, ...]]`` units), mirroring Spark's byte-range file
    splits — a single-file table must not serialize into one task."""
    sizes = []
    for p in paths:
        try:
            sizes.append(os.path.getsize(p) + _OPEN_COST)
        except OSError:
            sizes.append(max_partition_bytes)
    total = sum(sizes)
    target = min(
        max_partition_bytes,
        max(_OPEN_COST, -(-total // max(parallelism, 1))),
    )
    units: list[tuple] = []  # (path, rg_list_or_None, size)
    for p, sz in zip(paths, sizes):
        if sz > target * 1.5:
            try:
                import pyarrow.parquet as pq

                md = pq.ParquetFile(p).metadata
                for rg in range(md.num_row_groups):
                    rg_sz = sum(
                        md.row_group(rg).column(ci).total_compressed_size
                        for ci in range(md.num_columns)
                    )
                    units.append((p, [rg], rg_sz + _OPEN_COST // md.num_row_groups))
                continue
            except Exception:
                pass
        units.append((p, None, sz))
    groups: list[list] = []
    cur: list = []
    acc = 0
    for p, rgs, sz in units:
        if cur and acc + sz > target:
            groups.append(cur)
            cur, acc = [], 0
        # merge adjacent row-group units of the same file into one entry
        if rgs is not None and cur and cur[-1][0] == p and cur[-1][1] is not None:
            cur[-1][1].extend(rgs)
        else:
            cur.append([p, rgs])
        acc += sz
    if cur:
        groups.append(cur)
    return groups


def _part_values(path: str, part_cols: list[tuple[str, str]]) -> list[int]:
    vals = []
    segs = path.split(os.sep)
    for name, _typ in part_cols:
        pref = name + "="
        v = None
        for s in segs:
            if s.startswith(pref):
                v = int(unquote(s[len(pref):]))
        if v is None:
            raise ValueError(f"partition column {name!r} not in path {path!r}")
        vals.append(v)
    return vals


_PART_ARROW = {
    "long": pa.int64(),
    "integer": pa.int32(),
    "short": pa.int16(),
    "byte": pa.int8(),
}


def _read_tables(
    group: list[str],
    columns: list[str] | None,
    part_cols: list[tuple[str, str]],
    column_filter: list[str] | None,
    canonical_ts: bool,
):
    """Yield one Arrow table per file: parquet read (pruned to ``columns``
    present in the file), partition columns re-attached from the path, the
    optional row filter on the ``column`` field applied, timestamps
    canonicalized to naive us (the codec layer's domain)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    for path, rgs in group:
        pf = pq.ParquetFile(path, memory_map=True)
        if columns is not None:
            avail = pf.schema_arrow.names
            want = [c for c in columns if c in avail]
        else:
            want = None
        # use_threads=False: tasks already saturate the cores; Arrow's own
        # pool on top of 32 concurrent tasks only adds contention
        if rgs is not None:
            t = pf.read_row_groups(rgs, columns=want, use_threads=False)
        else:
            t = pf.read(columns=want, use_threads=False)
        if part_cols:
            pv = _part_values(path, part_cols)
            for (name, typ), v in zip(part_cols, pv):
                arr = pa.array(
                    np.full(t.num_rows, v, dtype=np.int64), type=_PART_ARROW[typ]
                )
                t = t.append_column(name, arr)
        if columns is not None:
            t = t.select([c for c in columns if c in t.column_names])
        if column_filter is not None:
            mask = pc.is_in(
                t["column"], value_set=pa.array(column_filter, pa.string())
            )
            t = t.filter(mask)
        if canonical_ts:
            new_cols = []
            changed = False
            for name in t.column_names:
                col = t[name]
                if pa.types.is_timestamp(col.type):
                    col = col.cast(pa.timestamp("us"))
                    changed = True
                new_cols.append(col)
            if changed:
                t = pa.table(
                    dict(zip(t.column_names, new_cols))
                )
        yield t


def pyscan_map_in_arrow(
    spark,
    scan: tuple[list[str], list[tuple[str, str]]],
    fn,
    out_schema,
    columns: list[str] | None = None,
    column_filter: list[str] | None = None,
    group: str = "dir",
    canonical_ts: bool = False,
):
    """Equivalent of ``df.mapInArrow(fn, out_schema)`` where the scan runs
    in the Python task: the Spark job maps over the file list, each task
    reads its group with pyarrow and feeds the batches to ``fn``.

    ``group``: 'dir' (one task per partition directory — chunk colocation
    guaranteed) or 'split' (packed to spark.sql.files.maxPartitionBytes,
    mirroring scan-split sizing for encode inputs)."""
    paths, part_cols = scan
    if group == "dir":
        groups = _group_by_dir(paths)
    else:
        try:
            target = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        except Exception:
            target = 128 << 20
        groups = _group_by_size(paths, target, spark.sparkContext.defaultParallelism)
    cf = sorted(column_filter) if column_filter is not None else None

    def task_fn(batches):
        from pyspark import TaskContext

        for b in batches:  # drain the (one-row) driver side of the range
            pass
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        if pid >= len(groups):
            return

        def gen():
            for t in _read_tables(
                groups[pid], columns, part_cols, cf, canonical_ts
            ):
                yield from t.to_batches()

        yield from fn(gen())

    # one native range partition per group: the scan job's input rows are
    # a single long per task (no python pre-stage, no shuffle); the task
    # picks its file group by partition id from the closure
    carrier = spark.range(len(groups), numPartitions=len(groups))
    return carrier.mapInArrow(task_fn, schema=out_schema)
