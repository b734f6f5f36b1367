"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (whole-table auto-codec
encode -> decode round trip over sf0.001 lineitem); ``queries()`` exposes
one entry per implemented operator (SURVEY.md §2); ``oracle_sql()`` gives
the DuckDB-equivalent SQL for the correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

from varint_simd_spark.driver_queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["auto_roundtrip_lineitem"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (identity selects for round trips —
    round trip ⇒ equality).  Keys absent here get the weaker rows-only
    check (engine-internal metrics)."""
    return dict(ORACLES)
