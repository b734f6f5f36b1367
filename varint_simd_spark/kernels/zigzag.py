"""ZigZag mapping between signed and unsigned integers (numpy + Spark expr).

Reference semantics (src/num.rs:118-126, 200-208, 288-296, 473-481 and the
signed-side trait src/num.rs:486-500):

    zigzag(n)   = (n << 1) ^ (n >> (WIDTH-1))   # arithmetic right shift
    unzigzag(z) = (z >> 1) ^ -(z & 1)           # logical right shift

so ``-20 -> 39 -> [0x27]`` (src/encode/mod.rs:34-35).  The numpy kernels
below operate on whole columns; :func:`zigzag_expr` / :func:`unzigzag_expr`
are the same math as native Spark SQL column expressions (JVM-side,
whole-stage-codegen'd — no Python in the hot path).
"""

from __future__ import annotations

import numpy as np

__all__ = ["zigzag", "unzigzag", "zigzag_expr", "unzigzag_expr", "zigzag_sql", "unzigzag_sql"]


def zigzag(values: np.ndarray) -> np.ndarray:
    """int64 column -> uint64 zigzag column."""
    n = np.asarray(values, dtype=np.int64)
    # numpy >> on int64 is arithmetic, matching src/num.rs:475
    return ((n << np.int64(1)) ^ (n >> np.int64(63))).view(np.uint64)


def unzigzag(values: np.ndarray) -> np.ndarray:
    """uint64 zigzag column -> int64 column."""
    z = np.asarray(values, dtype=np.uint64)
    half = (z >> np.uint64(1)).view(np.int64)
    return np.where((z & np.uint64(1)).astype(bool), ~half, half)


def zigzag_sql(col: str) -> str:
    """SQL expression for zigzag on a BIGINT column (Spark's shiftright is
    arithmetic, matching the reference)."""
    return f"(shiftleft({col}, 1)) ^ (shiftright({col}, 63))"


def unzigzag_sql(col: str) -> str:
    """SQL expression for unzigzag on a BIGINT zigzag column."""
    return f"(shiftrightunsigned({col}, 1)) ^ -({col} & 1)"


def zigzag_expr(col: str):
    from pyspark.sql import functions as F

    return F.expr(zigzag_sql(col))


def unzigzag_expr(col: str):
    from pyspark.sql import functions as F

    return F.expr(unzigzag_sql(col))
