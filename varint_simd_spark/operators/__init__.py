"""Spark operators: encode_table / decode_table / verify / metrics."""

from .encode import (
    ENCODED_SCHEMA,
    chunk_metrics,
    column_meta,
    decode_table,
    decode_table_colocated,
    encode_table,
    encode_table_bucketed,
    encode_table_per_split,
    lookup_by_key,
    prune_chunks_by_range,
)

__all__ = [
    "ENCODED_SCHEMA",
    "chunk_metrics",
    "column_meta",
    "decode_table",
    "decode_table_colocated",
    "encode_table",
    "encode_table_bucketed",
    "encode_table_per_split",
    "lookup_by_key",
    "prune_chunks_by_range",
]
