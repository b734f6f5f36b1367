"""Spark operators: encode_table / decode_table / verify / metrics."""

from .encode import ENCODED_SCHEMA, chunk_metrics, decode_table, encode_table

__all__ = ["ENCODED_SCHEMA", "chunk_metrics", "decode_table", "encode_table"]
