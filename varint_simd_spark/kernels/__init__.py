"""Pure-numpy codec kernels: the vectorized analog of the reference's
SIMD encode/decode routines (no Spark imports here — unit-testable alone)."""

from .errors import NotEnoughBytes, Overflow, VarIntDecodeError
from .varint import (
    MAX_LAST_VARINT_BYTE,
    MAX_VARINT_BYTES,
    decode,
    decode_lens,
    decode_single,
    encode,
    encode_single,
    varint_len,
)
from .zigzag import unzigzag, zigzag

__all__ = [
    "MAX_LAST_VARINT_BYTE",
    "MAX_VARINT_BYTES",
    "NotEnoughBytes",
    "Overflow",
    "VarIntDecodeError",
    "decode",
    "decode_lens",
    "decode_single",
    "encode",
    "encode_single",
    "varint_len",
    "unzigzag",
    "zigzag",
]
