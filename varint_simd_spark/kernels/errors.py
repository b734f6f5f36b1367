"""Error domain of the codec kernels.

Mirrors the reference's ``VarIntDecodeError { Overflow, NotEnoughBytes }``
(reference: src/lib.rs:40-53) as Python exceptions.  A vectorized decode
raises on the *first* offending value, like the reference's per-value
``Result::Err`` surfaces on the first failed decode in a loop.
"""

from __future__ import annotations


class VarIntDecodeError(ValueError):
    """Base class: a varint stream failed to decode."""


class Overflow(VarIntDecodeError):
    """Decoded varint does not fit the target width.

    Reference semantics (src/decode/mod.rs:42-48): a varint longer than
    ``MAX_VARINT_BYTES`` for the target type, or exactly ``MAX_VARINT_BYTES``
    long with a final byte greater than ``MAX_LAST_VARINT_BYTE``.
    """


class NotEnoughBytes(VarIntDecodeError):
    """Encoded length exceeds the available input.

    Reference semantics (src/decode/mod.rs:49-51): the decoded length is
    greater than the input slice length (truncation mid-varint, or a
    trailing varint whose continuation bit promises more bytes).
    """
