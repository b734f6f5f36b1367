"""Tiny section container for codec payloads.

A codec payload is a sequence of byte sections (e.g. dictionary bytes,
index stream, run-length stream).  The container frames them with a varint
header — eating our own dog food: the frame itself uses the reference's
LEB128 wire format (reference: src/encode/mod.rs:23-25).

Layout: ``varint(n_sections) varint(len_0) ... varint(len_{n-1}) bytes_0 ... bytes_{n-1}``
"""

from __future__ import annotations

import numpy as np

from ..kernels import varint


def pack_sections(sections: list[bytes]) -> bytes:
    lens = np.array([len(sections)] + [len(s) for s in sections], dtype=np.uint64)
    header, _ = varint.encode(lens)
    return header + b"".join(sections)


def unpack_sections(payload: bytes) -> list[bytes]:
    buf = np.frombuffer(payload, dtype=np.uint8)
    # first varint = section count
    ends = np.flatnonzero((buf & np.uint8(0x80)) == 0)
    n = int(varint.decode(buf[: ends[0] + 1], count=1)[0])
    header_end = int(ends[n]) + 1
    lens = varint.decode(buf[:header_end], count=n + 1)[1:].astype(np.int64)
    out, off = [], header_end
    for ln in lens:
        out.append(payload[off : off + int(ln)])
        off += int(ln)
    return out
