"""Deterministic synthetic media blobs (BMP images / WAV audio / opaque
binary) for the multimodal pipeline operators.

Every payload is a pure function of (media_id, seed) — the same ids always
produce byte-identical blobs at any parallelism, so multimodal outputs are
golden-pinnable.  The BMP/WAV bytes are REAL spec-conformant files (24-bit
uncompressed BI_RGB BMPs with row padding; PCM-16 RIFF/WAVE with mono and
stereo variants), so the engine's pure-numpy decoders are exercised against
genuine container layouts, not lookalikes.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def make_bmp(mid: int, seed: int = 42) -> bytes:
    """24-bit uncompressed bottom-up BMP.  Width varies so some rows need
    the 4-byte stride padding and some don't (the decoder must honor it)."""
    w = 8 + mid % 9
    h = 6 + mid % 5
    y, x = np.mgrid[0:h, 0:w]
    px = np.empty((h, w, 3), np.uint8)  # BGR on disk
    for c in range(3):
        px[..., c] = (mid * 31 + x * 7 + y * 13 + c * 101 + seed) % 256
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = px.reshape(h, w * 3)
    pixel_data = rows[::-1].tobytes()  # bottom-up row order
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixel_data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return header + info + pixel_data


def make_wav(mid: int, seed: int = 42) -> bytes:
    """PCM-16 RIFF/WAVE: mono for even ids, stereo for odd; sample values
    are a deterministic integer sequence (no float synthesis)."""
    n_ch = 1 + (mid // 2) % 2
    rate = 8000
    n_frames = 256 + (mid % 7) * 64
    t = np.arange(n_frames * n_ch, dtype=np.int64)
    samples = (((mid * 2654435761 + t * 40503 + seed * 97) % 65536) - 32768).astype("<i2")
    data = samples.tobytes()
    block_align = n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block_align, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_blob(mid: int, seed: int = 42) -> bytes:
    """Opaque binary with no known magic (format sniff must say unknown;
    feature extraction falls back to the documented stub)."""
    n = 64 + (mid % 13) * 17
    t = np.arange(n, dtype=np.int64)
    return (((mid * 1099511628211 + t * 16777619 + seed) >> 3) % 251).astype(np.uint8).tobytes()


def media_payload(mid: int, seed: int = 42) -> tuple[str, bytes]:
    k = mid % 3
    if k == 0:
        return "bmp", make_bmp(mid, seed)
    if k == 1:
        return "wav", make_wav(mid, seed)
    return "blob", make_blob(mid, seed)


def generate_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    df = spark.range(n).withColumnRenamed("id", "media_id")

    def fn(batches):
        for batch in batches:
            ids = batch.column(0).to_pylist()
            kinds, payloads = [], []
            for mid in ids:
                kind, payload = media_payload(int(mid), seed)
                kinds.append(kind)
                payloads.append(payload)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(kinds, pa.string()),
                    pa.array(payloads, pa.binary()),
                ],
                names=["media_id", "kind", "payload"],
            )

    return df.mapInArrow(fn, schema=MEDIA_SCHEMA)
