"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode/feature-extract kernels themselves need codec libraries that are
NOT in this container, so the pixel/sample-level steps are STUBBED behind
``decode_stub`` (clearly marked, deterministic fake) — but everything
Spark-side is real and tested: schemas, Arrow batch shapes, ``mapInArrow``
plumbing, format sniffing from magic bytes (native exprs), partitioning of
large binary payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# magic-byte prefixes -> format tag (hex, matched against hex(substring))
MAGIC = {
    "89504e47": "png",
    "ffd8ff": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi container
    "664c6143": "flac",
    "1a45dfa3": "mkv/webm",
    "3c68746d": "html",  # "<htm"
    "3c21646f": "html",  # "<!do"
}


def sniff_format(bin_col: str) -> Column:
    """Container format from magic bytes — native exprs (hex + CASE)."""
    prefix = F.lower(F.hex(F.substring(F.col(bin_col), 1, 4)))
    expr = F.lit("unknown")
    for magic, fmt in MAGIC.items():
        expr = F.when(prefix.startswith(magic), F.lit(fmt)).otherwise(expr)
    return expr


def binary_meta(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Typed metadata for an opaque binary column: size, format, content
    hash — all native."""
    return df.select(
        F.col(id_col),
        F.length(F.col(bin_col)).alias("n_bytes"),
        sniff_format(bin_col).alias("format"),
        F.xxhash64(F.col(bin_col)).alias("content_hash"),
    )


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_stub(payload: np.ndarray) -> np.ndarray:
    """STUB for the real image/audio decode (pillow/ffmpeg not in this
    container).  Deterministic fake: a 16-dim byte-histogram feature over
    the raw payload — same shape/dtype contract as a real embedding
    extractor, so the Spark-side plumbing is exercised end to end.

    A production deployment replaces ONLY this function (e.g. PIL decode +
    model forward) — the mapInArrow batching, schema, and partitioning
    stay identical."""
    if payload.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    hist = np.bincount(payload >> 4, minlength=FEATURE_DIM).astype(np.float32)
    return hist / hist.sum()


def decode_stub_batch(data: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Whole-batch version of :func:`decode_stub`: per-row 16-bin byte
    histograms over a flat uint8 buffer + int offsets — ONE bincount over
    the whole Arrow batch, no per-value Python.  A production deployment
    swaps in the real decoder here (PIL/ffmpeg over each [offs[i], offs[i+1])
    slice); the Spark-side plumbing stays identical."""
    n = offs.size - 1
    lens = np.diff(offs)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    idx = row_of * FEATURE_DIM + (data[offs[0] : offs[-1]] >> 4)
    hist = np.bincount(idx, minlength=n * FEATURE_DIM).astype(np.float32)
    hist = hist.reshape(n, FEATURE_DIM)
    totals = hist.sum(axis=1, keepdims=True)
    np.divide(hist, totals, out=hist, where=totals > 0)
    return hist


def _sniff_formats_np(data: np.ndarray, offs: np.ndarray) -> list[str]:
    """Vectorized magic-byte sniff: gather the first 4 bytes of every row
    from the flat buffer, compare against the MAGIC prefixes in numpy."""
    n = offs.size - 1
    lens = np.diff(offs)
    head = np.zeros((n, 4), dtype=np.uint8)
    for j in range(4):
        m = lens > j
        head[m, j] = data[offs[:-1][m] + j]
    out = np.full(n, "unknown", dtype=object)
    for magic, fmt in MAGIC.items():
        mb = bytes.fromhex(magic)
        match = lens >= len(mb)
        for j, b in enumerate(mb):
            match &= head[:, j] == b
        out[match & (out == "unknown")] = fmt
    return out.tolist()


def extract_features(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """mapInArrow feature extraction over a binary column: Arrow batches
    in, (id, format, n_bytes, features) batches out.  Fully vectorized —
    the histogram-stub features, sizes, and format sniff are whole-batch
    numpy over the Arrow binary buffer (offsets + flat data), no per-value
    Python loop."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0)
            payloads = batch.column(1)
            if isinstance(payloads, pa.ChunkedArray):
                payloads = payloads.combine_chunks()
            bufs = payloads.buffers()
            width = 8 if pa.types.is_large_binary(payloads.type) else 4
            odt = np.int64 if width == 8 else np.int32
            offs = np.frombuffer(bufs[1], dtype=odt)[
                payloads.offset : payloads.offset + len(payloads) + 1
            ].astype(np.int64)
            data = (
                np.frombuffer(bufs[2], dtype=np.uint8)
                if bufs[2] is not None
                else np.zeros(0, np.uint8)
            )
            feats = decode_stub_batch(data, offs)
            sizes = np.diff(offs)
            fmts = _sniff_formats_np(data, offs)
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(fmts, type=pa.string()),
                    pa.array(sizes, type=pa.int64()),
                    pa.array(list(feats), type=pa.list_(pa.float32())),
                ],
                names=["id", "format", "n_bytes", "features"],
            )

    return df.select(F.col(id_col).cast("long"), F.col(bin_col)).mapInArrow(
        fn, schema=FEATURES_SCHEMA
    )


# --------------------------------------------------------------------------
# resize / frame-sample stages (brief-mandated multimodal plumbing).
# The pixel/sample decode needs codec libs absent from this container, so
# the DECODE step is the documented stub; batching, schemas, offsets, and
# output shapes are real.

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def resize_stub(payload: np.ndarray, w: int, h: int) -> np.ndarray:
    """STUB for decode+resize (PIL absent): treats the raw payload as a
    byte grid and samples it down to (h, w) with evenly spaced strides —
    deterministic, same (h*w,) uint8 output contract as a real
    grayscale-resize, so the Spark plumbing is exercised end to end.  A
    production deployment replaces ONLY this function (PIL decode +
    Image.resize)."""
    if payload.size == 0:
        return np.zeros(w * h, dtype=np.uint8)
    idx = (np.arange(w * h, dtype=np.int64) * payload.size) // (w * h)
    return payload[idx]


def resize_images(df: DataFrame, bin_col: str, id_col: str, w: int = 32, h: int = 32) -> DataFrame:
    """mapInArrow resize stage: binary column in, fixed-size pixel buffers
    out.  Per-batch numpy over the Arrow buffer; the only per-value work
    is the (stubbed) decode itself — exactly where a real image decoder
    sits."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0)
            payloads = batch.column(1)
            out = []
            for i in range(batch.num_rows):
                raw = np.frombuffer(payloads[i].as_buffer(), dtype=np.uint8)
                out.append(resize_stub(raw, w, h).tobytes())
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array([w] * batch.num_rows, type=pa.int32()),
                    pa.array([h] * batch.num_rows, type=pa.int32()),
                    pa.array(out, type=pa.binary()),
                ],
                names=["id", "width", "height", "pixels"],
            )

    return df.select(F.col(id_col).cast("long"), F.col(bin_col)).mapInArrow(
        fn, schema=RESIZED_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, bin_col: str, id_col: str, n_frames: int = 4) -> DataFrame:
    """mapInArrow frame-sampling stage: one input row (video payload) ->
    ``n_frames`` output rows of evenly spaced byte windows — the 1-to-N
    exploding UDF shape of a real keyframe sampler (which would seek
    container keyframes instead of even offsets; that seek is the
    documented stub here)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0)
            payloads = batch.column(1)
            out_id, out_idx, out_off, out_frame = [], [], [], []
            for i in range(batch.num_rows):
                raw = np.frombuffer(payloads[i].as_buffer(), dtype=np.uint8)
                vid = ids[i].as_py()
                step = max(raw.size // n_frames, 1)
                for j in range(n_frames):
                    off = min(j * step, max(raw.size - 1, 0))
                    out_id.append(vid)
                    out_idx.append(j)
                    out_off.append(off)
                    out_frame.append(raw[off : off + min(step, 4096)].tobytes())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, type=pa.int64()),
                    pa.array(out_idx, type=pa.int32()),
                    pa.array(out_off, type=pa.int64()),
                    pa.array(out_frame, type=pa.binary()),
                ],
                names=["id", "frame_idx", "frame_offset", "frame"],
            )

    return df.select(F.col(id_col).cast("long"), F.col(bin_col)).mapInArrow(
        fn, schema=FRAMES_SCHEMA
    )
