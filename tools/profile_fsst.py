"""FSST codec micro-benchmark: single-process encode/decode MB/s on a
web-text-like corpus (same vocab/length distribution as sources/web_pages).

Usage: python tools/profile_fsst.py [mb] [trials]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from varint_simd_spark.codecs.strings import FsstStr, list_to_bo  # noqa: E402
from varint_simd_spark.sources.web_pages import VOCAB  # noqa: E402


def make_corpus(target_mb: float, seed: int = 7):
    rng = np.random.default_rng(seed)
    vocab = np.array(VOCAB)
    docs = []
    total = 0
    target = int(target_mb * 1e6)
    while total < target:
        n_tok = 8 + int(rng.integers(0, 40) * rng.integers(0, 12) / 4)
        s = " ".join(vocab[rng.integers(0, len(vocab), n_tok)]).encode()
        docs.append(s)
        total += len(s)
    return list_to_bo(docs)


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 16
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    bo = make_corpus(mb)
    blob, offs = bo
    nbytes = int(offs[-1])
    codec = FsstStr()

    # warmup + correctness
    payload, params = codec.encode_bo(bo)
    dblob, doffs = codec.decode_bo(payload, params, len(offs) - 1)
    assert np.array_equal(dblob, blob) and np.array_equal(doffs, offs), "roundtrip!"

    t_train = []
    for _ in range(trials):
        t0 = time.perf_counter()
        table = codec._train(blob, offs)
        t_train.append(time.perf_counter() - t0)

    enc = []
    for _ in range(trials):
        t0 = time.perf_counter()
        payload, params = codec.encode_bo(bo)
        enc.append(time.perf_counter() - t0)

    dec = []
    for _ in range(trials):
        t0 = time.perf_counter()
        codec.decode_bo(payload, params, len(offs) - 1)
        dec.append(time.perf_counter() - t0)

    ratio = len(payload) / nbytes
    print(
        f"corpus {nbytes/1e6:.1f} MB | ratio {ratio:.3f} | "
        f"train {min(t_train)*1e3:.0f} ms | "
        f"encode {nbytes/1e6/min(enc):.1f} MB/s ({min(enc):.3f}s) | "
        f"decode {nbytes/1e6/min(dec):.1f} MB/s ({min(dec):.3f}s)"
    )


if __name__ == "__main__":
    main()
