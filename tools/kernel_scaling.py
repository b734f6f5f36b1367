"""Kernel-level parallel-scaling microbenchmark.

Isolates the codec kernels from Spark: N independent processes each run
the FSST + varint encode/decode kernels on their own chunk-sized data
(the exact per-task work of the pipeline) and report per-process
throughput.  Flat per-process throughput as N grows = the kernels
themselves scale linearly; any E2E gap is Spark overhead + shared-bus
contention (see BASELINE.md).

Usage: python tools/kernel_scaling.py [procs ...]   (default 1 2 8)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def work(_=None) -> dict:
    import numpy as np

    from varint_simd_spark.codecs.strings import FsstStr, list_to_bo
    from varint_simd_spark.kernels import varint
    from varint_simd_spark.kernels.zigzag import zigzag

    rng = np.random.default_rng(7)
    text = ("the quick brown fox jumps over the lazy dog " * 30).encode()
    bo = list_to_bo([text[: rng.integers(500, 1400)] for _ in range(3000)])
    ints = np.cumsum(rng.integers(0, 120_000_000, 200_000)).astype(np.int64)
    f = FsstStr()
    f.encode_bo(bo)  # warm

    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        p, prm = f.encode_bo(bo)
    t1 = time.perf_counter()
    for _ in range(reps):
        f.decode_bo(p, prm, len(bo[1]) - 1)
    t2 = time.perf_counter()
    for _ in range(reps):
        vp, _l = varint.encode(zigzag(np.diff(ints)))
    t3 = time.perf_counter()
    for _ in range(reps):
        varint.decode(vp, count=len(ints) - 1)
    t4 = time.perf_counter()
    return {
        "fsst_enc_mbps": reps * bo[0].size / (t1 - t0) / 1e6,
        "fsst_dec_mbps": reps * bo[0].size / (t2 - t1) / 1e6,
        "varint_enc_melems": reps * (len(ints) - 1) / (t3 - t2) / 1e6,
        "varint_dec_melems": reps * (len(ints) - 1) / (t4 - t3) / 1e6,
    }


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [1, 2, 8]
    out = {}
    base = None
    for n in levels:
        with mp.Pool(n) as pool:
            rs = pool.map(work, range(n))
        agg = {k: sum(r[k] for r in rs) for k in rs[0]}
        per = {k: agg[k] / n for k in agg}
        if base is None:
            base = per
        eff = {k: round(per[k] / base[k], 3) for k in per}
        out[f"procs_{n}"] = {
            "per_proc": {k: round(v, 1) for k, v in per.items()},
            "aggregate": {k: round(v, 1) for k, v in agg.items()},
            "efficiency_vs_1": eff,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
