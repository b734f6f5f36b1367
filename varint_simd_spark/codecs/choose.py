"""Codec auto-selection — the engine's per-(partition, column) "optimizer".

The reference makes the analogous choice manually at compile time (picking
the integer width type parameter, README.md:57-59); here it is automatic and
*cost-based*: for integer columns the exact encoded size of every candidate
codec is computed analytically (cheap whole-column numpy, no trial
encoding); for string columns sizes are estimated from sampled statistics
(cardinality, run count, digram compressibility) per the north rule's
"sampled cardinality/run-length/entropy statistics".

Returns (codec_name, reason, stats) so the lineage table can record *why*.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..kernels import varint
from ..kernels.zigzag import zigzag
from .base import STR_TAGS, dtype_tag, to_int64

SAMPLE = 4096


def _int_candidate_sizes(v: np.ndarray) -> dict[str, int]:
    n = v.size
    sizes: dict[str, int] = {"raw64": 8 * n}
    u = v.view(np.uint64)
    sizes["varint"] = int(varint.varint_len(u).sum())
    sizes["varint_zz"] = int(varint.varint_len(zigzag(v)).sum())
    if n > 1:
        deltas = np.diff(v)
        sizes["delta_zz_varint"] = int(varint.varint_len(zigzag(deltas)).sum()) + 10
    base = int(v.min())
    hi = int((v - base).view(np.uint64).max())
    bits = max(1, hi.bit_length())
    sizes["for_bitpack"] = (n * bits + 7) // 8 + 24
    change = np.flatnonzero(v[1:] != v[:-1]) if n > 1 else np.zeros(0, dtype=np.int64)
    starts = np.concatenate([[0], change + 1]) if n else np.zeros(0, dtype=np.int64)
    if n:
        run_vals = v[starts]
        run_lens = np.diff(np.concatenate([starts, [n]]))
        sizes["rle_varint"] = (
            int(varint.varint_len(zigzag(run_vals)).sum())
            + int(varint.varint_len(run_lens.astype(np.uint64)).sum())
            + 12
        )
    return sizes


def _str_stats(vals: list[bytes]) -> dict:
    n = len(vals)
    arr = np.empty(n, dtype=object)
    arr[:] = vals
    codes, uniques = pd.factorize(arr, sort=False)
    runs = 1 + int(np.count_nonzero(codes[1:] != codes[:-1])) if n > 1 else n
    total = int(sum(len(v) for v in vals))
    uniq_bytes = int(sum(len(v) for v in uniques))
    # digram compressibility on a bounded sample
    blob = np.frombuffer(b"".join(vals[: max(1, SAMPLE // 16)])[: 1 << 16], dtype=np.uint8)
    digram_ratio = 1.0
    if blob.size > 256:
        pairs = blob[:-1].astype(np.uint32) * 256 + blob[1:]
        _, counts = np.unique(pairs, return_counts=True)
        top = np.sort(counts)[::-1][:180]
        covered = int(top.sum())
        # each covered pair occurrence saves ~1 byte (2 bytes -> 1 code);
        # non-overlap halves realizable matches
        digram_ratio = max(0.5, 1.0 - 0.5 * covered / max(1, blob.size))
    return {
        "n": n,
        "n_distinct": len(uniques),
        "runs": runs,
        "total_bytes": total,
        "uniq_bytes": uniq_bytes,
        "digram_ratio": digram_ratio,
    }


def choose_int_codec(v: np.ndarray) -> tuple[str, str, dict]:
    if v.size == 0:
        return "varint", "empty", {}
    sizes = _int_candidate_sizes(v)
    best = min(sizes, key=sizes.get)  # ties break deterministically? dict order is stable
    stats = {f"size_{k}": v_ for k, v_ in sizes.items()}
    return best, f"min-cost {sizes[best]}B of {sizes}", stats


def choose_str_codec(vals: list[bytes]) -> tuple[str, str, dict]:
    n = len(vals)
    if n == 0:
        return "raw_str", "empty", {}
    st = _str_stats(vals)
    avg_len = st["total_bytes"] / n
    idx_bytes = n * max(1, (max(1, st["n_distinct"]).bit_length() + 6) // 7)
    est = {
        "raw_str": st["total_bytes"] + n,  # + ~1B/len
        "dict_str": st["uniq_bytes"] + st["n_distinct"] + idx_bytes,
        "rle_str": st["runs"] * (avg_len + 2) + st["runs"],
        "fsst": st["total_bytes"] * st["digram_ratio"] + n + 512,
    }
    # dict/rle only help when cardinality / run structure exists
    if st["n_distinct"] > 0.5 * n:
        est.pop("dict_str", None)
    if st["runs"] > 0.5 * n:
        est.pop("rle_str", None)
    best = min(est, key=est.get)
    stats = {f"est_{k}": int(v) for k, v in est.items()}
    stats.update({k: (float(v) if isinstance(v, float) else int(v)) for k, v in st.items()})
    return best, f"est {int(est[best])}B of {({k: int(v) for k, v in est.items()})}", stats


def choose_codec(s: pd.Series) -> tuple[str, str, dict]:
    """Auto-select a codec for one pandas column (chunk-local)."""
    tag = dtype_tag(s)
    if tag in STR_TAGS:
        from .base import to_bytes_list

        vals = to_bytes_list(s.fillna("" if tag == "str" else b""), tag)
        return choose_str_codec(vals)
    sn = s.fillna(0) if s.isna().any() else s
    return choose_int_codec(to_int64(sn, tag))
