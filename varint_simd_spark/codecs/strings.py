"""String/binary-column codecs — zero-copy Arrow-buffer representation.

Internal unit: ``(blob, offs)`` — the Arrow large-string layout itself
(``blob``: np.uint8 of all bytes concatenated; ``offs``: np.int64 of n+1
offsets).  Values never materialize as Python objects: codecs read the
buffers Spark already ships across the JVM boundary (Arrow IPC), so the
whole string path is per-row-Python-free (input_hint requirement).

All payload framing uses the reference varint wire format (offset/length
streams are the north rule's "offset columns").  Dict / RLE / FSST are
engine extensions absent from the reference (SURVEY.md §2.1 provenance).

A thin list[bytes] adapter (encode/decode) remains for kernel-level tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import varint
from .container import pack_sections, unpack_sections

_ESCAPE = 255  # FSST escape code (code 255 = next byte is a literal)

_EVEN_MASK = np.tile(np.array([True, False]), 1 << 17)  # grown on demand


def _even_mask(n: int) -> np.ndarray:
    """Cached alternating True/False mask of length n (True at even idx)."""
    global _EVEN_MASK
    if _EVEN_MASK.size < n:
        _EVEN_MASK = np.tile(np.array([True, False]), (n + 1) // 2 + 1)
    return _EVEN_MASK[:n]

BO = tuple[np.ndarray, np.ndarray]  # (blob uint8, offs int64[n+1])


# --------------------------------------------------------------------------
# (blob, offs) <-> pyarrow / list[bytes] conversion helpers


def arrow_to_bo(arr: pa.Array) -> BO:
    """Zero-copy view of a large_string/large_binary array's buffers."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary() if pa.types.is_binary(arr.type) else pa.large_string())
    bufs = arr.buffers()
    n = len(arr)
    offs = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    blob = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]] if bufs[2] is not None else np.zeros(0, np.uint8)
    if offs[0] != 0:
        offs = offs - offs[0]
    return blob, offs.astype(np.int64, copy=False)


def bo_to_arrow(bo: BO, binary: bool = False, small: bool = False) -> pa.Array:
    """(blob, offs) -> Arrow array.  ``small=True`` emits 32-bit-offset
    string/binary directly when the blob fits (< 2 GiB) — Spark's expected
    type, avoiding a later cast copy."""
    blob, offs = bo
    n = len(offs) - 1
    if small and (offs.size == 0 or offs[-1] < (1 << 31)):
        typ = pa.binary() if binary else pa.string()
        off_buf = pa.py_buffer(np.ascontiguousarray(offs, dtype=np.int32).tobytes())
    else:
        typ = pa.large_binary() if binary else pa.large_string()
        off_buf = pa.py_buffer(np.ascontiguousarray(offs).tobytes())
    return pa.Array.from_buffers(
        typ,
        n,
        [None, off_buf, pa.py_buffer(np.ascontiguousarray(blob).tobytes())],
    )


def list_to_bo(values: list[bytes]) -> BO:
    lens = np.fromiter((len(v) for v in values), dtype=np.int64, count=len(values))
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    blob = np.frombuffer(b"".join(values), dtype=np.uint8)
    return blob, offs


def bo_to_list(bo: BO) -> list[bytes]:
    blob, offs = bo
    b = blob.tobytes()
    return [b[offs[i] : offs[i + 1]] for i in range(len(offs) - 1)]


def _gather_values(blob: np.ndarray, offs: np.ndarray, idx: np.ndarray) -> BO:
    """Vectorized take: output = values[idx] as a fresh (blob, offs)."""
    lens = np.diff(offs)
    out_lens = lens[idx]
    out_offs = np.concatenate([[0], np.cumsum(out_lens)]).astype(np.int64)
    total = int(out_offs[-1])
    if total == 0:
        return np.zeros(0, np.uint8), out_offs
    src_start = np.repeat(offs[idx], out_lens)
    pos = np.arange(total, dtype=np.int64) - np.repeat(out_offs[:-1], out_lens)
    return blob[src_start + pos], out_offs


def _dict_encode_bo(bo: BO) -> tuple[np.ndarray, BO]:
    """-> (codes int64[n], dictionary as BO) via Arrow's C++ hash kernel."""
    arr = bo_to_arrow(bo, binary=True)
    d = pc.dictionary_encode(arr)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dict_bo = arrow_to_bo(d.dictionary)
    return codes, dict_bo


# --------------------------------------------------------------------------


class RawStr:
    """varint length stream + concatenated bytes (offset-column framing)."""

    name = "raw_str"

    def encode_bo(self, bo: BO, cache: dict | None = None) -> tuple[bytes, dict]:
        blob, offs = bo
        lens_pay, _ = varint.encode(np.diff(offs).astype(np.uint64))
        return pack_sections([lens_pay, blob.tobytes()]), {}

    def decode_bo(self, payload: bytes, params: dict, n: int) -> BO:
        lens_pay, blob = unpack_sections(payload)
        lens = varint.decode(lens_pay, count=n, width=64).astype(np.int64) if n else np.zeros(0, np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        return np.frombuffer(blob, dtype=np.uint8), offs


class DictStr:
    """Dictionary encoding: unique values + varint index stream.
    Per-chunk local dictionary (no global shuffle — SURVEY.md §2.1)."""

    name = "dict_str"

    def encode_bo(self, bo: BO, cache: dict | None = None) -> tuple[bytes, dict]:
        # the codec chooser already dictionary-encoded this chunk to count
        # distincts — reuse its result instead of re-hashing the column
        codes, (dblob, doffs) = (cache or {}).get("dict") or _dict_encode_bo(bo)
        dlens_pay, _ = varint.encode(np.diff(doffs).astype(np.uint64))
        idx_pay, _ = varint.encode(codes.astype(np.uint64))
        return (
            pack_sections([dlens_pay, dblob.tobytes(), idx_pay]),
            {"dict_n": str(len(doffs) - 1)},
        )

    def decode_bo(self, payload: bytes, params: dict, n: int) -> BO:
        dn = int(params["dict_n"])
        dlens_pay, dblob_b, idx_pay = unpack_sections(payload)
        dlens = varint.decode(dlens_pay, count=dn, width=64).astype(np.int64) if dn else np.zeros(0, np.int64)
        doffs = np.concatenate([[0], np.cumsum(dlens)]).astype(np.int64)
        dblob = np.frombuffer(dblob_b, dtype=np.uint8)
        if n == 0:
            return np.zeros(0, np.uint8), np.zeros(1, np.int64)
        codes = varint.decode(idx_pay, count=n, width=64).astype(np.int64)
        return _gather_values(dblob, doffs, codes)


class RleStr:
    """Run-length encoding for sorted/low-churn string columns:
    run values (raw framing) + run lengths (varint)."""

    name = "rle_str"

    def encode_bo(self, bo: BO, cache: dict | None = None) -> tuple[bytes, dict]:
        blob, offs = bo
        n = len(offs) - 1
        if n == 0:
            return pack_sections([b"", b"", b""]), {"runs": "0"}
        codes, (dblob, doffs) = (cache or {}).get("dict") or _dict_encode_bo(bo)
        starts = np.concatenate([[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1])
        run_lens = np.diff(np.concatenate([starts, [n]])).astype(np.uint64)
        rblob, roffs = _gather_values(blob, offs, starts)
        rlens_pay, _ = varint.encode(np.diff(roffs).astype(np.uint64))
        rl_pay, _ = varint.encode(run_lens)
        return (
            pack_sections([rlens_pay, rblob.tobytes(), rl_pay]),
            {"runs": str(len(starts))},
        )

    def decode_bo(self, payload: bytes, params: dict, n: int) -> BO:
        runs = int(params["runs"])
        if runs == 0:
            return np.zeros(0, np.uint8), np.zeros(1, np.int64)
        rlens_pay, rblob_b, rl_pay = unpack_sections(payload)
        rlens = varint.decode(rlens_pay, count=runs, width=64).astype(np.int64)
        roffs = np.concatenate([[0], np.cumsum(rlens)]).astype(np.int64)
        rblob = np.frombuffer(rblob_b, dtype=np.uint8)
        run_lens = varint.decode(rl_pay, count=runs, width=64).astype(np.int64)
        idx = np.repeat(np.arange(runs, dtype=np.int64), run_lens)
        return _gather_values(rblob, roffs, idx)


class FsstStr:
    """FSST-style per-chunk symbol-table compression (Boncz/Neumann/Leis,
    VLDB 2020), simplified: up to 180 2-byte symbols + 1-byte identity
    symbols + escape code 255; greedy non-overlapping digram matching
    vectorized over the whole chunk blob (even-offset-within-run trick).
    Compressed per-value lengths keep random access."""

    name = "fsst"

    MAX_PAIRS = 180

    def _train(self, blob: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        sample = blob[: 1 << 16]
        present = np.unique(sample)
        if sample.size >= 2:
            pairs = sample[:-1].astype(np.uint16) << np.uint16(8)
            pairs |= sample[1:]
            uniq, counts = np.unique(pairs, return_counts=True)
            good = counts >= 4
            uniq, counts = uniq[good], counts[good]
            top = uniq[np.argsort(counts)[::-1][: self.MAX_PAIRS]]
        else:
            top = np.zeros(0, dtype=np.uint16)
        n_singles = 255 - len(top)
        singles = present[:n_singles]
        return top.astype(np.uint16), singles.astype(np.uint8)

    # compression runs in ~12 whole-array passes; tile the blob so those
    # passes hit a core-private L2 slice instead of re-streaming shared
    # DRAM (cache blocking — big effect on multi-core scaling).  128 KB
    # measured fastest at 1 AND 8 procs (working set incl. int32 offsets
    # and output stays ~L2-sized); 8-proc efficiency 0.88.
    TILE_BYTES = 1 << 17

    def _encode_layer(self, blob: np.ndarray, offs: np.ndarray):
        """One digram-coding layer.  -> (pair_syms, single_syms, out, comp_lens)."""
        pair_syms, single_syms = self._train(blob)
        P, S = len(pair_syms), len(single_syms)
        # uint8 LUTs with 0xFF = "no code" sentinel (safe: P+S <= 255, so
        # real codes never reach 255, which is the escape marker anyway)
        pair_code = np.full(65536, 0xFF, dtype=np.uint8)
        pair_code[pair_syms] = np.arange(P, dtype=np.uint8)
        single_code = np.full(256, 0xFF, dtype=np.uint8)
        single_code[single_syms] = np.arange(P, P + S, dtype=np.uint8)

        n_vals = offs.size - 1
        if int(offs[-1]) <= self.TILE_BYTES or n_vals < 2:
            out, comp_lens = self._compress_with_boundaries(blob, offs, pair_code, single_code)
        else:
            # split at value boundaries into ~TILE_BYTES slices
            cuts = [0]
            while cuts[-1] < n_vals:
                nxt = int(np.searchsorted(offs, offs[cuts[-1]] + self.TILE_BYTES))
                cuts.append(min(max(nxt, cuts[-1] + 1), n_vals))
            outs, lens_parts = [], []
            for a, b in zip(cuts[:-1], cuts[1:]):
                t_offs = offs[a : b + 1] - offs[a]
                t_blob = blob[offs[a] : offs[b]]
                o, cl = self._compress_with_boundaries(t_blob, t_offs, pair_code, single_code)
                outs.append(o)
                lens_parts.append(cl)
            out = np.concatenate(outs)
            comp_lens = np.concatenate(lens_parts)
        return pair_syms, single_syms, out, comp_lens

    # Re-Pair style round stacking: each extra layer digram-codes the
    # previous layer's code stream, so effective source-symbol length
    # doubles per round (2 -> 4 -> 8 bytes by round 3, real-FSST territory).
    # A round is kept only if it pays for its table (>=3% shrink).
    # Default 2: measured on a 38 MB html corpus, round 3 shrinks 6.4% more
    # (0.353 -> 0.330) but costs 22% encode / 42% decode throughput — set 3
    # for archival (write-once read-rarely) tables.
    MAX_ROUNDS = 2

    def encode_bo(self, bo: BO, cache: dict | None = None) -> tuple[bytes, dict]:
        blob, offs = bo
        p1, s1, out, comp_lens = self._encode_layer(blob, offs)
        tables: list[tuple[np.ndarray, np.ndarray]] = []
        rounds = 1
        while rounds < self.MAX_ROUNDS and out.size > 4096:
            offs2 = np.empty(comp_lens.size + 1, dtype=np.int64)
            offs2[0] = 0
            np.cumsum(comp_lens, out=offs2[1:])
            p_, s_, out2, comp_lens2 = self._encode_layer(out, offs2)
            if out2.size + 2 * len(p_) + len(s_) >= 0.97 * out.size:
                break
            rounds += 1
            tables.append((p_, s_))
            out, comp_lens = out2, comp_lens2
        clens_pay, _ = varint.encode(comp_lens.astype(np.uint64))
        extra: list[bytes] = []
        for p_, s_ in tables:
            extra.append(p_.astype(">u2").tobytes())
            extra.append(s_.tobytes())
        # layout (back-compatible with the 2-round format): p1, s1, clens,
        # codes, then (p_i, s_i) per extra round outermost-last
        return (
            pack_sections(
                [p1.astype(">u2").tobytes(), s1.tobytes(), clens_pay, out.tobytes()]
                + (extra or [b"", b""])
            ),
            {
                "pairs": str(len(p1)),
                "singles": str(len(s1)),
                "rounds": str(rounds),
            },
        )

    def _compress_with_boundaries(self, blob, offs, pair_code, single_code):
        nb = blob.size
        n_vals = offs.size - 1
        if nb == 0:
            return np.zeros(0, dtype=np.uint8), np.zeros(n_vals, dtype=np.int64)

        # one 64K-LUT gather produces the pair code per position (0xFF = none)
        pairs = blob[:-1].astype(np.uint16) << np.uint16(8)
        pairs |= blob[1:]
        pcode = pair_code[pairs]
        m = pcode != 0xFF
        # suppress pair matches straddling a value boundary (in-place scatter)
        ends = offs[1:][offs[1:] > 0] - 1
        ends = ends[ends < nb - 1]
        m[ends] = False

        # scan-free non-overlap selection ("parity repair" maximal matching):
        # take all matches at even positions, then odd-position matches whose
        # even neighbors were not taken.  Any valid non-overlapping parse
        # decodes identically; measured pair count is within noise of
        # greedy-left, at ~1/20 the cost of a positional forward-fill scan.
        even = _even_mask(nb - 1)
        sel_e = m & even
        selected = m & ~even
        selected[1:] &= ~sel_e[:-1]
        selected[:-1] &= ~sel_e[1:]
        selected |= sel_e

        sel_pos = np.flatnonzero(selected)
        remain = np.ones(nb, dtype=bool)
        remain[sel_pos] = False
        remain[sel_pos + 1] = False
        # classify leftover bytes on the (usually small) remainder only
        remain_idx = np.flatnonzero(remain)
        sc_r = single_code[blob[remain_idx]]
        esc_local = sc_r == 0xFF
        esc_idx = remain_idx[esc_local]
        single_idx = remain_idx[~esc_local]
        single_codes = sc_r[~esc_local]

        cost = np.ones(nb, dtype=np.uint8)
        cost[sel_pos + 1] = 0
        cost[esc_idx] = 2
        # int32 offsets are safe: tiles are <= TILE_BYTES << 2^31
        out_offs = np.empty(nb + 1, dtype=np.int32 if nb < (1 << 30) else np.int64)
        out_offs[0] = 0
        np.cumsum(cost, dtype=out_offs.dtype, out=out_offs[1:])
        out = np.empty(int(out_offs[-1]), dtype=np.uint8)
        out[out_offs[sel_pos]] = pcode[sel_pos]
        out[out_offs[single_idx]] = single_codes
        esc_out = out_offs[esc_idx]
        out[esc_out] = _ESCAPE
        out[esc_out + 1] = blob[esc_idx]

        comp_lens = out_offs[offs[1:]] - out_offs[offs[:-1]]
        return out, comp_lens.astype(np.int64)

    def decode_bo(self, payload: bytes, params: dict, n: int) -> BO:
        sections = unpack_sections(payload)
        table_p1, table_s1, clens_pay, blob_b = sections[:4]
        if n == 0:
            return np.zeros(0, np.uint8), np.zeros(1, np.int64)
        comp_lens = varint.decode(clens_pay, count=n, width=64).astype(np.int64)
        codes = np.frombuffer(blob_b, dtype=np.uint8)
        # undo extra rounds outermost-first: round k's tables are the LAST
        # (p, s) section pair, round 2's the first extra pair
        rounds = int(params.get("rounds", "1"))
        for r in range(rounds, 1, -1):
            pi = np.frombuffer(sections[4 + 2 * (r - 2)], dtype=">u2").astype(np.uint16)
            si = np.frombuffer(sections[5 + 2 * (r - 2)], dtype=np.uint8)
            codes, mid_offs = self._decode_layer(codes, comp_lens, pi, si)
            comp_lens = np.diff(mid_offs)
        p1 = np.frombuffer(table_p1, dtype=">u2").astype(np.uint16)
        s1 = np.frombuffer(table_s1, dtype=np.uint8)
        return self._decode_layer(codes, comp_lens, p1, s1)

    def _decode_layer(
        self, codes_all: np.ndarray, comp_lens: np.ndarray, pair_syms: np.ndarray, single_syms: np.ndarray
    ) -> BO:
        P, S = len(pair_syms), len(single_syms)
        n = comp_lens.size

        if codes_all.size > self.TILE_BYTES and n >= 2:
            # cache-blocked decode: tile at value boundaries (escape state
            # never crosses values — escapes are within-value)
            comp_offs_all = np.concatenate([[0], np.cumsum(comp_lens)])
            cuts = [0]
            while cuts[-1] < n:
                nxt = int(np.searchsorted(comp_offs_all, comp_offs_all[cuts[-1]] + self.TILE_BYTES))
                cuts.append(min(max(nxt, cuts[-1] + 1), n))
            blobs, offs_parts, base = [], [], 0
            for a, b in zip(cuts[:-1], cuts[1:]):
                t_blob, t_offs = self._decode_block(
                    codes_all[comp_offs_all[a] : comp_offs_all[b]],
                    comp_lens[a:b], b - a, pair_syms, single_syms, P, S,
                )
                blobs.append(t_blob)
                offs_parts.append(t_offs[1:] + base)
                base += int(t_offs[-1])
            return np.concatenate(blobs), np.concatenate([[0], *offs_parts]).astype(np.int64)
        return self._decode_block(codes_all, comp_lens, n, pair_syms, single_syms, P, S)

    def _decode_block(self, codes, comp_lens, n, pair_syms, single_syms, P, S) -> BO:

        sym_first = np.empty(256, dtype=np.uint8)
        sym_second = np.zeros(256, dtype=np.uint8)
        sym_len = np.ones(256, dtype=np.uint8)
        sym_first[:P] = (pair_syms >> np.uint16(8)).astype(np.uint8)
        sym_second[:P] = (pair_syms & np.uint16(0xFF)).astype(np.uint8)
        sym_len[:P] = 2
        sym_first[P : P + S] = single_syms

        nb = codes.size
        off_t = np.int32 if nb < (1 << 30) else np.int64
        esc_mask = codes == _ESCAPE

        if not esc_mask.any():
            # fast path (the common case: no escape bytes in this block)
            lens8 = sym_len[codes]
            out_offs = np.empty(nb + 1, dtype=off_t)
            out_offs[0] = 0
            np.cumsum(lens8, dtype=off_t, out=out_offs[1:])
            out = np.empty(int(out_offs[-1]), dtype=np.uint8)
            out[out_offs[:-1]] = sym_first[codes]
            two = np.flatnonzero(lens8 == 2)
            out[out_offs[two] + 1] = sym_second[codes[two]]
            comp_offs = np.concatenate([[0], np.cumsum(comp_lens)])
            return out, out_offs[comp_offs].astype(np.int64)

        is_code = np.ones(nb, dtype=bool)
        # runs of consecutive 0xFF bytes: alternating escape/literal
        run_start = esc_mask & ~np.concatenate([[False], esc_mask[:-1]])
        rid = np.cumsum(run_start)
        first_of = np.zeros(rid.max() + 1, dtype=np.int64)
        sidx = np.flatnonzero(run_start)
        first_of[rid[sidx]] = sidx
        par = (np.arange(nb) - first_of[rid]) & 1
        true_esc = esc_mask & (par == 0)
        literal = np.zeros(nb, dtype=bool)
        tp = np.flatnonzero(true_esc) + 1
        literal[tp[tp < nb]] = True
        is_code = ~literal
        esc_mask = true_esc
        out_len_per = np.where(esc_mask, np.uint8(1), sym_len[codes])
        out_len_per[~is_code] = 0

        out_offs = np.empty(nb + 1, dtype=off_t)
        out_offs[0] = 0
        np.cumsum(out_len_per, dtype=off_t, out=out_offs[1:])
        out = np.empty(int(out_offs[-1]), dtype=np.uint8)
        cp = np.flatnonzero(is_code & ~esc_mask)
        c2 = codes[cp]
        out[out_offs[cp]] = sym_first[c2]
        two = cp[sym_len[c2] == 2]
        out[out_offs[two] + 1] = sym_second[codes[two]]
        ep = np.flatnonzero(esc_mask)
        ep_valid = ep[ep + 1 < nb]
        out[out_offs[ep_valid]] = codes[ep_valid + 1]

        comp_offs = np.concatenate([[0], np.cumsum(comp_lens)])
        raw_offs = out_offs[comp_offs].astype(np.int64)
        return out, raw_offs


# list[bytes] adapter so kernel-level tests and small callers stay simple
for _cls in (RawStr, DictStr, RleStr, FsstStr):
    _cls.encode = lambda self, values: self.encode_bo(list_to_bo(values))
    _cls.decode = lambda self, payload, params, n: bo_to_list(self.decode_bo(payload, params, n))


STR_CODECS = {c.name: c for c in [RawStr(), DictStr(), RleStr(), FsstStr()]}
