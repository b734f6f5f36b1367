"""String/binary-column codecs.

Input/output unit: a list/np.object_ array of ``bytes`` (the operators layer
converts str<->bytes at the utf-8 boundary so that round-trips are
*byte-identical*, the north-rule invariant).

All payload framing uses the reference varint wire format (offset/length
streams are "offset columns" per the north rule).  Dict / RLE / FSST are
engine extensions absent from the reference (SURVEY.md §2.1 provenance note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..kernels import varint
from .container import pack_sections, unpack_sections

_ESCAPE = 255  # FSST escape code (code 255 = next byte is a literal)


def _concat_with_lens(values: list[bytes]) -> tuple[bytes, bytes]:
    """-> (varint length stream, concatenated bytes)."""
    lens = np.fromiter((len(v) for v in values), dtype=np.uint64, count=len(values))
    lens_pay, _ = varint.encode(lens)
    return lens_pay, b"".join(values)


def _split_by_lens(lens_pay: bytes, blob: bytes, n: int) -> list[bytes]:
    if n == 0:
        return []
    lens = varint.decode(lens_pay, count=n, width=64).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    return [blob[offs[i] : offs[i + 1]] for i in range(n)]


class RawStr:
    """varint length stream + concatenated bytes (offset-column framing)."""

    name = "raw_str"

    def encode(self, values: list[bytes]) -> tuple[bytes, dict]:
        lens_pay, blob = _concat_with_lens(values)
        return pack_sections([lens_pay, blob]), {}

    def decode(self, payload: bytes, params: dict, n: int) -> list[bytes]:
        lens_pay, blob = unpack_sections(payload)
        return _split_by_lens(lens_pay, blob, n)


class DictStr:
    """Dictionary encoding: unique values + varint index stream.

    Per-chunk local dictionary (no global shuffle — SURVEY.md §2.1 note)."""

    name = "dict_str"

    def encode(self, values: list[bytes]) -> tuple[bytes, dict]:
        codes, uniques = pd.factorize(np.asarray(values, dtype=object), sort=False)
        lens_pay, blob = _concat_with_lens(list(uniques))
        idx_pay, _ = varint.encode(codes.astype(np.uint64))
        return pack_sections([lens_pay, blob, idx_pay]), {"dict_n": str(len(uniques))}

    def decode(self, payload: bytes, params: dict, n: int) -> list[bytes]:
        dn = int(params["dict_n"])
        lens_pay, blob, idx_pay = unpack_sections(payload)
        uniques = np.array(_split_by_lens(lens_pay, blob, dn), dtype=object)
        if n == 0:
            return []
        codes = varint.decode(idx_pay, count=n, width=64).astype(np.int64)
        return list(uniques[codes])


class RleStr:
    """Run-length encoding for sorted/low-churn string columns:
    run values (raw framing) + run lengths (varint)."""

    name = "rle_str"

    def encode(self, values: list[bytes]) -> tuple[bytes, dict]:
        n = len(values)
        if n == 0:
            return pack_sections([b"", b"", b""]), {"runs": "0"}
        arr = np.empty(n, dtype=object)
        arr[:] = values
        codes, _ = pd.factorize(arr, sort=False)  # C-speed equality detection
        starts = np.concatenate([[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1])
        run_vals = [arr[s] for s in starts]
        run_lens = np.diff(np.concatenate([starts, [n]])).astype(np.uint64)
        lens_pay, blob = _concat_with_lens(run_vals)
        rl_pay, _ = varint.encode(run_lens)
        return pack_sections([lens_pay, blob, rl_pay]), {"runs": str(len(run_vals))}

    def decode(self, payload: bytes, params: dict, n: int) -> list[bytes]:
        runs = int(params["runs"])
        if runs == 0:
            return []
        lens_pay, blob, rl_pay = unpack_sections(payload)
        run_vals = np.array(_split_by_lens(lens_pay, blob, runs), dtype=object)
        run_lens = varint.decode(rl_pay, count=runs, width=64).astype(np.int64)
        return list(np.repeat(run_vals, run_lens))


class FsstStr:
    """FSST-style per-chunk symbol-table compression (Boncz/Neumann/Leis,
    VLDB 2020 "FSST: Fast Random Access String Compression"), simplified:

    * symbol table of up to 255 symbols: the most frequent byte *pairs*
      (2-byte symbols) plus identity 1-byte symbols for all frequent bytes;
    * code 255 = escape, next byte is a literal (rare-byte fallback);
    * greedy left-to-right longest-match, vectorized: pair-match positions
      are found on the whole concatenated chunk at once and non-overlapping
      matches selected by even-offset-within-run (no per-byte Python).

    Values are compressed as one concatenated blob + varint *compressed*
    length stream, so random access per value survives.
    """

    name = "fsst"

    MAX_PAIRS = 180  # leave room for 1-byte symbols; total codes <= 255

    def _train(self, blob: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """-> (pair_symbols uint16 array, single_bytes uint8 array)."""
        sample = blob[: 1 << 16]
        present = np.unique(sample)
        if sample.size >= 2:
            pairs = sample[:-1].astype(np.uint16) << np.uint16(8)
            pairs |= sample[1:]
            uniq, counts = np.unique(pairs, return_counts=True)
            good = counts >= 4  # a pair must save at least a few bytes
            uniq, counts = uniq[good], counts[good]
            top = uniq[np.argsort(counts)[::-1][: self.MAX_PAIRS]]
        else:
            top = np.zeros(0, dtype=np.uint16)
        n_singles = 255 - len(top)
        singles = present[:n_singles]
        return top.astype(np.uint16), singles.astype(np.uint8)

    def encode(self, values: list[bytes]) -> tuple[bytes, dict]:
        n = len(values)
        raw_lens = np.fromiter((len(v) for v in values), dtype=np.int64, count=n)
        blob = np.frombuffer(b"".join(values), dtype=np.uint8)
        pair_syms, single_syms = self._train(blob)

        # code assignment: pair symbols get codes [0, P); singles [P, P+S)
        P, S = len(pair_syms), len(single_syms)
        pair_code = np.full(65536, -1, dtype=np.int16)
        pair_code[pair_syms] = np.arange(P, dtype=np.int16)
        single_code = np.full(256, -1, dtype=np.int16)
        single_code[single_syms] = np.arange(P, P + S, dtype=np.int16)

        out = self._compress(blob, pair_code, single_code)

        # re-derive per-value compressed lengths by compressing per-boundary:
        # match positions never straddle value boundaries if we compress each
        # value's slice independently — instead we compress the whole blob but
        # must prevent cross-value pair matches.  Simplest correct approach:
        # compress per value-slice in a vectorized loop over *boundaries*:
        # done inside _compress via a boundary mask.
        offs = np.concatenate([[0], np.cumsum(raw_lens)])
        out, comp_lens = self._compress_with_boundaries(blob, offs, pair_code, single_code)

        table_pairs = pair_syms.astype(">u2").tobytes()
        table_singles = single_syms.tobytes()
        clens_pay, _ = varint.encode(comp_lens.astype(np.uint64))
        return (
            pack_sections([table_pairs, table_singles, clens_pay, out.tobytes()]),
            {"pairs": str(P), "singles": str(S)},
        )

    def _compress_with_boundaries(
        self,
        blob: np.ndarray,
        offs: np.ndarray,
        pair_code: np.ndarray,
        single_code: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Greedy digram compression of the whole blob at once, with pair
        matches suppressed across value boundaries.  Returns (codes, per-value
        compressed lengths)."""
        nb = blob.size
        n_vals = offs.size - 1
        if nb == 0:
            return np.zeros(0, dtype=np.uint8), np.zeros(n_vals, dtype=np.int64)

        pairs = blob[:-1].astype(np.uint16) << np.uint16(8)
        pairs |= blob[1:]
        m = pair_code[pairs] >= 0  # candidate pair-match start positions
        # suppress matches whose second byte is in the next value
        last_byte_of_value = np.zeros(nb, dtype=bool)
        nonempty_ends = offs[1:][offs[1:] > 0] - 1  # guard empty values (offs repeat)
        last_byte_of_value[nonempty_ends] = True
        m &= ~last_byte_of_value[:-1]

        # greedy non-overlapping: within each maximal run of consecutive
        # candidates, keep even offsets — but runs must also restart at value
        # boundaries (a pair consumed at the end of value k cannot shift the
        # phase of value k+1; boundary suppression above already breaks runs
        # because the boundary position itself is not a candidate).
        m_ext = np.concatenate([[False], m])
        run_start = m & ~m_ext[:-1]
        run_id = np.cumsum(run_start)
        pos = np.arange(nb - 1)
        first_pos_of_run = np.zeros(run_id.max() + 1 if run_id.size else 1, dtype=np.int64)
        starts_idx = np.flatnonzero(run_start)
        first_pos_of_run[run_id[starts_idx]] = starts_idx
        offset_in_run = pos - first_pos_of_run[run_id]
        selected = m & ((offset_in_run & 1) == 0)

        sel_pos = np.flatnonzero(selected)
        consumed_second = np.zeros(nb, dtype=bool)
        consumed_second[sel_pos + 1] = True

        # classify each byte: start of selected pair -> pair code;
        # consumed second byte -> skip; else single code or escape+literal
        is_pair_start = np.zeros(nb, dtype=bool)
        is_pair_start[sel_pos] = True
        remain = ~is_pair_start & ~consumed_second
        sc = single_code[blob]
        esc = remain & (sc < 0)
        single = remain & (sc >= 0)

        # output cost per input byte position
        cost = np.zeros(nb, dtype=np.int64)
        cost[is_pair_start] = 1
        cost[single] = 1
        cost[esc] = 2
        out_offs = np.concatenate([[0], np.cumsum(cost)])
        total = int(out_offs[-1])
        out = np.empty(total, dtype=np.uint8)
        out[out_offs[sel_pos]] = pair_code[pairs[sel_pos]].astype(np.uint8)
        single_idx = np.flatnonzero(single)
        out[out_offs[single_idx]] = sc[single_idx].astype(np.uint8)
        esc_idx = np.flatnonzero(esc)
        esc_out = out_offs[esc_idx]
        out[esc_out] = _ESCAPE
        out[esc_out + 1] = blob[esc_idx]

        comp_lens = out_offs[offs[1:]] - out_offs[offs[:-1]]
        return out, comp_lens.astype(np.int64)

    # kept for API symmetry / direct use in training experiments
    def _compress(self, blob, pair_code, single_code):
        offs = np.array([0, blob.size], dtype=np.int64)
        out, _ = self._compress_with_boundaries(blob, offs, pair_code, single_code)
        return out

    def decode(self, payload: bytes, params: dict, n: int) -> list[bytes]:
        P, S = int(params["pairs"]), int(params["singles"])
        table_pairs, table_singles, clens_pay, blob = unpack_sections(payload)
        if n == 0:
            return []
        pair_syms = np.frombuffer(table_pairs, dtype=">u2").astype(np.uint16)
        single_syms = np.frombuffer(table_singles, dtype=np.uint8)
        comp_lens = varint.decode(clens_pay, count=n, width=64).astype(np.int64)
        codes = np.frombuffer(blob, dtype=np.uint8)

        # per-code expansion: pair codes -> 2 bytes, single codes -> 1 byte,
        # escape -> swallow next byte as literal
        sym_first = np.empty(256, dtype=np.uint8)
        sym_second = np.zeros(256, dtype=np.uint8)
        sym_len = np.ones(256, dtype=np.int64)
        sym_first[:P] = (pair_syms >> np.uint16(8)).astype(np.uint8)
        sym_second[:P] = (pair_syms & np.uint16(0xFF)).astype(np.uint8)
        sym_len[:P] = 2
        sym_first[P : P + S] = single_syms

        nb = codes.size
        is_code = np.ones(nb, dtype=bool)
        esc_mask = codes == _ESCAPE
        # a byte following an escape is a literal, not a code; escapes cannot
        # chain ambiguously because literals are data — resolve sequentially
        # over escape positions only (rare), vectorized via parity trick:
        esc_pos = np.flatnonzero(esc_mask)
        if esc_pos.size:
            # escape bytes whose predecessor is a literal-of-escape are data;
            # walk runs of consecutive escape bytes: within a run starting at
            # a true escape, alternating bytes are escapes
            run_start = esc_mask & ~np.concatenate([[False], esc_mask[:-1]])
            rid = np.cumsum(run_start)
            first_of = np.zeros(rid.max() + 1, dtype=np.int64)
            sidx = np.flatnonzero(run_start)
            first_of[rid[sidx]] = sidx
            par = (np.arange(nb) - first_of[rid]) & 1
            true_esc = esc_mask & (par == 0)
            literal = np.zeros(nb, dtype=bool)
            tp = np.flatnonzero(true_esc)
            tp_next = tp + 1
            tp_next = tp_next[tp_next < nb]
            literal[tp_next] = True
            is_code = ~literal
            esc_mask = true_esc
        out_len_per = np.where(esc_mask, 1, sym_len[codes])
        out_len_per[~is_code] = 0  # literals emitted by their escape

        # build output: for each code position, write 1-2 bytes
        out_offs = np.concatenate([[0], np.cumsum(out_len_per)])
        total = int(out_offs[-1])
        out = np.empty(total, dtype=np.uint8)
        code_pos = is_code & ~esc_mask
        cp = np.flatnonzero(code_pos)
        out[out_offs[cp]] = sym_first[codes[cp]]
        two = cp[sym_len[codes[cp]] == 2]
        out[out_offs[two] + 1] = sym_second[codes[two]]
        ep = np.flatnonzero(esc_mask)
        ep_valid = ep[ep + 1 < nb]
        out[out_offs[ep_valid]] = codes[ep_valid + 1]

        comp_offs = np.concatenate([[0], np.cumsum(comp_lens)])
        raw_offs = out_offs[comp_offs]
        blob_bytes = out.tobytes()
        return [blob_bytes[raw_offs[i] : raw_offs[i + 1]] for i in range(n)]


STR_CODECS = {c.name: c for c in [RawStr(), DictStr(), RleStr(), FsstStr()]}
