"""Text-analysis functions for training-data pipelines — all native Spark
column expressions (JVM-side, whole-stage codegen; no Python in the hot
path), each with a DuckDB-mirrorable SQL formula for the oracle gate.

Operators: token counting, quality scoring, language ID (stopword-hit
heuristic), document fingerprinting (shingle min-hash / rolling-hash
style).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists (public common words)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit"],
    "fr": ["le", "la", "les", "et", "est", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "que", "por"],
}

STOPWORDS_EN = LANG_STOPWORDS["en"] + ["a", "in", "it", "for", "on", "as", "are"]


def tokens(col: str) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def token_count(col: str) -> Column:
    return F.size(tokens(col))


def token_count_sql_duckdb(col: str) -> str:
    return f"len(regexp_split_to_array(lower(trim({col})), '\\s+'))"


# GPT-2-style pre-tokenizer pattern, simplified to the subset whose
# semantics agree between Java regex (Spark) and RE2 (DuckDB): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens(col: str) -> Column:
    """BPE-ish sub-word pre-tokenization (the unit LLM token budgets count
    before merges) — native regexp, WSCG, cross-engine-identical."""
    return F.regexp_extract_all(F.col(col), F.lit(BPE_PATTERN), 0)


def bpe_token_count(col: str) -> Column:
    return F.size(bpe_tokens(col))


def bpe_token_count_sql_duckdb(col: str) -> str:
    pat = BPE_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all({col}, '{pat}'))"


def _hits(col: str, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(arr, t)))


def _hits_sql(col: str, words: list[str]) -> str:
    wl = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter(regexp_split_to_array(lower(trim({col})), '\\s+'), "
        f"t -> list_contains([{wl}], t)))"
    )


def stopword_ratio(col: str) -> Column:
    return (_hits(col, STOPWORDS_EN) / F.greatest(token_count(col), F.lit(1))).cast("double")


def stopword_ratio_sql_duckdb(col: str) -> str:
    return (
        f"CAST({_hits_sql(col, STOPWORDS_EN)} AS DOUBLE) / "
        f"greatest({token_count_sql_duckdb(col)}, 1)"
    )


def quality_score(col: str) -> Column:
    """Simple quality heuristic in [0,1]: length band + stopword presence +
    mean word length band (the classic Gopher-style rules, simplified).
    Integer-scaled to avoid float-division drift between engines."""
    n_tok = token_count(col)
    n_chars = F.length(F.col(col))
    mean_wl = n_chars / F.greatest(n_tok, F.lit(1))
    sw = stopword_ratio(col)
    score = (
        F.when((n_tok >= 10) & (n_tok <= 100000), 1).otherwise(0)
        + F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), 1).otherwise(0)
        + F.when(sw >= 0.05, 1).otherwise(0)
        + F.when(n_chars >= 50, 1).otherwise(0)
    )
    return (score / F.lit(4.0)).alias("quality")


def quality_score_sql_duckdb(col: str) -> str:
    n_tok = token_count_sql_duckdb(col)
    sw = stopword_ratio_sql_duckdb(col)
    return (
        f"(CASE WHEN {n_tok} BETWEEN 10 AND 100000 THEN 1 ELSE 0 END"
        f" + CASE WHEN CAST(length({col}) AS DOUBLE) / greatest({n_tok},1) BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END"
        f" + CASE WHEN {sw} >= 0.05 THEN 1 ELSE 0 END"
        f" + CASE WHEN length({col}) >= 50 THEN 1 ELSE 0 END) / 4.0"
    )


def lang_id(col: str) -> Column:
    """Stopword-hit language ID over {en,de,fr,es}; 'und' when no hits.
    Deterministic tie-break by fixed language order."""
    hits = {lang: _hits(col, words) for lang, words in LANG_STOPWORDS.items()}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_STOPWORDS)):  # first lang wins ties
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def lang_id_sql_duckdb(col: str) -> str:
    h = {lang: _hits_sql(col, words) for lang, words in LANG_STOPWORDS.items()}
    greatest = f"greatest({', '.join(h.values())})"
    expr = "'und'"
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = (
            f"CASE WHEN {h[lang]} > 0 AND {h[lang]} = {greatest} "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return expr


def shingle_fingerprint(col: str, k: int = 8) -> Column:
    """Document fingerprint: min over xxhash64 of all k-char shingles —
    the winnowing/rolling-hash scheme at shingle granularity.  Native exprs
    only; not DuckDB-mirrorable (hash differs) -> rows-only check."""
    c = F.col(col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1)))
    return F.array_min(F.transform(idx, lambda i: F.xxhash64(F.substring(c, i, k))))


def simhash_df(df, id_col: str, text_col: str):
    """64-bit SimHash per document — SHUFFLE-FREE.

    The whole signature is a per-row expression: ``aggregate`` folds the
    token-hash array into a 64-slot bit-count accumulator (``transform``
    with index inside the fold), then each bit is set iff its count wins
    the majority (2*count > n_tokens, identical to the ±1-vote sum of the
    grouped formulation — pinned equal by test).  Zero exchanges: at 100 TB
    this emits no (id, token-hash) shuffle stream at all, vs the exploded
    groupBy variant whose shuffle I/O is ~token-count x 16 bytes.

    Zero-token documents: this formulation emits simhash=0 for them, while
    ``simhash_df_grouped`` drops them entirely (explode yields no rows) —
    the bit-for-bit equivalence pin holds on rows present in both, i.e. on
    corpora with no token-less docs (the pin test filters accordingly)."""
    hs = F.transform(tokens(text_col), lambda t: F.xxhash64(t))
    n = F.size(hs)
    counts = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.transform(
            acc, lambda c, b: c + F.bit_get(h, b)
        ),
    )
    # majority bit per position (LSB first), then assemble the long from two
    # 32-bit halves MSB-first (acc*2 + bit — halves can't overflow, and the
    # final shiftleft is a bitwise op, exempt from ANSI overflow)
    bits = F.transform(
        counts, lambda c: F.when(c * 2 > n, F.lit(1)).otherwise(F.lit(0)).cast("long")
    )
    fold_msb_first = lambda half: F.aggregate(
        F.reverse(half), F.lit(0).cast("long"), lambda acc, x: acc * 2 + x
    )
    lo = fold_msb_first(F.slice(bits, 1, 32))
    hi = fold_msb_first(F.slice(bits, 33, 32))
    sim = F.shiftleft(hi, 32).bitwiseOR(lo)
    return df.select(F.col(id_col), sim.alias("simhash"))


def simhash_df_grouped(df, id_col: str, text_col: str):
    """The explode->groupBy formulation of :func:`simhash_df` (64 per-bit
    ±1-vote sums after one shuffle on the doc id).  Kept as the
    cross-implementation pin for the shuffle-free version; prefer
    :func:`simhash_df` everywhere."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__tok")
    ).withColumn("__h", F.xxhash64("__tok"))
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned("__h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"__v{b}")
            for b in range(64)
        ]
    )
    out = F.lit(0).cast("long")
    for b in range(64):
        out = out.bitwiseOR(
            F.when(F.col(f"__v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return votes.select(F.col(id_col), out.alias("simhash"))


# ---- html/url cleanup operators (crawl-pipeline staples) ------------------


# script/style ELEMENT CONTENTS are not text — real crawl cleanup drops
# them, not just the tags.  (?is) = case-insensitive + dotall; alternation
# instead of a backreference because RE2 (DuckDB) has no backrefs.
_SCRIPT_STYLE_RE = r"(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>"


def html_to_text(col) -> Column:
    """Strip markup from an html string column: script/style elements
    (including their contents) -> space, remaining tags -> space,
    whitespace collapsed, trimmed.  Pure native regexp (RE2/Java-agreeing
    patterns — no backrefs/lookarounds), so it runs JVM-side in WSCG."""
    c = col if isinstance(col, Column) else F.col(col)
    c = F.regexp_replace(c, _SCRIPT_STYLE_RE, " ")
    return F.trim(F.regexp_replace(F.regexp_replace(c, "<[^>]*>", " "), r"\s+", " "))


def html_to_text_sql_duckdb(col: str) -> str:
    inner = f"regexp_replace({col}, '{_SCRIPT_STYLE_RE}', ' ', 'g')"
    return (
        f"trim(regexp_replace(regexp_replace({inner}, '<[^>]*>', ' ', 'g'), "
        "'\\s+', ' ', 'g'))"
    )


def normalize_url(col) -> Column:
    """Canonicalize a URL for dedup keys: drop the fragment, lowercase
    scheme and host, strip trailing slashes from the path.  Composed only
    of string builtins whose semantics DuckDB mirrors exactly
    (:func:`normalize_url_sql_duckdb`)."""
    c = col if isinstance(col, Column) else F.col(col)
    u = F.substring_index(c, "#", 1)  # drop fragment
    scheme = F.lower(F.substring_index(u, "://", 1))
    after = F.substring(u, F.locate("://", u) + 3, F.length(u))
    host = F.lower(F.substring_index(after, "/", 1))
    slash = F.locate("/", after)
    path = F.when(
        slash > 0, F.substring(after, slash, F.length(after))
    ).otherwise(F.lit(""))
    path = F.regexp_replace(path, "/+$", "")
    return F.concat(scheme, F.lit("://"), host, path)


def normalize_url_sql_duckdb(col: str) -> str:
    u = f"split_part({col}, '#', 1)"
    scheme = f"lower(split_part({u}, '://', 1))"
    after = f"substr({u}, strpos({u}, '://') + 3)"
    host = f"lower(split_part({after}, '/', 1))"
    path = (
        f"CASE WHEN strpos({after}, '/') > 0 "
        f"THEN regexp_replace(substr({after}, strpos({after}, '/')), '/+$', '') "
        "ELSE '' END"
    )
    return f"({scheme} || '://' || {host} || {path})"


# ---- repetition / character-class quality signals (Gopher-style) ----------


def unique_token_ratio(col) -> Column:
    """distinct tokens / tokens — the classic repetition filter signal
    (heavily duplicated boilerplate pages score low)."""
    t = tokens(col if isinstance(col, str) else col)
    return (F.size(F.array_distinct(t)) / F.greatest(F.size(t), F.lit(1))).cast("double")


def unique_token_ratio_sql_duckdb(col: str) -> str:
    t = f"regexp_split_to_array(lower(trim({col})), '\\s+')"
    return f"CAST(len(list_distinct({t})) AS DOUBLE) / greatest(len({t}), 1)"


def alpha_ratio(col) -> Column:
    """letter characters / all characters (unicode \\p{L} — agrees between
    Java regex and RE2): gibberish/markup-heavy pages score low."""
    c = col if isinstance(col, Column) else F.col(col)
    return (
        F.length(F.regexp_replace(c, r"[^\p{L}]", "")) / F.greatest(F.length(c), F.lit(1))
    ).cast("double")


def alpha_ratio_sql_duckdb(col: str) -> str:
    return (
        f"CAST(length(regexp_replace({col}, '[^\\p{{L}}]', '', 'g')) AS DOUBLE) "
        f"/ greatest(length({col}), 1)"
    )
