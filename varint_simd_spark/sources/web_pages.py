"""Deterministic synthetic Common-Crawl-style ``web_pages`` table.

Schema per BASELINE.json ``input_hint``:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Generated entirely with ``spark.range`` + native column expressions — no
external data, no Python row functions, no driver-side loops: the same
(seed, n) always produces the same rows regardless of parallelism, which is
what makes chunk membership / resume deterministic at any cluster size.

Characteristics (FIXTURES.md §1):
* hosts Zipf-ish skewed (log-uniform rank over ~1000 hosts ⇒ a few hot
  hosts, exercising salting);
* ``warc_ts`` near-sorted by id with jitter back-jumps (negative deltas ⇒
  exercising zigzag);
* ``text`` = deterministic token sequences, log-normal-ish length;
* ``lang`` low-cardinality weighted (exercising dict/RLE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = (
    "the of and to in a is that for it as was with be by on not he this are or "
    "his from at which but have an had they you were their one all we can her "
    "has there been if more when will would who so no out up into them about "
    "than then its time only could other these two may first new now any such "
    "like our over man even most made after also did many before must through "
    "years where much your way well down should because each just those people "
    "data web page crawl index search engine column spark codec varint stream"
).split()

LANGS = ["en", "de", "fr", "es", "zh", "ja", "ru", "pt"]
_LANG_CUM = [50, 65, 75, 83, 90, 95, 98, 100]  # weighted cumulative %

BASE_TS = "2024-10-08 00:00:00"
N_HOSTS = 1000
AVG_STEP_S = 30
JITTER_S = 90  # > AVG_STEP => occasional negative deltas


def generate_web_pages(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    df = spark.range(n).withColumnRenamed("id", "page_id")
    h = lambda salt: F.abs(F.xxhash64("page_id", F.lit(seed), F.lit(salt)))

    # log-uniform host rank in [0, N_HOSTS): rank 0 is the hottest host
    u = (h(1) % 1_000_000) / 1_000_000.0
    host_rank = F.least(
        F.floor(F.exp(u * float(__import__("math").log(N_HOSTS)))) - 1,
        F.lit(N_HOSTS - 1),
    ).cast("int")
    host = F.concat(F.lit("host"), host_rank.cast("string"), F.lit(".example.com"))
    url = F.concat(F.lit("https://"), host, F.lit("/p/"), F.col("page_id").cast("string"))

    # near-sorted timestamp: base + id*step + jitter(-J..J)
    jitter = (h(2) % (2 * JITTER_S * 1_000_000)) - F.lit(JITTER_S * 1_000_000)
    micros = (
        F.unix_micros(F.to_timestamp(F.lit(BASE_TS)))
        + F.col("page_id") * (AVG_STEP_S * 1_000_000)
        + jitter
    )
    warc_ts = F.timestamp_micros(micros.cast("long"))

    # token text: log-normal-ish length via product of two uniforms
    n_tokens = (F.lit(8) + (h(3) % 40) * (h(4) % 12) / F.lit(4)).cast("int")
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_tokens),
            lambda i: F.element_at(
                vocab,
                (F.abs(F.xxhash64(F.col("page_id"), F.lit(seed), F.lit(5), i)) % len(VOCAB)).cast("int") + 1,
            ),
        ),
        " ",
    )

    lang_draw = h(6) % 100
    lang = F.lit(LANGS[-1])
    for code, cum in reversed(list(zip(LANGS[:-1], _LANG_CUM[:-1]))):
        lang = F.when(lang_draw < cum, F.lit(code)).otherwise(lang)

    # deterministic script/style blocks on a subset of pages: crawl-cleanup
    # operators (html_to_text) must drop element CONTENTS, not just tags,
    # so the fixtures need inline js/css to prove it
    script = F.when(
        F.col("page_id") % 3 == 0,
        F.concat(
            F.lit('<script type="text/javascript">var t='),
            F.col("page_id").cast("string"),
            F.lit(";track(t);</script>"),
        ),
    ).otherwise(F.lit(""))
    style = F.when(
        F.col("page_id") % 5 == 0,
        F.concat(
            F.lit("<STYLE>body{margin:"),
            (F.col("page_id") % 7).cast("string"),
            F.lit("px}</STYLE>"),
        ),
    ).otherwise(F.lit(""))
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>"),
            host,
            F.lit("</title>"),
            script,
            style,
            F.lit("</head><body><p>"),
            text,
            F.lit("</p></body></html>"),
        ),
        "utf-8",
    )

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )
