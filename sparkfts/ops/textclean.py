"""Corpus-cleaning ops for pretraining pipelines: repetition-based
quality rules, PII redaction, and URL canonicalization.

These are the standard cleanup moves a web-scale training-data pipeline
applies between crawl and index/training (the reference's pipeline ships
documents straight from ES to Neo4j, reference
ElasticsearchToNeo4jSync.py:92-102; these ops are the corpus-hygiene
stage every production deployment runs in front of that):

- ``repetition_stats``: Gopher-style repetition signals (duplicate-token
  fraction, duplicate-bigram fraction, top-token frequency) used to drop
  boilerplate / SEO-spam pages.
- ``redact_pii``: regex redaction of emails, IPv4 addresses and phone
  numbers, with per-type match counts (patterns pinned to the common
  Java-regex / RE2 subset so DuckDB replays them exactly).
- ``canonicalize_urls``: deterministic URL normalization (scheme/host
  lowercase, default-port strip, fragment drop, tracking-param strip)
  plus host extraction — the first step of per-host caps and host-level
  dedup.

Scale shapes:

- ``repetition_stats``: duplicate-token / duplicate-bigram fractions are
  pure JVM array expressions (``array_distinct`` / ``zip_with``) — linear
  per doc, no shuffle, whole-stage codegen. The top-token mode needs a
  real distributed aggregation: explode -> partial-agg count per
  (doc, token) -> per-doc max+sum (two map-side-combined shuffles keyed
  by doc_id; no skew risk beyond document length itself).
- ``redact_pii`` / ``canonicalize_urls``: rowwise JVM ``regexp_replace``
  chains — no shuffle, evaluate inside the scan's codegen stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Pinned PII patterns — the common subset of Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition and \b word boundaries
# only (no lookarounds, no backrefs). Redaction order is pinned
# email -> ipv4 -> phone so a dotted quad is never half-consumed by the
# phone pattern; each step's count is over THAT step's input text.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
PHONE_RE = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

# analyzer-pinned tokens (same [a-z0-9]+ stream as the index)
_TOK_RE = "[a-z0-9]+"


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition signals -> DataFrame(doc_id, n_tokens,
    dup_token_frac_e6, dup_bigram_frac_e6, top_token_frac_e6).

    Fractions are quantized to integer parts-per-million
    (``floor(1e6*x + 0.5)``, the repo-wide oracle convention):

    - ``dup_token_frac``  = 1 - distinct_tokens / n_tokens
    - ``dup_bigram_frac`` = 1 - distinct_bigrams / n_bigrams (0 if < 2
      tokens)
    - ``top_token_frac``  = count(most frequent token) / n_tokens

    Docs with zero analyzer tokens get all-zero stats (kept, not
    dropped — the caller decides thresholds).
    """
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{_TOK_RE}', 0)"
    )
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), toks.alias("toks")
    )
    n = F.size("toks")
    bigrams = F.zip_with(
        F.slice("toks", 1, F.greatest(n - 1, F.lit(0))),
        F.expr("slice(toks, 2, greatest(size(toks) - 1, 0))"),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    base = d.select(
        "doc_id",
        "toks",
        n.alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.size(bigrams).alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).alias("n_distinct_bigrams"),
    )

    def _e6(x: F.Column) -> F.Column:
        return F.floor(x * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")

    # top-token mode: the one part that genuinely needs an aggregation —
    # explode + two map-side-combined shuffles keyed by doc_id
    top = (
        d.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_count"))
    )
    return (
        base.join(top, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.when(F.col("n_tokens") > 0,
                   _e6(1.0 - F.col("n_distinct") / F.col("n_tokens")))
            .otherwise(F.lit(0)).alias("dup_token_frac_e6"),
            F.when(F.col("n_bigrams") > 0,
                   _e6(1.0 - F.col("n_distinct_bigrams") / F.col("n_bigrams")))
            .otherwise(F.lit(0)).alias("dup_bigram_frac_e6"),
            F.when(F.col("n_tokens") > 0,
                   _e6(F.coalesce(F.col("top_count"), F.lit(0))
                       / F.col("n_tokens")))
            .otherwise(F.lit(0)).alias("top_token_frac_e6"),
        )
    )


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / IPv4s / phone numbers -> DataFrame(doc_id,
    redacted, n_emails, n_ipv4, n_phones).

    Pinned sequential semantics: emails are replaced first (token
    ``<EMAIL>``), then IPv4s on the email-redacted text (``<IP>``), then
    phones (``<PHONE>``); each count is the number of matches the step
    actually replaced. Pure rowwise JVM regexp chain — no shuffle.
    """
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        t3.alias("redacted"),
        F.regexp_count(t0, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t1, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.regexp_count(t2, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
    )


# URL canonicalization steps, each a (java+RE2-safe pattern, replacement)
# applied in order. Kept as data so the DuckDB oracle can replay the
# exact chain.
URL_STEPS: tuple[tuple[str, str], ...] = (
    ("#.*$", ""),                                   # drop fragment
    ("&utm_[A-Za-z0-9_]*=[^&#]*", ""),              # non-leading utm params
    ("\\?utm_[A-Za-z0-9_]*=[^&#]*&", "?"),          # leading utm + successor
    ("\\?utm_[A-Za-z0-9_]*=[^&#]*$", ""),           # utm is the only param
)


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Canonicalize URLs -> DataFrame(doc_id, canon_url, host).

    Steps (pinned, in order): lowercase the scheme+host+port part
    (path/query case is preserved), strip default ports (:80 for http,
    :443 for https), drop the fragment, strip ``utm_*`` tracking params,
    drop a dangling ``?``. ``host`` is the lowercased hostname without
    port. Rowwise JVM expressions — no shuffle; feed the result to
    per-host caps (ops/sampling.py) or host-level dedup.
    """
    u = F.col(url_col)
    # split "scheme://authority" prefix from the rest; lowercase prefix
    prefix = F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    rest = F.expr(
        f"substring({url_col}, length("
        f"regexp_extract({url_col}, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)"
        f") + 1)"
    )
    canon = F.concat(F.lower(prefix), rest)
    canon = F.regexp_replace(canon, "^(https://[^/?#:]*):443(?:/|$)", "$1/")
    canon = F.regexp_replace(canon, "^(http://[^/?#:]*):80(?:/|$)", "$1/")
    for pat, rep in URL_STEPS:
        canon = F.regexp_replace(canon, pat, rep)
    host = F.regexp_extract(
        F.lower(u), "^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1
    )
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        canon.alias("canon_url"),
        host.alias("host"),
    )


def c4_clean(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4-style line/page cleaning (Raffel et al. 2020 §2.2, the
    standard web-corpus hygiene pass) -> DataFrame(doc_id,
    n_lines_total, n_lines_kept, page_dropped, clean_chars,
    clean_text).

    Pinned rule subset (each rule is C4's, made deterministic):

    - keep a line iff it ends in a terminal punctuation mark
      (``. ! ? "``), has >= 5 whitespace-delimited words, and does not
      contain the word "javascript" (case-insensitive);
    - drop the whole page iff its ORIGINAL text contains
      "lorem ipsum" (case-insensitive) or a curly brace ``{``, or
      fewer than 3 lines survive (C4's >= 3 sentences pin, applied at
      line granularity). Dropped pages keep their stats but report
      ``clean_text = ''``.

    (C4's remaining rules — langdetect, bad-words list, citation
    markers — live in :mod:`sparkfts.ops.textstats` quality scores and
    the curation funnel; this op is the line-structure stage.)

    Scale shape: pure rowwise JVM array expressions (split / filter /
    array_join inside whole-stage codegen) — no shuffle, no UDFs,
    column pruning pushes through."""
    lines = F.split(F.col(text_col), "\n")
    def _n_words(ln):
        return F.size(
            F.filter(F.split(ln, "\\s+"), lambda w: w != F.lit(""))
        )

    kept = F.filter(
        lines,
        lambda ln: ln.rlike('[.!?"]\\s*$')
        & (_n_words(ln) >= F.lit(5))
        & ~F.lower(ln).contains("javascript"),
    )
    page_bad = (
        F.lower(F.col(text_col)).contains("lorem ipsum")
        | F.col(text_col).contains("{")
    )
    df = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines_total"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        F.array_join(kept, "\n").alias("_clean"),
        page_bad.alias("_page_bad"),
    )
    dropped = F.col("_page_bad") | (F.col("n_lines_kept") < 3)
    return df.select(
        "doc_id",
        "n_lines_total",
        "n_lines_kept",
        dropped.alias("page_dropped"),
        F.when(dropped, F.lit(0))
        .otherwise(F.length("_clean"))
        .cast("long")
        .alias("clean_chars"),
        F.when(dropped, F.lit("")).otherwise(F.col("_clean"))
        .alias("clean_text"),
    )
