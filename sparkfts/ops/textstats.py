"""Text-analysis operators: language id, quality, token counts, fingerprints.

All JVM-side (built-in functions only — no Python UDF in these paths), so
they whole-stage-codegen and scale linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

# 31-bit modular hash space shared with DuckDB oracles
HASH_P = 2_147_483_647

# language marker tokens (tiny pinned stopword lists per language)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "of", "and", "to", "a", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour"],
}
EN_STOPWORDS = LANG_MARKERS["en"] + ["that", "for", "on", "as", "with"]


def tokens_col(text: Column) -> Column:
    """Pinned analyzer as a JVM expression (same regex as sparkfts.analysis)."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)


def term_hash31(term: Column) -> Column:
    """term -> int in [0, 2^31): md5-hex prefix parsed as int64, mod P.

    Cross-engine stable: DuckDB computes the same via
    ``CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % P``.
    """
    return (
        F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long")
        % F.lit(HASH_P)
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language guess: argmax of per-language marker hits,
    ties broken alphabetically, no hits -> 'und' (undetermined)."""
    toks = F.explode(tokens_col(F.col(text_col))).alias("tok")
    exploded = docs.select("doc_id", toks)
    scores = [
        F.sum(
            F.when(F.col("tok").isin(markers), 1).otherwise(0)
        ).alias(f"s_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    agg = exploded.groupBy("doc_id").agg(*scores)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):  # alphabetical tie-break
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return agg.select("doc_id", pred.alias("lang_pred")).orderBy("doc_id")


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + verdict per document.

    Features (all exact-integer or micro-scaled to survive cross-engine
    hashing): token count, char count, mean token length (micros),
    stopword ratio (micros), non-alnum char ratio (micros).
    """
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(EN_STOPWORDS))
    )
    # chars that are neither alphanumeric nor whitespace
    non_alnum = F.length(
        F.regexp_replace(F.col(text_col), "[a-zA-Z0-9\\s]", "")
    )
    # micro-ratio numerators cast to LONG before the 1e6 scale: an
    # int32 numerator overflows (ANSI crash) on any doc with > ~2147
    # token chars — i.e. on ordinary real web pages
    out = docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        (tok_chars.cast("long") * 1_000_000 / F.greatest(n_tok, F.lit(1)))
        .cast("long")
        .alias("mean_tok_len_micro"),
        (stop_hits.cast("long") * 1_000_000 / F.greatest(n_tok, F.lit(1)))
        .cast("long")
        .alias("stopword_ratio_micro"),
        (non_alnum.cast("long") * 1_000_000 / F.greatest(n_chars, F.lit(1)))
        .cast("long")
        .alias("punct_ratio_micro"),
    )
    verdict = (
        (F.col("n_tokens") >= 5)
        & (F.col("mean_tok_len_micro").between(1_500_000, 12_000_000))
        & (F.col("punct_ratio_micro") < 300_000)
    )
    return out.withColumn("keep", verdict).orderBy("doc_id")


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace, analyzer, and BPE-ish token counts per doc."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col(text_col)), "\\s+")).alias("ws_tokens"),
        F.size(tokens_col(F.col(text_col))).alias("word_tokens"),
        F.size(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(BPE_PATTERN), 0
            )
        ).alias("bpe_tokens"),
    ).orderBy("doc_id")


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive 32-bit document fingerprint.

    Each token hashes to 32 bits (md5-based, cross-engine stable), is
    rotated by its position mod 29, and all rotated hashes are XOR-folded.
    Position-sensitive (unlike a bag-of-words hash) yet parallelizable:
    XOR is commutative so Spark aggregates it distributively.
    """
    exploded = docs.select(
        "doc_id",
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "tok"),
    ).select(
        "doc_id",
        term_hash31(F.col("tok")).alias("h"),
        (F.col("pos") % 29).alias("s"),
    )
    # rot32(h, s) = ((h << s) | (h >> (32 - s))) & 0xFFFFFFFF, s in [0, 29)
    rotated = exploded.select(
        "doc_id",
        F.expr(
            "(shiftleft(h, cast(s as int)) | shiftright(h, cast(32 - s as int)))"
            " & 4294967295"
        ).alias("rh"),
    )
    return (
        rotated.groupBy("doc_id")
        .agg(F.expr("bit_xor(rh)").alias("fingerprint"))
        .orderBy("doc_id")
    )


def quality_quantile_filter(
    docs: DataFrame,
    score_col: str,
    group_col: str,
    q: float = 0.2,
    keep: str = "above",
) -> DataFrame:
    """Adaptive per-group quality gating: keep each group's docs whose
    ``score_col`` is >= (``keep='above'``) or <= (``'below'``) the
    group's exact ``q``-quantile — the per-language threshold move
    (fixed global cutoffs over/under-filter low-resource languages;
    published pipelines cut per-language percentiles instead).

    Plan: ONE partially-aggregated exact ``percentile`` per group
    (rows = group cardinality — tiny, broadcasts), one join, one
    pushable comparison. Exact percentile = linear interpolation
    (SQL ``percentile``/``percentile_cont``); the threshold column
    ``q_threshold`` rides along for auditability.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    if keep not in ("above", "below"):
        raise ValueError("keep must be 'above' or 'below'")
    thr = docs.groupBy(F.col(group_col).alias("__g")).agg(
        F.expr(f"percentile({score_col}, {q!r})").alias("q_threshold")
    )
    joined = docs.join(
        F.broadcast(thr), docs[group_col] == thr["__g"]
    ).drop("__g")
    cond = (
        F.col(score_col) >= F.col("q_threshold")
        if keep == "above"
        else F.col(score_col) <= F.col("q_threshold")
    )
    return joined.where(cond)
