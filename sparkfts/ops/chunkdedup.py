"""Sub-document deduplication: chunk/paragraph-level exact dedup and
duplicated-n-gram coverage.

Document-level dedup (sparkfts.ops.dedup) misses the dominant
contamination mode in web corpora: boilerplate and quoted passages
duplicated INSIDE otherwise-distinct pages.  Training-data pipelines
therefore also deduplicate at paragraph level and measure what
fraction of each document is made of spans seen elsewhere (Lee et al.,
"Deduplicating Training Data Makes Language Models Better" — the
ExactSubstr motivation; this module implements the scalable
chunk/paragraph approximation of it).

Two operators, both pure JVM column expressions (no Python UDFs):

- chunk dedup: split each doc into units — paragraphs when a
  ``separator`` exists in the corpus, else fixed ``chunk_tokens``-token
  windows — hash each unit (``term_hash31``: 31-bit md5-derived,
  DuckDB-reproducible), and keep only each hash's GLOBAL first
  occurrence (winner = smallest doc_id, then smallest chunk index —
  pinned, deterministic).  Consumers: per-doc stats
  (:func:`chunk_dedup_stats`) or the rewritten corpus
  (:func:`drop_duplicate_chunks`).
- duplicated-n-gram coverage: per doc, the fraction of its DISTINCT
  word n-grams that occur in at least one other document — the
  "how much of this page is boilerplate" score used for filtering.

100-TB shape: unit explosion is map-side; the only shuffles are
``groupBy hash`` (partial-aggregated; winner via one ``min(struct)``)
and the join back — both on 8-byte int hash keys, never on text.  The
join back is a standard co-partitioned hash join; no step is
proportional to corpus size beyond the streaming pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfts.ops.textstats import term_hash31, tokens_col


def chunk_units(
    docs: DataFrame,
    chunk_tokens: int = 10,
    separator: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = False,
) -> DataFrame:
    """Explode docs into dedup units ->
    ``(doc_id, chunk_idx, chunk_hash[, chunk_text])``.

    ``separator`` given: units are the non-empty separator-split
    parts (paragraph mode).  Otherwise: consecutive fixed windows of
    ``chunk_tokens`` analyzer tokens (the trailing partial window
    counts — it is still content that can be duplicated).
    """
    if separator is not None:
        parts = F.filter(
            F.transform(
                F.split(F.col(text_col), F.lit(separator), -1),
                lambda p: F.trim(p),
            ),
            lambda p: p != "",
        )
        base = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.posexplode(parts).alias("chunk_idx", "chunk_text"),
        )
    else:
        w = int(chunk_tokens)
        if w < 1:
            raise ValueError("chunk_tokens must be >= 1")
        toks = tokens_col(F.col(text_col))
        chunks = F.expr(
            f"CASE WHEN size(toks) > 0 THEN "
            f"transform(sequence(1, size(toks), {w}), "
            f"i -> array_join(slice(toks, i, {w}), ' ')) "
            f"ELSE array() END"
        )
        base = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            toks.alias("toks"),
        ).select(
            "doc_id",
            F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
        )
    out = base.select(
        "doc_id",
        "chunk_idx",
        term_hash31(F.col("chunk_text")).alias("chunk_hash"),
        *(["chunk_text"] if keep_text else []),
    )
    return out


def _with_winner(units: DataFrame) -> DataFrame:
    """Tag each unit occurrence with whether it is its hash's global
    first occurrence (min (doc_id, chunk_idx) — one min(struct) agg)."""
    winners = units.groupBy("chunk_hash").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("w")
    )
    return units.join(winners, "chunk_hash").withColumn(
        "is_first",
        (F.col("doc_id") == F.col("w.doc_id"))
        & (F.col("chunk_idx") == F.col("w.chunk_idx")),
    ).drop("w")


def chunk_dedup_stats(
    docs: DataFrame,
    chunk_tokens: int = 10,
    separator: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc chunk dedup accounting ->
    ``(doc_id, n_chunks, n_dropped)`` where ``n_dropped`` counts units
    whose content first appeared earlier in the corpus (pinned winner
    order: doc_id asc, chunk_idx asc)."""
    units = chunk_units(
        docs, chunk_tokens, separator, text_col, id_col
    )
    return (
        _with_winner(units)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(
                (~F.col("is_first")).cast("long")
            ).alias("n_dropped"),
        )
    )


def drop_duplicate_chunks(
    docs: DataFrame,
    chunk_tokens: int = 10,
    separator: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    joiner: str = " ",
) -> DataFrame:
    """The rewritten corpus -> ``(doc_id, text)``: each doc keeps only
    the units it is the global first occurrence of, re-joined in
    original order; docs losing every unit disappear (fully duplicate
    content)."""
    units = chunk_units(
        docs, chunk_tokens, separator, text_col, id_col, keep_text=True
    )
    return (
        _with_winner(units)
        .where(F.col("is_first"))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("chunk_idx", "chunk_text")
                        )
                    ),
                    lambda s: s["chunk_text"],
                ),
                joiner,
            ).alias("text")
        )
    )


def dup_ngram_coverage(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc duplicated-span score ->
    ``(doc_id, n_grams, n_dup, dup_frac)``: of the doc's DISTINCT word
    n-grams, how many occur in >= 2 distinct docs. Docs shorter than
    ``n`` tokens have no grams and are omitted (no span can recur)."""
    from sparkfts.ops.decontam import token_ngrams

    grams = token_ngrams(docs, n, text_col, id_col)
    gdf = grams.groupBy("gram31").agg(
        F.count("*").alias("gram_df")
    )
    return (
        grams.join(gdf, "gram31")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                (F.col("gram_df") >= 2).cast("long")
            ).alias("n_dup"),
        )
        .withColumn(
            "dup_frac", F.col("n_dup") / F.col("n_grams")
        )
    )
