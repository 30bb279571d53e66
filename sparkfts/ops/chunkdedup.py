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


def _positional_windows(
    docs: DataFrame,
    length: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Every L-token window WITH its start position ->
    ``(doc_id, n_tokens, pos, h60)``; pos is 1-based. Unlike
    :func:`sparkfts.ops.decontam.token_ngrams` this is positional and
    NOT distinct — ExactSubstr needs every occurrence.

    ``h60``: 60-bit md5-prefix hash (no 31-bit fold — positional window
    counts are corpus-sized, and a 2^31 key space would produce false
    "duplicates" by birthday collision at realistic scale; at 2^60 the
    per-pair collision rate is ~8.7e-19, the documented approximation
    vs a true suffix array)."""
    toks = tokens_col(F.col(text_col))
    win = F.expr(
        f"CASE WHEN size(toks) >= {length} THEN "
        f"transform(sequence(1, size(toks) - {length - 1}), "
        f"i -> struct(i AS pos, array_join(slice(toks, i, {length}), ' ') "
        f"AS gram)) ELSE array() END"
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"), toks.alias("toks")
        )
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.explode(win).alias("w"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.col("w.pos").alias("pos"),
            F.conv(F.substring(F.md5("w.gram"), 1, 15), 16, 10)
            .cast("long")
            .alias("h60"),
        )
    )


def _duplicated_occurrences(
    wins: DataFrame,
) -> DataFrame:
    """Keep-first pin: an occurrence is a duplicate iff its window
    hash occurs >= 2 times corpus-wide AND it is not the global first
    occurrence (min (doc_id, pos)) — the survivor every other copy is
    'a duplicate of'."""
    gstats = wins.groupBy("h60").agg(
        F.count("*").alias("n_occ"),
        F.min(F.struct("doc_id", "pos")).alias("first"),
    )
    return (
        wins.join(gstats, "h60")
        .where(
            (F.col("n_occ") >= 2)
            & ~(
                (F.col("doc_id") == F.col("first.doc_id"))
                & (F.col("pos") == F.col("first.pos"))
            )
        )
        .select("doc_id", "pos")
    )


def _merged_spans(dups: DataFrame, length: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated windows ``[pos, pos+L)``
    into maximal spans -> ``(doc_id, span_start, span_end)``.
    Overlapping OR adjacent windows merge (pos <= running max end)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(length)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end), F.lit(1)
    ).otherwise(F.lit(0))
    island = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        dups.withColumn("island", island)
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(length)).alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def exact_substring_stats(
    docs: DataFrame,
    length: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr dedup statistics (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"), the hash-anchor
    distributed variant -> per doc
    ``(doc_id, n_tokens, dup_windows, n_spans, removed_tokens)``.

    Pinned semantics: every ``length``-token window is hashed
    positionally; a window occurrence is duplicated iff its content
    occurs >= 2 times corpus-wide and it is not the GLOBAL first
    occurrence (min (doc_id, pos) — keep-first, so one copy of every
    repeated passage always survives); per doc, duplicated windows
    merge into maximal token spans (overlap or adjacency), and
    ``removed_tokens`` is their total length. Every doc appears, clean
    docs with zeros.

    vs the paper: Lee et al. build a corpus-global suffix array
    (exact, byte-level, single machine); this is the shuffle-native
    approximation — token-level anchors of ONE fixed length, where a
    duplicated passage of length >= L is covered by its duplicated
    L-windows, so the merged spans equal the true maximal duplicated
    regions whenever both copies align on token boundaries. Collisions
    (2^-60/pair) and sub-L repeats are the documented error terms.

    100-TB shape: one token-window flatMap (map-side), ONE groupBy on
    the 8-byte hash (partial-aggregated count + min-struct), one hash
    join back, and a per-doc window (partitionBy doc_id — millions of
    independent partitions). Nothing is driver-side and no stage holds
    more than a doc's windows in one partition after the islands
    merge."""
    if length < 2:
        raise ValueError("length must be >= 2")
    wins = _positional_windows(docs, length, text_col, id_col)
    dups = _duplicated_occurrences(wins)
    spans = _merged_spans(dups, length)
    per_doc_spans = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start"))
        .alias("removed_tokens"),
    )
    per_doc_dups = dups.groupBy("doc_id").agg(
        F.count("*").alias("dup_windows")
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(F.col(text_col))).alias("n_tokens"),
    )
    return (
        base.join(per_doc_dups, "doc_id", "left")
        .join(per_doc_spans, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_windows", F.lit(0)).cast("long")
            .alias("dup_windows"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("removed_tokens", F.lit(0)).cast("long")
            .alias("removed_tokens"),
        )
    )


def drop_duplicate_substrings(
    docs: DataFrame,
    length: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr REWRITE -> ``(doc_id, kept_text, n_tokens,
    kept_tokens)``: each doc's analyzer-token stream with every merged
    duplicated span (see :func:`exact_substring_stats`) removed,
    remaining tokens joined by single spaces.  The analyzer is lossy
    (case/punctuation), so the output is a TOKEN-stream rewrite — the
    form training pipelines feed the tokenizer anyway.

    Spans ride back per doc as a collected array (bounded by
    n_tokens/L per doc) and the keep-filter is one higher-order
    expression — no Python UDFs, no second corpus pass."""
    spans = _merged_spans(
        _duplicated_occurrences(
            _positional_windows(docs, length, text_col, id_col)
        ),
        length,
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    toks = tokens_col(F.col(text_col))
    # sequence(1, 0) is DESCENDING in Spark (the token_ngrams guard),
    # so the empty-token case is handled explicitly.
    kept_arr = F.expr(
        "CASE WHEN size(toks) = 0 THEN array() ELSE "
        "filter(transform(sequence(1, size(toks)), i -> "
        "CASE WHEN spans IS NOT NULL AND exists(spans, sp -> "
        "i >= sp.span_start AND i < sp.span_end) THEN NULL "
        "ELSE element_at(toks, i) END), x -> x IS NOT NULL) END"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .join(per_doc, "doc_id", "left")
        .withColumn("kept", kept_arr)
        .select(
            "doc_id",
            F.array_join("kept", " ").alias("kept_text"),
            F.size("toks").alias("n_tokens"),
            F.size("kept").cast("long").alias("kept_tokens"),
        )
    )
