"""ES ``_termvectors`` API: per-document term statistics.

``GET /index/_termvectors/<doc>`` returns, for each term of the
document, its in-doc frequency (``term_freq``), corpus document
frequency (``doc_freq``) and optionally the corpus-wide total term
frequency (``ttf``) — the standard debugging/feature-extraction
endpoint behind "why does this doc score like that" and TF-IDF feature
export.  The reference's backend serves it next to the ``_search``
call it delegates everything to (reference ElasticsearchHandler.py:69).

Implementation follows ES's own unstored-field path: the requested
documents' text is re-analyzed with the index's pinned analyzer
(stopwords/stemmer from the index meta), then corpus statistics join
in from the term dictionary:

- doc text: pushdown-filtered scan of the caller's documents frame
  (or the index's stored ``_source``) — reads only the requested ids.
- per-doc tf/doclen: map-side Arrow tokenize
  (:func:`sparkfts.tokens.tokenize_docs`) of just those docs.
- df: ``in_list``-pruned dictionary lookup
  (:func:`sparkfts.index.df_map_for`) over the docs' term set —
  bounded by the docs' combined vocabulary, never a dictionary sweep.
- ttf (opt-in): one term-pushed, tbucket-pruned postings scan summing
  tfs per term — the same pruned shape as a query, because ES also
  pays a terms lookup for ``term_statistics: true``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def termvectors(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    doc_ids: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    term_statistics: bool = False,
) -> DataFrame:
    """Term vectors for ``doc_ids``. Returns
    ``(doc_id, term, term_freq, doclen, doc_freq[, ttf])``,
    ordered doc_id asc, term asc.

    ``docs`` supplies the text (any (id, text) frame — typically the
    corpus table or the index's stored ``_source``).
    """
    from sparkfts.analysis import analysis_opts
    from sparkfts.index import df_map_for, read_meta
    from sparkfts.tokens import tokenize_docs

    meta = read_meta(index_dir)
    sw, stem = analysis_opts(meta)
    wanted = sorted(set(int(d) for d in doc_ids))
    src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    ).where(F.col("doc_id").isin(wanted))
    toks = tokenize_docs(
        src,
        stopwords=sorted(sw) if sw else None,
        stemmer=stem,
    )
    # bounded vocabulary: the requested docs' distinct terms
    terms = [r["term"] for r in toks.select("term").distinct().collect()]
    dfm = df_map_for(spark, index_dir, sorted(terms))
    df_tbl = spark.createDataFrame(
        [(t, int(d)) for t, d in sorted(dfm.items())] or [],
        "term string, doc_freq long",
    )
    out = (
        toks.join(F.broadcast(df_tbl), "term", "left")
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("term_freq"),
            F.col("doclen").cast("long").alias("doclen"),
            F.coalesce(F.col("doc_freq"), F.lit(0))
            .cast("long")
            .alias("doc_freq"),
        )
    )
    if term_statistics:
        ttf = _ttf_for(spark, index_dir, sorted(set(terms)), meta)
        out = out.join(ttf, "term", "left").withColumn(
            "ttf", F.coalesce(F.col("ttf"), F.lit(0))
        )
    return out.orderBy("doc_id", "term")


def _ttf_for(
    spark: SparkSession, index_dir: str, terms: list[str], meta: dict
) -> DataFrame:
    """``(term, ttf)`` — corpus-wide total term frequency via a
    term-pushed postings scan (sums each pruned posting run's tfs
    map-side)."""
    import numpy as np
    import pandas as pd

    from sparkfts.codec import decode_varint
    from sparkfts.index import in_list, load_postings, term_bucket

    if not terms:
        return spark.createDataFrame([], "term string, ttf long")
    buckets = sorted(
        {term_bucket(t, meta["n_tbuckets"]) for t in terms}
    )
    postings = (
        load_postings(spark, index_dir)
        .where(in_list("tbucket", buckets) & in_list("term", terms))
        .select("term", "tfs")
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            sums = [
                int(decode_varint(blob).sum()) for blob in pdf["tfs"]
            ]
            yield pd.DataFrame(
                {"term": pdf["term"], "ttf": np.array(sums, np.int64)}
            )

    return (
        postings.mapInPandas(gen, "term string, ttf long")
        .groupBy("term")
        .agg(F.sum("ttf").alias("ttf"))
    )
