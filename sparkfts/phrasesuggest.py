"""ES phrase suggester ("did you mean" for whole queries).

Where the term suggester (sparkfts/suggest.py) corrects words in
isolation, ES's phrase suggester re-ranks whole corrected PHRASES with
a word n-gram language model, so "spakr jion" -> "spark join" beats
"spar join".  The reference's backend ships it on the same `_search`
surface it delegates everything to (reference
ElasticsearchHandler.py:69).

Pinned spec (mirrored by the DuckDB oracle in ``__spark_entry__``):

- model: corpus bigram LM with Stupid Backoff (alpha = 0.4; Brants et
  al. 2007 — also ES's default smoothing for real-word correction):
  ``P(w2|w1) = bc(w1 w2)/uc(w1)`` when the bigram was seen, else
  ``0.4 * uc(w2)/total``; unigram start ``P(w1) = uc(w1)/total``.
  Counts are raw token-occurrence counts under the pinned analyzer.
- candidates per slot: the input term itself when it is in the
  dictionary, plus the term suggester's top ``max_candidates``
  corrections (distance asc, df desc, term asc — the pinned term-
  suggester order).  Whole-phrase candidates are the slot cross
  product.
- score: sum of natural-log probabilities over the phrase chain;
  ranking score desc, phrase asc; the unchanged input phrase is
  excluded (corrections, not echoes).

Scale shape: the LM is built ONCE at index time with two
partial-aggregated groupBys (bigram explosion is JVM ``arrays_zip``/
``explode`` — map-side, no Python) and stored as parquet sidecars
under ``<index>/lm``, sorted by leading word for row-group pruning.
Query time touches only IN-list-pruned slices of the two count tables
— candidate vocabulary is bounded by ``n_slots * (max_candidates+1)``,
so the lookup collect is O(candidates), never a model scan.  The model
tables themselves are never collected.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfts.analysis import tokenize

SB_ALPHA = 0.4  # Stupid Backoff discount (pinned)


def build_bigram_model(
    docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
) -> None:
    """Write the suggester LM sidecars: ``lm/unigrams`` (term, cnt)
    and ``lm/bigrams`` (w1, w2, cnt) under ``index_dir``."""
    from sparkfts.ops.textstats import tokens_col

    toks = docs.select(tokens_col(F.col(text_col)).alias("toks"))
    uni = (
        toks.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    pairs = toks.where(F.size("toks") >= 2).select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(toks, 1, size(toks) - 1)").alias("w1"),
                F.expr("slice(toks, 2, size(toks) - 1)").alias("w2"),
            )
        ).alias("p")
    )
    bi = (
        pairs.select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
    )
    base = os.path.join(index_dir, "lm")
    uni.orderBy("term").write.mode("overwrite").parquet(
        os.path.join(base, "unigrams")
    )
    bi.orderBy("w1", "w2").write.mode("overwrite").parquet(
        os.path.join(base, "bigrams")
    )


def _slot_candidates(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    max_candidates: int,
) -> list[list[str]]:
    """Per slot: [input term if in dictionary] + top corrections in
    the pinned term-suggester order."""
    from sparkfts.index import df_map_for
    from sparkfts.suggest import suggest_terms

    in_dict = df_map_for(spark, index_dir, sorted(set(terms)))
    sugg = suggest_terms(
        spark, index_dir, " ".join(terms), size=max_candidates
    ).collect()
    by_slot: dict[str, list[str]] = {}
    for r in sugg:
        by_slot.setdefault(r["input_term"], []).append(r["suggestion"])
    out = []
    for t in terms:
        cands = [t] if in_dict.get(t, 0) > 0 else []
        cands += [c for c in by_slot.get(t, []) if c not in cands]
        out.append(cands)
    return out


def suggest_phrase(
    spark: SparkSession,
    index_dir: str,
    text: str,
    size: int = 3,
    max_candidates: int = 3,
) -> DataFrame:
    """-> ``(phrase, score_ln, rank)``: the top corrected phrases under
    the pinned Stupid-Backoff bigram LM, input phrase excluded.
    Requires :func:`build_bigram_model` to have run for the index."""
    from itertools import product

    terms = tokenize(text)
    empty = "phrase string, score_ln double, rank int"
    if not terms:
        return spark.createDataFrame([], empty)
    slots = _slot_candidates(spark, index_dir, terms, max_candidates)
    if any(not s for s in slots):
        return spark.createDataFrame([], empty)
    phrases = [list(p) for p in product(*slots)]
    vocab = sorted({w for p in phrases for w in p})
    pair_keys = sorted(
        {(p[i], p[i + 1]) for p in phrases for i in range(len(p) - 1)}
    )
    base = os.path.join(index_dir, "lm")
    uni_tbl = spark.read.parquet(os.path.join(base, "unigrams"))
    total = uni_tbl.agg(F.sum("cnt")).collect()[0][0]
    uc = {
        r["term"]: r["cnt"]
        for r in uni_tbl.where(F.col("term").isin(vocab)).collect()
    }
    w1s = sorted({a for a, _ in pair_keys})
    bi_rows = (
        spark.read.parquet(os.path.join(base, "bigrams"))
        .where(F.col("w1").isin(w1s))
        .where(F.col("w2").isin(vocab))
        .collect()
    )
    bc = {(r["w1"], r["w2"]): r["cnt"] for r in bi_rows}

    def lm_score(p: list[str]) -> float:
        s = math.log(uc[p[0]] / total)
        for a, b in zip(p, p[1:]):
            n = bc.get((a, b), 0)
            if n > 0:
                s += math.log(n / uc[a])
            else:
                s += math.log(SB_ALPHA * uc[b] / total)
        return s

    scored = [
        (" ".join(p), lm_score(p))
        for p in phrases
        if p != terms  # corrections, not echoes
    ]
    scored.sort(key=lambda x: (-x[1], x[0]))
    rows = [
        (phrase, s, i + 1) for i, (phrase, s) in enumerate(scored[:size])
    ]
    return spark.createDataFrame(rows, empty)
