"""ES completion suggester (search-box autocomplete) over corpus
n-gram entries.

ES's third suggester: where `term`/`phrase` (sparkfts/suggest.py,
sparkfts/phrasesuggest.py) CORRECT input, `completion` EXTENDS a typed
prefix from a weighted suggestion dictionary Lucene stores as an FST —
one more `_search` body away on the surface the reference delegates to
(reference ElasticsearchHandler.py:69).

Pinned spec (mirrored by the DuckDB oracle in
``__spark_entry__.completion_suggest``):

- entries: corpus token UNIGRAMS (``"spark"``) and BIGRAMS
  (``"spark jobs"``) under the pinned analyzer; weight = raw
  occurrence count (ES's doc-supplied ``weight``, here derived from
  corpus popularity).  The two sets are disjoint (bigrams contain a
  space), so no dedup is needed.
- input prefix is normalized: lowercase, strip, internal whitespace
  runs collapsed to one space.  An entry matches iff it string-starts
  with the normalized prefix ("spark j" -> "spark jobs").
- order: weight desc, entry asc; top ``size``; rank 1..size.
- fuzzy option (ES ``fuzzy.fuzziness``): an entry also matches when
  the Levenshtein distance between the typed prefix and the entry's
  first ``len(prefix)`` characters is <= ``fuzziness`` (ES's
  UNICODE-prefix fuzzy-FST walk semantics); same weight ordering.

Scale shape — the FST analogue: entries come straight from the
phrase-suggester LM sidecars (``<index>/lm/unigrams`` sorted by term,
``lm/bigrams`` sorted by (w1, w2) — sparkfts/phrasesuggest.py writes
both sorted), so the prefix probe is a row-group-pruned ``startswith``
range scan on each table, never a full read; only the <= ``size``
winning rows are ever collected (the window's input is the pruned
match set, bounded in practice by the per-prefix vocabulary).  Fuzzy
probes widen the unigram scan to a first-character-window range, the
same dictionary-scan caveat ES documents for fuzzy completion.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _normalize_prefix(prefix: str) -> str:
    return " ".join(prefix.lower().split()) + (
        " " if prefix and prefix[-1].isspace() else ""
    )


def _entries(spark: SparkSession, index_dir: str, first_tok: str):
    """Lazy union of (entry, weight) from the LM sidecars, pre-filtered
    so both parquet scans stay row-group-pruned ranges: unigram term
    and bigram w1 must start with the prefix's first token."""
    base = os.path.join(index_dir, "lm")
    if not os.path.isdir(base):
        raise FileNotFoundError(
            f"{base} missing: build the completion/LM sidecar first "
            "(sparkfts.phrasesuggest.build_bigram_model or CLI `lm`)"
        )
    uni = (
        spark.read.parquet(os.path.join(base, "unigrams"))
        .where(F.col("term").startswith(first_tok))
        .select(F.col("term").alias("entry"), F.col("cnt").alias("weight"))
    )
    bi = (
        spark.read.parquet(os.path.join(base, "bigrams"))
        .where(F.col("w1").startswith(first_tok))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("entry"),
            F.col("cnt").alias("weight"),
        )
    )
    return uni.unionByName(bi)


def complete(
    spark: SparkSession,
    index_dir: str,
    prefix: str,
    size: int = 5,
    fuzziness: int = 0,
) -> DataFrame:
    """-> ``(entry, weight, rank)``: top completions of ``prefix`` in
    the pinned (weight desc, entry asc) order."""
    p = _normalize_prefix(prefix)
    empty = "entry string, weight long, rank int"
    if not p.strip():
        return spark.createDataFrame([], empty)
    first_tok = p.split(" ")[0]
    if fuzziness <= 0:
        ent = _entries(spark, index_dir, first_tok).where(
            F.col("entry").startswith(p)
        )
    else:
        # fuzzy prefix: edits may hit the first token, so the pushable
        # range pre-filter narrows to the first CHARACTER only — ES's
        # fuzzy completion `prefix_length` default (1): the leading
        # character must match exactly, everything after may be edited.
        ent = _entries(spark, index_dir, first_tok[:1]).where(
            F.levenshtein(
                F.substring(F.col("entry"), 1, len(p)), F.lit(p)
            )
            <= int(fuzziness)
        )
    # distributed top-k (per-partition heads + merge via TakeOrdered),
    # then rank over the <= size survivors — never a global sort of
    # the whole prefix match set
    top = ent.orderBy(F.desc("weight"), F.asc("entry")).limit(int(size))
    w = Window.orderBy(F.desc("weight"), F.asc("entry"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("entry", F.col("weight").cast("long"), "rank")
        .orderBy("rank")
    )
