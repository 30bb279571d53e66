"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship index-backed BM25 top-k on sf0.001.
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (+ the training-pipeline extensions); ``oracle_sql()`` gives
the DuckDB-equivalent SQL for every SQL-expressible one. Column names and
value quantization (integer micros, floor(x*s + 0.5)) are pinned
identically on both sides so the driver's order-insensitive value-hash
comparison is meaningful.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.abspath(__file__))

TOKEN_RE_SQL = "[a-z0-9]+"
BM25_QUERY_AND = "spark join"          # both terms common in `documents`
BM25_QUERY_OR = "spark join vector"
BM25_QUERY_FUZZY = "spafk joun"        # typo'd "spark join" — exercises
                                       # fuzziness:AUTO expansion (dist 1)
BM25_QUERY_TRANSPOSED = "sprak jion"   # adjacent-swap typos of "spark
                                       # join": Damerau distance 1 but
                                       # plain Levenshtein 2 — reachable
                                       # ONLY with fuzzy_transpositions
PHRASE_QUERY = "table hash"            # adjacent-bigram phrase, df(phrase)=46
                                       # at sf0.01 — exercises positions
HASH_P = 2_147_483_647


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _docs_as_pages(docs: DataFrame) -> DataFrame:
    """FIXTURES.md §5 mapping: documents -> webtext page shape.

    ``source`` / ``n_chars`` ride along as doc-value columns for the
    doc-value query ops (sort / function_score / collapse / top_hits)."""
    return docs.select(
        F.col("doc_id"),
        F.col("doc_id").cast("string").alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("source"),
        F.col("n_chars").cast("long").alias("n_chars"),
        # deterministic per-doc crawl time as epoch seconds
        # (2024-01-01 UTC + doc_id % 400 days) — the decay/recency
        # entries' doc value, reproduced arithmetically in DuckDB
        (F.lit(1704067200) + (F.col("doc_id") % 400) * 86400)
        .cast("long")
        .alias("crawl_epoch"),
    )


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkfts.tokens import tokenize_docs

    return tokenize_docs(_docs(spark, sf_dir))


def _scan_stats(spark: SparkSession, sf_dir: str):
    from sparkfts.stats import avgdl_of

    docs = _docs(spark, sf_dir)
    tokens = _doc_tokens(spark, sf_dir)
    n_docs = docs.count()
    return tokens, n_docs, avgdl_of(tokens, n_docs)


def _index_dir_for(spark: SparkSession, sf_dir: str) -> str:
    """Build (once, cached) the inverted index over `documents`.

    ``lang`` rides in the docmap as a doc value (``bool.filter`` +
    facets); stale caches built before that are rebuilt.
    """
    key = os.path.basename(sf_dir.rstrip("/")) or "sf"
    idx = os.path.join(REPO, ".scratch", f"entry_idx_{key}")
    meta_path = os.path.join(idx, "meta.json")
    want_dv = ["lang", "source", "n_chars", "crawl_epoch"]
    stale = True
    if os.path.exists(meta_path):
        import json as _json

        with open(meta_path) as f:
            m = _json.load(f)
        stale = m.get("docvalue_cols", []) != want_dv or not m.get(
            "store_source"
        )  # r5: significant_text / terms-lookup need _source
    if stale:
        import shutil

        shutil.rmtree(idx, ignore_errors=True)
        from sparkfts.index import build_index

        build_index(
            _docs_as_pages(_docs(spark, sf_dir)),
            idx,
            n_shards=8,
            n_tbuckets=16,
            id_source="column",
            docvalue_cols=want_dv,
            store_source=True,
        )
    return idx


def _edge_index_dir_for(spark: SparkSession, sf_dir: str) -> str:
    """Build (once, cached) the edge_ngram autocomplete index over
    `documents` (index-time expander edge:3-8; query analysis stays
    standard — the ES index/search-analyzer split)."""
    key = os.path.basename(sf_dir.rstrip("/")) or "sf"
    idx = os.path.join(REPO, ".scratch", f"entry_edge_{key}")
    meta_path = os.path.join(idx, "meta.json")
    stale = True
    if os.path.exists(meta_path):
        import json as _json

        with open(meta_path) as f:
            stale = _json.load(f).get("expander") != "edge:3-8"
    if stale:
        import shutil

        shutil.rmtree(idx, ignore_errors=True)
        from sparkfts.index import build_index

        build_index(
            _docs_as_pages(_docs(spark, sf_dir)),
            idx,
            n_shards=8,
            n_tbuckets=16,
            id_source="column",
            expander="edge:3-8",
        )
    return idx


_SCORE_E4 = "CAST(floor(score * 10000 + 0.5) AS BIGINT)"

MF_FIELDS = ["title^2", "text"]  # ES-style best_fields spec for the entry

def _title_col() -> F.Column:
    """title = first 8 analyzer tokens of text, synthesized identically
    on the Spark side (array_join(slice(...))) and in DuckDB (tk[1:8])."""
    return F.array_join(
        F.slice(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE_SQL}', 0)"),
            1,
            8,
        ),
        " ",
    )


def _mf_index_dir_for(spark: SparkSession, sf_dir: str) -> str:
    """Build (once, cached) the two-field (title, text) index."""
    key = os.path.basename(sf_dir.rstrip("/")) or "sf"
    idx = os.path.join(REPO, ".scratch", f"entry_mf_{key}")
    if not os.path.exists(os.path.join(idx, "multifield.json")):
        from sparkfts.multifield import build_multifield_index

        pages = _docs_as_pages(_docs(spark, sf_dir)).withColumn(
            "title", _title_col()
        )
        build_multifield_index(
            pages,
            idx,
            fields=("title", "text"),
            n_shards=8,
            n_tbuckets=16,
            id_source="column",
        )
    return idx


def _bm25_field_ctes(
    p: str, toks_src: str, terms: list[str], conjunctive: bool
) -> str:
    """CTE block scoring ONE field (prefix ``p``) -> ``{p}_scored``."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    having = f"HAVING count(*) = {len(terms)}" if conjunctive else ""
    return f"""
{p}_toks AS ({toks_src}),
{p}_dl AS (SELECT doc_id, count(*) AS doclen FROM {p}_toks GROUP BY doc_id),
{p}_stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM {p}_dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
{p}_tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf FROM {p}_toks
  WHERE tok IN ({in_list}) GROUP BY doc_id, tok
),
{p}_df AS (SELECT term, count(*) AS df FROM {p}_tf GROUP BY term),
{p}_cand AS (SELECT doc_id FROM {p}_tf GROUP BY doc_id {having}),
{p}_scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
              * 2.2 ) AS score
  FROM {p}_tf tf
  JOIN {p}_df df USING (term) JOIN {p}_dl dl USING (doc_id)
  CROSS JOIN {p}_stats s
  WHERE tf.doc_id IN (SELECT doc_id FROM {p}_cand)
  GROUP BY tf.doc_id
)"""


def _bm25_subset_ctes(
    p: str, where: str, terms: list[str], conjunctive: bool
) -> str:
    """CTE block scoring ONE document subset (prefix ``p``) with
    subset-LOCAL stats -> ``{p}_scored`` (cross-index search: each index
    keeps its own n_docs/avgdl/df)."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    having = f"HAVING count(*) = {len(terms)}" if conjunctive else ""
    return f"""
{p}_docs AS (SELECT doc_id, text FROM documents WHERE {where}),
{p}_toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok
  FROM {p}_docs
),
{p}_dl AS (SELECT doc_id, count(*) AS doclen FROM {p}_toks GROUP BY doc_id),
{p}_stats AS (
  SELECT (SELECT count(*) FROM {p}_docs) AS n_docs,
         (SELECT sum(doclen) FROM {p}_dl) * 1.0
           / (SELECT count(*) FROM {p}_docs) AS avgdl
),
{p}_tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf FROM {p}_toks
  WHERE tok IN ({in_list}) GROUP BY doc_id, tok
),
{p}_df AS (SELECT term, count(*) AS df FROM {p}_tf GROUP BY term),
{p}_cand AS (SELECT doc_id FROM {p}_tf GROUP BY doc_id {having}),
{p}_scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
              * 2.2 ) AS score
  FROM {p}_tf tf
  JOIN {p}_df df USING (term) JOIN {p}_dl dl USING (doc_id)
  CROSS JOIN {p}_stats s
  WHERE tf.doc_id IN (SELECT doc_id FROM {p}_cand)
  GROUP BY tf.doc_id
)"""


def _bm25_sql(
    terms: list[str],
    conjunctive: bool,
    k: int = 10,
    min_match: int | None = None,
    extra_where: str = "",
) -> str:
    """DuckDB BM25 oracle over `documents` (pinned analyzer + formula).

    ``extra_where``: predicate fragment (``AND ...``) on the final select
    — bool.filter / bool.must_not restrictions AFTER scoring (ES: they
    never change scoring stats), BEFORE top-k.
    """
    return f"""
{_bm25_scored_cte(terms, conjunctive, min_match)}
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored WHERE 1=1 {extra_where} ORDER BY score DESC, doc_id LIMIT {k}
"""


def _bm25_scored_cte(
    terms: list[str],
    conjunctive: bool,
    min_match: int | None = None,
) -> str:
    """The shared DuckDB CTE prefix ending in ``scored(doc_id, score)``
    (pinned analyzer + BM25 formula; used by the plain top-k oracle and
    the doc-value composition oracles)."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    having = f"HAVING count(*) = {len(terms)}" if conjunctive else ""
    if min_match is not None:
        having = f"HAVING count(*) >= {int(min_match)}"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf FROM toks
  WHERE tok IN ({in_list}) GROUP BY doc_id, tok
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
cand AS (SELECT doc_id FROM tf GROUP BY doc_id {having}),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
              * 2.2 ) AS score
  FROM tf
  JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.doc_id IN (SELECT doc_id FROM cand)
  GROUP BY tf.doc_id
)"""


def _score_e4_col() -> F.Column:
    return F.floor(F.col("score") * 10000 + 0.5).cast("long").alias("score_e4")


# ---------------------------------------------------------------------------
# queries (Spark side)
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index-backed conjunctive BM25 top-10 over sf0.001 docs."""
    from sparkfts.query import bm25_index_batch

    sf_dir = "/root/testdata/sf0.001"
    idx = _index_dir_for(spark, sf_dir)
    return bm25_index_batch(
        spark, idx, [(0, BM25_QUERY_AND, 10)]
    ).select("rank", "doc_id", "score")


def q_fts_corpus_stats(spark, sf_dir):
    tokens, n_docs, _ = _scan_stats(spark, sf_dir)
    return tokens.agg(
        F.sum(F.col("tf").cast("long")).alias("total_tokens")
    ).select(
        F.lit(n_docs).cast("long").alias("n_docs"),
        "total_tokens",
        F.expr(f"total_tokens * 1000000 div {n_docs}").alias("avgdl_micro"),
    )


def q_fts_term_df(spark, sf_dir):
    return (
        _doc_tokens(spark, sf_dir)
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(20)
    )


def q_fts_term_tf(spark, sf_dir):
    return (
        _doc_tokens(spark, sf_dir)
        .where(F.col("term") == "the")
        .select("doc_id", F.col("tf").cast("long").alias("tf"))
    )


def q_fts_doclen(spark, sf_dir):
    return (
        _doc_tokens(spark, sf_dir)
        .select("doc_id", F.col("doclen").cast("long").alias("doclen"))
        .distinct()
    )


def q_fts_bm25_topk(spark, sf_dir):
    from sparkfts.query import bm25_scan_batch

    tokens, n_docs, avgdl = _scan_stats(spark, sf_dir)
    res = bm25_scan_batch(tokens, [(0, BM25_QUERY_AND, 10)], n_docs, avgdl)
    return res.select("doc_id", _score_e4_col())


def q_fts_index_topk(spark, sf_dir):
    from sparkfts.query import bm25_index_batch

    idx = _index_dir_for(spark, sf_dir)
    res = bm25_index_batch(spark, idx, [(0, BM25_QUERY_AND, 10)])
    return res.select("doc_id", _score_e4_col())


def q_fts_phrase_topk(spark, sf_dir):
    """match_phrase top-k from the positional index (ES positional-query
    family; oracle.phrase pins the Lucene PhraseQuery scoring shape)."""
    from sparkfts.phrase import build_positions, match_phrase_batch

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "positions")):
        build_positions(
            _docs_as_pages(_docs(spark, sf_dir)), idx, id_source="column"
        )
    res = match_phrase_batch(spark, idx, [(0, PHRASE_QUERY, 10)])
    return res.select("doc_id", _score_e4_col())


def q_fts_phrase_slop(spark, sf_dir):
    """match_phrase with slop=2 (ES window-tolerant phrase; pinned
    ordered-greedy semantics, oracle.phrase.sloppy_freq). For a 2-term
    phrase the greedy chain is `exists second-term position in
    (p0, p0+1+slop]` — the DuckDB oracle states it exactly that way."""
    from sparkfts.phrase import build_positions, match_phrase_batch

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "positions")):
        build_positions(
            _docs_as_pages(_docs(spark, sf_dir)), idx, id_source="column"
        )
    res = match_phrase_batch(spark, idx, [(0, PHRASE_QUERY, 10)], slop=2)
    return res.select("doc_id", _score_e4_col())


def q_fts_phrase_prefix(spark, sf_dir):
    """ES match_phrase_prefix (search-as-you-type): 'table ha' — fixed
    term 'table' followed by any dictionary term with prefix 'ha' at the
    next position. Pinned spec: oracle.phrase.search_phrase_prefix
    (last-slot position union, union-df virtual-prefix idf, sorted
    expansion cap)."""
    from sparkfts.phrase import build_positions, match_phrase_prefix_batch

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "positions")):
        build_positions(
            _docs_as_pages(_docs(spark, sf_dir)), idx, id_source="column"
        )
    p0, p1 = PHRASE_QUERY.split()
    res = match_phrase_prefix_batch(
        spark, idx, [(0, f"{p0} {p1[:2]}", 10)], max_expansions=50
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_edge_ngram(spark, sf_dir):
    """ES autocomplete: index-time edge_ngram (sparkfts/index.py
    expander slot) + standard query analysis — the typed prefix 'spar'
    hits indexed grams directly as ordinary BM25 terms (doclen counts
    the expanded stream, the pinned equivalence contract in
    sparkfts/analysis.py)."""
    from sparkfts.query import bm25_index_batch

    idx = _edge_index_dir_for(spark, sf_dir)
    res = bm25_index_batch(spark, idx, [(0, "spar", 10)], mode="or")
    return res.select("doc_id", _score_e4_col())


def q_fts_prefix_topk(spark, sf_dir):
    """ES prefix query over the sorted term dictionary: prefix 's'
    expands to {scan, slow, small, sort, spark, stream} at this SF;
    per doc the best expansion wins (max of idf * tf_norm * (k1+1) —
    pinned spec in sparkfts/prefix.py docstring)."""
    from sparkfts.prefix import prefix_topk_batch

    idx = _index_dir_for(spark, sf_dir)
    res = prefix_topk_batch(spark, idx, [(0, "s", 10)])
    return res.select("doc_id", _score_e4_col())


def q_fts_multifield_topk(spark, sf_dir):
    """ES multi_match(best_fields, operator=and) over [title^2, text] —
    the reference's actual query shape (field list at reference
    ElasticsearchToNeo4jSync.py:89 feeding multi_match :92-99)."""
    from sparkfts.multifield import bm25_multifield_batch

    idx = _mf_index_dir_for(spark, sf_dir)
    res = bm25_multifield_batch(
        spark, idx, [(0, BM25_QUERY_AND, 10)], fields=MF_FIELDS
    )
    return res.select("doc_id", _score_e4_col())


def _mi_index_dirs_for(spark: SparkSession, sf_dir: str) -> list[str]:
    """Build (once, cached) TWO indexes over the doc_id-parity halves of
    `documents` — the time-partitioned-indices deployment shape that
    cross-index search exists for (ES `logs-*`)."""
    key = os.path.basename(sf_dir.rstrip("/")) or "sf"
    dirs = []
    for half in (0, 1):
        idx = os.path.join(REPO, ".scratch", f"entry_mi{half}_{key}")
        if not os.path.exists(os.path.join(idx, "meta.json")):
            from sparkfts.index import build_index

            pages = _docs_as_pages(
                _docs(spark, sf_dir).where(F.col("doc_id") % 2 == half)
            )
            build_index(
                pages, idx, n_shards=4, n_tbuckets=16, id_source="column"
            )
        dirs.append(idx)
    return dirs


def q_fts_multi_index_topk(spark, sf_dir):
    """ES cross-index search: one request over two indexes, each scored
    with its OWN stats (query-then-fetch), merged by (-score, index_ord,
    doc_id)."""
    from sparkfts.multiindex import bm25_multi_index_batch

    dirs = _mi_index_dirs_for(spark, sf_dir)
    res = bm25_multi_index_batch(spark, dirs, [(0, BM25_QUERY_AND, 10)])
    return res.select(
        F.col("index_ord").cast("long").alias("index_ord"),
        "doc_id",
        _score_e4_col(),
    )


QS_QUERY = "spark AND (stream OR query) AND NOT data"


def q_fts_query_string(spark, sf_dir):
    """ES query_string syntax (Kibana bar / ``q=``): parsed to a nested
    bool tree, executed in the single-pass bool-tree kernel. Score =
    sum of matching positive per-term BM25 scores (must sums; inner OR
    sums its matching members), NOT-matched docs excluded."""
    from sparkfts.querystring import query_string_topk_batch

    idx = _index_dir_for(spark, sf_dir)
    res = query_string_topk_batch(spark, idx, [(0, QS_QUERY, 10)])
    return res.select("doc_id", _score_e4_col())


SQS_QUERY = '"table hash" | (spark + str*) -vector'


def q_fts_simple_qs(spark, sf_dir):
    """ES simple_query_string (lenient search-box syntax): phrase leaf
    OR'd with an AND group holding a trailing-star prefix, minus a
    negated term. The phrase-bearing tree takes the composed plan
    (sparkfts/simpleqs.py: one bool-tree kernel pass for term+prefix
    leaves, one positions pass for the phrase, one Catalyst fold on
    doc_id); phrase-free queries route to the single-pass kernel."""
    from sparkfts.phrase import build_positions
    from sparkfts.simpleqs import simple_query_string_topk_batch

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "positions")):
        build_positions(
            _docs_as_pages(_docs(spark, sf_dir)), idx, id_source="column"
        )
    res = simple_query_string_topk_batch(spark, idx, [(0, SQS_QUERY, 10)])
    return res.select("doc_id", _score_e4_col())


def q_fts_nested_filter(spark, sf_dir):
    """ES bool.filter at a NESTED level (round 5 docset nodes): must=
    [spark] + should=[bool{must:[stream], filter:[lang='en']}] — every
    spark doc matches; the stream bonus fires only for docs whose lang
    docvalue is 'en' (the filter constrains ITS node, zero score —
    sparkfts/booltree.py eval 'docset')."""
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.querybuilder import Bool, Clause, SearchRequest

    idx = _index_dir_for(spark, sf_dir)
    tree = Bool(
        must=(Clause(query="spark", fuzziness="0"),),
        should=(Bool(
            must=(Clause(query="stream", fuzziness="0"),),
            filter=("lang = 'en'",),
        ),),
    )
    res = bool_topk_batch(
        spark, idx, [SearchRequest(clauses=(tree,), k=10)]
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_bool_msm(spark, sf_dir):
    """ES bool.minimum_should_match INSIDE the bool grammar (round 5):
    must=[spark], should=[stream, query, vector], msm=2 — with msm set,
    should members CONSTRAIN (ES: no longer a pure bonus); score =
    must sum + matching should sum (kernel slot-4 msm,
    sparkfts/booltree.py)."""
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.querybuilder import Bool, Clause, SearchRequest

    idx = _index_dir_for(spark, sf_dir)
    tree = Bool(
        must=(Clause(query="spark", fuzziness="0"),),
        should=(
            Clause(query="stream", fuzziness="0"),
            Clause(query="query", fuzziness="0"),
            Clause(query="vector", fuzziness="0"),
        ),
        minimum_should_match=2,
    )
    res = bool_topk_batch(
        spark, idx, [SearchRequest(clauses=(tree,), k=10)]
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_qs_boost(spark, sf_dir):
    """Lucene ^boost through query_string (round 5): 'spark^2
    (stream query)^0.5' — OR of a double-weighted term and a
    half-weighted group; kernel applies each boost as ONE multiply
    after the node's own fold (booltree ("boost",...) wrapper)."""
    from sparkfts.querystring import query_string_topk_batch

    idx = _index_dir_for(spark, sf_dir)
    res = query_string_topk_batch(
        spark, idx, [(0, "spark^2 (stream query)^0.5", 10)]
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_or_wand_topk(spark, sf_dir):
    from sparkfts.query import bm25_index_batch

    idx = _index_dir_for(spark, sf_dir)
    res = bm25_index_batch(
        spark, idx, [(0, BM25_QUERY_OR, 10)], mode="or", use_blockmax=True
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_min_should_match(spark, sf_dir):
    """ES minimum_should_match: OR query requiring >= 2 of 3 terms."""
    from sparkfts.query import bm25_index_batch

    idx = _index_dir_for(spark, sf_dir)
    res = bm25_index_batch(
        spark, idx, [(0, BM25_QUERY_OR, 10)], mode="or", min_should_match=2
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_fuzzy_topk(spark, sf_dir):
    """Fuzzy (AUTO) conjunctive BM25 over a typo'd query (SURVEY.md §2.7;
    reference emits fuzziness:AUTO at ElasticsearchToNeo4jSync.py:97)."""
    from sparkfts.fuzzy import bm25_fuzzy_scan_batch

    tokens, n_docs, avgdl = _scan_stats(spark, sf_dir)
    res = bm25_fuzzy_scan_batch(tokens, [(0, BM25_QUERY_FUZZY, 10)], n_docs, avgdl)
    return res.select("doc_id", _score_e4_col())


def q_fts_fuzzy_index_topk(spark, sf_dir):
    """Same fuzzy query answered from the inverted index (term-dictionary
    Levenshtein expansion + grouped best-expansion kernel) — must be
    rank-identical to the scan-mode path and the DuckDB oracle."""
    from sparkfts.query import bm25_index_fuzzy_batch

    idx = _index_dir_for(spark, sf_dir)
    res = bm25_index_fuzzy_batch(spark, idx, [(0, BM25_QUERY_FUZZY, 10)])
    return res.select("doc_id", _score_e4_col())


def q_fts_fuzzy_fixed(spark, sf_dir):
    """ES FIXED fuzziness (match {query, fuzziness: 1}): the max edit
    distance applies as-is regardless of term length — 'stream' is 6
    chars so AUTO would allow 2 edits; the round-5 _FUZZY1 expansion
    class pins 1 (sparkfts/booltree.py tags; sparkfts/query.py
    fuzzy_expand_index fuzziness=)."""
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.querybuilder import Clause, SearchRequest

    idx = _index_dir_for(spark, sf_dir)
    req = SearchRequest(
        clauses=(Clause(query="stream", fuzziness="1"),), k=10
    )
    res = bool_topk_batch(spark, idx, [req])
    return res.select("doc_id", _score_e4_col())


def q_fts_bool_termlevel(spark, sf_dir):
    """ES bool composing TERM-LEVEL leaf queries (round-5 widening):
    wildcard 'st*m' AND regexp 'quer(y|ies)' AND fuzzy term 'vektor'
    (AUTO -> maxd 2 -> 'vector') — all three execute as expansion
    groups inside ONE single-pass bool-tree kernel plan
    (sparkfts/booltree.py _WILD/_REGEX/fuzzy tags), scores summed in
    member order."""
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.querybuilder import (
        Bool,
        FuzzyTerm,
        Regexp,
        SearchRequest,
        Wildcard,
    )

    idx = _index_dir_for(spark, sf_dir)
    req = SearchRequest(
        clauses=(Bool(must=(
            Wildcard(pattern="st*m"),
            Regexp(pattern="quer(y|ies)"),
            FuzzyTerm(term="vektor"),
        )),),
        k=10,
    )
    res = bool_topk_batch(spark, idx, [req])
    return res.select("doc_id", _score_e4_col())


def q_fts_fuzzy_transpositions(spark, sf_dir):
    """ES default fuzzy semantics (``fuzzy_transpositions: true``):
    Damerau-Levenshtein expansion, a transposition = ONE edit. The query
    terms are adjacent-swap typos at Damerau distance 1 / plain distance
    2, so plain-Levenshtein AUTO matches nothing and this entry isolates
    the transposition path. Distance pinned to the UNRESTRICTED Damerau
    variant = DuckDB's ``damerau_levenshtein`` (oracle-identical)."""
    from sparkfts.query import bm25_index_fuzzy_batch

    idx = _index_dir_for(spark, sf_dir)
    res = bm25_index_fuzzy_batch(
        spark, idx, [(0, BM25_QUERY_TRANSPOSED, 10)], transpositions=True
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_filtered_topk(spark, sf_dir):
    """ES bool.filter: BM25 top-k restricted by a structured predicate
    (the most common real-ES query shape after plain match — the
    reference's delegated `client.search` would accept the same filter
    clause, reference ElasticsearchHandler.py:69). Filter evaluates
    JVM-side on the docmap (lang stored as a doc value); exact top-k
    over the filtered set, scores corpus-global per ES semantics."""
    from sparkfts.query import bm25_index_batch

    idx = _index_dir_for(spark, sf_dir)
    res = bm25_index_batch(
        spark, idx, [(0, BM25_QUERY_OR, 10)], mode="or",
        filter_expr="lang = 'en'",
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_must_not_topk(spark, sf_dir):
    """ES bool.must_not: docs matching the negated query are excluded
    BEFORE top-k, with no scoring contribution; survivor scores are
    identical to the unnegated query's."""
    from sparkfts.query import bm25_index_batch

    idx = _index_dir_for(spark, sf_dir)
    res = bm25_index_batch(
        spark, idx, [(0, BM25_QUERY_AND, 10)], mode="and",
        must_not={0: "vector"},
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_bool_topk(spark, sf_dir):
    """Full ES bool tree executed in ONE single-pass shard-kernel plan
    (sparkfts.booltree): must (fuzzy conjunctive multi_match, the shape
    the reference pins at ElasticsearchToNeo4jSync.py:92-102) + should
    (score bonus) + must_not (exclusion) — per-shard top-k, global
    window over <= n_shards*k rows, no per-clause full match sets."""
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.querybuilder import Clause, SearchRequest

    idx = _index_dir_for(spark, sf_dir)
    req = SearchRequest(
        clauses=(Clause(query=BM25_QUERY_FUZZY),),
        should=(Clause(query="vector"),),
        must_not=("stream",),
        k=10,
    )
    res = bool_topk_batch(spark, idx, [req])
    return res.select("doc_id", _score_e4_col())


def q_fts_synonym_topk(spark, sf_dir):
    """Query-time synonym expansion: "spark merge" with merge->join.
    Pinned semantics: a term's group = {term} | analyze(synonyms), a
    group matches when ANY member matches, scored best-member-wins with
    weight = idf(df(member)) — fuzzy-group machinery with boost 1
    (sparkfts/query.py bm25_index_synonym_batch). Zero extra jobs for
    expansion (driver-side map + generation-cached df dictionary)."""
    from sparkfts.query import bm25_index_synonym_batch

    idx = _index_dir_for(spark, sf_dir)
    res = bm25_index_synonym_batch(
        spark, idx, [(0, "spark merge", 10)],
        synonyms={"merge": ["join"]},
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_dismax_topk(spark, sf_dir):
    """ES ``dis_max`` query: union of two fuzzy conjunctive clauses,
    score = best clause + tie_breaker * (sum of other matching clauses).
    Runs in the same single-pass bool-tree shard kernel
    (sparkfts/booltree.py) — per-shard top-k, no full match sets on the
    global window. Pinned float association: best + tb*(total-best),
    total folded in member order."""
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.querybuilder import Clause, DisMax, SearchRequest

    idx = _index_dir_for(spark, sf_dir)
    req = SearchRequest(
        clauses=(
            DisMax(
                queries=(
                    Clause(query=BM25_QUERY_AND),
                    Clause(query="vector"),
                ),
                tie_breaker=0.3,
            ),
        ),
        k=10,
    )
    res = bool_topk_batch(spark, idx, [req])
    return res.select("doc_id", _score_e4_col())


def q_fts_sort_topk(spark, sf_dir):
    """ES ``sort`` on a doc-value field: AND-matching docs ordered by
    ``n_chars`` desc (ties doc_id asc) instead of _score. Exhaustive
    per-shard match + per-shard top-k by the sort key, global window
    over <= n_shards*k rows (sparkfts/docvalues.py)."""
    from sparkfts.docvalues import sort_by_field_batch

    idx = _index_dir_for(spark, sf_dir)
    res = sort_by_field_batch(
        spark, idx, [(0, BM25_QUERY_AND, 15)], "n_chars", ascending=False
    )
    return res.select("rank", "doc_id", "sort_value")


def q_fts_function_score(spark, sf_dir):
    """ES ``function_score`` + field_value_factor (multiply, ln1p):
    final = BM25 * ln(1 + n_chars). Doc-value boosts break score-bound
    pruning, so the kernel re-ranks the full in-shard match set — ES's
    own cost model for this query."""
    from sparkfts.docvalues import function_score_batch

    idx = _index_dir_for(spark, sf_dir)
    res = function_score_batch(
        spark, idx, [(0, BM25_QUERY_OR, 10)], "n_chars",
        modifier="log1p", mode="or",
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_terms_set(spark, sf_dir):
    """ES terms_set: per-doc minimum_should_match — doc matches when
    it contains >= min(doc_id%5, n_terms) of the query's terms
    (required < 1 never matches); standard OR scoring over the
    matching terms."""
    from sparkfts.docvalues import terms_set_batch

    idx = _index_dir_for(spark, sf_dir)
    res = terms_set_batch(
        spark, idx, [(0, BM25_QUERY_OR, 10)], "pmod(doc_id, 5)"
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_script_score(spark, sf_dir):
    """ES script_score: final = _score * (0.5 + value/(value+10)) with
    value = n_chars — the pinned arithmetic DSL (sparkfts.scripting),
    parsed driver-side, compiled to a vectorized numpy closure (no
    eval), evaluated in the exhaustive in-shard re-rank kernel."""
    from sparkfts.docvalues import script_score_batch

    idx = _index_dir_for(spark, sf_dir)
    res = script_score_batch(
        spark, idx, [(0, BM25_QUERY_OR, 10)], "n_chars",
        "_score * (0.5 + value / (value + 10))", mode="or",
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_collapse(spark, sf_dir):
    """ES ``collapse``: top-k with one best hit per ``source``.
    Per-shard best-per-key -> top-k, global re-collapse -> top-k
    (lossless merge; see sparkfts/docvalues.py)."""
    from sparkfts.docvalues import collapse_batch

    idx = _index_dir_for(spark, sf_dir)
    res = collapse_batch(
        spark, idx, [(0, BM25_QUERY_OR, 8)], "source", mode="or"
    )
    return res.select("rank", "doc_id", _score_e4_col(), "collapse_value")


def q_terms_top_hits(spark, sf_dir):
    """ES ``terms`` agg + ``top_hits`` sub-agg: the 5 largest ``source``
    buckets over the OR match set, each with its 2 best hits by BM25.
    Kernel emits per-shard per-key top-N + run counts; global transfer
    bounded by keys-in-shard * N."""
    from sparkfts.docvalues import terms_top_hits

    idx = _index_dir_for(spark, sf_dir)
    res = terms_top_hits(
        spark, idx, BM25_QUERY_OR, "source", size=5, hits=2, mode="or"
    )
    return res.select(
        "value", "doc_count", "hit_rank", "doc_id", _score_e4_col()
    )


def q_fts_bm25f_topk(spark, sf_dir):
    """BM25F combined-fields scoring over [title^2, text] (ES
    combined_fields family; pinned spec oracle/bm25f.py): per-field
    length-normalized tfs fold into one tfc BEFORE saturation, idf over
    the any-field df from the terms_any combined dictionary."""
    from sparkfts.multifield import bm25f_batch

    idx = _mf_index_dir_for(spark, sf_dir)
    res = bm25f_batch(
        spark, idx, [(0, BM25_QUERY_AND, 10)], fields=MF_FIELDS, mode="and"
    )
    return res.select("doc_id", _score_e4_col())


def q_stats_agg(spark, sf_dir):
    """ES stats aggregation (count/min/max/sum/avg of n_chars) over the
    FULL match set of an OR query — aggregations never see just the
    top-k page. avg quantized to micro-ints for the hash compare."""
    from sparkfts.aggs import stats_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    res = stats_agg(
        spark, idx, BM25_QUERY_OR, docs.select("doc_id", "n_chars"),
        "n_chars", mode="or",
    )
    return res.select(
        F.col("count").cast("long").alias("n"),
        F.col("min").cast("long").alias("min_chars"),
        F.col("max").cast("long").alias("max_chars"),
        F.col("sum").cast("long").alias("sum_chars"),
        F.floor(F.col("avg") * 1_000_000 + 0.5).cast("long").alias("avg_e6"),
    )


def q_histogram_facet(spark, sf_dir):
    """ES histogram aggregation: fixed-interval n_chars buckets over the
    full match set (floor(v/interval)*interval keys, empty buckets
    omitted)."""
    from sparkfts.aggs import histogram_facet

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    res = histogram_facet(
        spark, idx, BM25_QUERY_OR, docs.select("doc_id", "n_chars"),
        "n_chars", interval=200.0, mode="or",
    )
    return res.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("doc_count").cast("long").alias("doc_count"),
    )


def q_terms_stats_nested(spark, sf_dir):
    """ES sub-aggregation: terms buckets (lang) with a nested stats agg
    (n_chars) per bucket over the OR query's full match set."""
    from sparkfts.aggs import terms_stats_nested

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    res = terms_stats_nested(
        spark, idx, BM25_QUERY_OR,
        docs.select("doc_id", "lang", "n_chars"),
        "lang", "n_chars", mode="or", size=10,
    )
    return res.select(
        "value",
        F.col("doc_count").cast("long").alias("doc_count"),
        F.col("min").cast("long").alias("min_chars"),
        F.col("max").cast("long").alias("max_chars"),
        F.col("sum").cast("long").alias("sum_chars"),
        F.floor(F.col("avg") * 1_000_000 + 0.5).cast("long").alias("avg_e6"),
    )


def q_date_histogram(spark, sf_dir):
    """ES date_histogram (calendar_interval=month, UTC truncation) over
    a deterministic per-doc crawl timestamp (2024-01-01 + doc_id%400
    days — synthesized identically in the DuckDB oracle)."""
    from sparkfts.aggs import date_histogram

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(
            "timestamp'2024-01-01 00:00:00' + "
            "make_interval(0, 0, 0, CAST(doc_id % 400 AS INT))"
        ).alias("crawl_ts"),
    )
    res = date_histogram(
        spark, idx, BM25_QUERY_OR, docs, "crawl_ts",
        calendar_interval="month", mode="or",
    )
    return res.select(
        F.col("bucket").cast("long").alias("bucket_epoch"),
        F.col("doc_count").cast("long").alias("doc_count"),
    )


def q_fts_wildcard_topk(spark, sf_dir):
    """ES wildcard query: pattern 's*a*' expands via the literal-prefix
    range pre-filter + anchored regex over the term dictionary
    ({scan, small, spark, stream} at this SF); best-expansion-wins
    scoring, same pinned spec as prefix."""
    from sparkfts.prefix import wildcard_topk_batch

    idx = _index_dir_for(spark, sf_dir)
    res = wildcard_topk_batch(spark, idx, [(0, "s*a*", 10)])
    return res.select("doc_id", _score_e4_col())


def _routed_index_dir_for(spark: SparkSession, sf_dir: str) -> str:
    """Build (once, cached) a ROUTED index over `documents`: shard =
    md5-hash(source) — ES custom routing, so per-source queries prune
    to one shard."""
    key = os.path.basename(sf_dir.rstrip("/")) or "sf"
    idx = os.path.join(REPO, ".scratch", f"entry_idx_routed_{key}")
    if not os.path.exists(os.path.join(idx, "meta.json")):
        from sparkfts.index import build_index

        build_index(
            _docs_as_pages(_docs(spark, sf_dir)),
            idx,
            n_shards=8,
            n_tbuckets=16,
            id_source="column",
            docvalue_cols=["source"],
            routing_col="source",
        )
    return idx


def q_fts_routed_topk(spark, sf_dir):
    """ES custom routing: the OR query routed to the shard owning
    source='src3' — the postings scan prunes to 1 of 8 shards; results
    equal the unrouted query restricted to that shard's docs (global
    stats, the engine's pinned dfs_query_then_fetch-style contract).
    The DuckDB oracle recomputes the same md5-prefix shard hash."""
    from sparkfts.query import bm25_index_batch

    idx = _routed_index_dir_for(spark, sf_dir)
    res = bm25_index_batch(
        spark, idx, [(0, BM25_QUERY_OR, 10)], mode="or", routing="src3"
    )
    return res.select("doc_id", _score_e4_col())


def q_percentile_ranks(spark, sf_dir):
    """ES percentile_ranks (exact CDF pin, integer arithmetic): what
    percent of matched docs' n_chars fall at or below each probe."""
    from sparkfts.aggs import percentile_ranks_agg

    idx = _index_dir_for(spark, sf_dir)
    return percentile_ranks_agg(
        spark, idx, BM25_QUERY_OR, _docs(spark, sf_dir), "n_chars",
        [2000.0, 5000.0, 20000.0], mode="or",
    )


def q_mget_docs(spark, sf_dir):
    """ES _mget: docmap lookups for a fixed id list (one missing id),
    request order, found flags; newest-segment/tombstone visibility
    rules apply (sparkfts.lifecycle.mget)."""
    from sparkfts.lifecycle import mget

    idx = _index_dir_for(spark, sf_dir)
    res = mget(spark, idx, [3, 1, 999999, 7])
    return res.select(
        "doc_id", "found", "url", F.col("doclen").cast("int")
    )


def q_fts_count(spark, sf_dir):
    """ES _count: matching-doc totals for the AND and OR flagship
    queries in one batch — no scoring, partial-aggregated counts only
    (sparkfts.aggs.count_matches)."""
    from sparkfts.aggs import count_matches

    idx = _index_dir_for(spark, sf_dir)
    both = count_matches(
        spark, idx, [(0, BM25_QUERY_AND)], mode="and"
    ).unionByName(
        count_matches(spark, idx, [(1, BM25_QUERY_OR)], mode="or")
    )
    return both.select("query_id", "doc_count")


def q_rare_terms_agg(spark, sf_dir):
    """ES rare_terms aggregation: the long-tail `source` buckets
    (doc_count <= 2) among docs matching 'dup' (a mid-frequency term,
    so rarity is non-vacuous at sf0.01) — doc_count asc, value asc
    (exact; see sparkfts.aggs.rare_terms scale note)."""
    from sparkfts.aggs import rare_terms

    idx = _index_dir_for(spark, sf_dir)
    res = rare_terms(
        spark, idx, "dup", _docs(spark, sf_dir), "source",
        mode="or", max_doc_count=2,
    )
    return res.select("value", F.col("doc_count").cast("long"))


def q_auto_date_histogram(spark, sf_dir):
    """ES auto_date_histogram (target 15 buckets): finest calendar
    interval from the pinned ladder whose non-empty bucket count fits —
    over the deterministic crawl_ts (2024-01-01 + doc_id%400 days,
    same synthesis as date_histogram); the 400-day span lands on
    'month' (14 buckets), derived — not hardcoded — in both engines."""
    from sparkfts.aggs import auto_date_histogram

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(
            "timestamp'2024-01-01 00:00:00' + "
            "make_interval(0, 0, 0, CAST(doc_id % 400 AS INT))"
        ).alias("crawl_ts"),
    )
    res = auto_date_histogram(
        spark, idx, BM25_QUERY_OR, docs, "crawl_ts",
        target_buckets=15, mode="or",
    )
    return res.select(
        "interval",
        F.col("bucket").cast("long").alias("bucket_epoch"),
        F.col("doc_count").cast("long").alias("doc_count"),
    )


def q_fts_regexp_topk(spark, sf_dir):
    """ES regexp query: anchored pattern 's(c|p)a[a-z]+' over the term
    dictionary (literal-prefix 's' range pre-filter, RE2/Java common
    subset); best-expansion-wins scoring, same pinned spec as
    prefix/wildcard."""
    from sparkfts.prefix import regexp_topk_batch

    idx = _index_dir_for(spark, sf_dir)
    res = regexp_topk_batch(spark, idx, [(0, "s(c|p)a[a-z]+", 10)])
    return res.select("doc_id", _score_e4_col())


def q_cardinality_agg(spark, sf_dir):
    """ES cardinality aggregation (exact variant) over the full match
    set: distinct langs among docs matching the OR query."""
    from sparkfts.aggs import cardinality_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    return cardinality_agg(
        spark, idx, BM25_QUERY_OR, docs.select("doc_id", "lang"),
        "lang", mode="or",
    )


def q_percentiles_agg(spark, sf_dir):
    """ES percentiles aggregation (exact percentile_cont variant) of
    n_chars over the full match set; micro-int quantized."""
    from sparkfts.aggs import percentiles_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    res = percentiles_agg(
        spark, idx, BM25_QUERY_OR, docs.select("doc_id", "n_chars"),
        "n_chars", percentiles=[25.0, 50.0, 75.0, 95.0], mode="or",
    )
    return res.select(
        F.col("pct").cast("long").alias("pct"),
        F.floor(F.col("value") * 1_000_000 + 0.5).cast("long").alias("value_e6"),
    )


def q_term_suggest(spark, sf_dir):
    """ES term suggester: per typo'd input term, dictionary corrections
    within AUTO edit distance ordered (dist asc, df desc, term asc) —
    the pinned spec in sparkfts/suggest.py."""
    from sparkfts.suggest import suggest_terms

    idx = _index_dir_for(spark, sf_dir)
    return suggest_terms(spark, idx, BM25_QUERY_FUZZY, size=3).select(
        "input_term", "suggestion", "dist", "df",
        F.col("rank").cast("long").alias("rank"),
    )


def q_significant_terms(spark, sf_dir):
    """ES significant_terms (pinned JLH scoring) over the OR query's
    match set: terms over-represented vs the corpus background."""
    from sparkfts.aggs import significant_terms

    idx = _index_dir_for(spark, sf_dir)
    res = significant_terms(
        spark, idx, BM25_QUERY_OR, mode="or", size=10, min_doc_count=3
    )
    return res.select(
        "term", "df_fg", "df_bg",
        F.floor(F.col("score_jlh") * 1_000_000 + 0.5).cast("long").alias(
            "score_e6"
        ),
    )


def q_significant_text(spark, sf_dir):
    """ES significant_text: JLH-scored terms over the match set's
    RE-ANALYZED stored _source (sparkfts/aggs.py significant_text) —
    the free-text counterpart of significant_terms."""
    from sparkfts.aggs import significant_text

    idx = _index_dir_for(spark, sf_dir)
    res = significant_text(
        spark, idx, BM25_QUERY_AND, mode="and", size=10, min_doc_count=3
    )
    return res.select(
        "term", "df_fg", "df_bg",
        F.floor(F.col("score_jlh") * 1_000_000 + 0.5).cast("long").alias(
            "score_e6"
        ),
    )


def q_scripted_metric(spark, sf_dir):
    """ES scripted_metric (pinned subset): per-doc map script over
    docmap fields compiled to ONE Catalyst column, order-free exact
    combine (max) + doc_count (sparkfts/aggs.py scripted_metric)."""
    from sparkfts.aggs import scripted_metric

    idx = _index_dir_for(spark, sf_dir)
    res = scripted_metric(
        spark, idx, BM25_QUERY_AND,
        map_script="sqrt(n_chars) + n_chars / 7",
        combine="max", mode="and", fields=["n_chars"],
    )
    return res.select(
        "doc_count",
        F.floor(F.col("value") * 10_000 + 0.5).cast("long").alias(
            "value_e4"
        ),
    )


TERMS_LOOKUP_DOC = 7  # lookup document id (exists at every SF)


def q_fts_terms_lookup(spark, sf_dir):
    """ES terms-lookup query: the filter's value set is FETCHED from
    another document (index/id/path form) instead of inlined — mget ->
    value list -> IN predicate pushed into the docmap scan
    (sparkfts/lifecycle.py terms_lookup_values/_expr)."""
    from sparkfts.lifecycle import terms_lookup_expr, terms_lookup_values
    from sparkfts.query import bm25_index_batch

    idx = _index_dir_for(spark, sf_dir)
    vals = terms_lookup_values(spark, idx, TERMS_LOOKUP_DOC, "source")
    res = bm25_index_batch(
        spark, idx, [(0, BM25_QUERY_OR, 10)], mode="or",
        filter_expr=terms_lookup_expr("source", vals),
    )
    return res.select("doc_id", _score_e4_col())


def q_rank_eval(spark, sf_dir):
    """ES _rank_eval (sparkfts/rankeval.py): precision/recall/mrr/dcg
    of the OR query's top-10 against a deterministic rating set (docs
    containing the token 'vector' rated 1)."""
    from sparkfts.analysis import TOKEN_RE
    from sparkfts.rankeval import rank_eval

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    toks = F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE_SQL}', 0)")
    ratings = docs.where(
        F.array_contains(toks, "vector")
    ).select(
        F.lit(0).cast("int").alias("query_id"),
        F.col("doc_id").cast("long"),
        F.lit(1).cast("int").alias("rating"),
    )
    reqs = [(0, BM25_QUERY_OR, 10)]
    out = None
    for m in ("precision", "recall", "mrr", "dcg"):
        part = rank_eval(spark, idx, reqs, ratings, metric=m).select(
            "query_id",
            F.floor(F.col("metric_value") * 1_000_000 + 0.5)
            .cast("long")
            .alias(f"{m}_e6"),
        )
        out = part if out is None else out.join(part, "query_id")
    return out


def q_more_like_this(spark, sf_dir):
    """ES more_like_this: docs similar to the min-doc_id document
    (tf*idf term selection, OR BM25, source excluded)."""
    from sparkfts.mlt import more_like_this

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    src_id = docs.agg(F.min("doc_id")).collect()[0][0]
    res = more_like_this(
        spark, idx, docs, int(src_id), k=10,
        max_query_terms=10, min_term_freq=1, min_doc_freq=2,
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_rescore_topk(spark, sf_dir):
    """ES rescore: phrase-proximity re-rank of the OR query's top-50
    window (score_mode total, rescore_weight 2)."""
    from sparkfts.phrase import build_positions
    from sparkfts.rescore import rescore_phrase

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "positions")):
        build_positions(
            _docs_as_pages(_docs(spark, sf_dir)), idx, id_source="column"
        )
    res = rescore_phrase(
        spark, idx, BM25_QUERY_OR, PHRASE_QUERY,
        k=10, window_size=50, query_weight=1.0, rescore_weight=2.0,
        mode="or",
    )
    return res.select("doc_id", _score_e4_col())


def q_terms_facet(spark, sf_dir):
    """ES terms aggregation: lang buckets over the FULL match set of an
    OR query (aggregations run over all matches, not the top-k page)."""
    from sparkfts.aggs import terms_facet

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    return terms_facet(
        spark, idx, BM25_QUERY_OR, docs.select("doc_id", "lang"), "lang",
        mode="or", size=10,
    )


def q_highlight_spans(spark, sf_dir):
    """Highlighting span summary (token-level, SQL-expressible half of
    the ES highlight spec; the fragment text itself is pytest-pinned)."""
    from sparkfts.highlight import highlight

    res = highlight(_docs(spark, sf_dir), BM25_QUERY_AND)
    return res.where(F.col("first_tok_pos").isNotNull()).select(
        "doc_id",
        F.col("first_tok_pos").cast("long").alias("first_tok_pos"),
        F.col("n_hit_tokens").cast("long").alias("n_hit_tokens"),
    )


def q_match_all(spark, sf_dir):
    """Empty query -> match-all top-k (reference returns {} for empty input,
    ElasticsearchToNeo4jSync.py:102; ES treats {} as match_all, score 1.0)."""
    from sparkfts.querybuilder import match_all_topk

    docs = _docs(spark, sf_dir)
    return match_all_topk(docs, k=10).select(
        "rank", "doc_id", F.lit(10000).cast("long").alias("score_e4")
    )


def q_threshold_filter(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .where(F.col("value") >= 0.9)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.floor(F.col("value") * 1_000_000 + 0.5)
            .cast("long")
            .alias("value_e6"),
        )
    )


def q_projection_rename(spark, sf_dir):
    # reference getProps + propMap (answer -> name) + str() coercion
    return _events(spark, sf_dir).select(
        F.col("event_id").alias("id"),
        F.col("event_type").alias("name"),
        F.col("user_id").cast("string").alias("user_str"),
    )


def q_type_lookup(spark, sf_dir):
    # reference getType: entity key -> schema.org supertype (nodeType.py)
    node_type = (
        F.when(F.col("event_type").isin("signup"), "Person")
        .when(F.col("event_type").isin("purchase", "error"), "Organization")
        .otherwise("Thing")
    )
    return (
        _events(spark, sf_dir)
        .select(node_type.alias("node_type"))
        .groupBy("node_type")
        .agg(F.count("*").alias("n"))
    )


def q_distinct_fields(spark, sf_dir):
    return _events(spark, sf_dir).select("event_type").distinct()


def q_batch_chunks(spark, sf_dir):
    # reference dataPush chunking (flush every chunkSize rows)
    return (
        _events(spark, sf_dir)
        .select(F.expr("event_id div 1000").alias("batch_id"))
        .groupBy("batch_id")
        .agg(F.count("*").alias("n"))
    )


def q_graph_dyads(spark, sf_dir):
    # reference buildGraphData: dyad shaping after threshold filter
    return (
        _events(spark, sf_dir)
        .where(F.col("value") >= 400.0)
        .select(
            F.lit("Person").alias("from_type"),
            F.col("user_id").cast("string").alias("from_key"),
            F.upper(F.col("event_type")).alias("edge_type"),
            F.lit("Thing").alias("to_type"),
            F.col("event_id").cast("string").alias("to_key"),
        )
    )


def q_topk_per_group(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        _events(spark, sf_dir)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 2)
        .select(
            "event_type",
            F.col("rnk").cast("long").alias("rnk"),
            "event_id",
            F.floor(F.col("value") * 1_000_000 + 0.5)
            .cast("long")
            .alias("value_e6"),
        )
    )


def q_tumbling_window(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy(
            F.window(F.col("ts"), "1 hour").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("sum_value_e2"),
        )
        .select(
            # TIMESTAMP_NTZ -> epoch seconds (session TZ pinned to UTC, so
            # this matches DuckDB's epoch(time_bucket(...)))
            F.col("w.start").cast("timestamp").cast("long").alias("window_epoch"),
            "event_type",
            "n_events",
            "sum_value_e2",
        )
    )


def q_session_windows(spark, sf_dir):
    """Gap-based session windows (30-min) over the events stream — the
    batch form of the applyInPandasWithState stateful operator."""
    from sparkfts.sessions import session_windows

    return session_windows(_events(spark, sf_dir))


def q_dedup_exact(spark, sf_dir):
    from sparkfts.ops.dedup import exact_dup_groups

    docs = _docs(spark, sf_dir)
    dup = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    return exact_dup_groups(dup)


def q_dedup_jaccard(spark, sf_dir):
    from sparkfts.ops.dedup import ngram_jaccard_pairs

    # shingle_df_cap makes the skew-safe candidate plan the driver-checked
    # path; at this SF no shingle df exceeds 4 (checked), so the output is
    # provably identical to the exhaustive oracle below
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=0.015, max_doc_id=120,
        shingle_df_cap=50,
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    from sparkfts.ops.dedup import lsh_buckets

    return lsh_buckets(_docs(spark, sf_dir), n_hashes=8, bands=4)


def q_dedup_simhash(spark, sf_dir):
    from sparkfts.ops.dedup import simhash32

    return simhash32(_docs(spark, sf_dir))


def q_decontaminate(spark, sf_dir):
    """Test-set decontamination: 8-gram overlap of the corpus against a
    deterministic eval slice (doc_id % 97 == 0) — the standard
    contamination check of large-scale training-data pipelines."""
    from sparkfts.ops.decontam import ngram_overlap

    docs = _docs(spark, sf_dir)
    eval_df = docs.where(F.col("doc_id") % 97 == 0)
    return ngram_overlap(docs, eval_df, n=8)


def q_source_cap_sample(spark, sf_dir):
    """Per-source document cap (the per-host cap every web pretraining
    pipeline applies so no one domain dominates): keep the 5
    lowest-doc_id docs per source. One window partitioned by source —
    the exact per-group top-N shape (sparkfts/ops/sampling.py)."""
    from sparkfts.ops.sampling import cap_per_group

    capped = cap_per_group(_docs(spark, sf_dir), "source", 5)
    return capped.select("doc_id", "source")


def q_stratified_sample(spark, sf_dir):
    """Deterministic language-stratified down-sample: keep ~50% of en
    and ~10% of de via an integer-LCG hash bucket per doc (no RNG; the
    keep set is replayable and DuckDB-reproducible). Pure rowwise
    predicate — no shuffle (sparkfts/ops/sampling.py)."""
    from sparkfts.ops.sampling import stratified_sample

    kept = stratified_sample(
        _docs(spark, sf_dir), {"en": 500, "de": 100}, strata_col="lang"
    )
    return kept.select("doc_id", "lang")


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition quality signals per document
    (duplicate-token / duplicate-bigram fractions, top-token frequency)
    — the standard boilerplate/SEO-spam filter of a web pretraining
    pipeline (sparkfts/ops/textclean.py)."""
    from sparkfts.ops.textclean import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


def _pii_docs(docs):
    """Deterministically inject PII-shaped content (email, IPv4, phone
    derived from doc_id/source) so the redaction oracle checks real
    matches; the same construction is replayed in DuckDB."""
    from pyspark.sql import functions as F

    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact "), F.col("source"), F.lit("@example.com ip "),
            (F.col("doc_id") % 256).cast("string"), F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit(".0.1 tel 555-"),
            F.lpad(((F.col("doc_id") * 13) % 1000).cast("string"), 3, "0"),
            F.lit("-1234"),
        ).alias("text"),
    )


def q_pii_redact(spark, sf_dir):
    """PII redaction (emails -> <EMAIL>, IPv4 -> <IP>, phones ->
    <PHONE>) with per-type match counts; rowwise JVM regexp chain
    (sparkfts/ops/textclean.py)."""
    from pyspark.sql import functions as F

    from sparkfts.ops.textclean import redact_pii

    out = redact_pii(_pii_docs(_docs(spark, sf_dir)))
    return out.select(
        "doc_id", F.md5("redacted").alias("redacted_md5"),
        "n_emails", "n_ipv4", "n_phones",
    )


def _url_docs(docs):
    """Deterministic messy-URL column (mixed case, default ports,
    tracking params, fragments) replayable in DuckDB."""
    from pyspark.sql import functions as F

    d = F.col("doc_id")
    even = F.concat(
        F.lit("HTTPS://WWW.Host"), (d % 7).cast("string"),
        F.lit(".COM:443/p/"), d.cast("string"),
        F.lit("?utm_source=x&id="), d.cast("string"), F.lit("#top"),
    )
    odd = F.concat(
        F.lit("http://blog"), (d % 5).cast("string"),
        F.lit(".Example.NET:80/a/"), d.cast("string"),
        F.lit("?utm_campaign=y"),
    )
    return docs.select(
        "doc_id", F.when(d % 2 == 0, even).otherwise(odd).alias("url")
    )


def q_url_canonicalize(spark, sf_dir):
    """URL canonicalization (lowercase scheme+host, strip default ports,
    drop fragments and utm_* params) + host extraction — the first step
    of per-host caps and host-level dedup
    (sparkfts/ops/textclean.py)."""
    from sparkfts.ops.textclean import canonicalize_urls

    return canonicalize_urls(_url_docs(_docs(spark, sf_dir)))


def q_host_doc_counts(spark, sf_dir):
    """Docs-per-host census over canonicalized URLs (the input to
    per-host caps): one hash-groupBy with map-side partial agg."""
    from pyspark.sql import functions as F

    from sparkfts.ops.textclean import canonicalize_urls

    return (
        canonicalize_urls(_url_docs(_docs(spark, sf_dir)))
        .groupBy("host")
        .agg(F.count("*").alias("n_docs"))
    )


def q_filters_agg(spark, sf_dir):
    """ES filters aggregation: named predicate buckets (overlapping,
    zero-count included, request order) + the _other_ bucket, over the
    full OR-query match set."""
    from sparkfts.aggs import filters_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    return filters_agg(
        spark, idx, BM25_QUERY_OR,
        docs.select("doc_id", "lang", "n_chars"),
        [("english", "lang = 'en'"),
         ("big", "n_chars >= 200"),
         ("absent", "lang = 'zz'")],
        mode="or", other_bucket=True,
    )


def q_missing_agg(spark, sf_dir):
    """ES missing aggregation: matched docs with no value for the field
    (engine semantics: NULL doc value or absent row). The fixture
    nullifies lang='de' so the count is deterministic and non-zero."""
    from sparkfts.aggs import missing_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    dv = docs.select(
        "doc_id", F.expr("nullif(lang, 'de')").alias("lang_opt")
    )
    return missing_agg(spark, idx, BM25_QUERY_OR, dv, "lang_opt", mode="or")


def q_range_agg(spark, sf_dir):
    """ES range aggregation over the full OR-query match set: every
    requested range reported (zero-count included), request order
    preserved, from inclusive / to exclusive (sparkfts/aggs.py)."""
    from sparkfts.aggs import range_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    return range_agg(
        spark, idx, BM25_QUERY_OR, docs.select("doc_id", "n_chars"),
        "n_chars",
        [("small", None, 150.0), ("mid", 150.0, 300.0),
         ("large", 300.0, None)],
        mode="or",
    )


def q_composite_agg(spark, sf_dir):
    """ES composite aggregation (paginated multi-source buckets): terms
    on lang x histogram(100) on n_chars, page size 5, resumed after the
    bucket ('de', 100.0) — ES's scalable deep-bucket pagination
    (sparkfts/aggs.py)."""
    from sparkfts.aggs import composite_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    return composite_agg(
        spark, idx, BM25_QUERY_OR,
        docs.select("doc_id", "lang", "n_chars"),
        [("lang", "terms", "lang", None),
         ("size_bucket", "histogram", "n_chars", 100.0)],
        size=5, after={"lang": "de", "size_bucket": 100.0}, mode="or",
    )


def q_hybrid_rrf_topk(spark, sf_dir):
    """Hybrid retrieval (ES 8 hybrid search): BM25 leg over the built
    index + exact cosine leg over the embeddings table, fused with
    Reciprocal Rank Fusion (rrf_k=60, rank_window_size=100)
    (sparkfts/hybrid.py). vec_id is keyed like doc_id in the test
    tables."""
    from sparkfts.hybrid import hybrid_rrf_topk

    idx = _index_dir_for(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    res = hybrid_rrf_topk(
        spark, idx, emb, [(0, BM25_QUERY_OR, list(qvec))], k=10, depth=100
    )
    return res.select(
        "rank",
        "doc_id",
        F.floor(F.col("rrf_score") * 1_000_000_000 + 0.5)
        .cast("long")
        .alias("rrf_e9"),
    )


def q_lang_id(spark, sf_dir):
    from sparkfts.ops.textstats import lang_id

    return lang_id(_docs(spark, sf_dir))


def q_quality_scores(spark, sf_dir):
    from sparkfts.ops.textstats import quality_scores

    return quality_scores(_docs(spark, sf_dir))


def q_token_counts(spark, sf_dir):
    from sparkfts.ops.textstats import token_counts

    return token_counts(_docs(spark, sf_dir))


def q_fingerprints(spark, sf_dir):
    from sparkfts.ops.textstats import fingerprints

    return fingerprints(_docs(spark, sf_dir))


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs (training-pipeline op): exact
    integer-quantized pairwise cosine, threshold 0.40."""
    from sparkfts.ops.similarity import embedding_dup_pairs

    return embedding_dup_pairs(_emb(spark, sf_dir), threshold_e6=400_000)


def q_dedup_embedding_lsh(spark, sf_dir):
    """LSH-bucketed embedding near-dup pairs: the 100-TB-shape variant
    (intra-bucket join, NO crossJoin in the plan — round-1 VERDICT #3).
    Driver-checked against a DuckDB oracle that reproduces the integer
    LCG buckets and exact quantized cosine within buckets."""
    from sparkfts.ops.similarity import embedding_dup_pairs

    return embedding_dup_pairs(
        _emb(spark, sf_dir), threshold_e6=400_000, bucketed=True, n_planes=8
    ).orderBy("id_a", "id_b")


def q_dedup_clusters(spark, sf_dir):
    """LSH candidate pairs -> connected components -> canonical keep/drop
    sets: what a training-data pipeline actually consumes (round-1
    VERDICT gap #2)."""
    from sparkfts.ops.dedup import duplicate_clusters, lsh_star_edges

    # star edges: component-exact vs all-pairs (same clusters, same
    # oracle), linear in bucket size instead of quadratic (r4 VERDICT)
    pairs = lsh_star_edges(_docs(spark, sf_dir), n_hashes=8, bands=4)
    return duplicate_clusters(pairs)


def q_ann_cosine_topk(spark, sf_dir):
    from sparkfts.ops.similarity import cosine_topk

    emb = _emb(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return cosine_topk(emb, list(qvec), k=10)


def _ann_index_dir_for(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once, cached) the bucket-partitioned ANN index."""
    key = os.path.basename(sf_dir.rstrip("/")) or "sf"
    idx = os.path.join(REPO, ".scratch", f"entry_ann_{key}")
    if not os.path.exists(os.path.join(idx, "_annmeta.json")):
        from sparkfts.ops.similarity import write_ann_index

        write_ann_index(_emb(spark, sf_dir), idx, n_planes=8)
    return idx


def q_ann_lsh_topk(spark, sf_dir):
    """LSH-probed ANN top-k (multi-probe hamming<=1) from the MATERIALIZED
    bucket-partitioned index: the probe scan is partition-pruned instead
    of recomputing every vector's bucket per query (round-1 VERDICT #3)."""
    from sparkfts.ops.similarity import ann_index_topk

    emb = _emb(spark, sf_dir)
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0][0]
    ]
    idx = _ann_index_dir_for(spark, sf_dir)
    return ann_index_topk(spark, idx, qvec, k=10, probe_hamming=1)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-flat ANN: probe the 2 nearest centroid PARTITIONS of the
    materialized inverted-file index (deterministic sampled centroids,
    integer-L2 assignment — engine-reproducible in DuckDB)."""
    from sparkfts.ops.similarity import ivf_topk, write_ivf_index

    emb = _emb(spark, sf_dir)
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0][0]
    ]
    key = os.path.basename(sf_dir.rstrip("/")) or "sf"
    idx = os.path.join(REPO, ".scratch", f"entry_ivf_{key}")
    if not os.path.exists(os.path.join(idx, "_ivfmeta.json")):
        write_ivf_index(emb, idx, n_centroids=16)
    return ivf_topk(spark, idx, qvec, k=10, n_probe=2)


def q_ann_lsh_buckets(spark, sf_dir):
    from sparkfts.ops.similarity import lsh_bucket

    return lsh_bucket(_emb(spark, sf_dir), n_planes=8)


def q_multimodal_meta(spark, sf_dir):
    from sparkfts.ops.multimodal import media_metadata

    payloads = _docs(spark, sf_dir).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return media_metadata(payloads, "payload").select(
        "doc_id",
        F.col("media_meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("media_meta.container").alias("container"),
        F.col("media_meta.content_hash31").alias("content_hash31"),
    )


def q_multimodal_decode(spark, sf_dir):
    """Arrow decode plumbing, fully oracle-checked: the deterministic
    fake feature is pure byte arithmetic (mean of consecutive 8-byte
    chunks of the first 64 payload bytes / 255 —
    sparkfts/ops/multimodal.py:_decode_image), which DuckDB reproduces
    byte-for-byte over the utf-8 payload (testdata text is ASCII, so
    char n == byte n; both sides fold as (sum/8)/255 in float64)."""
    from sparkfts.ops.multimodal import decode_features

    payloads = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    feats = decode_features(payloads, "payload", "media_id", fake=True)
    return feats.select(
        "media_id", F.posexplode("features").alias("j", "f")
    ).select(
        "media_id",
        F.col("j").cast("int").alias("j"),
        F.floor(F.col("f") * 1_000_000 + 0.5).cast("long").alias("f_e6"),
    )


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: filtered fact-fact join with a broadcast filtered
    dimension, integer-quantized revenue, TakeOrdered top-10."""
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).where(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).where(
        F.col("l_shipdate") > F.lit("1998-01-01")
    )
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").cast("long").alias(
                "o_epoch"
            ),
        )
        .agg(F.sum(rev).alias("revenue_e2"))
        .orderBy(F.desc("revenue_e2"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: broadcast dimension chain (region -> nation) into
    customer -> orders -> lineitem, revenue per nation."""
    r = spark.read.parquet(os.path.join(sf_dir, "region.parquet")).where(
        F.col("r_name") == "ASIA"
    )
    n = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    dims = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue_e2"))
        .orderBy(F.desc("revenue_e2"), F.asc("n_name"))
    )


def q_pricing_summary(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.floor(F.col("l_quantity") * 100 + 0.5).cast("long")).alias(
                "sum_qty_e2"
            ),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            ).alias("sum_price_e2"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# round 4 wave 2: score shaping, pipeline aggs, percolate/termvectors,
# LM perplexity, sub-document dedup
# ---------------------------------------------------------------------------

DECAY_ORIGIN = 1717200000.0  # epoch of 2024-06-01 UTC
DECAY_SCALE = 5184000.0      # 60 days in seconds
DECAY_OFFSET = 864000.0      # 10 days


def q_fts_rank_feature(spark, sf_dir):
    """ES rank_feature (saturation, pivot 200) in bool.should with the
    AND match: score = BM25 + 0.7 * n_chars/(n_chars+200)."""
    from sparkfts.scoring import rank_feature_batch

    idx = _index_dir_for(spark, sf_dir)
    res = rank_feature_batch(
        spark, idx, [(0, BM25_QUERY_AND, 10)], "n_chars",
        "saturation", pivot=200.0, boost=0.7, mode="and",
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_decay_recency(spark, sf_dir):
    """ES function_score gauss decay on the synthesized crawl time
    (origin 2024-06-01, scale 60d, offset 10d, decay 0.5,
    boost_mode multiply) — the standard recency boost."""
    from sparkfts.scoring import decay_score_batch

    idx = _index_dir_for(spark, sf_dir)
    res = decay_score_batch(
        spark, idx, [(0, BM25_QUERY_AND, 10)], "crawl_epoch", "gauss",
        origin=DECAY_ORIGIN, scale=DECAY_SCALE, offset=DECAY_OFFSET,
        decay=0.5, mode="and",
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_boosting_topk(spark, sf_dir):
    """ES boosting query: positive AND match, docs also containing
    'vector' demoted by negative_boost 0.4."""
    from sparkfts.scoring import boosting_batch

    idx = _index_dir_for(spark, sf_dir)
    res = boosting_batch(
        spark, idx, [(0, BM25_QUERY_AND, "vector", 10)],
        negative_boost=0.4, mode="and",
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_constant_score(spark, sf_dir):
    """ES constant_score: every OR-match scores boost 1.5; ties pinned
    doc_id asc so the page is the 12 smallest matching ids."""
    from sparkfts.scoring import constant_score_batch

    idx = _index_dir_for(spark, sf_dir)
    res = constant_score_batch(
        spark, idx, [(0, BM25_QUERY_OR, 12)], boost=1.5, mode="or"
    )
    return res.select(
        "rank", "doc_id", _score_e4_col()
    )


def _month_buckets(spark, sf_dir):
    """Shared parent agg for the pipeline entries: monthly
    date_histogram of the OR query over the synthesized crawl_ts."""
    from sparkfts.aggs import date_histogram

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(
            "timestamp'2024-01-01 00:00:00' + "
            "make_interval(0, 0, 0, CAST(doc_id % 400 AS INT))"
        ).alias("crawl_ts"),
    )
    return date_histogram(
        spark, idx, BM25_QUERY_OR, docs, "crawl_ts",
        calendar_interval="month", mode="or",
    )


def q_pipeline_percentiles_bucket(spark, sf_dir):
    """ES sibling percentiles_bucket over the monthly doc_counts
    (exact percentile_cont interpolation — the percentiles_agg pin;
    ES documents the same linear interpolation between closest bucket
    values)."""
    from sparkfts.pipelineaggs import percentiles_bucket

    res = percentiles_bucket(
        _month_buckets(spark, sf_dir), "doc_count",
        [25.0, 50.0, 75.0, 95.0],
    )
    return res.select(
        F.floor(F.col("pct")).cast("long").alias("pct"),
        F.floor(F.col("value") * 1_000_000 + 0.5)
        .cast("long")
        .alias("value_e6"),
    )


def q_pipeline_cumulative_cardinality(spark, sf_dir):
    """ES cumulative_cardinality parent pipeline agg ("total unique
    users so far" over a daily histogram), EXACT pin: each user_id is
    attributed to its FIRST day (min bucket), per-day first-seen counts
    cumsum in bucket order — the true distinct count per prefix, where
    ES merges HLL sketches (sparkfts/pipelineaggs.py
    cumulative_cardinality; one partial-agg groupBy(user) + one bounded
    groupBy(day) + coordinator cumsum)."""
    from sparkfts.pipelineaggs import cumulative_cardinality

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    rows = ev.select(
        F.unix_timestamp(F.date_trunc("day", F.col("ts")))
        .cast("long")
        .alias("b"),
        "user_id",
    )
    res = cumulative_cardinality(rows, "b", "user_id")
    return res.select(
        F.col("bucket").alias("bucket_epoch"),
        F.col("first_seen").cast("long").alias("first_seen"),
        F.col("cumulative_cardinality").cast("long").alias("cum"),
    )


def q_pipeline_cumsum(spark, sf_dir):
    """ES cumulative_sum pipeline agg over the monthly date_histogram."""
    from sparkfts.pipelineaggs import cumulative_sum

    res = cumulative_sum(_month_buckets(spark, sf_dir), "doc_count")
    return res.select(
        F.col("bucket").cast("long").alias("bucket_epoch"),
        F.col("doc_count").cast("long").alias("doc_count"),
        F.col("cumulative_sum").cast("long").alias("cum"),
    )


def q_pipeline_derivative(spark, sf_dir):
    """ES derivative pipeline agg (first bucket omitted, as ES omits
    the field there)."""
    from sparkfts.pipelineaggs import derivative

    res = derivative(_month_buckets(spark, sf_dir), "doc_count")
    return res.where(F.col("derivative").isNotNull()).select(
        F.col("bucket").cast("long").alias("bucket_epoch"),
        F.col("derivative").cast("long").alias("deriv"),
    )


def q_pipeline_moving_avg(spark, sf_dir):
    """ES moving_fn unweightedAvg, window 3, shift 0 (current bucket
    excluded — ES default); empty-window buckets omitted."""
    from sparkfts.pipelineaggs import moving_avg

    res = moving_avg(
        _month_buckets(spark, sf_dir), "doc_count", window=3, shift=0
    )
    return res.where(F.col("moving_avg").isNotNull()).select(
        F.col("bucket").cast("long").alias("bucket_epoch"),
        F.floor(F.col("moving_avg") * 1_000_000 + 0.5)
        .cast("long")
        .alias("mavg_e6"),
    )


def q_pipeline_stats_bucket(spark, sf_dir):
    """ES sibling stats_bucket over the monthly doc_counts."""
    from sparkfts.pipelineaggs import stats_bucket

    res = stats_bucket(_month_buckets(spark, sf_dir), "doc_count")
    return res.select(
        F.col("count").cast("long").alias("n_buckets"),
        F.col("min").cast("long").alias("min_count"),
        F.col("max").cast("long").alias("max_count"),
        F.col("sum").cast("long").alias("sum_count"),
        F.floor(F.col("avg") * 1_000_000 + 0.5)
        .cast("long")
        .alias("avg_e6"),
    )


def q_pipeline_bucket_sort(spark, sf_dir):
    """ES bucket_sort: top-3 months by doc_count desc (bucket asc
    ties)."""
    from sparkfts.pipelineaggs import bucket_sort

    res = bucket_sort(
        _month_buckets(spark, sf_dir),
        [("doc_count", "desc"), ("bucket", "asc")],
        size=3,
    )
    return res.select(
        F.col("bucket").cast("long").alias("bucket_epoch"),
        F.col("doc_count").cast("long").alias("doc_count"),
    )


def q_ann_filtered_topk(spark, sf_dir):
    """ES kNN with filter (exact brute path): top-10 by cosine AMONG
    label=2 vectors — pre-filter semantics (always k hits when k
    candidates pass), not a post-filtered unfiltered page."""
    from sparkfts.ops.knnfilter import cosine_topk_filtered

    emb = _emb(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return cosine_topk_filtered(emb, list(qvec), "label = 2", k=10)


def q_ann_range_search(spark, sf_dir):
    """ES kNN similarity radius: every vector with cos_e6 >= 120000
    vs the vec_id=0 query, cos desc."""
    from sparkfts.ops.knnfilter import cosine_range_search

    emb = _emb(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return cosine_range_search(emb, list(qvec), 120000)


def q_bpe_token_counts(spark, sf_dir):
    """BPE tokenizer training + segmentation (sparkfts.ops.bpe): learn
    20 merges from the corpus word-frequency table (the one
    corpus-scale stage; pinned count-desc/pair-asc tie-break), then
    segment every doc distributed. Iterative merge training is not
    SQL-expressible, so this entry is rows-only by design (the driver
    contract's documented carve-out); the algorithm is pinned against
    an independent brute-force mirror in tests/test_bpe.py."""
    from sparkfts.ops.bpe import apply_bpe, learn_bpe

    docs = _docs(spark, sf_dir)
    merges = learn_bpe(docs, n_merges=20, max_words=5000)
    return apply_bpe(docs, merges).orderBy("doc_id")


def q_unigram_token_counts(spark, sf_dir):
    """SentencePiece-style unigram-LM tokenizer (sparkfts.ops.unigram):
    seed substrings from the pruned word-frequency table (the one
    corpus-scale stage, same shape as BPE), hard-EM piece estimation on
    the driver, distributed Viterbi segmentation. Iterative EM training
    is not SQL-expressible, so this entry is rows-only by design (like
    bpe_token_counts); the spec is pinned against enumeration mirrors
    in tests/test_unigram.py."""
    from sparkfts.ops.unigram import apply_unigram, learn_unigram

    docs = _docs(spark, sf_dir)
    vocab = learn_unigram(docs, vocab_size=500, em_iters=2,
                          max_words=5000)
    return apply_unigram(docs, vocab).orderBy("doc_id")


def q_pack_manifest(spark, sf_dir):
    """Sequence-packing manifest (concat-then-chunk, capacity 2048):
    where every doc lands in the packed token stream — a two-phase
    distributed prefix sum, never a single-partition global window
    (sparkfts.ops.packing docstring)."""
    from sparkfts.ops.packing import pack_manifest

    return pack_manifest(_docs(spark, sf_dir), capacity=2048)


def q_ann_sq8_topk(spark, sf_dir):
    """ES int8-quantized ANN (two-phase): rank all vectors by the int8
    approximate cosine, keep top-50, exact-rerank to top-10 — ES's
    default dense_vector quantization + rescore_vector shape."""
    from sparkfts.ops.similarity import ann_sq8_topk

    emb = _emb(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return ann_sq8_topk(emb, list(qvec), k=10, rescore=50)


def q_ann_pq_topk(spark, sf_dir):
    """Product-quantized ANN (ADC): 4 subspaces x 8 codewords (pinned
    id-order bootstrap, same as IVF), driver-side query-dot lookup
    tables, approximate pass touches only each vector's 4 code ints;
    top-50 re-rank exactly to top-10."""
    from sparkfts.ops.similarity import ann_pq_topk

    emb = _emb(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return ann_pq_topk(emb, list(qvec), k=10, rescore=50, m=4, ks=8)


def q_ann_ivfpq_topk(spark, sf_dir):
    """IVF-PQ composed ANN (the 10^12-vector production recipe): 8
    coarse cells bound the searched FRACTION (4 probed), residual PQ
    codes (4 x 8) bound the BYTES per searched vector; driver-side
    integer ADC tables, exact top-50 -> top-10 rescore
    (sparkfts/ops/similarity.py ann_ivfpq_topk)."""
    from sparkfts.ops.similarity import ann_ivfpq_topk

    emb = _emb(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return ann_ivfpq_topk(
        emb, list(qvec), k=10, rescore=50, n_centroids=8, m=4, ks=8,
        n_probe=4,
    )


def q_curate_funnel(spark, sf_dir):
    """End-to-end curation funnel (quality -> exact dedup -> 500-per-
    mille sample) with per-stage retention accounting — the pipeline
    composition a training-data engineer actually reports."""
    from sparkfts.ops.curate import curate_corpus, funnel_df

    docs = _docs(spark, sf_dir)
    _final, funnel = curate_corpus(
        spark, docs, quality=True, exact=True, neardup=False,
        sample_rate_per_mille=500,
    )
    return funnel_df(spark, funnel).select(
        "stage_idx", "stage", "docs_in", "docs_out"
    )


def q_fts_bool_prefix(spark, sf_dir):
    """ES match_bool_prefix 'spark jo' (search-as-you-type,
    non-positional): term clause 'spark' + prefix clause 'jo*',
    bool.should combine; prefix expansions each carry their own idf,
    best expansion wins (the engine's pinned prefix scoring)."""
    from sparkfts.prefix import match_bool_prefix_batch

    idx = _index_dir_for(spark, sf_dir)
    res = match_bool_prefix_batch(
        spark, idx, [(0, "spark jo", 10)], mode="or"
    )
    return res.select("doc_id", _score_e4_col())


def q_phrase_suggest(spark, sf_dir):
    """ES phrase suggester: 'past hast' corrected via per-slot term
    candidates (AUTO fuzz ladder) re-ranked by the pinned
    Stupid-Backoff bigram LM (sparkfts.phrasesuggest docstring)."""
    from sparkfts.phrasesuggest import build_bigram_model, suggest_phrase

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "lm")):
        build_bigram_model(_docs(spark, sf_dir), idx)
    res = suggest_phrase(
        spark, idx, "past hast", size=3, max_candidates=3
    )
    return res.select(
        "phrase",
        F.floor(F.col("score_ln") * 1_000_000 + 0.5)
        .cast("long")
        .alias("score_e6"),
        F.col("rank").cast("int").alias("rank"),
    )


def q_completion_suggest(spark, sf_dir):
    """ES completion suggester: top-5 completions of the prefix
    'the ' from weighted corpus n-gram entries (unigrams + bigrams,
    weight = occurrence count; sparkfts.complete docstring pins the
    spec this DuckDB oracle mirrors)."""
    from sparkfts.complete import complete
    from sparkfts.phrasesuggest import build_bigram_model

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "lm")):
        build_bigram_model(_docs(spark, sf_dir), idx)
    return complete(spark, idx, "the ", size=5).select(
        "entry", "weight", F.col("rank").cast("int").alias("rank")
    )


def q_fts_span_near(spark, sf_dir):
    """ES span_near in_order=false, slop=2: 'hash table' matched in
    either order within the pinned anchor window (sparkfts.spans
    docstring pins the spec the DuckDB oracle mirrors)."""
    from sparkfts.phrase import build_positions
    from sparkfts.spans import span_near_batch

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "positions")):
        build_positions(
            _docs_as_pages(_docs(spark, sf_dir)), idx, id_source="column"
        )
    res = span_near_batch(
        spark, idx, [(0, PHRASE_QUERY, 10)], slop=2, in_order=False
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_span_first(spark, sf_dir):
    """ES span_first: 'table' within the first 12 positions (tfp =
    qualifying occurrences)."""
    from sparkfts.phrase import build_positions
    from sparkfts.spans import span_first_batch

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "positions")):
        build_positions(
            _docs_as_pages(_docs(spark, sf_dir)), idx, id_source="column"
        )
    res = span_first_batch(
        spark, idx, [(0, PHRASE_QUERY.split()[0], 12, 10)]
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_span_or(spark, sf_dir):
    """ES span_or over single-term clauses: tfp = |union of member
    positions|, idf = summed member idfs (sparkfts/spans.py pin)."""
    from sparkfts.phrase import build_positions
    from sparkfts.spans import span_or_batch

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "positions")):
        build_positions(
            _docs_as_pages(_docs(spark, sf_dir)), idx, id_source="column"
        )
    res = span_or_batch(spark, idx, [(0, BM25_QUERY_OR, 10)])
    return res.select("doc_id", _score_e4_col())


def q_fts_span_not(spark, sf_dir):
    """ES span_not pre=1 post=1: include occurrences with no exclude
    occurrence in [p-1, p+1] (sparkfts/spans.py pin)."""
    from sparkfts.phrase import build_positions
    from sparkfts.spans import span_not_batch

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "positions")):
        build_positions(
            _docs_as_pages(_docs(spark, sf_dir)), idx, id_source="column"
        )
    inc, exc = PHRASE_QUERY.split()[:2]
    res = span_not_batch(spark, idx, [(0, inc, exc, 10)], pre=1, post=1)
    return res.select("doc_id", _score_e4_col())


def q_fts_span_containing(spark, sf_dir):
    """ES span_containing slop=3: unordered big-window anchors whose
    window also holds the little term (sparkfts/spans.py pin)."""
    from sparkfts.phrase import build_positions
    from sparkfts.spans import span_containing_batch

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "positions")):
        build_positions(
            _docs_as_pages(_docs(spark, sf_dir)), idx, id_source="column"
        )
    res = span_containing_batch(
        spark, idx, [(0, PHRASE_QUERY, "spark", 10)], slop=3
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_span_within(spark, sf_dir):
    """ES span_within slop=3: little-term occurrences covered by a
    qualifying unordered big window; scored as the little query
    (sparkfts/spans.py pin)."""
    from sparkfts.phrase import build_positions
    from sparkfts.spans import span_within_batch

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "positions")):
        build_positions(
            _docs_as_pages(_docs(spark, sf_dir)), idx, id_source="column"
        )
    res = span_within_batch(
        spark, idx, [(0, PHRASE_QUERY, "spark", 10)], slop=3
    )
    return res.select("doc_id", _score_e4_col())


def q_extended_stats_agg(spark, sf_dir):
    """ES extended_stats over the OR match set: + sum_of_squares and
    the pinned moment-formula population variance/std."""
    from sparkfts.aggs import extended_stats_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    res = extended_stats_agg(
        spark, idx, BM25_QUERY_OR, docs.select("doc_id", "n_chars"),
        "n_chars", mode="or",
    )
    return res.select(
        F.col("count").cast("long").alias("n"),
        F.col("min").cast("long").alias("min_chars"),
        F.col("max").cast("long").alias("max_chars"),
        F.col("sum").cast("long").alias("sum_chars"),
        F.col("sum_of_squares").cast("long").alias("sumsq"),
        F.floor(F.col("variance") * 10_000 + 0.5)
        .cast("long")
        .alias("var_e4"),
        F.floor(F.col("std_deviation") * 10_000 + 0.5)
        .cast("long")
        .alias("std_e4"),
    )


def q_weighted_avg_agg(spark, sf_dir):
    """ES weighted_avg of n_chars weighted by the deterministic
    wt = doc_id % 7 + 1."""
    from sparkfts.aggs import weighted_avg_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir).select(
        "doc_id", "n_chars",
        (F.col("doc_id") % 7 + 1).cast("long").alias("wt"),
    )
    res = weighted_avg_agg(
        spark, idx, BM25_QUERY_OR, docs, "n_chars", "wt", mode="or"
    )
    return res.select(
        F.floor(F.col("value") * 1_000_000 + 0.5)
        .cast("long")
        .alias("wavg_e6")
    )


def q_top_metrics_agg(spark, sf_dir):
    """ES top_metrics: n_chars of the 5 matched docs with the largest
    wt (ties doc_id asc)."""
    from sparkfts.aggs import top_metrics_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir).select(
        "doc_id", "n_chars",
        (F.col("doc_id") % 7 + 1).cast("long").alias("wt"),
    )
    res = top_metrics_agg(
        spark, idx, BM25_QUERY_OR, docs, "n_chars", "wt",
        ascending=False, size=5, mode="or",
    )
    return res.select(
        F.col("sort_value").cast("long").alias("sort_value"),
        F.col("n_chars").cast("long").alias("n_chars"),
        "doc_id",
    )


def q_date_range_agg(spark, sf_dir):
    """ES date_range over the synthesized crawl_ts (from inclusive,
    to exclusive, zero-count ranges reported in request order)."""
    from sparkfts.aggs import date_range_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(
            "timestamp'2024-01-01 00:00:00' + "
            "make_interval(0, 0, 0, CAST(doc_id % 400 AS INT))"
        ).alias("crawl_ts"),
    )
    ranges = [
        ("q1", None, "2024-04-01 00:00:00"),
        ("q2", "2024-04-01 00:00:00", "2024-07-01 00:00:00"),
        ("h2", "2024-07-01 00:00:00", "2025-01-01 00:00:00"),
        ("y25", "2025-01-01 00:00:00", None),
    ]
    res = date_range_agg(
        spark, idx, BM25_QUERY_OR, docs, "crawl_ts", ranges, mode="or"
    )
    return res.select("key", F.col("doc_count").cast("long").alias("doc_count"))


def q_adjacency_matrix_agg(spark, sf_dir):
    """ES adjacency_matrix over lang/source/length predicates: singles
    + pairwise intersections, empty buckets omitted, key asc."""
    from sparkfts.aggs import adjacency_matrix_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang", "source", "n_chars"
    )
    filters = [
        ("en", "lang = 'en'"),
        ("s0", "source = 'src0'"),
        ("long", "n_chars >= 300"),
    ]
    res = adjacency_matrix_agg(
        spark, idx, BM25_QUERY_OR, docs, filters, mode="or"
    )
    return res.select(
        "key", F.col("doc_count").cast("long").alias("doc_count")
    )


PERCOLATE_QUERIES = [
    (1, BM25_QUERY_AND, "and"),
    (2, "spark vector", "or"),
    (3, BM25_QUERY_OR, "msm:2"),
]


def q_percolate_matches(spark, sf_dir):
    """ES percolator: which registered queries match each document
    (broadcast query-term table, one join + grouped count)."""
    from sparkfts.percolate import percolate

    docs = _docs(spark, sf_dir)
    return percolate(spark, docs, PERCOLATE_QUERIES).select(
        "doc_id", "query_id"
    )


def q_termvectors(spark, sf_dir):
    """ES _termvectors with term_statistics for docs 0-2: per-term
    in-doc tf, doclen, corpus df and total term frequency."""
    from sparkfts.termvectors import termvectors

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    return termvectors(
        spark, idx, docs, [0, 1, 2], term_statistics=True
    ).select(
        "doc_id",
        "term",
        F.col("term_freq").cast("long").alias("term_freq"),
        F.col("doclen").cast("long").alias("doclen"),
        F.col("doc_freq").cast("long").alias("doc_freq"),
        F.col("ttf").cast("long").alias("ttf"),
    )


def q_unigram_logppl(spark, sf_dir):
    """Unigram-LM cross-entropy per doc (self-trained, add-1
    smoothing) — the CCNet/Gopher perplexity-filter shape."""
    from sparkfts.ops.lm import unigram_cross_entropy

    docs = _docs(spark, sf_dir)
    res = unigram_cross_entropy(docs, alpha=1.0)
    return res.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(F.col("h") * 1_000_000 + 0.5).cast("long").alias("h_e6"),
    )


def q_chunk_dedup_stats(spark, sf_dir):
    """Sub-document dedup accounting: 10-token chunks, global
    first-occurrence winners (doc_id asc, chunk_idx asc)."""
    from sparkfts.ops.chunkdedup import chunk_dedup_stats

    docs = _docs(spark, sf_dir)
    res = chunk_dedup_stats(docs, chunk_tokens=10)
    return res.select(
        "doc_id",
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
    )


def q_dup_ngram_coverage(spark, sf_dir):
    """Duplicated-span score: fraction of each doc's distinct 5-grams
    occurring in >= 2 docs (Lee et al. boilerplate signal)."""
    from sparkfts.ops.chunkdedup import dup_ngram_coverage

    docs = _docs(spark, sf_dir)
    res = dup_ngram_coverage(docs, n=5)
    return res.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_dup").cast("long").alias("n_dup"),
    )


def q_children_agg(spark, sf_dir):
    """ES `children` AGGREGATION (join field): switch scope from the
    matching parent orders (o_orderstatus='F', o_totalprice>150000) to
    their lineitem children, then a terms sub-agg on l_returnflag with
    doc_count + summed quantity (sparkfts/parentjoin.py children_scope:
    filtered DISTINCT parent keys semi-joined into the child scan — the
    ES routed-shard colocation expressed as a co-partitioned semi
    join)."""
    from sparkfts.parentjoin import children_scope

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    scope = children_scope(
        o, li, "o_orderkey", "l_orderkey",
        "o_orderstatus = 'F' AND o_totalprice > 150000",
    )
    return (
        scope.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_count"),
            F.floor(F.sum("l_quantity") + F.lit(0.5))
            .cast("long")
            .alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


def q_parent_agg(spark, sf_dir):
    """ES `parent` AGGREGATION (the `children` inverse): the DISTINCT
    parent orders having at least one returned lineitem child
    (l_returnflag='R'), each counted once regardless of child
    multiplicity, then a terms sub-agg on o_orderstatus with doc_count
    + avg total price (parentjoin.parent_scope: distinct child keys
    semi-joined into the parent scan)."""
    from sparkfts.parentjoin import parent_scope

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    scope = parent_scope(
        o, li, "o_orderkey", "l_orderkey", "l_returnflag = 'R'"
    )
    return (
        scope.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_count"),
            F.floor(F.avg("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("avg_price_e2"),
        )
        .orderBy("o_orderstatus")
    )


def q_has_child_topk(spark, sf_dir):
    """ES has_child (join field): top-10 orders by SUMMED score of
    their matching lineitem children (l_returnflag='R', quantity>=30),
    min_children=2. Child side folds to one row per parent key BEFORE
    the join exchange (sparkfts/parentjoin.py). Per-child score is
    pre-quantized to e2 integers so the double sum is exact
    cross-engine."""
    from sparkfts.parentjoin import has_child

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    res = has_child(
        o, li, "o_orderkey", "l_orderkey",
        "l_returnflag = 'R' AND l_quantity >= 30",
        score_mode="sum",
        score_expr="floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)",
        min_children=2,
    )
    return (
        res.select(
            "o_orderkey",
            F.col("child_count").cast("long").alias("child_count"),
            F.col("score").cast("long").alias("score_e2"),
        )
        .orderBy(F.desc("score_e2"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_has_parent_topk(spark, sf_dir):
    """ES has_parent with score=true: lineitems of URGENT high-value
    orders, each child carrying its PARENT's score (o_totalprice).
    Parent side is filtered + projected to (key, score) before the
    join — broadcastable."""
    from sparkfts.parentjoin import has_parent

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    res = has_parent(
        o, li, "o_orderkey", "l_orderkey",
        "o_orderpriority = '1-URGENT' AND o_totalprice >= 150000",
        score=True, score_expr="o_totalprice",
    )
    return (
        res.select(
            "l_orderkey",
            F.col("l_linenumber").cast("int").alias("l_linenumber"),
            F.floor(F.col("score") * 100 + 0.5).cast("long").alias(
                "score_e2"
            ),
        )
        .orderBy(
            F.desc("score_e2"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
        .limit(20)
    )


def q_has_child_inner_hits(spark, sf_dir):
    """ES inner_hits: top-5 parents by summed child score, each with
    its top-2 matching children. Child ranks use a window PARTITIONED
    by parent key; the parent top-k is a distributed TakeOrdered, so
    no unbounded single-task sort anywhere."""
    from sparkfts.parentjoin import has_child_inner_hits

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    res = has_child_inner_hits(
        o, li, "o_orderkey", "l_orderkey",
        "l_returnflag = 'R'",
        score_expr="floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)",
        n_parents=5, n_hits=2, child_tiebreak="l_linenumber",
    )
    return res.select(
        F.col("parent_rank").cast("int").alias("parent_rank"),
        F.col("o_orderkey"),
        F.col("parent_score").cast("long").alias("pscore_e2"),
        F.col("hit_rank").cast("int").alias("hit_rank"),
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        F.col("o_orderpriority"),
    )


# --- geo family -------------------------------------------------------
# Deterministic geo_point per doc: pure int64 LCG + one IEEE division,
# bit-identical cross-engine (the repo's integer-kernel convention for
# anything pseudo-random). lat in [-80, 80], lon in [-180, 180].
def _geo_lat_col() -> F.Column:
    return (
        (F.col("doc_id") * 1103515245 + 12345) % 160000001 - 80000000
    ) / 1000000.0


def _geo_lon_col() -> F.Column:
    return ((F.col("doc_id") * 2654435761 + 98765) % 360000001 - 180000000) / 1000000.0


_GEO_LAT_SQL = (
    "((doc_id * 1103515245 + 12345) % 160000001 - 80000000) / 1000000.0"
)
_GEO_LON_SQL = "((doc_id * 2654435761 + 98765) % 360000001 - 180000000) / 1000000.0"


def _geo_docs(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", _geo_lat_col().alias("lat"), _geo_lon_col().alias("lon")
    )


def q_geo_distance_topk(spark, sf_dir):
    """ES geo_distance query + _geo_distance sort: the 15 docs nearest
    (48.85, 2.35) within 3000 km, haversine metres on the ES mean-radius
    sphere, distance quantized to decimetres (cross-engine 1-ulp trig
    slack; sparkfts/geo.py docstring)."""
    from sparkfts.geo import geo_distance, geo_distance_sort

    pts = _geo_docs(spark, sf_dir)
    hits = geo_distance(pts, "lat", "lon", 48.85, 2.35, 3_000_000.0)
    res = geo_distance_sort(
        hits, "lat", "lon", 48.85, 2.35, k=15, tiebreak="doc_id",
        distance_alias="d2",
    )
    return res.select(
        "doc_id",
        F.floor(F.col("distance_m") * 10 + 0.5).cast("long").alias(
            "dist_e1"
        ),
    )


def q_geo_bbox(spark, sf_dir):
    """ES geo_bounding_box (inclusive edges) over an antimeridian-
    crossing box — pure comparisons, exact cross-engine."""
    from sparkfts.geo import geo_bounding_box

    pts = _geo_docs(spark, sf_dir)
    res = geo_bounding_box(
        pts, "lat", "lon", top=70.0, left=150.0, bottom=-20.0,
        right=-120.0,
    )
    return res.select(
        "doc_id",
        F.floor(F.col("lat") * 1000000 + 0.5).cast("long").alias("lat_e6"),
        F.floor(F.col("lon") * 1000000 + 0.5).cast("long").alias("lon_e6"),
    )


def q_geotile_grid(spark, sf_dir):
    """ES geotile_grid agg at zoom 4: web-mercator slippy-tile doc
    counts, count desc then key asc — one partially-aggregated groupBy
    keyed on <= 256 tiles."""
    from sparkfts.geo import geotile_grid

    pts = _geo_docs(spark, sf_dir)
    return geotile_grid(pts, "lat", "lon", zoom=4)


def q_geo_distance_rings(spark, sf_dir):
    """ES geo_distance agg: half-open [from, to) metre rings around
    (0, 0); N conditional sums in ONE pass, a scalar row per ring
    crosses the exchange."""
    from sparkfts.geo import geo_distance_agg

    pts = _geo_docs(spark, sf_dir)
    res = geo_distance_agg(
        pts, "lat", "lon", 0.0, 0.0,
        [(None, 3e6), (3e6, 8e6), (8e6, 14e6), (14e6, None)],
    )
    return res.select("ring_idx", "doc_count")


def q_runtime_field_topk(spark, sf_dir):
    """ES runtime field (runtime_mappings) used as a sort key: script
    ``log1p(n_chars) * 10 - doc_id / 1000`` compiled to a Catalyst
    Column (sparkfts.scripting.compile_script_column) — filters/sorts
    plan exactly like a stored field, zero Python in the row path."""
    from sparkfts.scripting import runtime_field

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    rt = runtime_field(docs, "rt", "log1p(n_chars) * 10 - doc_id / 1000")
    return (
        rt.where("rt > 50")
        .orderBy(F.desc("rt"), F.asc("doc_id"))
        .limit(12)
        .select(
            "doc_id",
            F.floor(F.col("rt") * 1000000 + 0.5).cast("long").alias(
                "rt_e6"
            ),
        )
    )


def q_runtime_field_agg(spark, sf_dir):
    """ES runtime field consumed by an aggregation: per-``source``
    count + sum of the per-row-quantized runtime value (integer sum —
    exact cross-engine)."""
    from sparkfts.scripting import runtime_field

    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    rt = runtime_field(docs, "rt", "sqrt(n_chars) + doc_id / 100000")
    q = F.floor(F.col("rt") * 10000 + 0.5).cast("long")
    return (
        rt.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_count"),
            F.sum(q).cast("long").alias("rt_sum_e4"),
        )
        .orderBy("source")
    )


def q_multi_terms_agg(spark, sf_dir):
    """ES multi_terms aggregation: (lang, source) tuple buckets over
    the full OR-match set, key_as_string = values joined by '|', count
    desc then key asc — one partially-aggregated composite-key groupBy
    (sparkfts/aggs.py multi_terms_agg)."""
    from sparkfts.aggs import multi_terms_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    res = multi_terms_agg(
        spark, idx, BM25_QUERY_OR, docs.select("doc_id", "lang", "source"),
        ["lang", "source"], mode="or", size=15,
    )
    return res.select("key", F.col("doc_count").cast("long").alias(
        "doc_count"))


def q_ann_bbq_topk(spark, sf_dir):
    """ES BBQ (binary-quantized) ANN: sign bits packed to int64 words,
    phase-1 rank = popcount(xor) hamming (32x less memory traffic than
    float32 — ES's default for large vector indexes), top-50 re-ranked
    exactly to top-10 (rescore_vector)."""
    from sparkfts.ops.similarity import ann_bbq_topk

    emb = _emb(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return ann_bbq_topk(emb, list(qvec), k=10, rescore=50)


def q_dedup_incremental(spark, sf_dir):
    """Incremental near-dup: new snapshot (doc_id %% 3 != 0) LSH-matched
    against the reference corpus (doc_id %% 3 == 0) — join is strictly
    NEW x REF on (band, band_key); adding a snapshot never re-pairs the
    reference with itself (sparkfts/ops/dedup.py dedup_against)."""
    from sparkfts.ops.dedup import dedup_against

    docs = _docs(spark, sf_dir)
    ref = docs.where(F.col("doc_id") % 3 == 0)
    new = docs.where(F.col("doc_id") % 3 != 0)
    return dedup_against(new, ref)


def q_ingest_pipeline(spark, sf_dir):
    """ES ingest pipeline (set/rename/lowercase/gsub/convert chain)
    compiled to ONE Catalyst projection (sparkfts/ingest.py) — vowels
    stripped via gsub, source renamed, constant field set."""
    from sparkfts.ingest import apply_pipeline

    docs = _docs(spark, sf_dir).select(
        "doc_id", "text", "lang", "source"
    )
    out = apply_pipeline(
        docs,
        [
            {"set": {"field": "stripped", "copy_from": "text"}},
            {"gsub": {"field": "stripped", "pattern": "[aeiou]",
                      "replacement": ""}},
            {"rename": {"field": "source", "target_field": "origin"}},
            {"lowercase": {"field": "lang"}},
            {"set": {"field": "corpus", "value": "web"}},
        ],
    )
    return out.select(
        "doc_id", "lang", "origin", "corpus",
        (F.length("text") - F.length("stripped")).cast("long").alias(
            "n_vowels"
        ),
    )


def q_sorted_index_topk(spark, sf_dir):
    """ES index.sort + early termination (track_total_hits=false):
    top-15 'en' docs by n_chars desc from the sort sidecar — each scan
    split stops consuming Arrow batches after k surviving rows, so I/O
    is O(k) per split regardless of corpus size
    (sparkfts/sortedindex.py; bounded-read proof in
    tests/test_sortedindex.py)."""
    from sparkfts.sortedindex import sorted_topk, write_sorted_docvalues

    idx = _index_dir_for(spark, sf_dir)
    from sparkfts.sortedindex import SORT_META, _sidecar_dir

    if not os.path.isfile(os.path.join(_sidecar_dir(idx, "n_chars"),
                                       SORT_META)):
        write_sorted_docvalues(spark, idx, "n_chars", ascending=False)
    res = sorted_topk(spark, idx, "n_chars", k=15,
                      filter_expr="lang = 'en'")
    return res.select(
        "rank", "doc_id",
        F.col("sort_value").cast("long").alias("n_chars"),
    )


def _orders_items(spark, sf_dir):
    """orders with a nested items array<struct> (the ES nested field)."""
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    items = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.collect_list(
            F.struct(
                F.col("l_quantity").alias("qty"),
                F.col("l_extendedprice").alias("price"),
                F.col("l_returnflag").alias("flag"),
            )
        ).alias("items")
    )
    return o.join(items, "o_orderkey").withColumnRenamed(
        "o_orderkey", "doc_id"
    )


def q_nested_query_topk(spark, sf_dir):
    """ES nested query + score_mode=sum: orders where ONE item has
    qty>=45 AND flag='R' (per-element independence — no cross-matching),
    scored by the sum of matching items' integer-quantized qty*price.
    Pure Catalyst higher-order functions; no explode, no Python
    (sparkfts/nested.py)."""
    from sparkfts.nested import nested_match_count, nested_score

    df = _orders_items(spark, sf_dir)
    pred = "_n.qty >= 45 AND _n.flag = 'R'"
    res = nested_score(
        df, "items", pred,
        "floor(_n.price * _n.qty * 100 + 0.5)", score_mode="sum",
    )
    return (
        res.select(
            F.col("doc_id").alias("o_orderkey"),
            nested_match_count("items", pred).cast("int").alias(
                "n_matched"
            ),
            F.col("score").cast("long").alias("score_e2"),
        )
        .orderBy(F.desc("score_e2"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_nested_reverse_agg(spark, sf_dir):
    """ES nested agg + reverse_nested: flag buckets counting PARENT
    orders (distinct-parent partial agg after one explode)."""
    from sparkfts.nested import nested_terms_agg

    df = _orders_items(spark, sf_dir)
    return nested_terms_agg(
        df, "items", "flag", reverse_nested=True, size=10
    ).select("value", F.col("doc_count").cast("long").alias("doc_count"))


def q_mixture_sample(spark, sf_dir):
    """Pretraining domain mixing: per-lang keep rates hitting a target
    token mix (plan = ONE bounded groupBy + driver-free arithmetic),
    applied via the engine-reproducible integer-LCG hash; output = per
    group plan + achieved counts (sparkfts/ops/mixing.py)."""
    from sparkfts.ops.mixing import apply_mixture, mixture_plan

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    weights = {"en": 0.4, "de": 0.3, "fr": 0.3}
    plan = mixture_plan(
        docs, weights, token_budget=30000, group_col="lang",
        token_col="n_chars",
    )
    kept = apply_mixture(docs, plan, group_col="lang")
    achieved = kept.groupBy(F.col("lang").alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("kept_docs"),
        F.sum("n_chars").cast("long").alias("kept_chars"),
    )
    return (
        plan.join(achieved, "group", "left")
        .na.fill({"kept_docs": 0, "kept_chars": 0})
        .select(
            "group",
            F.col("tokens_available").cast("long").alias("avail"),
            F.col("keep_permille").cast("long").alias("keep_permille"),
            F.col("kept_docs").cast("long").alias("kept_docs"),
            F.col("kept_chars").cast("long").alias("kept_chars"),
        )
        .orderBy("group")
    )


INTERVALS_PHRASE_2 = "merge group"  # df=45 at sf0.01 (second branch)


def q_fts_intervals(spark, sf_dir):
    """ES intervals query: any_of of two ordered matches (max_gaps=0)
    — the grammar layer lowers onto the pinned phrase kernel; any_of =
    best-alternative (dis_max containment argument keeps per-branch
    top-k sound; sparkfts/intervals.py)."""
    from sparkfts.intervals import intervals_topk_batch
    from sparkfts.phrase import build_positions

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "positions")):
        build_positions(
            _docs_as_pages(_docs(spark, sf_dir)), idx, id_source="column"
        )
    body = {"any_of": {"intervals": [
        {"match": {"query": PHRASE_QUERY, "ordered": True,
                   "max_gaps": 0}},
        {"match": {"query": INTERVALS_PHRASE_2, "ordered": True,
                   "max_gaps": 0}},
    ]}}
    res = intervals_topk_batch(spark, idx, [(0, body, 10)])
    return res.select("doc_id", _score_e4_col())


def q_sparse_vector_topk(spark, sf_dir):
    """ES sparse_vector (ELSER-style learned-sparse) retrieval: exact
    integer dot product between the query's term-weight map and stored
    per-doc sparse vectors (deterministic tf top-16 stand-in); one
    term-pruned join + partial-agg sum + TakeOrdered
    (sparkfts/sparsevec.py)."""
    from sparkfts.sparsevec import (
        sparse_vector_topk,
        tf_sparse_vectors,
        write_sparse_index,
    )

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "sparse")):
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        write_sparse_index(tf_sparse_vectors(docs, top_m=16), idx,
                           n_tbuckets=8)
    return sparse_vector_topk(
        spark, idx, {"spark": 2.0, "join": 1.0, "vector": 0.5}, k=10,
        n_tbuckets=8,
    )


def q_hybrid_linear_topk(spark, sf_dir):
    """ES linear retriever: BM25 + cosine legs, per-leg MIN-MAX
    normalization over the retrieved depth-100 candidates, weighted
    sum (lex 1.0, vec 2.0) — the fuse touches only leg outputs
    (sparkfts/hybrid.py linear_fuse)."""
    from sparkfts.hybrid import hybrid_linear_topk

    idx = _index_dir_for(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    res = hybrid_linear_topk(
        spark, idx, emb, [(0, BM25_QUERY_OR, list(qvec))], k=10,
        depth=100, weights=(1.0, 2.0),
    )
    return res.select(
        "rank", "doc_id",
        F.floor(F.col("score") * 1_000_000_000 + 0.5).cast("long")
        .alias("score_e9"),
    )


DATEMATH_NOW = "2024-01-20 12:00:00"  # pinned 'now' (engine never
                                       # reads the wall clock)


def q_date_math_range(spark, sf_dir):
    """ES range query with date-math bounds (gte: now-7d/d, lte: now/d —
    lte rounds UP to the next day start, ES's last-instant semantics):
    bounds resolve driver-side to literal timestamps, so the parquet
    scan min/max-prunes (sparkfts/datemath.py)."""
    from datetime import datetime

    from sparkfts.datemath import date_range_filter

    ev = _events(spark, sf_dir)
    now = datetime.fromisoformat(DATEMATH_NOW)
    out = date_range_filter(ev, "ts", "now-7d/d", None, now=now,
                            lte="now/d")
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("doc_count"),
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias(
            "value_sum_e2"
        ),
    ).orderBy("event_type")


def q_quality_clf_scores(spark, sf_dir):
    """Model-based quality filter (the FineWeb-Edu / CCNet classifier
    stage): linear classifier over hashed bag-of-words features
    (fastText shape — mean-pooled hashed tokens -> sigmoid), pinned
    deterministic weights so the whole scoring plan is oracle-checked
    (sparkfts/ops/qualityclf.py; training is train_logreg, property-
    tested). Plan: explode -> md5-bucket -> broadcast weight join ->
    one partial-agg groupBy(doc_id)."""
    from sparkfts.ops.qualityclf import clf_scores, pinned_weights

    docs = _docs(spark, sf_dir)
    res = clf_scores(docs, pinned_weights(64), intercept=0.1)
    return res.select(
        "doc_id",
        F.floor(F.col("prob") * 10_000 + 0.5).cast("long").alias("prob_e4"),
        F.col("kept").cast("boolean").alias("kept"),
    ).orderBy("doc_id")


def q_fts_dsl_aggs(spark, sf_dir):
    """ES query + aggs in ONE request body (round 5,
    esdsl.run_request): bool.should over three terms with a terms agg
    on lang and a stats agg on n_chars — aggregations computed over
    the COMPLETE match set (bool_matches_batch), never the hits page;
    entry returns terms buckets x the stats row."""
    from sparkfts.esdsl import run_request

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    body = {
        "size": 5,
        "query": {"bool": {"should": [
            {"match": {"text": {"query": t, "operator": "and",
                                "fuzziness": 0}}}
            for t in ("spark", "join", "vector")
        ]}},
        "aggs": {
            "by_lang": {"terms": {"field": "lang", "size": 10}},
            "chars": {"stats": {"field": "n_chars"}},
        },
    }
    out = run_request(
        spark, idx, body,
        doc_values=docs.select("doc_id", "lang", "n_chars"),
    )
    terms = out["aggregations"]["by_lang"].select(
        "key", F.col("doc_count").cast("long").alias("doc_count")
    )
    st = out["aggregations"]["chars"].select(
        F.col("count").cast("long").alias("n"),
        F.floor(F.col("avg") * 100 + 0.5).cast("long").alias("avg_chars_e2"),
    )
    return terms.crossJoin(st)


def q_quality_quantile_filter(spark, sf_dir):
    """Adaptive per-language quality gate: keep docs at or above their
    language's exact 30th-percentile n_chars (fixed global cutoffs
    over-filter low-resource languages; per-group percentile is the
    published recipe). One bounded percentile agg + broadcast join
    (sparkfts/ops/textstats.py quality_quantile_filter)."""
    from sparkfts.ops.textstats import quality_quantile_filter

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    out = quality_quantile_filter(docs, "n_chars", "lang", q=0.3)
    return out.select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"),
        F.floor(F.col("q_threshold") * 10000 + 0.5).cast("long").alias(
            "thr_e4"
        ),
    )


def q_fts_distance_feature(spark, sf_dir):
    """ES distance_feature (numeric form): final = _score + boost *
    pivot/(pivot + |value - origin|) — recency/proximity boost that
    ADDS to relevance (unlike decay, which multiplies); lowered onto
    the pinned script kernel (sparkfts/docvalues.py)."""
    from sparkfts.docvalues import distance_feature_batch

    idx = _index_dir_for(spark, sf_dir)
    res = distance_feature_batch(
        spark, idx, [(0, BM25_QUERY_OR, 10)], "n_chars",
        origin=500.0, pivot=200.0, boost=0.8, mode="or",
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_random_score(spark, sf_dir):
    """ES function_score random_score with a seed: deterministic
    pseudo-random order over the match set (integer-LCG on doc_id —
    pure int64 JVM arithmetic; the standard unbiased-sampling /
    A-B-bucketing query)."""
    from sparkfts.docvalues import random_score_batch

    res = random_score_batch(
        spark, _index_dir_for(spark, sf_dir),
        [(0, BM25_QUERY_OR, 10)], seed=7, mode="or",
    )
    return res.select(
        "rank", "doc_id",
        F.floor(F.col("score") * 1_000_000_000 + 0.5).cast("long")
        .alias("score_e9"),
    )


def q_fts_pinned(spark, sf_dir):
    """ES pinned query (promoted results): doc ids 7 and 3 rank first
    in given order (synthetic descending scores above every organic
    score), organic BM25 minus the pins fills the page
    (sparkfts/query.py pinned_topk_batch)."""
    from sparkfts.query import pinned_topk_batch

    idx = _index_dir_for(spark, sf_dir)
    res = pinned_topk_batch(
        spark, idx, [(0, BM25_QUERY_OR, 10)], {0: [7, 3]}, mode="or"
    )
    return res.select(
        "rank", "doc_id",
        F.floor(F.col("score") * 10000 + 0.5).cast("long").alias(
            "score_e4"
        ),
    )


def q_boxplot_agg(spark, sf_dir):
    """ES boxplot aggregation (exact pin): quartiles via exact
    linear-interpolated percentiles + ES whiskers (nearest actual
    values inside 1.5*IQR fences) over the OR match set."""
    from sparkfts.aggs import boxplot_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    res = boxplot_agg(
        spark, idx, BM25_QUERY_OR, docs.select("doc_id", "n_chars"),
        "n_chars", mode="or",
    )
    e4 = lambda c: F.floor(F.col(c) * 10000 + 0.5).cast("long").alias(
        c + "_e4"
    )
    return res.select(
        F.col("min_v").cast("long").alias("min_v"),
        e4("q1"), e4("q2"), e4("q3"),
        F.col("max_v").cast("long").alias("max_v"),
        F.col("lower").cast("long").alias("lower"),
        F.col("upper").cast("long").alias("upper"),
    )


def q_t_test_agg(spark, sf_dir):
    """ES t_test aggregation (Welch's, ES default): even vs odd doc_id
    halves of the match set on n_chars — six conditional EXACT-int64
    sums in one pass, t derived from identical integers cross-engine."""
    from sparkfts.aggs import t_test_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    res = t_test_agg(
        spark, idx, BM25_QUERY_OR, docs.select("doc_id", "n_chars"),
        "n_chars", "doc_id % 2 = 0", mode="or",
    )
    return res.select(
        "n_a", "n_b",
        F.floor(F.col("mean_a") * 10000 + 0.5).cast("long").alias(
            "mean_a_e4"
        ),
        F.floor(F.col("mean_b") * 10000 + 0.5).cast("long").alias(
            "mean_b_e4"
        ),
        F.floor(F.col("t_value") * 1000000 + 0.5).cast("long").alias(
            "t_e6"
        ),
    )


def q_knn_join_lsh(spark, sf_dir):
    """kNN JOIN (SemDeDup / embedding-decontamination shape): each
    vector's top-2 nearest among LSH-bucket candidates (3 planes,
    self-pairs excluded) — per-bucket joins only, per-left-key window
    (sparkfts/ops/knnjoin.py)."""
    from sparkfts.ops.knnjoin import knn_join

    emb = _emb(spark, sf_dir)
    return knn_join(emb, emb, k=2, method="lsh", n_planes=3)


def q_semdedup(spark, sf_dir):
    """SemDeDup: embedding-level semantic dedup — LSH-bucketed pairs at
    cos >= 0.99 -> path-doubled connected components -> canonical
    keep-set; singletons restored (sparkfts/ops/knnjoin.py)."""
    from sparkfts.ops.knnjoin import semdedup

    emb = _emb(spark, sf_dir)
    return semdedup(emb, threshold_e6=990_000, n_planes=3)


def q_tfidf_keywords(spark, sf_dir):
    """Per-doc tf-idf keyword extraction: top-3 terms per document by
    tf * pinned idf (doc tagging / topic seeds; one tf groupBy + df
    lookup + per-doc window — sparkfts/ops/keywords.py). Restricted to
    the first 50 docs for a bounded entry."""
    from sparkfts.ops.keywords import tfidf_keywords

    docs = _docs(spark, sf_dir)
    res = tfidf_keywords(docs, k=3)
    return res.where(F.col("doc_id") < 50)


def q_collocations(spark, sf_dir):
    """Corpus bigram collocations: top-25 adjacent bigrams by exact
    count (min_count=5) with PMI reported — ordering never touches a
    float (sparkfts/ops/keywords.py)."""
    from sparkfts.ops.keywords import collocations

    return collocations(_docs(spark, sf_dir), min_count=5, size=25)


def q_maxsim_topk(spark, sf_dir):
    """Late-interaction (ColBERT / ES rank_vectors) MaxSim: docs as 4
    token vectors (64-dim embedding sliced 4x16), query = doc 0's token
    vectors; score = sum over query tokens of the best doc-token dot —
    exact e3 integer arithmetic, rowwise Catalyst HOFs, no explode
    (sparkfts/ops/lateinteraction.py)."""
    from sparkfts.ops.lateinteraction import (
        maxsim_topk,
        split_token_vectors,
    )

    emb = _emb(spark, sf_dir)
    docs = split_token_vectors(emb, n_tokens=4)
    q = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    qvecs = [list(q[i * 16:(i + 1) * 16]) for i in range(4)]
    return maxsim_topk(docs, qvecs, k=10)


# Driver-attestation rotation (see ROTATION.md): the driver's CORRECTNESS_r0N
# artifact records only the FIRST 50 keys of queries().  Rounds 1-4 therefore
# attested the same head over and over (81 distinct entries across r1-r4)
# while everything appended later was only ever judge/self-verified via
# tools/check_oracle.py.  Round 5 rotates the window: ~10 flagship invariants
# stay pinned at the head, and the remaining ~40 slots are filled with entries
# that have NEVER appeared in any CORRECTNESS_r0N.json.  Every entry remains
# in the registry (full dict below); only the iteration order changes.
def q_string_stats_agg(spark, sf_dir):
    """ES string_stats aggregation over the OR match set's text field:
    value count, min/max/avg character lengths, and Shannon entropy
    (base 2) of the character distribution — the flatMap-into-bounded-
    histogram plan (sparkfts/aggs.py string_stats_agg)."""
    from sparkfts.aggs import string_stats_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    res = string_stats_agg(
        spark, idx, BM25_QUERY_OR, docs.select("doc_id", "text"),
        "text", mode="or",
    )
    return res.select(
        F.col("count").cast("long").alias("n"),
        F.col("min_length").cast("long").alias("min_length"),
        F.col("max_length").cast("long").alias("max_length"),
        F.floor(F.col("avg_length") * 10000 + 0.5).cast("long")
        .alias("avg_len_e4"),
        F.floor(F.col("entropy") * 10000 + 0.5).cast("long")
        .alias("entropy_e4"),
    )


def q_mad_agg(spark, sf_dir):
    """ES median_absolute_deviation (exact pin: two exact interpolated
    medians, the percentiles_agg pin) on n_chars over the OR match
    set."""
    from sparkfts.aggs import median_absolute_deviation_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    res = median_absolute_deviation_agg(
        spark, idx, BM25_QUERY_OR, docs.select("doc_id", "n_chars"),
        "n_chars", mode="or",
    )
    return res.select(
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("median") * 10000 + 0.5).cast("long")
        .alias("median_e4"),
        F.floor(F.col("mad") * 10000 + 0.5).cast("long").alias("mad_e4"),
    )


def q_matrix_stats_agg(spark, sf_dir):
    """ES matrix_stats over (n_chars, n_toks): per-pair count, means,
    sample covariance and Pearson correlation from ONE pass of exact
    int64 sums (n_toks = pinned-analyzer token count, derived
    identically in DuckDB)."""
    from sparkfts.aggs import matrix_stats_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE_SQL}', 0)")
        ).cast("long").alias("n_toks"),
    )
    res = matrix_stats_agg(
        spark, idx, BM25_QUERY_OR, docs, ["n_chars", "n_toks"], mode="or",
    )
    e4 = lambda c: F.floor(F.col(c) * 10000 + 0.5).cast("long").alias(
        c + "_e4"
    )
    return res.select(
        "field_x", "field_y", F.col("count").cast("long").alias("count"),
        e4("mean_x"), e4("mean_y"), e4("covariance"),
        F.floor(F.col("correlation") * 1_000_000 + 0.5).cast("long")
        .alias("corr_e6"),
    )


def q_sampler_agg(spark, sf_dir):
    """ES sampler aggregation bounding a stats sub-agg: stats(n_chars)
    over the 100 best-scoring OR matches (pinned GLOBAL BM25 top
    shard_size, (-score, doc_id) ties — deterministic vs ES's
    shard-local sample)."""
    from sparkfts.aggs import sampler_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    res = sampler_agg(
        spark, idx, BM25_QUERY_OR, docs.select("doc_id", "n_chars"),
        "n_chars", shard_size=100, mode="or",
    )
    return res.select(
        F.col("sample_count").cast("long").alias("sample_count"),
        F.col("min_v").cast("long").alias("min_v"),
        F.col("max_v").cast("long").alias("max_v"),
        F.col("sum_v").cast("long").alias("sum_v"),
        F.floor(F.col("avg_v") * 1_000_000 + 0.5).cast("long")
        .alias("avg_e6"),
    )


def q_pipeline_normalize(spark, sf_dir):
    """ES normalize pipeline agg (percent_of_sum) over the monthly
    date_histogram — each bucket's share of the total match count."""
    from sparkfts.pipelineaggs import normalize_buckets

    res = normalize_buckets(
        _month_buckets(spark, sf_dir), "doc_count",
        method="percent_of_sum", out="pct",
    )
    return res.select(
        F.col("bucket").cast("long").alias("bucket_epoch"),
        F.col("doc_count").cast("long").alias("doc_count"),
        F.floor(F.col("pct") * 1_000_000 + 0.5).cast("long")
        .alias("pct_e6"),
    )


def q_pipeline_moving_percentile(spark, sf_dir):
    """ES moving_percentiles pipeline agg: exact interpolated p50 of
    doc_count over the trailing 3-bucket window [i-3, i) (current
    bucket excluded, the moving_fn contract); empty-window buckets
    omitted."""
    from sparkfts.pipelineaggs import moving_percentile

    res = moving_percentile(
        _month_buckets(spark, sf_dir), "doc_count", window=3,
        percent=50.0, out="mp",
    )
    return res.where(F.col("mp").isNotNull()).select(
        F.col("bucket").cast("long").alias("bucket_epoch"),
        F.floor(F.col("mp") * 10000 + 0.5).cast("long").alias("mp_e4"),
    )


def q_fts_most_fields(spark, sf_dir):
    """ES multi_match(most_fields) over [title^2, text]: combined
    score = SUM of matching fields' scores (== dis_max tie_breaker=1.0,
    routed through the exact bool-tree kernel)."""
    from sparkfts.multifield import bm25_most_fields_batch

    idx = _mf_index_dir_for(spark, sf_dir)
    res = bm25_most_fields_batch(
        spark, idx, [(0, BM25_QUERY_AND, 10)], fields=MF_FIELDS
    )
    return res.select("doc_id", _score_e4_col())


def q_fts_ids(spark, sf_dir):
    """ES ids query: filter-context fetch by _id list (constant score,
    doc-order pin); one requested id is absent, so 4 of 5 return."""
    from sparkfts.querybuilder import ids_topk

    docs = _docs(spark, sf_dir)
    res = ids_topk(docs, [42, 7, 3, 11, 99_999_999], k=10)
    return res.select("rank", "doc_id")


def q_fts_exists(spark, sf_dir):
    """ES exists query: docs that HAVE a value for a nullable field
    (here lang with 'de' nulled out — the typed-null missing-value
    shape), score 1.0, doc-order pin, first page of 12."""
    from sparkfts.querybuilder import exists_topk

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.expr("nullif(lang, 'de')").alias("lang_opt")
    )
    res = exists_topk(docs, "lang_opt", k=12)
    return res.select("rank", "doc_id")


def q_pipeline_rate(spark, sf_dir):
    """ES rate agg over the monthly date_histogram, unit=day: each
    bucket's match count scaled by its TRUE day span (28-31 — the
    documented actual-span pin vs ES's fixed-ratio calendar
    conversion)."""
    from sparkfts.pipelineaggs import rate_buckets

    res = rate_buckets(
        _month_buckets(spark, sf_dir), "doc_count",
        interval="month", unit="day", out="rate",
    )
    return res.select(
        F.col("bucket").cast("long").alias("bucket_epoch"),
        F.col("doc_count").cast("long").alias("doc_count"),
        F.floor(F.col("rate") * 1_000_000 + 0.5).cast("long")
        .alias("rate_e6"),
    )


def q_diversified_sampler_agg(spark, sf_dir):
    """ES diversified_sampler bounding a stats sub-agg: walk the OR
    matches in global BM25 order, keep <= 2 docs per lang, stop after
    5 keeps, stats(n_chars) over the kept sample."""
    from sparkfts.aggs import diversified_sampler_agg

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    res = diversified_sampler_agg(
        spark, idx, BM25_QUERY_OR,
        docs.select("doc_id", "n_chars", "lang"),
        "n_chars", "lang", shard_size=5, max_docs_per_value=2,
        mode="or",
    )
    return res.select(
        F.col("sample_count").cast("long").alias("sample_count"),
        F.col("min_v").cast("long").alias("min_v"),
        F.col("max_v").cast("long").alias("max_v"),
        F.col("sum_v").cast("long").alias("sum_v"),
        F.floor(F.col("avg_v") * 1_000_000 + 0.5).cast("long")
        .alias("avg_e6"),
    )


def q_geo_centroid(spark, sf_dir):
    """ES geo_centroid agg: arithmetic-mean coordinates of the point
    set (degrees), count alongside."""
    from sparkfts.geo import geo_centroid

    res = geo_centroid(_geo_docs(spark, sf_dir), "lat", "lon")
    return res.select(
        F.floor(F.col("lat") * 1_000_000 + 0.5).cast("long")
        .alias("lat_e6"),
        F.floor(F.col("lon") * 1_000_000 + 0.5).cast("long")
        .alias("lon_e6"),
        F.col("count").alias("n_points"),
    )


def q_geo_bounds(spark, sf_dir):
    """ES geo_bounds agg (wrap_longitude=false pin): min/max box in
    degrees — exact comparisons, no float slack needed."""
    from sparkfts.geo import geo_bounds

    res = geo_bounds(_geo_docs(spark, sf_dir), "lat", "lon")
    return res.select(
        F.floor(F.col("top") * 1_000_000 + 0.5).cast("long")
        .alias("top_e6"),
        F.floor(F.col("left") * 1_000_000 + 0.5).cast("long")
        .alias("left_e6"),
        F.floor(F.col("bottom") * 1_000_000 + 0.5).cast("long")
        .alias("bottom_e6"),
        F.floor(F.col("right") * 1_000_000 + 0.5).cast("long")
        .alias("right_e6"),
    )


def q_categorize_text(spark, sf_dir):
    """ES categorize_text agg, deterministic pin: category key = first
    4 non-numeric analyzer tokens (digit-bearing tokens are the
    variable parts ES's categorizer filters out)."""
    from sparkfts.aggs import categorize_text

    res = categorize_text(
        _docs(spark, sf_dir), "text", max_matched_tokens=4, size=15
    )
    return res.select("category", F.col("doc_count").cast("long")
                      .alias("doc_count"))


def q_random_sampler_agg(spark, sf_dir):
    """ES random_sampler agg bounding a stats sub-agg at probability
    0.25 — pinned integer-LCG per-mille hash keep set (the
    ops/sampling family), replayed exactly by the oracle."""
    from sparkfts.aggs import random_sampler_agg

    res = random_sampler_agg(
        _docs(spark, sf_dir), "n_chars", probability_permille=250
    )
    return res.select(
        "sample_count",
        F.col("min_v").alias("min_v"),
        F.col("max_v").alias("max_v"),
        F.col("sum_v").alias("sum_v"),
        F.floor(F.col("avg_v") * 1_000_000 + 0.5).cast("long")
        .alias("avg_e6"),
    )


def q_variable_width_histogram(spark, sf_dir):
    """ES variable_width_histogram, deterministic pin: exact
    equal-frequency clustering (ntile over (value, doc_id) order) —
    adaptive widths, every bucket populated, reproducible bounds."""
    from sparkfts.aggs import variable_width_histogram

    res = variable_width_histogram(
        _docs(spark, sf_dir), "n_chars", buckets=8
    )
    return res.select(
        F.col("bucket_idx").cast("long").alias("bucket_idx"),
        F.col("min_v").cast("long").alias("min_v"),
        F.col("max_v").cast("long").alias("max_v"),
        F.floor(F.col("centroid") * 1_000_000 + 0.5).cast("long")
        .alias("centroid_e6"),
        F.col("doc_count").alias("doc_count"),
    )


def q_pipeline_bucket_correlation(spark, sf_dir):
    """ES bucket_correlation sibling pipeline agg: Pearson correlation
    of the monthly bucket counts against a linear ramp indicator
    (trend detection, the count_correlation use case)."""
    from sparkfts.pipelineaggs import bucket_correlation

    buckets = _month_buckets(spark, sf_dir)
    n = buckets.count()  # bounded: n_buckets rows
    res = bucket_correlation(
        buckets, "doc_count", [float(i) for i in range(1, n + 1)]
    )
    return res.select(
        F.floor(F.col("correlation") * 1_000_000 + 0.5).cast("long")
        .alias("corr_e6"),
    )


def q_pipeline_ks_test(spark, sf_dir):
    """ES bucket_count_ks_test sibling pipeline agg vs the uniform
    CDF — exact D statistics (two_sided / greater / less), the
    documented deterministic pin."""
    from sparkfts.pipelineaggs import bucket_count_ks_test

    res = bucket_count_ks_test(_month_buckets(spark, sf_dir))
    return res.select(
        F.floor(F.col("d_statistic") * 1_000_000 + 0.5).cast("long")
        .alias("d_e6"),
        F.floor(F.col("d_plus") * 1_000_000 + 0.5).cast("long")
        .alias("dplus_e6"),
        F.floor(F.col("d_minus") * 1_000_000 + 0.5).cast("long")
        .alias("dminus_e6"),
    )


def q_c4_clean_stats(spark, sf_dir):
    """C4-style line/page cleaning (Raffel et al. 2020 §2.2 pinned
    subset): per-doc line survival + page-drop accounting."""
    from sparkfts.ops.textclean import c4_clean

    res = c4_clean(_docs(spark, sf_dir))
    return res.select(
        "doc_id",
        "n_lines_total",
        "n_lines_kept",
        F.col("page_dropped").cast("int").cast("long").alias("dropped"),
        "clean_chars",
    )


def q_fts_es_dsl(spark, sf_dir):
    """ES query-DSL JSON executed end-to-end: the reference's emitted
    body shape (bool.must fuzzy multi_match, reference
    ElasticsearchToNeo4jSync.py:89-102) composed with should /
    must_not / filter, parsed by sparkfts.esdsl onto the typed IR and
    run in the single-pass bool-tree shard kernel. Identical semantics
    to fts_bool_topk restricted by the term filter — the oracle is that
    SQL with the filter predicate added."""
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.esdsl import parse_request

    body = {
        "size": 10,
        "query": {"bool": {
            "must": [{"multi_match": {
                "query": BM25_QUERY_FUZZY, "fields": ["text"],
                "operator": "and", "fuzziness": "AUTO"}}],
            "should": [{"match": {"text": {
                "query": "vector", "operator": "and",
                "fuzziness": "AUTO"}}}],
            "must_not": [{"match": {"text": "stream"}}],
            "filter": [{"term": {"lang": "en"}}],
        }},
    }
    req = parse_request(body)
    idx = _index_dir_for(spark, sf_dir)
    res = bool_topk_batch(spark, idx, [req])
    return res.select("doc_id", _score_e4_col())


def q_histogram_dense(spark, sf_dir):
    """ES histogram with min_doc_count=0 + extended_bounds: the dense
    Kibana-axis contract — zero buckets fill the ladder, bounds widen
    it to [0, 12000] regardless of data."""
    from sparkfts.aggs import histogram_facet

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    res = histogram_facet(
        spark, idx, BM25_QUERY_OR, docs.select("doc_id", "n_chars"),
        "n_chars", interval=200.0, mode="or",
        min_doc_count=0, extended_bounds=(0.0, 12000.0),
    )
    return res.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("doc_count").cast("long").alias("doc_count"),
    )


def q_terms_order_by_avg(spark, sf_dir):
    """ES terms agg ordered by a nested stats metric
    (order: {"stats.avg": "desc"}): top-3 langs by mean doc length."""
    from sparkfts.aggs import terms_stats_nested

    idx = _index_dir_for(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    res = terms_stats_nested(
        spark, idx, BM25_QUERY_OR,
        docs.select("doc_id", "lang", "n_chars"), "lang", "n_chars",
        mode="or", size=3, order_by="avg", order_dir="desc",
    )
    return res.select(
        "value",
        F.col("doc_count").cast("long").alias("doc_count"),
        F.col("min").cast("long").alias("min_chars"),
        F.col("max").cast("long").alias("max_chars"),
        F.col("sum").cast("long").alias("sum_chars"),
        F.floor(F.col("avg") * 1_000_000 + 0.5).cast("long")
        .alias("avg_e6"),
    )


def q_frequent_item_sets(spark, sf_dir):
    """ES frequent_item_sets agg (exact enumeration pin): co-occurring
    (lang, source, length-band) value sets with support >= 5."""
    from sparkfts.aggs import frequent_item_sets

    docs = _docs(spark, sf_dir).select(
        "lang", "source",
        F.floor(F.col("n_chars") / 2000).cast("long").alias("len_band"),
    )
    res = frequent_item_sets(
        docs, ["lang", "source", "len_band"], min_support=5, size=15
    )
    return res.select(
        "items",
        F.col("set_size").cast("long").alias("set_size"),
        F.col("doc_count").cast("long").alias("doc_count"),
    )


def q_geo_line_agg(spark, sf_dir):
    """ES geo_line agg: per-lang track of the first 5 points in doc_id
    order, micro-degree quantized coordinate string."""
    from sparkfts.geo import geo_line

    pts = _geo_docs(spark, sf_dir).join(
        _docs(spark, sf_dir).select("doc_id", "lang"), "doc_id"
    )
    res = geo_line(pts, "lang", "lat", "lon", "doc_id", size=5)
    return res.select(
        F.col("bucket").alias("bucket"),
        F.col("n_points").alias("n_points"),
        F.col("line").alias("line"),
    )


def q_significant_terms_chi2(spark, sf_dir):
    """ES significant_terms with the chi_square heuristic (pinned
    textbook 2x2 chi-square, include_negatives=false)."""
    from sparkfts.aggs import significant_terms

    idx = _index_dir_for(spark, sf_dir)
    res = significant_terms(
        spark, idx, BM25_QUERY_OR, mode="or", size=10, min_doc_count=3,
        heuristic="chi_square",
    )
    return res.select(
        "term", "df_fg", "df_bg",
        F.floor(F.col("score_chi2") * 1_000 + 0.5).cast("long").alias(
            "score_e3"
        ),
    )


def q_ip_range_agg(spark, sf_dir):
    """ES ip_range agg over a synthesized ip doc value (half-open
    [from, to) + CIDR masks, request order): the geo_distance_agg
    conditional-sum shape on the int64 form of the dotted quad."""
    from sparkfts.aggs import ip_range_agg

    h = (F.col("doc_id") * 1103515245 + 54321) % 16777216
    ip = F.concat_ws(
        ".",
        F.lit(10).cast("string"),
        ((h / 65536).cast("long") % 256).cast("string"),
        ((h / 256).cast("long") % 256).cast("string"),
        (h % 256).cast("string"),
    )
    docs = _docs(spark, sf_dir).select(ip.alias("ip"))
    res = ip_range_agg(docs, "ip", [
        {"to": "10.64.0.0"},
        {"from": "10.64.0.0", "to": "10.192.0.0"},
        {"from": "10.192.0.0"},
        {"mask": "10.128.0.0/9"},
        {"mask": "10.32.77.0/24"},
    ])
    return res.select(
        F.col("range_idx").cast("long").alias("range_idx"),
        "key",
        F.col("doc_count").alias("doc_count"),
    )


def q_geohash_grid(spark, sf_dir):
    """ES geohash_grid agg at precision 3: classic Niemeyer base-32
    cells (integer bit-interleave formulation, pinned by the Wikipedia
    test vector in test_geo), count desc then key asc — one
    partially-aggregated groupBy on <= 32^3 cells."""
    from sparkfts.geo import geohash_grid

    pts = _geo_docs(spark, sf_dir)
    return geohash_grid(pts, "lat", "lon", precision=3)


def q_fts_span_multi(spark, sf_dir):
    """ES span_multi wrapping prefix 's': pinned Lucene span rewrite —
    span_or over the dictionary expansions (tfp = union of expansion
    positions, pseudo-idf = summed expansion idfs,
    sparkfts/spans.py span_multi_batch)."""
    from sparkfts.phrase import build_positions
    from sparkfts.spans import span_multi_batch

    idx = _index_dir_for(spark, sf_dir)
    if not os.path.isdir(os.path.join(idx, "positions")):
        build_positions(
            _docs_as_pages(_docs(spark, sf_dir)), idx, id_source="column"
        )
    res = span_multi_batch(spark, idx, [(0, "s", 10)], kind="prefix")
    return res.select("doc_id", _score_e4_col())


def q_exact_substring_stats(spark, sf_dir):
    """ExactSubstr dedup (Lee et al. 2022), hash-anchor distributed
    variant: positional 8-token windows, global keep-first pin,
    per-doc gaps-and-islands span merge
    (sparkfts/ops/chunkdedup.py exact_substring_stats). Per-doc
    removal accounting over the full corpus."""
    from sparkfts.ops.chunkdedup import exact_substring_stats

    docs = _docs(spark, sf_dir)
    return exact_substring_stats(docs, length=8)


_ATTEST_WINDOW_R5 = [
    # -- flagship invariants, pinned every round --------------------------
    "fts_corpus_stats",
    "fts_term_df",
    "fts_bm25_topk",
    "fts_index_topk",
    "fts_phrase_topk",
    "fts_bool_topk",
    "fts_fuzzy_topk",
    "fts_or_wand_topk",
    "fts_multifield_topk",
    "terms_facet",
    # -- never-driver-attested before round 5 -----------------------------
    "fts_rank_feature",
    "fts_decay_recency",
    "fts_boosting_topk",
    "fts_constant_score",
    "pipeline_cumsum",
    "pipeline_derivative",
    "pipeline_stats_bucket",
    "pipeline_bucket_sort",
    "percolate_matches",
    "termvectors",
    "phrase_suggest",
    "completion_suggest",
    "fts_bool_prefix",
    "fts_span_near",
    "fts_span_first",
    "has_child_topk",
    "has_parent_topk",
    "has_child_inner_hits",
    "geo_distance_topk",
    "geo_bbox",
    "geotile_grid",
    "geo_distance_rings",
    "runtime_field_topk",
    "runtime_field_agg",
    # -- brand-new in round 5 (also never attested, by construction) ----
    "fts_edge_ngram",
    "significant_text",
    "scripted_metric",
    "fts_terms_lookup",
    "fts_span_or",
    "fts_span_not",
    "fts_span_containing",
    "unigram_token_counts",
    "ann_sq8_topk",
    "ann_pq_topk",
    "ann_bbq_topk",
    "ann_filtered_topk",
    "nested_query_topk",
    "fts_intervals",
    "sparse_vector_topk",
    "hybrid_linear_topk",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    full = _registry()
    head = {k: full[k] for k in _ATTEST_WINDOW_R5}
    head.update((k, v) for k, v in full.items() if k not in head)
    return head


def _registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "fts_corpus_stats": q_fts_corpus_stats,
        "fts_term_df": q_fts_term_df,
        "fts_term_tf": q_fts_term_tf,
        "fts_doclen": q_fts_doclen,
        "fts_bm25_topk": q_fts_bm25_topk,
        "fts_index_topk": q_fts_index_topk,
        "fts_phrase_topk": q_fts_phrase_topk,
        "fts_phrase_slop": q_fts_phrase_slop,
        "fts_phrase_prefix": q_fts_phrase_prefix,
        "fts_prefix_topk": q_fts_prefix_topk,
        "fts_edge_ngram": q_fts_edge_ngram,
        "fts_multifield_topk": q_fts_multifield_topk,
        "fts_multi_index_topk": q_fts_multi_index_topk,
        "fts_query_string": q_fts_query_string,
        "fts_simple_qs": q_fts_simple_qs,
        "fts_qs_boost": q_fts_qs_boost,
        "fts_bool_msm": q_fts_bool_msm,
        "fts_nested_filter": q_fts_nested_filter,
        "fts_bm25f_topk": q_fts_bm25f_topk,
        "fts_or_wand_topk": q_fts_or_wand_topk,
        "fts_min_should_match": q_fts_min_should_match,
        "fts_fuzzy_topk": q_fts_fuzzy_topk,
        "fts_fuzzy_index_topk": q_fts_fuzzy_index_topk,
        "fts_fuzzy_transpositions": q_fts_fuzzy_transpositions,
        "fts_fuzzy_fixed": q_fts_fuzzy_fixed,
        "fts_bool_termlevel": q_fts_bool_termlevel,
        "fts_filtered_topk": q_fts_filtered_topk,
        "fts_must_not_topk": q_fts_must_not_topk,
        "fts_bool_topk": q_fts_bool_topk,
        "fts_dismax_topk": q_fts_dismax_topk,
        "fts_synonym_topk": q_fts_synonym_topk,
        "fts_sort_topk": q_fts_sort_topk,
        "fts_function_score": q_fts_function_score,
        "fts_script_score": q_fts_script_score,
        "fts_terms_set": q_fts_terms_set,
        "fts_collapse": q_fts_collapse,
        "terms_top_hits": q_terms_top_hits,
        "terms_facet": q_terms_facet,
        "stats_agg": q_stats_agg,
        "histogram_facet": q_histogram_facet,
        "cardinality_agg": q_cardinality_agg,
        "percentiles_agg": q_percentiles_agg,
        "terms_stats_nested": q_terms_stats_nested,
        "date_histogram": q_date_histogram,
        "fts_wildcard_topk": q_fts_wildcard_topk,
        "fts_regexp_topk": q_fts_regexp_topk,
        "fts_count": q_fts_count,
        "fts_routed_topk": q_fts_routed_topk,
        "percentile_ranks_agg": q_percentile_ranks,
        "mget_docs": q_mget_docs,
        "rare_terms_agg": q_rare_terms_agg,
        "auto_date_histogram": q_auto_date_histogram,
        "term_suggest": q_term_suggest,
        "significant_terms": q_significant_terms,
        "significant_text": q_significant_text,
        "scripted_metric": q_scripted_metric,
        "fts_terms_lookup": q_fts_terms_lookup,
        "more_like_this": q_more_like_this,
        "rank_eval_metrics": q_rank_eval,
        "fts_rescore_topk": q_fts_rescore_topk,
        "highlight_spans": q_highlight_spans,
        "match_all": q_match_all,
        "threshold_filter": q_threshold_filter,
        "projection_rename": q_projection_rename,
        "type_lookup": q_type_lookup,
        "distinct_fields": q_distinct_fields,
        "batch_chunks": q_batch_chunks,
        "graph_dyads": q_graph_dyads,
        "topk_per_group": q_topk_per_group,
        "tumbling_window": q_tumbling_window,
        "session_windows": q_session_windows,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_clusters": q_dedup_clusters,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "decontaminate": q_decontaminate,
        "source_cap_sample": q_source_cap_sample,
        "stratified_sample": q_stratified_sample,
        "repetition_stats": q_repetition_stats,
        "pii_redact": q_pii_redact,
        "url_canonicalize": q_url_canonicalize,
        "host_doc_counts": q_host_doc_counts,
        "hybrid_rrf_topk": q_hybrid_rrf_topk,
        "range_agg": q_range_agg,
        "filters_agg": q_filters_agg,
        "missing_agg": q_missing_agg,
        "composite_agg": q_composite_agg,
        "lang_id": q_lang_id,
        "quality_scores": q_quality_scores,
        "token_counts": q_token_counts,
        "fingerprints": q_fingerprints,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_lsh_buckets": q_ann_lsh_buckets,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_decode": q_multimodal_decode,
        "pricing_summary": q_pricing_summary,
        "shipping_priority": q_shipping_priority,
        "region_revenue": q_region_revenue,
        "fts_rank_feature": q_fts_rank_feature,
        "fts_decay_recency": q_fts_decay_recency,
        "fts_boosting_topk": q_fts_boosting_topk,
        "fts_constant_score": q_fts_constant_score,
        "pipeline_cumsum": q_pipeline_cumsum,
        "pipeline_percentiles_bucket": q_pipeline_percentiles_bucket,
        "pipeline_cumulative_cardinality": q_pipeline_cumulative_cardinality,
        "pipeline_derivative": q_pipeline_derivative,
        "pipeline_moving_avg": q_pipeline_moving_avg,
        "pipeline_stats_bucket": q_pipeline_stats_bucket,
        "pipeline_bucket_sort": q_pipeline_bucket_sort,
        "percolate_matches": q_percolate_matches,
        "termvectors": q_termvectors,
        "unigram_logppl": q_unigram_logppl,
        "chunk_dedup_stats": q_chunk_dedup_stats,
        "dup_ngram_coverage": q_dup_ngram_coverage,
        "extended_stats_agg": q_extended_stats_agg,
        "weighted_avg_agg": q_weighted_avg_agg,
        "top_metrics_agg": q_top_metrics_agg,
        "date_range_agg": q_date_range_agg,
        "adjacency_matrix_agg": q_adjacency_matrix_agg,
        "fts_span_near": q_fts_span_near,
        "fts_span_first": q_fts_span_first,
        "fts_span_or": q_fts_span_or,
        "fts_span_not": q_fts_span_not,
        "fts_span_containing": q_fts_span_containing,
        "fts_span_within": q_fts_span_within,
        "phrase_suggest": q_phrase_suggest,
        "fts_bool_prefix": q_fts_bool_prefix,
        "completion_suggest": q_completion_suggest,
        "ann_filtered_topk": q_ann_filtered_topk,
        "ann_range_search": q_ann_range_search,
        "ann_sq8_topk": q_ann_sq8_topk,
        "ann_pq_topk": q_ann_pq_topk,
        "ann_ivfpq_topk": q_ann_ivfpq_topk,
        "curate_funnel": q_curate_funnel,
        "pack_manifest": q_pack_manifest,
        "bpe_token_counts": q_bpe_token_counts,
        "unigram_token_counts": q_unigram_token_counts,
        "has_child_topk": q_has_child_topk,
        "children_agg": q_children_agg,
        "parent_agg": q_parent_agg,
        "has_parent_topk": q_has_parent_topk,
        "has_child_inner_hits": q_has_child_inner_hits,
        "geo_distance_topk": q_geo_distance_topk,
        "geo_bbox": q_geo_bbox,
        "geotile_grid": q_geotile_grid,
        "geo_distance_rings": q_geo_distance_rings,
        "runtime_field_topk": q_runtime_field_topk,
        "runtime_field_agg": q_runtime_field_agg,
        "multi_terms_agg": q_multi_terms_agg,
        "ann_bbq_topk": q_ann_bbq_topk,
        "dedup_incremental": q_dedup_incremental,
        "ingest_pipeline": q_ingest_pipeline,
        "sorted_index_topk": q_sorted_index_topk,
        "nested_query_topk": q_nested_query_topk,
        "nested_reverse_agg": q_nested_reverse_agg,
        "mixture_sample": q_mixture_sample,
        "fts_intervals": q_fts_intervals,
        "sparse_vector_topk": q_sparse_vector_topk,
        "hybrid_linear_topk": q_hybrid_linear_topk,
        "date_math_range": q_date_math_range,
        "quality_quantile_filter": q_quality_quantile_filter,
        "quality_clf_scores": q_quality_clf_scores,
        "fts_dsl_aggs": q_fts_dsl_aggs,
        "fts_distance_feature": q_fts_distance_feature,
        "fts_random_score": q_fts_random_score,
        "fts_pinned": q_fts_pinned,
        "boxplot_agg": q_boxplot_agg,
        "t_test_agg": q_t_test_agg,
        "knn_join_lsh": q_knn_join_lsh,
        "semdedup": q_semdedup,
        "tfidf_keywords": q_tfidf_keywords,
        "collocations": q_collocations,
        "maxsim_topk": q_maxsim_topk,
        "string_stats_agg": q_string_stats_agg,
        "mad_agg": q_mad_agg,
        "matrix_stats_agg": q_matrix_stats_agg,
        "sampler_agg": q_sampler_agg,
        "pipeline_normalize": q_pipeline_normalize,
        "pipeline_moving_percentile": q_pipeline_moving_percentile,
        "fts_most_fields": q_fts_most_fields,
        "fts_ids": q_fts_ids,
        "fts_exists": q_fts_exists,
        "exact_substring_stats": q_exact_substring_stats,
        "fts_span_multi": q_fts_span_multi,
        "geohash_grid": q_geohash_grid,
        "pipeline_rate": q_pipeline_rate,
        "diversified_sampler_agg": q_diversified_sampler_agg,
        "geo_centroid": q_geo_centroid,
        "geo_bounds": q_geo_bounds,
        "categorize_text": q_categorize_text,
        "random_sampler_agg": q_random_sampler_agg,
        "variable_width_histogram": q_variable_width_histogram,
        "pipeline_bucket_correlation": q_pipeline_bucket_correlation,
        "pipeline_ks_test": q_pipeline_ks_test,
        "c4_clean_stats": q_c4_clean_stats,
        "fts_es_dsl": q_fts_es_dsl,
        "histogram_dense": q_histogram_dense,
        "terms_order_by_avg": q_terms_order_by_avg,
        "frequent_item_sets": q_frequent_item_sets,
        "geo_line_agg": q_geo_line_agg,
        "significant_terms_chi2": q_significant_terms_chi2,
        "ip_range_agg": q_ip_range_agg,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB side)
# ---------------------------------------------------------------------------

_TOKS = (
    "SELECT doc_id, unnest(regexp_extract_all(lower(text), "
    f"'{TOKEN_RE_SQL}')) AS tok FROM documents"
)

_GRAMS = f"""
  SELECT doc_id,
         unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                               for i in range(1, len(t) - 1)])) AS shingle
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') t
        FROM documents)
  WHERE len(t) >= 3
"""

_MINHASH = f"""
WITH grams AS ({_GRAMS}),
g31 AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % {HASH_P} AS g31
  FROM grams
),
sig AS (
  SELECT doc_id, i,
         min(((1103515245 * (i + 1)) % {HASH_P} * g31
              + (12345 * (i + 1)) % {HASH_P}) % {HASH_P}) AS minhash
  FROM g31 CROSS JOIN (SELECT unnest(range(0, 8)) AS i)
  GROUP BY doc_id, i
)
"""


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}

    sqls["fts_corpus_stats"] = f"""
WITH dl AS (SELECT len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS d
            FROM documents)
SELECT count(*) AS n_docs, CAST(sum(d) AS BIGINT) AS total_tokens,
       CAST(sum(d) * 1000000 // count(*) AS BIGINT) AS avgdl_micro
FROM dl
"""

    sqls["fts_term_df"] = f"""
WITH t AS (SELECT doc_id,
                  unnest(list_distinct(regexp_extract_all(lower(text),
                         '{TOKEN_RE_SQL}'))) AS term
           FROM documents)
SELECT term, count(*) AS df FROM t GROUP BY term
ORDER BY df DESC, term LIMIT 20
"""

    sqls["fts_term_tf"] = f"""
SELECT doc_id, count(*) AS tf FROM ({_TOKS}) WHERE tok = 'the'
GROUP BY doc_id
"""

    sqls["fts_doclen"] = f"""
SELECT doc_id, len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS doclen
FROM documents
WHERE len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) > 0
"""

    bm25_and = _bm25_sql(sorted(set(BM25_QUERY_AND.split())), True)
    sqls["fts_bm25_topk"] = bm25_and
    sqls["fts_index_topk"] = bm25_and

    # edge_ngram expansion mirror (sparkfts.analysis.expand_tokens pins:
    # grams lo..min(len, hi); len>hi also emits the full token; len<lo
    # emits the token unchanged); doclen counts the EXPANDED stream
    sqls["fts_edge_ngram"] = f"""
WITH raw AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok
  FROM documents
),
exp AS (
  SELECT doc_id, unnest(
    CASE WHEN length(tok) < 3 THEN [tok]
         WHEN length(tok) > 8
           THEN list_append([substr(tok, 1, g) for g in range(3, 9)], tok)
         ELSE [substr(tok, 1, g) for g in range(3, length(tok) + 1)]
    END) AS tok
  FROM raw
),
dl AS (SELECT doc_id, count(*) AS doclen FROM exp GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf FROM exp
  WHERE tok = 'spar' GROUP BY doc_id, tok
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
              * 2.2 ) AS score
  FROM tf
  JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["fts_prefix_topk"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf FROM toks
  WHERE tok LIKE 's%' GROUP BY doc_id, tok
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         max( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
              * 2.2 ) AS score
  FROM tf
  JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["fts_filtered_topk"] = _bm25_sql(
        sorted(set(BM25_QUERY_OR.split())),
        False,
        extra_where=(
            "AND doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')"
        ),
    )
    sqls["fts_must_not_topk"] = _bm25_sql(
        sorted(set(BM25_QUERY_AND.split())),
        True,
        extra_where=(
            "AND doc_id NOT IN (SELECT doc_id FROM ("
            + _TOKS
            + ") WHERE tok = 'vector')"
        ),
    )

    p_terms = PHRASE_QUERY.split()
    p_vals = ", ".join(f"('{t}', {i})" for i, t in enumerate(p_terms))
    p_in = ", ".join(f"'{t}'" for t in sorted(set(p_terms)))
    sqls["fts_phrase_topk"] = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
toks AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
                unnest(tk) AS tok FROM t),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
pterms(term, i) AS (VALUES {p_vals}),
dfs AS (SELECT tok AS term, count(DISTINCT doc_id) AS df FROM toks
        WHERE tok IN ({p_in}) GROUP BY 1),
idfsum AS (
  SELECT sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))) AS isum
  FROM pterms p JOIN dfs d USING (term) CROSS JOIN stats s),
hits AS (
  SELECT tk.doc_id, tk.pos - p.i AS st
  FROM toks tk JOIN pterms p ON tk.tok = p.term
  WHERE tk.pos - p.i >= 0
  GROUP BY 1, 2 HAVING count(*) = {len(p_terms)}),
freq AS (SELECT doc_id, count(*) AS tfp FROM hits GROUP BY 1),
scored AS (
  SELECT f.doc_id,
         i.isum * (f.tfp / (f.tfp + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                           / s.avgdl))) * 2.2 AS score
  FROM freq f JOIN dl USING (doc_id) CROSS JOIN idfsum i CROSS JOIN stats s)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    t0_term, t1_term = p_terms[0], p_terms[1]
    pfx = t1_term[:2]
    sqls["fts_phrase_prefix"] = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
toks AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
                unnest(tk) AS tok FROM t),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
exps AS (SELECT DISTINCT tok AS term FROM toks WHERE tok LIKE '{pfx}%'
         ORDER BY term LIMIT 50),
fdf AS (SELECT count(DISTINCT doc_id) AS df FROM toks
        WHERE tok = '{t0_term}'),
dfp AS (SELECT count(DISTINCT doc_id) AS df FROM toks
        WHERE tok IN (SELECT term FROM exps)),
weight AS (
  SELECT ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
         + ln(1 + (s.n_docs - p.df + 0.5) / (p.df + 0.5)) AS w
  FROM fdf f CROSS JOIN dfp p CROSS JOIN stats s),
hits AS (
  SELECT a.doc_id, a.pos AS st
  FROM toks a
  WHERE a.tok = '{t0_term}'
    AND EXISTS (SELECT 1 FROM toks b
                WHERE b.doc_id = a.doc_id AND b.pos = a.pos + 1
                  AND b.tok IN (SELECT term FROM exps))),
freq AS (SELECT doc_id, count(*) AS tfp FROM hits GROUP BY 1),
scored AS (
  SELECT f.doc_id,
         wt.w * (f.tfp / (f.tfp + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                         / s.avgdl))) * 2.2 AS score
  FROM freq f JOIN dl USING (doc_id) CROSS JOIN weight wt CROSS JOIN stats s)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["fts_phrase_slop"] = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
toks AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
                unnest(tk) AS tok FROM t),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
pterms(term, i) AS (VALUES {p_vals}),
dfs AS (SELECT tok AS term, count(DISTINCT doc_id) AS df FROM toks
        WHERE tok IN ({p_in}) GROUP BY 1),
idfsum AS (
  SELECT sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))) AS isum
  FROM pterms p JOIN dfs d USING (term) CROSS JOIN stats s),
hits AS (
  SELECT a.doc_id, a.pos AS st
  FROM toks a
  WHERE a.tok = '{t0_term}'
    AND EXISTS (SELECT 1 FROM toks b
                WHERE b.doc_id = a.doc_id AND b.tok = '{t1_term}'
                  AND b.pos > a.pos AND b.pos <= a.pos + 3)),
freq AS (SELECT doc_id, count(*) AS tfp FROM hits GROUP BY 1),
scored AS (
  SELECT f.doc_id,
         i.isum * (f.tfp / (f.tfp + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                           / s.avgdl))) * 2.2 AS score
  FROM freq f JOIN dl USING (doc_id) CROSS JOIN idfsum i CROSS JOIN stats s)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    mf_terms = sorted(set(BM25_QUERY_AND.split()))
    tx_src = (
        "SELECT doc_id, unnest(regexp_extract_all(lower(text), "
        f"'{TOKEN_RE_SQL}')) AS tok FROM documents"
    )
    ti_src = (
        "SELECT doc_id, unnest(regexp_extract_all(lower(text), "
        f"'{TOKEN_RE_SQL}')[1:8]) AS tok FROM documents"
    )
    sqls["fts_multifield_topk"] = f"""
WITH {_bm25_field_ctes("tx", tx_src, mf_terms, True)},
{_bm25_field_ctes("ti", ti_src, mf_terms, True)},
u AS (
  SELECT doc_id, score * 1.0 AS s FROM tx_scored
  UNION ALL SELECT doc_id, score * 2.0 FROM ti_scored
),
best AS (SELECT doc_id, max(s) AS score FROM u GROUP BY doc_id)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM best ORDER BY score DESC, doc_id LIMIT 10
"""

    # query_string: spark AND (stream OR query) AND NOT data
    # score = sum of per-term BM25 over {spark} + matching of {stream,query}
    sqls["fts_query_string"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf FROM toks
  WHERE tok IN ('spark', 'stream', 'query') GROUP BY doc_id, tok
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
pt AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
           * 2.2 AS ts
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, sum(ts) AS score,
         max(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS h_spark,
         max(CASE WHEN term = 'stream' THEN 1 ELSE 0 END) AS h_stream,
         max(CASE WHEN term = 'query' THEN 1 ELSE 0 END) AS h_query
  FROM pt GROUP BY doc_id
)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM agg
WHERE h_spark = 1 AND (h_stream = 1 OR h_query = 1)
  AND doc_id NOT IN (SELECT DISTINCT doc_id FROM toks WHERE tok = 'data')
ORDER BY score DESC, doc_id LIMIT 10
"""

    # simple_query_string '"table hash" | (spark + str*) -vector':
    # leaf scores per the engine pins (phrase = idf-sum * tf_norm(tfp),
    # term = BM25, prefix = best-expansion-wins over LIKE 'str%'); OR
    # sums MATCHING members in member order; '-vector' excludes.
    sqls["fts_simple_qs"] = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
toks AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
                unnest(tk) AS tok FROM t),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
pterms(term, i) AS (VALUES ('table', 0), ('hash', 1)),
pdfs AS (SELECT tok AS term, count(DISTINCT doc_id) AS df FROM toks
         WHERE tok IN ('table', 'hash') GROUP BY 1),
idfsum AS (
  SELECT sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))) AS isum
  FROM pterms p JOIN pdfs d USING (term) CROSS JOIN stats s),
phits AS (
  SELECT tk.doc_id, tk.pos - p.i AS st
  FROM toks tk JOIN pterms p ON tk.tok = p.term
  WHERE tk.pos - p.i >= 0
  GROUP BY 1, 2 HAVING count(*) = 2),
pfreq AS (SELECT doc_id, count(*) AS tfp FROM phits GROUP BY 1),
phrase_s AS (
  SELECT f.doc_id,
         i.isum * (f.tfp / (f.tfp + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                           / s.avgdl))) * 2.2 AS s
  FROM pfreq f JOIN dl USING (doc_id) CROSS JOIN idfsum i CROSS JOIN stats s),
stf AS (SELECT doc_id, count(*) AS tf FROM toks WHERE tok = 'spark'
        GROUP BY 1),
sdf AS (SELECT count(*) AS df FROM stf),
spark_s AS (
  SELECT stf.doc_id,
         ln(1 + (s.n_docs - sdf.df + 0.5) / (sdf.df + 0.5))
           * (stf.tf / (stf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                        / s.avgdl))) * 2.2 AS s
  FROM stf JOIN dl USING (doc_id) CROSS JOIN sdf CROSS JOIN stats s),
ptf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM toks
        WHERE tok LIKE 'str%' GROUP BY 1, 2),
pdf2 AS (SELECT term, count(*) AS df FROM ptf GROUP BY 1),
prefix_s AS (
  SELECT ptf.doc_id,
         max( ln(1 + (s.n_docs - pdf2.df + 0.5) / (pdf2.df + 0.5))
              * (ptf.tf / (ptf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                           / s.avgdl))) * 2.2 ) AS s
  FROM ptf JOIN pdf2 USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY ptf.doc_id),
leaves AS (
  SELECT doc_id,
         max(CASE WHEN lid = 0 THEN s END) AS s_ph,
         max(CASE WHEN lid = 1 THEN s END) AS s_sp,
         max(CASE WHEN lid = 2 THEN s END) AS s_px
  FROM (
    SELECT doc_id, s, 0 AS lid FROM phrase_s
    UNION ALL SELECT doc_id, s, 1 FROM spark_s
    UNION ALL SELECT doc_id, s, 2 FROM prefix_s
  ) GROUP BY doc_id),
folded AS (
  SELECT doc_id,
         COALESCE(s_ph, 0)
           + CASE WHEN s_sp IS NOT NULL AND s_px IS NOT NULL
                  THEN s_sp + s_px ELSE 0 END AS score
  FROM leaves
  WHERE (s_ph IS NOT NULL
         OR (s_sp IS NOT NULL AND s_px IS NOT NULL))
    AND doc_id NOT IN (SELECT DISTINCT doc_id FROM toks
                       WHERE tok = 'vector'))
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM folded ORDER BY score DESC, doc_id LIMIT 10
"""

    # nested filter: every spark doc; stream bonus only when lang='en'
    sqls["fts_nested_filter"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf FROM toks
  WHERE tok IN ('spark', 'stream') GROUP BY doc_id, tok
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
pt AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
           * 2.2 AS ts
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
agg AS (
  SELECT p.doc_id,
         max(CASE WHEN term = 'spark' THEN ts END) AS s_must,
         COALESCE(max(CASE WHEN term = 'stream'
                           AND d.lang = 'en' THEN ts END), 0) AS s_bonus
  FROM pt p JOIN documents d USING (doc_id)
  GROUP BY p.doc_id
)
SELECT doc_id,
       CAST(floor((s_must + s_bonus) * 10000 + 0.5) AS BIGINT) AS score_e4
FROM agg WHERE s_must IS NOT NULL
ORDER BY s_must + s_bonus DESC, doc_id LIMIT 10
"""

    # bool msm: spark AND (>=2 of stream/query/vector); score = s_spark
    # + sum of matching shoulds
    sqls["fts_bool_msm"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf FROM toks
  WHERE tok IN ('spark', 'stream', 'query', 'vector')
  GROUP BY doc_id, tok
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
pt AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
           * 2.2 AS ts
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
agg AS (
  SELECT doc_id,
         max(CASE WHEN term = 'spark' THEN ts END) AS s_must,
         count(CASE WHEN term <> 'spark' THEN 1 END) AS n_should,
         COALESCE(sum(CASE WHEN term <> 'spark' THEN ts END), 0)
           AS s_should
  FROM pt GROUP BY doc_id
)
SELECT doc_id,
       CAST(floor((s_must + s_should) * 10000 + 0.5) AS BIGINT)
         AS score_e4
FROM agg
WHERE s_must IS NOT NULL AND n_should >= 2
ORDER BY s_must + s_should DESC, doc_id LIMIT 10
"""

    # query_string boost: 'spark^2 (stream query)^0.5' (default OR) —
    # score = 2*s(spark) + 0.5*(s(stream)+s(query)) over the union
    sqls["fts_qs_boost"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf FROM toks
  WHERE tok IN ('spark', 'stream', 'query') GROUP BY doc_id, tok
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
pt AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
           * 2.2 AS ts
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
agg AS (
  SELECT doc_id,
         2.0 * COALESCE(max(CASE WHEN term = 'spark' THEN ts END), 0)
         + 0.5 * (COALESCE(max(CASE WHEN term = 'stream' THEN ts END), 0)
                  + COALESCE(max(CASE WHEN term = 'query' THEN ts END), 0))
           AS score
  FROM pt GROUP BY doc_id
)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM agg ORDER BY score DESC, doc_id LIMIT 10
"""

    mi_terms = sorted(set(BM25_QUERY_AND.split()))
    sqls["fts_multi_index_topk"] = f"""
WITH {_bm25_subset_ctes("h0", "doc_id % 2 = 0", mi_terms, True)},
{_bm25_subset_ctes("h1", "doc_id % 2 = 1", mi_terms, True)},
merged AS (
  SELECT 0 AS index_ord, doc_id, score FROM h0_scored
  UNION ALL
  SELECT 1 AS index_ord, doc_id, score FROM h1_scored
)
SELECT CAST(index_ord AS BIGINT) AS index_ord, doc_id,
       {_SCORE_E4} AS score_e4
FROM merged ORDER BY score DESC, index_ord, doc_id LIMIT 10
"""

    mf_in = ", ".join(f"'{t}'" for t in mf_terms)
    sqls["fts_bm25f_topk"] = f"""
WITH xt AS ({tx_src}), tt AS ({ti_src}),
xdl AS (SELECT doc_id, count(*) AS doclen FROM xt GROUP BY 1),
tdl AS (SELECT doc_id, count(*) AS doclen FROM tt GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM xdl) * 1.0
           / (SELECT count(*) FROM documents) AS avg_x,
         (SELECT sum(doclen) FROM tdl) * 1.0
           / (SELECT count(*) FROM documents) AS avg_t
),
xtf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM xt
        WHERE tok IN ({mf_in}) GROUP BY 1, 2),
ttf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM tt
        WHERE tok IN ({mf_in}) GROUP BY 1, 2),
dfany AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM (
    SELECT doc_id, term FROM xtf UNION SELECT doc_id, term FROM ttf
  ) GROUP BY 1),
pairs AS (
  SELECT doc_id, term FROM xtf UNION SELECT doc_id, term FROM ttf),
tfc AS (
  SELECT p.doc_id, p.term,
         COALESCE(2.0 * tt2.tf
                  / (1 - 0.75 + 0.75 * tdl.doclen / s.avg_t), 0)
       + COALESCE(1.0 * xt2.tf
                  / (1 - 0.75 + 0.75 * xdl.doclen / s.avg_x), 0) AS tfc
  FROM pairs p
  LEFT JOIN xtf xt2 USING (doc_id, term)
  LEFT JOIN ttf tt2 USING (doc_id, term)
  JOIN xdl USING (doc_id) JOIN tdl USING (doc_id)
  CROSS JOIN stats s),
scored AS (
  SELECT c.doc_id,
         sum( ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * (c.tfc / (1.2 + c.tfc)) * 2.2 ) AS score,
         count(*) AS nt
  FROM tfc c JOIN dfany d USING (term) CROSS JOIN stats s
  WHERE c.tfc > 0 GROUP BY c.doc_id)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored WHERE nt = {len(mf_terms)}
ORDER BY score DESC, doc_id LIMIT 10
"""
    sqls["fts_or_wand_topk"] = _bm25_sql(
        sorted(set(BM25_QUERY_OR.split())), False
    )
    sqls["fts_min_should_match"] = _bm25_sql(
        sorted(set(BM25_QUERY_OR.split())), False, min_match=2
    )

    from sparkfts.analysis import auto_fuzz, tokenize_query

    fterms = tokenize_query(BM25_QUERY_FUZZY)
    qvals = ", ".join(
        f"('{t}', {auto_fuzz(t)}, {len(t)})" for t in fterms
    )
    sqls["fts_fuzzy_topk"] = f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM toks GROUP BY 1, 2),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
qterms(q_term, maxd, qlen) AS (VALUES {qvals}),
exp AS (
  SELECT q.q_term, d.term, d.df,
         1.0 - levenshtein(d.term, q.q_term) * 1.0 / q.qlen AS boost
  FROM dict d JOIN qterms q
    ON abs(length(d.term) - q.qlen) <= q.maxd
   AND levenshtein(d.term, q.q_term) <= q.maxd
),
contrib AS (
  SELECT e.q_term, tf.doc_id,
         max(e.boost * ln(1 + (s.n_docs - e.df + 0.5) / (e.df + 0.5))
             * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
             * 2.2) AS best
  FROM tf JOIN exp e USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY e.q_term, tf.doc_id
),
scored AS (
  SELECT doc_id, sum(best) AS score, count(*) AS nm FROM contrib GROUP BY doc_id
)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored WHERE nm = {len(fterms)} ORDER BY score DESC, doc_id LIMIT 10
"""
    sqls["fts_fuzzy_index_topk"] = sqls["fts_fuzzy_topk"]

    # bool of term-level leaves: wildcard st*m AND regexp quer(y|ies)
    # AND fuzzy vektor (AUTO: len 6 -> maxd 2); member-order sum
    sqls["fts_bool_termlevel"] = f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM toks GROUP BY 1, 2),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
w_s AS (
  SELECT tf.doc_id,
         max( ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                         / s.avgdl))) * 2.2 ) AS s
  FROM dict d JOIN tf USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats s
  WHERE regexp_full_match(d.term, 'st.*m') GROUP BY tf.doc_id),
r_s AS (
  SELECT tf.doc_id,
         max( ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                         / s.avgdl))) * 2.2 ) AS s
  FROM dict d JOIN tf USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats s
  WHERE regexp_full_match(d.term, 'quer(y|ies)') GROUP BY tf.doc_id),
f_s AS (
  SELECT tf.doc_id,
         max( (1.0 - levenshtein(d.term, 'vektor') * 1.0 / 6)
              * ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                         / s.avgdl))) * 2.2 ) AS s
  FROM dict d JOIN tf USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats s
  WHERE abs(length(d.term) - 6) <= 2
    AND levenshtein(d.term, 'vektor') <= 2
  GROUP BY tf.doc_id),
scored AS (
  SELECT w.doc_id, w.s + r.s + f.s AS score
  FROM w_s w JOIN r_s r USING (doc_id) JOIN f_s f USING (doc_id))
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    # fixed fuzziness 1 on a 6-char term (AUTO would be 2)
    sqls["fts_fuzzy_fixed"] = f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM toks GROUP BY 1, 2),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
qterms(q_term, maxd, qlen) AS (VALUES ('stream', 1, 6)),
exp AS (
  SELECT q.q_term, d.term, d.df,
         1.0 - levenshtein(d.term, q.q_term) * 1.0 / q.qlen AS boost
  FROM dict d JOIN qterms q
    ON abs(length(d.term) - q.qlen) <= q.maxd
   AND levenshtein(d.term, q.q_term) <= q.maxd
),
contrib AS (
  SELECT e.q_term, tf.doc_id,
         max(e.boost * ln(1 + (s.n_docs - e.df + 0.5) / (e.df + 0.5))
             * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
             * 2.2) AS best
  FROM tf JOIN exp e USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY e.q_term, tf.doc_id
),
scored AS (
  SELECT doc_id, sum(best) AS score FROM contrib GROUP BY doc_id
)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    tterms = tokenize_query(BM25_QUERY_TRANSPOSED)
    tvals = ", ".join(
        f"('{t}', {auto_fuzz(t)}, {len(t)})" for t in tterms
    )
    sqls["fts_fuzzy_transpositions"] = f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM toks GROUP BY 1, 2),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
qterms(q_term, maxd, qlen) AS (VALUES {tvals}),
exp AS (
  SELECT q.q_term, d.term, d.df,
         1.0 - damerau_levenshtein(d.term, q.q_term) * 1.0 / q.qlen AS boost
  FROM dict d JOIN qterms q
    ON abs(length(d.term) - q.qlen) <= q.maxd
   AND damerau_levenshtein(d.term, q.q_term) <= q.maxd
),
contrib AS (
  SELECT e.q_term, tf.doc_id,
         max(e.boost * ln(1 + (s.n_docs - e.df + 0.5) / (e.df + 0.5))
             * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
             * 2.2) AS best
  FROM tf JOIN exp e USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY e.q_term, tf.doc_id
),
scored AS (
  SELECT doc_id, sum(best) AS score, count(*) AS nm FROM contrib GROUP BY doc_id
)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored WHERE nm = {len(tterms)} ORDER BY score DESC, doc_id LIMIT 10
"""

    def _fuzzy_clause_ctes(p: str, terms: list[str]) -> str:
        """CTEs scoring one fuzzy(AUTO) conjunctive clause (shares the
        toks/dl/stats/tf/dict CTEs) -> ``{p}scored(doc_id, score, nm)``."""
        vals = ", ".join(
            f"('{t}', {auto_fuzz(t)}, {len(t)})" for t in terms
        )
        return f"""
{p}terms(q_term, maxd, qlen) AS (VALUES {vals}),
{p}exp AS (
  SELECT q.q_term, d.term, d.df,
         1.0 - levenshtein(d.term, q.q_term) * 1.0 / q.qlen AS boost
  FROM dict d JOIN {p}terms q
    ON abs(length(d.term) - q.qlen) <= q.maxd
   AND levenshtein(d.term, q.q_term) <= q.maxd
),
{p}contrib AS (
  SELECT e.q_term, tf.doc_id,
         max(e.boost * ln(1 + (s.n_docs - e.df + 0.5) / (e.df + 0.5))
             * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
             * 2.2) AS best
  FROM tf JOIN {p}exp e USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY e.q_term, tf.doc_id
),
{p}scored AS (
  SELECT doc_id, sum(best) AS score, count(*) AS nm
  FROM {p}contrib GROUP BY doc_id
)"""

    must_terms = tokenize_query(BM25_QUERY_FUZZY)
    should_terms = tokenize_query("vector")
    sqls["fts_bool_topk"] = f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM toks GROUP BY 1, 2),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
{_fuzzy_clause_ctes("m", must_terms)},
{_fuzzy_clause_ctes("s", should_terms)},
final AS (
  SELECT m.doc_id, m.score + COALESCE(s.score, 0) AS score
  FROM mscored m
  LEFT JOIN (SELECT doc_id, score FROM sscored
             WHERE nm = {len(should_terms)}) s USING (doc_id)
  WHERE m.nm = {len(must_terms)}
    AND m.doc_id NOT IN (SELECT doc_id FROM toks WHERE tok = 'stream')
)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM final ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["fts_synonym_topk"] = f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM toks GROUP BY 1, 2),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
syn(q_term, term) AS (VALUES
  ('spark', 'spark'), ('merge', 'join'), ('merge', 'merge')),
exp AS (SELECT s.q_term, d.term, d.df FROM dict d JOIN syn s USING (term)),
contrib AS (
  SELECT e.q_term, tf.doc_id,
         max(ln(1 + (s.n_docs - e.df + 0.5) / (e.df + 0.5))
             * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
             * 2.2) AS best
  FROM tf JOIN exp e USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY e.q_term, tf.doc_id
),
scored AS (
  SELECT doc_id, sum(best) AS score, count(*) AS nm FROM contrib GROUP BY doc_id
)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored WHERE nm = 2 ORDER BY score DESC, doc_id LIMIT 10
"""

    dm_a = tokenize_query(BM25_QUERY_AND)
    dm_b = tokenize_query("vector")
    sqls["fts_dismax_topk"] = f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM toks GROUP BY 1, 2),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
{_fuzzy_clause_ctes("a", dm_a)},
{_fuzzy_clause_ctes("b", dm_b)},
dm AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, a.score AS sa, b.score AS sb
  FROM (SELECT doc_id, score FROM ascored WHERE nm = {len(dm_a)}) a
  FULL JOIN (SELECT doc_id, score FROM bscored WHERE nm = {len(dm_b)}) b
    USING (doc_id)
),
final AS (
  SELECT doc_id,
         CASE WHEN sa IS NULL THEN sb
              WHEN sb IS NULL THEN sa
              ELSE greatest(sa, sb)
                   + 0.3 * ((sa + sb) - greatest(sa, sb))
         END AS score
  FROM dm
)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM final ORDER BY score DESC, doc_id LIMIT 10
"""

    and_cte = _bm25_scored_cte(sorted(set(BM25_QUERY_AND.split())), True)
    or_cte = _bm25_scored_cte(sorted(set(BM25_QUERY_OR.split())), False)

    sqls["fts_sort_topk"] = f"""
{and_cte}
SELECT CAST(row_number() OVER (ORDER BY d.n_chars DESC, d.doc_id) AS INT)
         AS rank,
       d.doc_id, d.n_chars AS sort_value
FROM documents d JOIN cand USING (doc_id)
ORDER BY rank LIMIT 15
"""

    sqls["fts_function_score"] = f"""
{or_cte}
SELECT s.doc_id,
       CAST(floor(s.score * ln(1 + d.n_chars) * 10000 + 0.5) AS BIGINT)
         AS score_e4
FROM scored s JOIN documents d USING (doc_id)
ORDER BY s.score * ln(1 + d.n_chars) DESC, s.doc_id LIMIT 10
"""

    ts_terms = ", ".join(
        f"'{t}'" for t in sorted(set(BM25_QUERY_OR.split()))
    )
    sqls["fts_terms_set"] = f"""
{or_cte},
cnts AS (
  SELECT doc_id, count(DISTINCT tok) AS c FROM ({_TOKS})
  WHERE tok IN ({ts_terms}) GROUP BY doc_id),
req AS (SELECT doc_id, doc_id % 5 AS r FROM documents)
SELECT s.doc_id, {_SCORE_E4} AS score_e4
FROM scored s JOIN cnts USING (doc_id) JOIN req USING (doc_id)
WHERE r >= 1 AND c >= least(r, {len(set(BM25_QUERY_OR.split()))})
ORDER BY s.score DESC, s.doc_id LIMIT 10
"""

    sqls["fts_script_score"] = f"""
{or_cte}
SELECT s.doc_id,
       CAST(floor(s.score * (0.5 + d.n_chars / (d.n_chars + 10.0))
                  * 10000 + 0.5) AS BIGINT) AS score_e4
FROM scored s JOIN documents d USING (doc_id)
ORDER BY s.score * (0.5 + d.n_chars / (d.n_chars + 10.0)) DESC, s.doc_id
LIMIT 10
"""

    sqls["fts_collapse"] = f"""
{or_cte},
best AS (
  SELECT s.doc_id, s.score, d.source,
         row_number() OVER (
           PARTITION BY d.source ORDER BY s.score DESC, s.doc_id
         ) AS rn
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
       doc_id, {_SCORE_E4} AS score_e4, source AS collapse_value
FROM best WHERE rn = 1
ORDER BY score DESC, doc_id LIMIT 8
"""

    sqls["terms_top_hits"] = f"""
{or_cte},
joined AS (
  SELECT s.doc_id, s.score, d.source AS value
  FROM scored s JOIN documents d USING (doc_id)
),
buckets AS (
  SELECT value, CAST(count(*) AS BIGINT) AS doc_count FROM joined
  GROUP BY value ORDER BY doc_count DESC, value LIMIT 5
),
hits AS (
  SELECT value, doc_id, score,
         row_number() OVER (
           PARTITION BY value ORDER BY score DESC, doc_id
         ) AS hit_rank
  FROM joined
)
SELECT b.value, b.doc_count, CAST(h.hit_rank AS INT) AS hit_rank,
       h.doc_id, CAST(floor(h.score * 10000 + 0.5) AS BIGINT) AS score_e4
FROM buckets b JOIN hits h USING (value) WHERE h.hit_rank <= 2
"""

    or_terms = ", ".join(f"'{t}'" for t in sorted(set(BM25_QUERY_OR.split())))
    sqls["terms_facet"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms}))
SELECT d.lang AS value, count(*) AS doc_count
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1 ORDER BY doc_count DESC, value LIMIT 10
"""

    sqls["stats_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms}))
SELECT count(*) AS n,
       CAST(min(d.n_chars) AS BIGINT) AS min_chars,
       CAST(max(d.n_chars) AS BIGINT) AS max_chars,
       CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
       CAST(floor(avg(d.n_chars * 1.0) * 1000000 + 0.5) AS BIGINT) AS avg_e6
FROM matched m JOIN documents d USING (doc_id)
"""

    sqls["terms_stats_nested"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms}))
SELECT d.lang AS value, count(*) AS doc_count,
       CAST(min(d.n_chars) AS BIGINT) AS min_chars,
       CAST(max(d.n_chars) AS BIGINT) AS max_chars,
       CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
       CAST(floor(avg(d.n_chars * 1.0) * 1000000 + 0.5) AS BIGINT) AS avg_e6
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1 ORDER BY doc_count DESC, value LIMIT 10
"""

    sqls["date_histogram"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms}))
SELECT CAST(floor(epoch(date_trunc('month',
         TIMESTAMP '2024-01-01 00:00:00'
         + (d.doc_id % 400) * INTERVAL 1 DAY))) AS BIGINT) AS bucket_epoch,
       count(*) AS doc_count
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1 ORDER BY 1
"""

    sqls["histogram_facet"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms}))
SELECT CAST(floor(d.n_chars / 200.0) * 200.0 AS BIGINT) AS bucket,
       count(*) AS doc_count
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1 ORDER BY bucket
"""

    # inputs: the two typo'd fuzzy-query terms; AUTO ladder mirrored as
    # CASE (len<3 -> 0, len<6 -> 1, else 2) per sparkfts.analysis.auto_fuzz
    fuzzy_in = ", ".join(f"'{t}'" for t in sorted(set(BM25_QUERY_FUZZY.split())))
    sqls["term_suggest"] = f"""
WITH dict AS (
  SELECT tok AS term, count(DISTINCT doc_id) AS df
  FROM ({_TOKS}) GROUP BY 1),
q(q_term) AS (SELECT unnest([{fuzzy_in}])),
qq AS (SELECT q_term,
              CASE WHEN length(q_term) < 3 THEN 0
                   WHEN length(q_term) < 6 THEN 1 ELSE 2 END AS maxd
       FROM q),
cand AS (
  SELECT qq.q_term AS input_term, d.term AS suggestion,
         levenshtein(d.term, qq.q_term) AS dist, d.df
  FROM dict d JOIN qq
    ON d.term <> qq.q_term
   AND abs(length(d.term) - length(qq.q_term)) <= qq.maxd
   AND levenshtein(d.term, qq.q_term) <= qq.maxd)
SELECT input_term, suggestion, CAST(dist AS INT) AS dist, df,
       CAST(row_number() OVER (PARTITION BY input_term
            ORDER BY dist, df DESC, suggestion) AS BIGINT) AS rank
FROM cand
QUALIFY rank <= 3
ORDER BY input_term, rank
"""

    # rescore: primary OR-BM25 top-50 window re-ranked by 2x the phrase
    # score (score_mode total). Primary CTE = the standard bm25 oracle
    # shape; phrase CTE = the standard phrase oracle shape.
    resc_terms = ", ".join(f"'{t}'" for t in sorted(set(BM25_QUERY_OR.split())))
    rp_terms = PHRASE_QUERY.split()
    rp_vals = ", ".join(f"('{t}', {i})" for i, t in enumerate(rp_terms))
    rp_in = ", ".join(f"'{t}'" for t in sorted(set(rp_terms)))
    sqls["fts_rescore_topk"] = f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM toks
       WHERE tok IN ({resc_terms}) GROUP BY doc_id, tok),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
prim AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
              * 2.2 ) AS pscore
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id),
win AS (SELECT doc_id, pscore FROM prim
        ORDER BY pscore DESC, doc_id LIMIT 50),
t2 AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
       FROM documents),
ptoks AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
                 unnest(tk) AS tok FROM t2),
pterms(term, i) AS (VALUES {rp_vals}),
pdfs AS (SELECT tok AS term, count(DISTINCT doc_id) AS df FROM ptoks
         WHERE tok IN ({rp_in}) GROUP BY 1),
idfsum AS (
  SELECT sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))) AS isum
  FROM pterms p JOIN pdfs d USING (term) CROSS JOIN stats s),
hits AS (
  SELECT tk.doc_id, tk.pos - p.i AS st
  FROM ptoks tk JOIN pterms p ON tk.tok = p.term
  WHERE tk.pos - p.i >= 0
  GROUP BY 1, 2 HAVING count(*) = {len(rp_terms)}),
freq AS (SELECT doc_id, count(*) AS tfp FROM hits GROUP BY 1),
ph AS (
  SELECT f.doc_id,
         i.isum * (f.tfp / (f.tfp + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                           / s.avgdl))) * 2.2 AS sscore
  FROM freq f JOIN dl USING (doc_id) CROSS JOIN idfsum i CROSS JOIN stats s),
comb AS (
  SELECT w.doc_id,
         1.0 * w.pscore + 2.0 * COALESCE(ph.sscore, 0) AS score
  FROM win w LEFT JOIN ph USING (doc_id))
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM comb ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["significant_terms"] = f"""
WITH toks AS ({_TOKS}),
matched AS (SELECT DISTINCT doc_id FROM toks WHERE tok IN ({or_terms})),
nm AS (SELECT count(*) AS n FROM matched),
nd AS (SELECT count(*) AS n FROM documents),
fg AS (
  SELECT tok AS term, count(DISTINCT doc_id) AS df_fg
  FROM toks WHERE doc_id IN (SELECT doc_id FROM matched)
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
bg AS (SELECT tok AS term, count(DISTINCT doc_id) AS df_bg
       FROM toks GROUP BY 1),
scored AS (
  SELECT f.term, f.df_fg, b.df_bg,
         (f.df_fg / (SELECT n * 1.0 FROM nm)
          - b.df_bg / (SELECT n * 1.0 FROM nd))
         * ((f.df_fg / (SELECT n * 1.0 FROM nm))
            / (b.df_bg / (SELECT n * 1.0 FROM nd))) AS s
  FROM fg f JOIN bg b USING (term))
SELECT term, df_fg, df_bg,
       CAST(floor(s * 1000000 + 0.5) AS BIGINT) AS score_e6
FROM scored WHERE s > 0 ORDER BY s DESC, term LIMIT 10
"""

    # significant_text: same JLH pin as significant_terms, but the
    # foreground is the AND match set's re-analyzed source text
    _st_and = ", ".join(
        f"'{t}'" for t in sorted(set(BM25_QUERY_AND.split()))
    )
    _st_n = len(set(BM25_QUERY_AND.split()))
    sqls["significant_text"] = f"""
WITH toks AS ({_TOKS}),
matched AS (SELECT doc_id FROM toks WHERE tok IN ({_st_and})
            GROUP BY doc_id HAVING count(DISTINCT tok) = {_st_n}),
nm AS (SELECT count(*) AS n FROM matched),
nd AS (SELECT count(*) AS n FROM documents),
fg AS (
  SELECT tok AS term, count(DISTINCT doc_id) AS df_fg
  FROM toks WHERE doc_id IN (SELECT doc_id FROM matched)
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
bg AS (SELECT tok AS term, count(DISTINCT doc_id) AS df_bg
       FROM toks GROUP BY 1),
scored AS (
  SELECT f.term, f.df_fg, b.df_bg,
         (f.df_fg / (SELECT n * 1.0 FROM nm)
          - b.df_bg / (SELECT n * 1.0 FROM nd))
         * ((f.df_fg / (SELECT n * 1.0 FROM nm))
            / (b.df_bg / (SELECT n * 1.0 FROM nd))) AS s
  FROM fg f JOIN bg b USING (term))
SELECT term, df_fg, df_bg,
       CAST(floor(s * 1000000 + 0.5) AS BIGINT) AS score_e6
FROM scored WHERE s > 0 ORDER BY s DESC, term LIMIT 10
"""

    sqls["scripted_metric"] = f"""
WITH toks AS ({_TOKS}),
matched AS (SELECT doc_id FROM toks WHERE tok IN ({_st_and})
            GROUP BY doc_id HAVING count(DISTINCT tok) = {_st_n})
SELECT CAST(count(*) AS BIGINT) AS doc_count,
       CAST(floor(max(sqrt(CAST(n_chars AS DOUBLE))
                      + CAST(n_chars AS DOUBLE) / 7) * 10000 + 0.5)
            AS BIGINT) AS value_e4
FROM documents WHERE doc_id IN (SELECT doc_id FROM matched)
"""

    sqls["fts_terms_lookup"] = _bm25_sql(
        sorted(set(BM25_QUERY_OR.split())),
        False,
        extra_where=(
            "AND doc_id IN (SELECT doc_id FROM documents WHERE source IN "
            f"(SELECT source FROM documents WHERE doc_id = {TERMS_LOOKUP_DOC}))"
        ),
    )

    # rank_eval: ranks from the pinned BM25 OR top-10; relevant = docs
    # containing the token 'vector' (the entry's deterministic ratings)
    sqls["rank_eval_metrics"] = f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf FROM toks
  WHERE tok IN ({or_terms}) GROUP BY doc_id, tok
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
              * 2.2 ) AS score
  FROM tf
  JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
),
topk AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored ORDER BY score DESC, doc_id LIMIT 10
),
rel AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'vector'),
hits AS (
  SELECT t.rank,
         CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
  FROM topk t LEFT JOIN rel r USING (doc_id)
),
m AS (
  SELECT
    sum(is_rel) * 1.0 / count(*) AS precision_v,
    sum(is_rel) * 1.0 / (SELECT count(*) FROM rel) AS recall_v,
    coalesce(1.0 / min(CASE WHEN is_rel = 1 THEN rank END), 0.0) AS mrr_v,
    coalesce(sum(CASE WHEN is_rel = 1
                      THEN 1.0 / log2(rank + 1.0) END), 0.0) AS dcg_v
  FROM hits
)
SELECT 0 AS query_id,
       CAST(floor(precision_v * 1000000 + 0.5) AS BIGINT) AS precision_e6,
       CAST(floor(recall_v * 1000000 + 0.5) AS BIGINT) AS recall_e6,
       CAST(floor(mrr_v * 1000000 + 0.5) AS BIGINT) AS mrr_e6,
       CAST(floor(dcg_v * 1000000 + 0.5) AS BIGINT) AS dcg_e6
FROM m
"""

    sqls["more_like_this"] = f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
src AS (SELECT min(doc_id) AS d FROM documents),
dtf AS (SELECT tok AS term, count(*) AS tf FROM toks
        WHERE doc_id = (SELECT d FROM src) GROUP BY 1
        HAVING count(*) >= 1),
ddf AS (SELECT tok AS term, count(DISTINCT doc_id) AS df
        FROM toks GROUP BY 1),
qterms AS (
  SELECT t.term
  FROM dtf t JOIN ddf d USING (term) CROSS JOIN stats s
  WHERE d.df >= 2
  ORDER BY t.tf * ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) DESC,
           t.term
  LIMIT 10),
tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf FROM toks
  WHERE tok IN (SELECT term FROM qterms) GROUP BY doc_id, tok
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
              * 2.2 ) AS score
  FROM tf
  JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored WHERE doc_id <> (SELECT d FROM src)
ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["cardinality_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms}))
SELECT count(DISTINCT d.lang) AS cardinality
FROM matched m JOIN documents d USING (doc_id)
"""

    sqls["percentiles_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms})),
v AS (SELECT CAST(d.n_chars AS DOUBLE) AS x
      FROM matched m JOIN documents d USING (doc_id))
SELECT CAST(p AS BIGINT) AS pct,
       CAST(floor(q * 1000000 + 0.5) AS BIGINT) AS value_e6
FROM (
  SELECT unnest([25.0, 50.0, 75.0, 95.0]) AS p,
         unnest(quantile_cont(x, [0.25, 0.50, 0.75, 0.95])) AS q
  FROM v)
"""

    sqls["fts_wildcard_topk"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf FROM toks
  WHERE tok LIKE 's%a%' GROUP BY doc_id, tok
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         max( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
              * 2.2 ) AS score
  FROM tf
  JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["fts_regexp_topk"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf FROM toks
  WHERE regexp_full_match(tok, 's(c|p)a[a-z]+') GROUP BY doc_id, tok
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         max( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl)))
              * 2.2 ) AS score
  FROM tf
  JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    and_terms = ", ".join(f"'{t}'" for t in sorted(set(BM25_QUERY_AND.split())))
    sqls["highlight_spans"] = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
pos AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS p, unnest(tk) AS tok
        FROM t)
SELECT doc_id, CAST(min(p) AS BIGINT) AS first_tok_pos,
       count(*) AS n_hit_tokens
FROM pos WHERE tok IN ({and_terms}) GROUP BY doc_id
"""

    sqls["match_all"] = """
SELECT row_number() OVER (ORDER BY doc_id) AS rank, doc_id,
       CAST(10000 AS BIGINT) AS score_e4
FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 10)
"""

    sqls["threshold_filter"] = """
SELECT event_id, user_id, event_type,
       CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS value_e6
FROM events WHERE value >= 0.9
"""

    sqls["projection_rename"] = """
SELECT event_id AS id, event_type AS name,
       CAST(user_id AS VARCHAR) AS user_str
FROM events
"""

    sqls["type_lookup"] = """
SELECT CASE WHEN event_type IN ('signup') THEN 'Person'
            WHEN event_type IN ('purchase', 'error') THEN 'Organization'
            ELSE 'Thing' END AS node_type,
       count(*) AS n
FROM events GROUP BY 1
"""

    sqls["distinct_fields"] = "SELECT DISTINCT event_type FROM events"

    sqls["batch_chunks"] = """
SELECT event_id // 1000 AS batch_id, count(*) AS n
FROM events GROUP BY 1
"""

    sqls["graph_dyads"] = """
SELECT 'Person' AS from_type, CAST(user_id AS VARCHAR) AS from_key,
       upper(event_type) AS edge_type, 'Thing' AS to_type,
       CAST(event_id AS VARCHAR) AS to_key
FROM events WHERE value >= 400.0
"""

    sqls["topk_per_group"] = """
WITH r AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rnk
  FROM events)
SELECT event_type, rnk, event_id,
       CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS value_e6
FROM r WHERE rnk <= 2
"""

    sqls["tumbling_window"] = """
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
         AS window_epoch,
       event_type, count(*) AS n_events,
       CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS sum_value_e2
FROM events GROUP BY 1, 2
"""

    sqls["session_windows"] = """
WITH e AS (SELECT user_id, event_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS ep
           FROM events),
m AS (
  SELECT user_id, event_id, ep,
         CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w > 1800
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)),
s AS (
  SELECT user_id, ep,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ep, event_id
                             ROWS UNBOUNDED PRECEDING) - 1 AS INT)
           AS session_id
  FROM m)
SELECT user_id, session_id,
       CAST(min(ep) AS BIGINT) AS session_start_epoch,
       count(*) AS n_events,
       CAST(max(ep) - min(ep) AS BIGINT) AS duration_sec
FROM s GROUP BY 1, 2
"""

    sqls["dedup_exact"] = """
WITH dup AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text FROM documents)
SELECT md5(text) AS content_md5, count(*) AS n_dups,
       min(doc_id) AS keep_doc_id
FROM dup GROUP BY 1 HAVING count(*) > 1 ORDER BY 1
"""

    sqls["dedup_jaccard"] = f"""
WITH s AS ({_GRAMS.replace("FROM documents", "FROM documents")}),
sf AS (SELECT * FROM s WHERE doc_id < 120),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
  FROM sf a JOIN sf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT a_id, b_id,
       CAST(floor(n_inter * 1000000 / (sa.n_sh + sb.n_sh - n_inter)) AS BIGINT)
         AS jaccard_e6
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE floor(n_inter * 1000000 / (sa.n_sh + sb.n_sh - n_inter)) >= 15000
"""

    sqls["dedup_minhash_lsh"] = f"""
{_MINHASH}
, keys AS (
  SELECT doc_id, i // 2 AS band,
         string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY i) AS band_key
  FROM sig GROUP BY doc_id, i // 2)
SELECT band, band_key, count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM keys GROUP BY 1, 2 HAVING count(*) > 1 ORDER BY 1, 2
"""

    sqls["dedup_clusters"] = f"""
{_MINHASH.replace("WITH ", "WITH RECURSIVE ", 1)}
, keys AS (
  SELECT doc_id, i // 2 AS band,
         string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY i) AS band_key
  FROM sig GROUP BY doc_id, i // 2),
cpairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM keys a JOIN keys b
    ON a.band = b.band AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM cpairs
  UNION SELECT b_id, a_id FROM cpairs),
reach(doc_id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.doc_id)
SELECT doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id,
       doc_id = min(lbl) AS is_canonical
FROM reach GROUP BY doc_id
"""

    sqls["dedup_embedding_lsh"] = f"""
WITH ee AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS x
  FROM embeddings),
dots AS (
  SELECT vec_id, p,
         sum(x * ((1103515245 * ((p * 1024 + d + 1) % {HASH_P}) + 12345)
                  % {HASH_P} - {(HASH_P - 1) // 2})) AS dot
  FROM ee CROSS JOIN (SELECT unnest(range(0, 8)) AS p)
  GROUP BY 1, 2),
buckets AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)
              AS BIGINT) AS bucket
  FROM dots GROUP BY 1),
q AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
      FROM embeddings),
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             sum(a.v * b.v) AS dot, sum(a.v * a.v) AS na,
             sum(b.v * b.v) AS nb
      FROM q a JOIN q b USING (pos)
      JOIN buckets ba ON ba.vec_id = a.vec_id
      JOIN buckets bb ON bb.vec_id = b.vec_id AND ba.bucket = bb.bucket
      WHERE a.vec_id < b.vec_id
      GROUP BY 1, 2)
SELECT id_a, id_b,
       CAST(floor(dot / (sqrt(na) * sqrt(nb)) * 1000000 + 0.5) AS BIGINT)
         AS cos_e6
FROM p WHERE na > 0 AND nb > 0
  AND CAST(floor(dot / (sqrt(na) * sqrt(nb)) * 1000000 + 0.5) AS BIGINT)
      >= 400000
"""

    sqls["dedup_simhash"] = f"""
WITH tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM ({_TOKS}) GROUP BY 1, 2),
h AS (
  SELECT doc_id, tf,
         CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {HASH_P} AS h
  FROM tf),
bits AS (
  SELECT doc_id, b, sum(tf * (((h >> b) & 1) * 2 - 1)) AS vb
  FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS b)
  GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(CASE WHEN vb > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT)
         AS simhash
FROM bits GROUP BY 1
"""

    sqls["decontaminate"] = f"""
WITH tg AS (
  SELECT doc_id,
         unnest(list_distinct([array_to_string(t[i:i+7], ' ')
                               for i in range(1, len(t) - 6)])) AS gram
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') t
        FROM documents)),
th AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) % {HASH_P}
           AS gram31
  FROM tg),
eh AS (SELECT doc_id AS eval_id, gram31 FROM th WHERE doc_id % 97 = 0)
SELECT t.doc_id, e.eval_id, count(*) AS n_shared
FROM th t JOIN eh e USING (gram31)
GROUP BY 1, 2
"""

    lang_cases = []
    for lang in ["de", "en", "es", "fr"]:
        lang_cases.append(f"WHEN s_{lang} = best THEN '{lang}'")
    markers = {
        "de": "'der','die','das','und','ist','nicht','ein','mit'",
        "en": "'the','of','and','to','a','in','is','it'",
        "es": "'el','la','de','que','y','en','un','es'",
        "fr": "'le','la','de','et','un','est','que','pour'",
    }
    sqls["source_cap_sample"] = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn <= 5
"""

    # same integer LCG as sparkfts/ops/sampling.py (_keep_hash):
    # bucket = ((doc_id % P + P) % P * A + B) % P % 1000
    sqls["stratified_sample"] = """
SELECT doc_id, lang FROM documents
WHERE ((doc_id % 2147483647 + 2147483647) % 2147483647
       * 1103515245 + 12345) % 2147483647 % 1000
      < CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 100 ELSE 0 END
"""

    # ops/textclean.py parity: same tokenizer, same float association
    # (1.0 - a/b) * 1e6 + 0.5 — IEEE-identical across engines
    sqls["repetition_stats"] = f"""
WITH tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS t
  FROM documents
),
cnt AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(t) AS tok FROM tk) GROUP BY 1, 2
),
top AS (
  SELECT doc_id, max(c) AS top_count, CAST(sum(c) AS BIGINT) AS n_tokens,
         count(*) AS n_distinct
  FROM cnt GROUP BY 1
),
bg AS (
  SELECT doc_id, greatest(len(t) - 1, 0) AS n_bigrams,
         len(list_distinct([t[i] || ' ' || t[i + 1]
                            for i in range(1, len(t))]))
           AS n_distinct_bigrams
  FROM tk
)
SELECT tk.doc_id,
       COALESCE(top.n_tokens, 0) AS n_tokens,
       CASE WHEN COALESCE(top.n_tokens, 0) > 0 THEN
         CAST(floor((1.0 - top.n_distinct / CAST(top.n_tokens AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END
         AS dup_token_frac_e6,
       CASE WHEN bg.n_bigrams > 0 THEN
         CAST(floor((1.0 - bg.n_distinct_bigrams
                     / CAST(bg.n_bigrams AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END
         AS dup_bigram_frac_e6,
       CASE WHEN COALESCE(top.n_tokens, 0) > 0 THEN
         CAST(floor(top.top_count / CAST(top.n_tokens AS DOUBLE)
                    * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END
         AS top_token_frac_e6
FROM tk LEFT JOIN top ON tk.doc_id = top.doc_id
        LEFT JOIN bg ON tk.doc_id = bg.doc_id
"""

    from sparkfts.ops.textclean import EMAIL_RE, IPV4_RE, PHONE_RE

    sqls["pii_redact"] = f"""
WITH base AS (
  SELECT doc_id,
         text || ' contact ' || source || '@example.com ip '
         || CAST(doc_id % 256 AS VARCHAR) || '.'
         || CAST((doc_id * 7) % 256 AS VARCHAR) || '.0.1 tel 555-'
         || lpad(CAST((doc_id * 13) % 1000 AS VARCHAR), 3, '0')
         || '-1234' AS t0
  FROM documents
),
s AS (
  SELECT doc_id, t0,
         regexp_replace(t0, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
  FROM base
),
s2 AS (SELECT *, regexp_replace(t1, '{IPV4_RE}', '<IP>', 'g') AS t2 FROM s),
s3 AS (
  SELECT *, regexp_replace(t2, '{PHONE_RE}', '<PHONE>', 'g') AS t3 FROM s2
)
SELECT doc_id, md5(t3) AS redacted_md5,
       CAST(len(regexp_extract_all(t0, '{EMAIL_RE}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(t1, '{IPV4_RE}')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(t2, '{PHONE_RE}')) AS BIGINT)
         AS n_phones
FROM s3
"""

    _URL_SYNTH = """
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN
           'HTTPS://WWW.Host' || CAST(doc_id % 7 AS VARCHAR)
           || '.COM:443/p/' || CAST(doc_id AS VARCHAR)
           || '?utm_source=x&id=' || CAST(doc_id AS VARCHAR) || '#top'
         ELSE
           'http://blog' || CAST(doc_id % 5 AS VARCHAR)
           || '.Example.NET:80/a/' || CAST(doc_id AS VARCHAR)
           || '?utm_campaign=y'
         END AS url
  FROM documents
"""
    # replay of ops/textclean.py canonicalize_urls: lowercase the
    # scheme://authority prefix, strip default ports (RE2 backref \\1 =
    # Java $1), then the pinned URL_STEPS chain with the 'g' flag
    # (Spark regexp_replace is replace-all)
    _CANON = r"""
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
        || url[length(regexp_extract(url,
             '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) + 1:],
      '^(https://[^/?#:]*):443(?:/|$)', '\1/'),
      '^(http://[^/?#:]*):80(?:/|$)', '\1/'),
      '#.*$', '', 'g'),
      '&utm_[A-Za-z0-9_]*=[^&#]*', '', 'g'),
      '\?utm_[A-Za-z0-9_]*=[^&#]*&', '?', 'g'),
      '\?utm_[A-Za-z0-9_]*=[^&#]*$', '', 'g') AS canon_url,
    regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/?#:]*)', 1) AS host
  FROM u
"""
    sqls["url_canonicalize"] = (
        f"WITH u AS ({_URL_SYNTH})\nSELECT doc_id, canon_url, host "
        f"FROM ({_CANON})"
    )
    sqls["host_doc_counts"] = (
        f"WITH u AS ({_URL_SYNTH})\nSELECT host, count(*) AS n_docs "
        f"FROM ({_CANON}) GROUP BY host"
    )

    # range agg: every requested range, request order preserved via a
    # pinned ordinal; from inclusive, to exclusive
    sqls["range_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms})),
j AS (SELECT d.n_chars FROM matched m JOIN documents d USING (doc_id))
SELECT 'small' AS key,
       CAST(coalesce(sum(CASE WHEN n_chars < 150.0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS doc_count FROM j
UNION ALL
SELECT 'mid',
       CAST(coalesce(sum(CASE WHEN n_chars >= 150.0 AND n_chars < 300.0
                          THEN 1 ELSE 0 END), 0) AS BIGINT) FROM j
UNION ALL
SELECT 'large',
       CAST(coalesce(sum(CASE WHEN n_chars >= 300.0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) FROM j
"""

    sqls["filters_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms})),
j AS (SELECT d.lang, d.n_chars FROM matched m JOIN documents d USING (doc_id))
SELECT 'english' AS key,
       CAST(coalesce(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS doc_count FROM j
UNION ALL
SELECT 'big',
       CAST(coalesce(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END), 0)
            AS BIGINT) FROM j
UNION ALL
SELECT 'absent',
       CAST(coalesce(sum(CASE WHEN lang = 'zz' THEN 1 ELSE 0 END), 0)
            AS BIGINT) FROM j
UNION ALL
SELECT '_other_',
       CAST(coalesce(sum(CASE WHEN NOT (lang = 'en') AND NOT (n_chars >= 200)
                          AND NOT (lang = 'zz') THEN 1 ELSE 0 END), 0)
            AS BIGINT) FROM j
"""

    sqls["missing_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms}))
SELECT CAST(coalesce(sum(CASE WHEN nullif(d.lang, 'de') IS NULL
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS doc_count
FROM matched m JOIN documents d USING (doc_id)
"""

    # composite agg: lexicographic after-key pagination
    sqls["composite_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms})),
b AS (
  SELECT d.lang AS lang,
         floor(d.n_chars / 100.0) * 100.0 AS size_bucket,
         count(*) AS doc_count
  FROM matched m JOIN documents d USING (doc_id)
  GROUP BY 1, 2
)
SELECT lang, size_bucket, CAST(doc_count AS BIGINT) AS doc_count
FROM b
WHERE lang > 'de' OR (lang = 'de' AND size_bucket > 100.0)
ORDER BY lang, size_bucket LIMIT 5
"""

    # hybrid RRF: BM25 OR-mode leg (depth 100) + exact quantized-cosine
    # leg (depth 100), rrf = 1.0/(60+rank) summed bm25-then-ann (the
    # engine's sorted fold; two-addend IEEE sums are order-exact)
    hybrid_terms = BM25_QUERY_OR.split()
    sqls["hybrid_rrf_topk"] = f"""
{_bm25_scored_cte(hybrid_terms, conjunctive=False)},
br AS (
  SELECT doc_id, r FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id) AS r
    FROM scored
  ) WHERE r <= 100
),
qq AS (
  SELECT generate_subscripts(e, 1) AS pos,
         CAST(floor(CAST(unnest(e) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
  FROM (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
),
ee AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
              CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
       FROM embeddings),
dots AS (
  SELECT e.vec_id, sum(e.v * q.v) AS dot, sum(e.v * e.v) AS na
  FROM ee e JOIN qq q USING (pos) GROUP BY e.vec_id),
nq AS (SELECT sum(v * v) AS nq FROM qq),
coss AS (
  SELECT vec_id,
         CAST(floor(dot / (sqrt(na) * sqrt(nq)) * 1000000 + 0.5) AS BIGINT)
           AS cos_e6
  FROM dots, nq WHERE na > 0
),
ar AS (
  SELECT vec_id AS doc_id, r FROM (
    SELECT vec_id,
           row_number() OVER (ORDER BY cos_e6 DESC, vec_id) AS r
    FROM coss
  ) WHERE r <= 100
),
fused AS (
  SELECT COALESCE(br.doc_id, ar.doc_id) AS doc_id,
         COALESCE(1.0 / (60 + br.r), 0) + COALESCE(1.0 / (60 + ar.r), 0)
           AS rrf
  FROM br FULL OUTER JOIN ar ON br.doc_id = ar.doc_id
)
SELECT row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank, doc_id,
       CAST(floor(rrf * 1000000000 + 0.5) AS BIGINT) AS rrf_e9
FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
"""

    sqls["lang_id"] = f"""
WITH t AS ({_TOKS}),
s AS (
  SELECT doc_id,
         sum(CASE WHEN tok IN ({markers['de']}) THEN 1 ELSE 0 END) AS s_de,
         sum(CASE WHEN tok IN ({markers['en']}) THEN 1 ELSE 0 END) AS s_en,
         sum(CASE WHEN tok IN ({markers['es']}) THEN 1 ELSE 0 END) AS s_es,
         sum(CASE WHEN tok IN ({markers['fr']}) THEN 1 ELSE 0 END) AS s_fr
  FROM t GROUP BY doc_id),
g AS (SELECT *, greatest(s_de, s_en, s_es, s_fr) AS best FROM s)
SELECT doc_id,
       CASE WHEN best <= 0 THEN 'und' {' '.join(lang_cases)} END AS lang_pred
FROM g
"""

    sqls["quality_scores"] = f"""
WITH f AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS n_tokens,
         length(text) AS n_chars,
         list_aggregate(list_transform(
             regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'),
             x -> length(x)), 'sum') AS tok_chars,
         len(list_filter(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'),
             x -> x IN ('the','of','and','to','a','in','is','it','that',
                        'for','on','as','with'))) AS stop_hits,
         length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS non_alnum
  FROM documents)
SELECT doc_id, n_tokens, n_chars,
       CAST(floor(tok_chars * 1000000 / greatest(n_tokens, 1)) AS BIGINT)
         AS mean_tok_len_micro,
       CAST(floor(stop_hits * 1000000 / greatest(n_tokens, 1)) AS BIGINT)
         AS stopword_ratio_micro,
       CAST(floor(non_alnum * 1000000 / greatest(n_chars, 1)) AS BIGINT)
         AS punct_ratio_micro,
       (n_tokens >= 5
        AND floor(tok_chars * 1000000 / greatest(n_tokens, 1))
            BETWEEN 1500000 AND 12000000
        AND floor(non_alnum * 1000000 / greatest(n_chars, 1)) < 300000)
         AS keep
FROM f
"""

    sqls["token_counts"] = f"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS word_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
         AS bpe_tokens
FROM documents
"""

    sqls["fingerprints"] = f"""
WITH t AS (
  SELECT doc_id,
         generate_subscripts(regexp_extract_all(lower(text),
             '{TOKEN_RE_SQL}'), 1) - 1 AS pos,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok
  FROM documents),
h AS (
  SELECT doc_id, pos % 29 AS s,
         CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {HASH_P} AS h
  FROM t),
r AS (
  SELECT doc_id,
         ((h << s) | (h >> (32 - s))) & 4294967295 AS rh
  FROM h)
SELECT doc_id, bit_xor(rh) AS fingerprint FROM r GROUP BY doc_id
"""

    sqls["dedup_embedding_cosine"] = """
WITH ee AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
            FROM embeddings),
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             sum(a.v * b.v) AS dot, sum(a.v * a.v) AS na, sum(b.v * b.v) AS nb
      FROM ee a JOIN ee b USING (pos) WHERE a.vec_id < b.vec_id
      GROUP BY 1, 2)
SELECT id_a, id_b,
       CAST(floor(dot / (sqrt(na) * sqrt(nb)) * 1000000 + 0.5) AS BIGINT)
         AS cos_e6
FROM p WHERE na > 0 AND nb > 0
  AND CAST(floor(dot / (sqrt(na) * sqrt(nb)) * 1000000 + 0.5) AS BIGINT)
      >= 400000
"""

    sqls["ann_cosine_topk"] = """
WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
qq AS (SELECT generate_subscripts(e, 1) AS pos,
              CAST(floor(CAST(unnest(e) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v FROM q),
ee AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
              CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
       FROM embeddings),
dots AS (
  SELECT e.vec_id, sum(e.v * q.v) AS dot, sum(e.v * e.v) AS na
  FROM ee e JOIN qq q USING (pos) GROUP BY e.vec_id),
nq AS (SELECT sum(v * v) AS nq FROM qq)
SELECT vec_id,
       CAST(floor(dot / (sqrt(na) * sqrt(nq)) * 1000000 + 0.5) AS BIGINT)
         AS cos_e6
FROM dots, nq WHERE na > 0
ORDER BY cos_e6 DESC, vec_id LIMIT 10
"""

    sqls["ann_lsh_topk"] = f"""
WITH ee AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS x
  FROM embeddings),
dots AS (
  SELECT vec_id, p,
         sum(x * ((1103515245 * ((p * 1024 + d + 1) % {HASH_P}) + 12345)
                  % {HASH_P} - {(HASH_P - 1) // 2})) AS dot
  FROM ee CROSS JOIN (SELECT unnest(range(0, 8)) AS p)
  GROUP BY 1, 2),
buckets AS (
  SELECT vec_id,
         sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
  FROM dots GROUP BY 1),
qb AS (SELECT bucket AS qbucket FROM buckets WHERE vec_id = 0),
cand AS (
  SELECT b.vec_id FROM buckets b, qb
  WHERE bit_count(xor(b.bucket, qb.qbucket)) <= 1),
q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
qq AS (SELECT generate_subscripts(e, 1) AS pos,
              CAST(floor(CAST(unnest(e) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v FROM q),
ce AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
              CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
       FROM embeddings WHERE vec_id IN (SELECT vec_id FROM cand)),
d2 AS (
  SELECT e.vec_id, sum(e.v * q.v) AS dot, sum(e.v * e.v) AS na
  FROM ce e JOIN qq q USING (pos) GROUP BY e.vec_id),
nq AS (SELECT sum(v * v) AS nq FROM qq)
SELECT vec_id,
       CAST(floor(dot / (sqrt(na) * sqrt(nq)) * 1000000 + 0.5) AS BIGINT)
         AS cos_e6
FROM d2, nq WHERE na > 0
ORDER BY cos_e6 DESC, vec_id LIMIT 10
"""

    sqls["ann_ivf_topk"] = """
WITH ee AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
  FROM embeddings),
cent AS (
  SELECT vec_id AS src_id, row_number() OVER (ORDER BY vec_id) - 1
           AS centroid_id
  FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
cvec AS (SELECT c.centroid_id, e.pos, e.v
         FROM cent c JOIN ee e ON e.vec_id = c.src_id),
d2 AS (
  SELECT e.vec_id, c.centroid_id, sum((e.v - c.v) * (e.v - c.v)) AS d2
  FROM ee e JOIN cvec c USING (pos) GROUP BY 1, 2),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, centroid_id) AS rn
    FROM d2) WHERE rn = 1),
probes AS (
  SELECT centroid_id FROM d2 WHERE vec_id = 0
  ORDER BY d2, centroid_id LIMIT 2),
cand AS (SELECT vec_id FROM assign
         WHERE centroid_id IN (SELECT centroid_id FROM probes)),
qq AS (SELECT pos, v FROM ee WHERE vec_id = 0),
ce AS (SELECT vec_id, pos, v FROM ee
       WHERE vec_id IN (SELECT vec_id FROM cand)),
dots AS (
  SELECT e.vec_id, sum(e.v * q.v) AS dot, sum(e.v * e.v) AS na
  FROM ce e JOIN qq q USING (pos) GROUP BY 1),
nq AS (SELECT sum(v * v) AS nq FROM qq)
SELECT vec_id,
       CAST(floor(dot / (sqrt(na) * sqrt(nq)) * 1000000 + 0.5) AS BIGINT)
         AS cos_e6
FROM dots, nq WHERE na > 0
ORDER BY cos_e6 DESC, vec_id LIMIT 10
"""

    sqls["ann_lsh_buckets"] = f"""
WITH ee AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS x
  FROM embeddings),
dots AS (
  SELECT vec_id, p,
         sum(x * ((1103515245 * ((p * 1024 + d + 1) % {HASH_P}) + 12345)
                  % {HASH_P} - {(HASH_P - 1) // 2})) AS dot
  FROM ee CROSS JOIN (SELECT unnest(range(0, 8)) AS p)
  GROUP BY 1, 2)
SELECT vec_id,
       CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT)
         AS bucket
FROM dots GROUP BY 1
"""

    sqls["multimodal_meta"] = f"""
SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       'unknown' AS container,
       CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)
         % {HASH_P} AS content_hash31
FROM documents
"""

    sqls["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_qty_e2,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_price_e2,
       count(*) AS n_rows
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
"""
    sqls["shipping_priority"] = """
SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS o_epoch,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_e2
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2 ORDER BY revenue_e2 DESC, o_orderkey LIMIT 10
"""

    sqls["region_revenue"] = """
SELECT n_name, CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                   + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_e2
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1 ORDER BY revenue_e2 DESC, n_name
"""
    # multimodal_decode: the fake-decode byte math (mean of consecutive
    # 8-byte chunks of the first 64 bytes / 255) is reproduced exactly
    # over the ASCII payloads; zero-padding matches ascii(substr beyond
    # len) = 0. Both sides fold as (sum/8)/255 in float64 (integer sums
    # are exact, /8 is a power of two), so the e6 quantization is stable.
    sqls["multimodal_decode"] = """
WITH grid AS (
  SELECT d.doc_id, r1.j, 8 * r1.j + r2.i + 1 AS n, d.text
  FROM documents d, range(8) r1(j), range(8) r2(i)
)
SELECT doc_id AS media_id, CAST(j AS INT) AS j,
       CAST(floor(sum(ascii(substr(text, CAST(n AS INT), 1))) / 8.0 / 255.0
                  * 1000000 + 0.5) AS BIGINT) AS f_e6
FROM grid GROUP BY doc_id, j
"""

    # --- round-4 wave 2: score shaping -----------------------------------
    rf_cte = _bm25_scored_cte(sorted(set(BM25_QUERY_AND.split())), True)
    sqls["fts_rank_feature"] = f"""
{rf_cte}
SELECT s.doc_id,
       CAST(floor((s.score + 0.7 * (d.n_chars / (d.n_chars + 200.0)))
                  * 10000 + 0.5) AS BIGINT) AS score_e4
FROM scored s JOIN documents d USING (doc_id)
ORDER BY s.score + 0.7 * (d.n_chars / (d.n_chars + 200.0)) DESC, s.doc_id
LIMIT 10
"""

    # gauss decay mirrored with the engine's exact float association:
    # sigma2 = -(scale*scale)/(2*ln(decay)); factor =
    # exp(-(max(|v-origin|-offset,0))^2 / (2*sigma2)); missing -> 1
    decay_expr = (
        "exp(-pow(greatest(abs(CAST(1704067200 + (d.doc_id % 400) * 86400"
        " AS DOUBLE) - 1717200000.0) - 864000.0, 0.0), 2)"
        " / (2.0 * (-(5184000.0 * 5184000.0) / (2.0 * ln(0.5)))))"
    )
    sqls["fts_decay_recency"] = f"""
{rf_cte}
SELECT s.doc_id,
       CAST(floor(s.score * {decay_expr} * 10000 + 0.5) AS BIGINT)
         AS score_e4
FROM scored s JOIN documents d USING (doc_id)
ORDER BY s.score * {decay_expr} DESC, s.doc_id LIMIT 10
"""

    sqls["fts_boosting_topk"] = f"""
{rf_cte},
neg AS (SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok = 'vector')
SELECT s.doc_id,
       CAST(floor(CASE WHEN n.doc_id IS NOT NULL THEN s.score * 0.4
                       ELSE s.score END * 10000 + 0.5) AS BIGINT)
         AS score_e4
FROM scored s LEFT JOIN neg n USING (doc_id)
ORDER BY CASE WHEN n.doc_id IS NOT NULL THEN s.score * 0.4
              ELSE s.score END DESC, s.doc_id
LIMIT 10
"""

    or_terms4 = ", ".join(
        f"'{t}'" for t in sorted(set(BM25_QUERY_OR.split()))
    )
    sqls["fts_constant_score"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms4}))
SELECT CAST(row_number() OVER (ORDER BY doc_id) AS INT) AS rank,
       doc_id, CAST(15000 AS BIGINT) AS score_e4
FROM matched ORDER BY doc_id LIMIT 12
"""

    # --- pipeline aggregations over the monthly date_histogram -----------
    mb_cte = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms4})),
mb AS (
  SELECT CAST(floor(epoch(date_trunc('month',
           TIMESTAMP '2024-01-01 00:00:00'
           + (d.doc_id % 400) * INTERVAL 1 DAY))) AS BIGINT)
           AS bucket_epoch,
         count(*) AS doc_count
  FROM matched m JOIN documents d USING (doc_id)
  GROUP BY 1)
"""
    sqls["pipeline_percentiles_bucket"] = f"""
{mb_cte}
SELECT CAST(pct AS BIGINT) AS pct,
       CAST(floor(v * 1000000 + 0.5) AS BIGINT) AS value_e6
FROM (
  SELECT 25 AS pct,
         quantile_cont(CAST(doc_count AS DOUBLE), 0.25) AS v FROM mb
  UNION ALL SELECT 50, quantile_cont(CAST(doc_count AS DOUBLE), 0.50)
  FROM mb
  UNION ALL SELECT 75, quantile_cont(CAST(doc_count AS DOUBLE), 0.75)
  FROM mb
  UNION ALL SELECT 95, quantile_cont(CAST(doc_count AS DOUBLE), 0.95)
  FROM mb
) ORDER BY pct
"""

    sqls["pipeline_cumulative_cardinality"] = """
WITH f AS (
  SELECT user_id,
         CAST(floor(epoch(min(date_trunc('day', ts)))) AS BIGINT)
           AS bucket
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
per AS (SELECT bucket, count(*) AS c FROM f GROUP BY 1),
ab AS (SELECT DISTINCT CAST(floor(epoch(date_trunc('day', ts)))
                            AS BIGINT) AS bucket
       FROM events)
SELECT bucket AS bucket_epoch,
       CAST(COALESCE(c, 0) AS BIGINT) AS first_seen,
       CAST(sum(COALESCE(c, 0)) OVER (ORDER BY bucket
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
FROM ab LEFT JOIN per USING (bucket)
ORDER BY bucket_epoch
"""

    sqls["pipeline_cumsum"] = f"""
{mb_cte}
SELECT bucket_epoch, CAST(doc_count AS BIGINT) AS doc_count,
       CAST(sum(doc_count) OVER (ORDER BY bucket_epoch
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
FROM mb ORDER BY bucket_epoch
"""

    sqls["pipeline_derivative"] = f"""
{mb_cte}
SELECT bucket_epoch,
       CAST(doc_count - lag(doc_count, 1)
              OVER (ORDER BY bucket_epoch) AS BIGINT) AS deriv
FROM mb
QUALIFY lag(doc_count, 1) OVER (ORDER BY bucket_epoch) IS NOT NULL
ORDER BY bucket_epoch
"""

    sqls["pipeline_moving_avg"] = f"""
{mb_cte}
SELECT bucket_epoch,
       CAST(floor(avg(doc_count * 1.0) OVER (ORDER BY bucket_epoch
              ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
              * 1000000 + 0.5) AS BIGINT) AS mavg_e6
FROM mb
QUALIFY avg(doc_count * 1.0) OVER (ORDER BY bucket_epoch
          ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) IS NOT NULL
ORDER BY bucket_epoch
"""

    sqls["pipeline_stats_bucket"] = f"""
{mb_cte}
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(min(doc_count) AS BIGINT) AS min_count,
       CAST(max(doc_count) AS BIGINT) AS max_count,
       CAST(sum(doc_count) AS BIGINT) AS sum_count,
       CAST(floor(avg(doc_count * 1.0) * 1000000 + 0.5) AS BIGINT)
         AS avg_e6
FROM mb
"""

    sqls["pipeline_bucket_sort"] = f"""
{mb_cte}
SELECT bucket_epoch, CAST(doc_count AS BIGINT) AS doc_count
FROM mb ORDER BY doc_count DESC, bucket_epoch LIMIT 3
"""

    # --- match_bool_prefix ------------------------------------------------
    sqls["fts_bool_prefix"] = f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tfx AS (SELECT doc_id, tok AS term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfd AS (SELECT term, count(*) AS df FROM tfx GROUP BY term),
norms AS (SELECT dl.doc_id,
                 1.2 * (1 - 0.75 + 0.75 * dl.doclen / s.avgdl) AS norm
          FROM dl CROSS JOIN stats s),
fixedc AS (
  SELECT t.doc_id,
         ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf / (t.tf + n.norm)) * 2.2 AS s
  FROM tfx t JOIN dfd d USING (term) JOIN norms n USING (doc_id)
  CROSS JOIN stats s
  WHERE t.term = 'spark'),
prefc AS (
  SELECT t.doc_id,
         max(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (t.tf / (t.tf + n.norm)) * 2.2) AS s
  FROM tfx t JOIN dfd d USING (term) JOIN norms n USING (doc_id)
  CROSS JOIN stats s
  WHERE t.term LIKE 'jo%' GROUP BY t.doc_id),
u AS (
  SELECT COALESCE(f.doc_id, p.doc_id) AS doc_id,
         COALESCE(f.s, 0) + COALESCE(p.s, 0) AS score
  FROM fixedc f FULL JOIN prefc p USING (doc_id))
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM u ORDER BY score DESC, doc_id LIMIT 10
"""

    # --- phrase suggester -------------------------------------------------
    # inputs 'past' / 'hast' (len 5 -> AUTO fuzz 1, neither in the
    # vocabulary); slot candidates mirror the term-suggester pin
    # (dist asc, df desc, term asc, top 3 + input-if-in-dict)
    def _slot_cte(name: str, q: str) -> str:
        return f"""
{name} AS (
  SELECT term FROM dfd WHERE term = '{q}'
  UNION ALL
  SELECT term FROM (
    SELECT term, row_number() OVER (
      ORDER BY levenshtein(term, '{q}') ASC, df DESC, term ASC) AS rn
    FROM dfd
    WHERE term != '{q}' AND abs(length(term) - {len(q)}) <= 1
      AND levenshtein(term, '{q}') <= 1)
  WHERE rn <= 3)"""

    sqls["phrase_suggest"] = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
toks AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
                unnest(tk) AS tok FROM t),
uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM uni),
dfd AS (SELECT tok AS term, count(DISTINCT doc_id) AS df FROM toks
        GROUP BY 1),
{_slot_cte('s1', 'past')},
{_slot_cte('s2', 'hast')},
bi AS (
  SELECT w1, w2, count(*) AS bc FROM (
    SELECT tok AS w1,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM toks)
  WHERE w2 IS NOT NULL GROUP BY 1, 2),
phr AS (
  SELECT s1.term AS a, s2.term AS b,
         s1.term || ' ' || s2.term AS phrase
  FROM s1, s2
  WHERE NOT (s1.term = 'past' AND s2.term = 'hast')),
scored AS (
  SELECT phrase,
         ln(u1.c * 1.0 / tot.t)
           + CASE WHEN bi.bc IS NOT NULL THEN ln(bi.bc * 1.0 / u1.c)
                  ELSE ln(0.4 * u2.c / tot.t) END AS score
  FROM phr
  JOIN uni u1 ON phr.a = u1.tok
  JOIN uni u2 ON phr.b = u2.tok
  LEFT JOIN bi ON bi.w1 = phr.a AND bi.w2 = phr.b
  CROSS JOIN tot)
SELECT phrase, CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_e6,
       CAST(row_number() OVER (ORDER BY score DESC, phrase) AS INT)
         AS rank
FROM scored ORDER BY score DESC, phrase LIMIT 3
"""

    # --- span queries -----------------------------------------------------
    # span_near unordered, slop=2, n=2 -> window span 3: anchor = any
    # position of either term with both terms occurring in [a, a+3]
    sqls["fts_span_near"] = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
toks AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
                unnest(tk) AS tok FROM t),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
pterms(term, i) AS (VALUES {p_vals}),
dfs AS (SELECT tok AS term, count(DISTINCT doc_id) AS df FROM toks
        WHERE tok IN ({p_in}) GROUP BY 1),
idfsum AS (
  SELECT sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))) AS isum
  FROM pterms p JOIN dfs d USING (term) CROSS JOIN stats s),
hits AS (
  SELECT DISTINCT a.doc_id, a.pos AS anchor
  FROM toks a
  WHERE a.tok IN ('{t0_term}', '{t1_term}')
    AND EXISTS (SELECT 1 FROM toks b
                WHERE b.doc_id = a.doc_id AND b.tok = '{t0_term}'
                  AND b.pos >= a.pos AND b.pos <= a.pos + 3)
    AND EXISTS (SELECT 1 FROM toks c
                WHERE c.doc_id = a.doc_id AND c.tok = '{t1_term}'
                  AND c.pos >= a.pos AND c.pos <= a.pos + 3)),
freq AS (SELECT doc_id, count(*) AS tfp FROM hits GROUP BY 1),
scored AS (
  SELECT f.doc_id,
         i.isum * (f.tfp / (f.tfp + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                           / s.avgdl))) * 2.2 AS score
  FROM freq f JOIN dl USING (doc_id) CROSS JOIN idfsum i CROSS JOIN stats s)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    # r5 span family: same positions CTEs, pinned specs in sparkfts/spans.py
    sqls["fts_span_or"] = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
toks AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
                unnest(tk) AS tok FROM t),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
dfs AS (SELECT tok AS term, count(DISTINCT doc_id) AS df FROM toks
        WHERE tok IN ({or_terms}) GROUP BY 1),
idfsum AS (
  SELECT sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))) AS isum
  FROM dfs d CROSS JOIN stats s),
freq AS (SELECT doc_id, count(*) AS tfp FROM toks
         WHERE tok IN ({or_terms}) GROUP BY 1),
scored AS (
  SELECT f.doc_id,
         i.isum * (f.tfp / (f.tfp + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                           / s.avgdl))) * 2.2 AS score
  FROM freq f JOIN dl USING (doc_id) CROSS JOIN idfsum i CROSS JOIN stats s)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["fts_span_not"] = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
toks AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
                unnest(tk) AS tok FROM t),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
idf AS (
  SELECT ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) AS isum
  FROM (SELECT count(DISTINCT doc_id) AS df FROM toks
        WHERE tok = '{t0_term}') d CROSS JOIN stats s),
freq AS (
  SELECT a.doc_id, count(*) AS tfp FROM toks a
  WHERE a.tok = '{t0_term}'
    AND NOT EXISTS (SELECT 1 FROM toks b
                    WHERE b.doc_id = a.doc_id AND b.tok = '{t1_term}'
                      AND b.pos >= a.pos - 1 AND b.pos <= a.pos + 1)
  GROUP BY 1),
scored AS (
  SELECT f.doc_id,
         i.isum * (f.tfp / (f.tfp + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                           / s.avgdl))) * 2.2 AS score
  FROM freq f JOIN dl USING (doc_id) CROSS JOIN idf i CROSS JOIN stats s)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["fts_span_containing"] = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
toks AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
                unnest(tk) AS tok FROM t),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
pterms(term) AS (VALUES ('{t0_term}'), ('{t1_term}'), ('spark')),
dfs AS (SELECT tok AS term, count(DISTINCT doc_id) AS df FROM toks
        WHERE tok IN ('{t0_term}', '{t1_term}', 'spark') GROUP BY 1),
idfsum AS (
  SELECT sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))) AS isum
  FROM pterms p JOIN dfs d USING (term) CROSS JOIN stats s),
hits AS (
  SELECT DISTINCT a.doc_id, a.pos AS anchor
  FROM toks a
  WHERE a.tok IN ('{t0_term}', '{t1_term}')
    AND EXISTS (SELECT 1 FROM toks b
                WHERE b.doc_id = a.doc_id AND b.tok = '{t0_term}'
                  AND b.pos >= a.pos AND b.pos <= a.pos + 4)
    AND EXISTS (SELECT 1 FROM toks c
                WHERE c.doc_id = a.doc_id AND c.tok = '{t1_term}'
                  AND c.pos >= a.pos AND c.pos <= a.pos + 4)
    AND EXISTS (SELECT 1 FROM toks l
                WHERE l.doc_id = a.doc_id AND l.tok = 'spark'
                  AND l.pos >= a.pos AND l.pos <= a.pos + 4)),
freq AS (SELECT doc_id, count(*) AS tfp FROM hits GROUP BY 1),
scored AS (
  SELECT f.doc_id,
         i.isum * (f.tfp / (f.tfp + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                           / s.avgdl))) * 2.2 AS score
  FROM freq f JOIN dl USING (doc_id) CROSS JOIN idfsum i CROSS JOIN stats s)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["fts_span_within"] = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
toks AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
                unnest(tk) AS tok FROM t),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
idf AS (
  SELECT ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) AS isum
  FROM (SELECT count(DISTINCT doc_id) AS df FROM toks
        WHERE tok = 'spark') d CROSS JOIN stats s),
anchors AS (
  SELECT DISTINCT a.doc_id, a.pos AS anchor
  FROM toks a
  WHERE a.tok IN ('{t0_term}', '{t1_term}')
    AND EXISTS (SELECT 1 FROM toks b
                WHERE b.doc_id = a.doc_id AND b.tok = '{t0_term}'
                  AND b.pos >= a.pos AND b.pos <= a.pos + 4)
    AND EXISTS (SELECT 1 FROM toks c
                WHERE c.doc_id = a.doc_id AND c.tok = '{t1_term}'
                  AND c.pos >= a.pos AND c.pos <= a.pos + 4)),
freq AS (
  SELECT l.doc_id, count(*) AS tfp FROM toks l
  WHERE l.tok = 'spark'
    AND EXISTS (SELECT 1 FROM anchors an
                WHERE an.doc_id = l.doc_id
                  AND an.anchor <= l.pos AND l.pos <= an.anchor + 4)
  GROUP BY 1),
scored AS (
  SELECT f.doc_id,
         i.isum * (f.tfp / (f.tfp + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                           / s.avgdl))) * 2.2 AS score
  FROM freq f JOIN dl USING (doc_id) CROSS JOIN idf i CROSS JOIN stats s)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["fts_span_first"] = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
toks AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
                unnest(tk) AS tok FROM t),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
dfx AS (SELECT count(DISTINCT doc_id) AS df FROM toks
        WHERE tok = '{t0_term}'),
freq AS (SELECT doc_id, count(*) AS tfp FROM toks
         WHERE tok = '{t0_term}' AND pos < 12 GROUP BY 1),
scored AS (
  SELECT f.doc_id,
         ln(1 + (s.n_docs - x.df + 0.5) / (x.df + 0.5))
           * (f.tfp / (f.tfp + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                      / s.avgdl))) * 2.2 AS score
  FROM freq f JOIN dl USING (doc_id) CROSS JOIN dfx x CROSS JOIN stats s)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    # --- extended metric aggs --------------------------------------------
    sqls["extended_stats_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms4})),
s AS (
  SELECT count(*) AS n, min(d.n_chars) AS mn, max(d.n_chars) AS mx,
         CAST(sum(d.n_chars) AS BIGINT) AS sm,
         avg(d.n_chars * 1.0) AS av,
         CAST(sum(d.n_chars * d.n_chars) AS BIGINT) AS sq
  FROM matched m JOIN documents d USING (doc_id))
SELECT CAST(n AS BIGINT) AS n, CAST(mn AS BIGINT) AS min_chars,
       CAST(mx AS BIGINT) AS max_chars, sm AS sum_chars,
       sq AS sumsq,
       CAST(floor((sq * 1.0 / n - av * av) * 10000 + 0.5) AS BIGINT)
         AS var_e4,
       CAST(floor(sqrt(sq * 1.0 / n - av * av) * 10000 + 0.5) AS BIGINT)
         AS std_e4
FROM s
"""

    sqls["weighted_avg_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms4}))
SELECT CAST(floor(sum(d.n_chars * 1.0 * (d.doc_id % 7 + 1))
                  / sum((d.doc_id % 7 + 1) * 1.0)
                  * 1000000 + 0.5) AS BIGINT) AS wavg_e6
FROM matched m JOIN documents d USING (doc_id)
"""

    sqls["top_metrics_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms4}))
SELECT CAST(d.doc_id % 7 + 1 AS BIGINT) AS sort_value,
       CAST(d.n_chars AS BIGINT) AS n_chars, d.doc_id
FROM matched m JOIN documents d USING (doc_id)
ORDER BY d.doc_id % 7 + 1 DESC, d.doc_id LIMIT 5
"""

    sqls["date_range_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms4})),
j AS (
  SELECT TIMESTAMP '2024-01-01 00:00:00'
           + (d.doc_id % 400) * INTERVAL 1 DAY AS ts
  FROM matched m JOIN documents d USING (doc_id)),
c AS (
  SELECT
    sum(CASE WHEN ts < TIMESTAMP '2024-04-01 00:00:00'
             THEN 1 ELSE 0 END) AS q1,
    sum(CASE WHEN ts >= TIMESTAMP '2024-04-01 00:00:00'
              AND ts < TIMESTAMP '2024-07-01 00:00:00'
             THEN 1 ELSE 0 END) AS q2,
    sum(CASE WHEN ts >= TIMESTAMP '2024-07-01 00:00:00'
              AND ts < TIMESTAMP '2025-01-01 00:00:00'
             THEN 1 ELSE 0 END) AS h2,
    sum(CASE WHEN ts >= TIMESTAMP '2025-01-01 00:00:00'
             THEN 1 ELSE 0 END) AS y25
  FROM j)
SELECT key, CAST(doc_count AS BIGINT) AS doc_count FROM (
  SELECT 'q1' AS key, q1 AS doc_count FROM c
  UNION ALL SELECT 'q2', q2 FROM c
  UNION ALL SELECT 'h2', h2 FROM c
  UNION ALL SELECT 'y25', y25 FROM c)
"""

    sqls["adjacency_matrix_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms4})),
j AS (SELECT d.* FROM matched m JOIN documents d USING (doc_id)),
c AS (
  SELECT
    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS b_en,
    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS b_s0,
    sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS b_long,
    sum(CASE WHEN lang = 'en' AND source = 'src0'
             THEN 1 ELSE 0 END) AS b_en_s0,
    sum(CASE WHEN lang = 'en' AND n_chars >= 300
             THEN 1 ELSE 0 END) AS b_en_long,
    sum(CASE WHEN source = 'src0' AND n_chars >= 300
             THEN 1 ELSE 0 END) AS b_s0_long
  FROM j)
SELECT key, CAST(doc_count AS BIGINT) AS doc_count FROM (
  SELECT 'en' AS key, b_en AS doc_count FROM c
  UNION ALL SELECT 's0', b_s0 FROM c
  UNION ALL SELECT 'long', b_long FROM c
  UNION ALL SELECT 'en&s0', b_en_s0 FROM c
  UNION ALL SELECT 'en&long', b_en_long FROM c
  UNION ALL SELECT 's0&long', b_s0_long FROM c)
WHERE doc_count > 0 ORDER BY key
"""

    # --- percolate / termvectors -----------------------------------------
    sqls["percolate_matches"] = f"""
WITH dt AS (SELECT DISTINCT doc_id, tok FROM ({_TOKS}))
SELECT doc_id, CAST(1 AS INT) AS query_id FROM dt
WHERE tok IN ('join', 'spark') GROUP BY doc_id HAVING count(*) = 2
UNION ALL
SELECT doc_id, CAST(2 AS INT) FROM dt
WHERE tok IN ('spark', 'vector') GROUP BY doc_id HAVING count(*) >= 1
UNION ALL
SELECT doc_id, CAST(3 AS INT) FROM dt
WHERE tok IN ('join', 'spark', 'vector')
GROUP BY doc_id HAVING count(*) >= 2
"""

    sqls["termvectors"] = f"""
WITH toks AS ({_TOKS}),
tfx AS (SELECT doc_id, tok AS term, count(*) AS tf FROM toks
        GROUP BY 1, 2),
dlx AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY 1),
dfx AS (SELECT tok AS term, count(DISTINCT doc_id) AS df FROM toks
        GROUP BY 1),
ttfx AS (SELECT tok AS term, count(*) AS ttf FROM toks GROUP BY 1)
SELECT t.doc_id, t.term, CAST(t.tf AS BIGINT) AS term_freq,
       CAST(dlx.doclen AS BIGINT) AS doclen,
       CAST(dfx.df AS BIGINT) AS doc_freq,
       CAST(ttfx.ttf AS BIGINT) AS ttf
FROM tfx t JOIN dlx USING (doc_id) JOIN dfx USING (term)
JOIN ttfx USING (term)
WHERE t.doc_id IN (0, 1, 2) ORDER BY doc_id, term
"""

    # --- unigram LM cross-entropy ----------------------------------------
    sqls["unigram_logppl"] = f"""
WITH toks AS ({_TOKS}),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS vocab FROM cnt)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(floor(-avg(ln((cnt.c + 1.0) / (tot.total + 1.0 * tot.vocab)))
                  * 1000000 + 0.5) AS BIGINT) AS h_e6
FROM toks t JOIN cnt ON t.tok = cnt.tok CROSS JOIN tot
GROUP BY t.doc_id
"""

    # --- sub-document dedup ----------------------------------------------
    sqls["chunk_dedup_stats"] = f"""
WITH tl AS (SELECT doc_id,
                   regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS t
            FROM documents),
tk AS (SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS i
       FROM tl),
ch AS (SELECT doc_id, CAST((i - 1) // 10 AS BIGINT) AS chunk_idx,
              string_agg(tok, ' ' ORDER BY i) AS chunk_text
       FROM tk GROUP BY 1, 2),
hs AS (SELECT doc_id, chunk_idx,
              CAST(('0x' || substr(md5(chunk_text), 1, 15)) AS BIGINT)
                % {HASH_P} AS h
       FROM ch),
wn AS (SELECT h, min(struct_pack(d := doc_id, c := chunk_idx)) AS w
       FROM hs GROUP BY h)
SELECT hs.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN struct_extract(w, 'd') = hs.doc_id
                      AND struct_extract(w, 'c') = hs.chunk_idx
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM hs JOIN wn USING (h) GROUP BY hs.doc_id
"""

    sqls["dup_ngram_coverage"] = f"""
WITH tl AS (SELECT doc_id,
                   regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS t
            FROM documents),
gr AS (SELECT doc_id,
              unnest(list_distinct([array_to_string(t[i:i+4], ' ')
                                    for i in range(1, len(t) - 3)]))
                AS gram
       FROM tl WHERE len(t) >= 5),
g31 AS (SELECT doc_id,
               CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT)
                 % {HASH_P} AS g
        FROM gr),
gdf AS (SELECT g, count(*) AS c FROM g31 GROUP BY g)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
FROM g31 JOIN gdf USING (g) GROUP BY doc_id
"""

    sqls["percentile_ranks_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms})),
j AS (SELECT d.n_chars FROM matched m JOIN documents d USING (doc_id)),
c AS (SELECT count(*) AS n,
             CAST(sum(CASE WHEN n_chars <= 2000.0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS le_0,
             CAST(sum(CASE WHEN n_chars <= 5000.0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS le_1,
             CAST(sum(CASE WHEN n_chars <= 20000.0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS le_2
      FROM j)
SELECT 2000.0 AS value, le_0 * 100000000 // greatest(n, 1) AS rank_e6
FROM c
UNION ALL SELECT 5000.0, le_1 * 100000000 // greatest(n, 1) FROM c
UNION ALL SELECT 20000.0, le_2 * 100000000 // greatest(n, 1) FROM c
"""

    sqls["mget_docs"] = f"""
WITH req(doc_id) AS (VALUES (3), (1), (999999), (7)),
dm AS (
  SELECT doc_id, CAST(doc_id AS VARCHAR) AS url,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))
              AS INT) AS doclen
  FROM documents)
SELECT CAST(r.doc_id AS BIGINT) AS doc_id,
       dm.doc_id IS NOT NULL AS found, dm.url, dm.doclen
FROM req r LEFT JOIN dm USING (doc_id)
"""

    sqls["fts_routed_topk"] = f"""
{or_cte},
routed AS (
  SELECT doc_id FROM documents
  WHERE (CAST('0x' || substr(md5(source), 1, 15) AS BIGINT)
         % 2147483647) % 8
      = (CAST('0x' || substr(md5('src3'), 1, 15) AS BIGINT)
         % 2147483647) % 8)
SELECT s.doc_id, {_SCORE_E4} AS score_e4
FROM scored s JOIN routed USING (doc_id)
ORDER BY s.score DESC, s.doc_id LIMIT 10
"""

    n_and = len(set(BM25_QUERY_AND.split()))
    sqls["fts_count"] = f"""
SELECT CAST(0 AS INT) AS query_id, CAST(count(*) AS BIGINT) AS doc_count
FROM (SELECT doc_id FROM ({_TOKS}) WHERE tok IN ({and_terms})
      GROUP BY doc_id HAVING count(DISTINCT tok) = {n_and})
UNION ALL
SELECT CAST(1 AS INT), CAST(count(*) AS BIGINT)
FROM (SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms}))
"""

    sqls["rare_terms_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok = 'dup')
SELECT d.source AS value, count(*) AS doc_count
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1 HAVING count(*) <= 2
ORDER BY doc_count, value
"""

    sqls["auto_date_histogram"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms})),
j AS (
  SELECT doc_id,
         TIMESTAMP '2024-01-01 00:00:00'
           + (doc_id % 400) * INTERVAL 1 DAY AS ts
  FROM matched),
c AS (
  SELECT count(DISTINCT date_trunc('minute', ts)) AS c_minute,
         count(DISTINCT date_trunc('hour', ts)) AS c_hour,
         count(DISTINCT date_trunc('day', ts)) AS c_day,
         count(DISTINCT date_trunc('week', ts)) AS c_week,
         count(DISTINCT date_trunc('month', ts)) AS c_month,
         count(DISTINCT date_trunc('quarter', ts)) AS c_quarter,
         count(DISTINCT date_trunc('year', ts)) AS c_year
  FROM j),
iv AS (
  SELECT CASE WHEN c_minute <= 15 THEN 'minute'
              WHEN c_hour <= 15 THEN 'hour'
              WHEN c_day <= 15 THEN 'day'
              WHEN c_week <= 15 THEN 'week'
              WHEN c_month <= 15 THEN 'month'
              WHEN c_quarter <= 15 THEN 'quarter'
              ELSE 'year' END AS iv
  FROM c)
SELECT iv.iv AS interval,
       CAST(floor(epoch(CASE iv.iv
              WHEN 'minute' THEN date_trunc('minute', ts)
              WHEN 'hour' THEN date_trunc('hour', ts)
              WHEN 'day' THEN date_trunc('day', ts)
              WHEN 'week' THEN date_trunc('week', ts)
              WHEN 'month' THEN date_trunc('month', ts)
              WHEN 'quarter' THEN date_trunc('quarter', ts)
              ELSE date_trunc('year', ts) END)) AS BIGINT)
         AS bucket_epoch,
       count(*) AS doc_count
FROM j, iv GROUP BY 1, 2 ORDER BY 2
"""

    # ES completion suggester: weighted n-gram entries, prefix 'the '
    sqls["completion_suggest"] = f"""
WITH tk AS (SELECT regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS t
            FROM documents),
uni AS (SELECT unnest(t) AS entry FROM tk),
bi AS (SELECT unnest([t[i] || ' ' || t[i + 1]
                      for i in range(1, len(t))]) AS entry
       FROM tk WHERE len(t) >= 2),
ent AS (
  SELECT entry, count(*) AS weight
  FROM (SELECT entry FROM uni UNION ALL SELECT entry FROM bi)
  GROUP BY entry),
m AS (SELECT entry, CAST(weight AS BIGINT) AS weight FROM ent
      WHERE entry LIKE 'the %')
SELECT entry, weight,
       CAST(row_number() OVER (ORDER BY weight DESC, entry) AS INT) AS rank
FROM m ORDER BY weight DESC, entry LIMIT 5
"""

    # ES kNN with filter — pre-filter semantics: top-k AMONG label=2
    sqls["ann_filtered_topk"] = """
WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
qq AS (SELECT generate_subscripts(e, 1) AS pos,
              CAST(floor(CAST(unnest(e) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v FROM q),
ee AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
              CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
       FROM embeddings WHERE label = 2),
dots AS (
  SELECT e.vec_id, sum(e.v * q.v) AS dot, sum(e.v * e.v) AS na
  FROM ee e JOIN qq q USING (pos) GROUP BY e.vec_id),
nq AS (SELECT sum(v * v) AS nq FROM qq)
SELECT vec_id,
       CAST(floor(dot / (sqrt(na) * sqrt(nq)) * 1000000 + 0.5) AS BIGINT)
         AS cos_e6
FROM dots, nq WHERE na > 0
ORDER BY cos_e6 DESC, vec_id LIMIT 10
"""

    # ES kNN similarity radius — every vector with cos_e6 >= 120000
    sqls["ann_range_search"] = """
WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
qq AS (SELECT generate_subscripts(e, 1) AS pos,
              CAST(floor(CAST(unnest(e) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v FROM q),
ee AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
              CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
       FROM embeddings),
dots AS (
  SELECT e.vec_id, sum(e.v * q.v) AS dot, sum(e.v * e.v) AS na
  FROM ee e JOIN qq q USING (pos) GROUP BY e.vec_id),
nq AS (SELECT sum(v * v) AS nq FROM qq)
SELECT vec_id,
       CAST(floor(dot / (sqrt(na) * sqrt(nq)) * 1000000 + 0.5) AS BIGINT)
         AS cos_e6
FROM dots, nq WHERE na > 0
  AND CAST(floor(dot / (sqrt(na) * sqrt(nq)) * 1000000 + 0.5) AS BIGINT)
      >= 120000
"""

    # concat-then-chunk packing manifest: global exclusive prefix sum
    # over doc_id order, capacity-2048 chunk spans
    sqls["pack_manifest"] = f"""
WITH n AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))
              AS BIGINT) AS n_tokens
  FROM documents),
s AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS start_offset
  FROM n WHERE n_tokens > 0)
SELECT doc_id, n_tokens, start_offset,
       start_offset // 2048 AS first_chunk,
       (start_offset + n_tokens - 1) // 2048 AS last_chunk
FROM s ORDER BY doc_id
"""

    # int8-quantized two-phase ANN: approximate int8 scan (per-vector
    # symmetric scale, q = floor(x*127/max|x|+0.5)) -> top-50 ->
    # exact e3-quantized rerank -> top-10
    sqls["ann_sq8_topk"] = """
WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
qsc AS (SELECT CAST(list_aggregate(list_transform(e, x -> abs(x)), 'max')
                    AS DOUBLE) AS s FROM q),
qq AS (SELECT generate_subscripts(e, 1) AS pos,
              CAST(floor(CAST(unnest(e) AS DOUBLE) * 127.0 / s + 0.5)
                   AS BIGINT) AS v
       FROM q, qsc),
nqq AS (SELECT sum(v * v) AS nqq FROM qq),
esc AS (SELECT vec_id,
               CAST(list_aggregate(list_transform(embedding, x -> abs(x)),
                                   'max') AS DOUBLE) AS s
        FROM embeddings),
ee AS (SELECT e.vec_id, generate_subscripts(e.embedding, 1) AS pos,
              CAST(floor(CAST(unnest(e.embedding) AS DOUBLE) * 127.0
                         / esc.s + 0.5) AS BIGINT) AS v
       FROM embeddings e JOIN esc USING (vec_id) WHERE esc.s > 0),
adots AS (
  SELECT e.vec_id, sum(e.v * q.v) AS dotq, sum(e.v * e.v) AS naq
  FROM ee e JOIN qq q USING (pos) GROUP BY e.vec_id),
cand AS (
  SELECT vec_id, dotq / (sqrt(CAST(naq AS DOUBLE)) * sqrt(nqq.nqq)) AS a
  FROM adots, nqq WHERE naq > 0
  ORDER BY a DESC, vec_id LIMIT 50),
ce AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
              CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
       FROM embeddings WHERE vec_id IN (SELECT vec_id FROM cand)),
cq AS (SELECT generate_subscripts(e, 1) AS pos,
              CAST(floor(CAST(unnest(e) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v FROM q),
nq AS (SELECT sum(v * v) AS nq FROM cq),
d2 AS (
  SELECT e.vec_id, sum(e.v * q.v) AS dot, sum(e.v * e.v) AS na
  FROM ce e JOIN cq q USING (pos) GROUP BY e.vec_id)
SELECT vec_id,
       CAST(floor(dot / (sqrt(na) * sqrt(nq)) * 1000000 + 0.5) AS BIGINT)
         AS cos_e6
FROM d2, nq WHERE na > 0
ORDER BY cos_e6 DESC, vec_id LIMIT 10
"""

    # product-quantized ANN: 4x8 id-order codebooks, integer-L2 code
    # assignment, ADC lookup scoring, top-50 exact rerank -> top-10
    # IVF-PQ: centroid layer + residual-PQ ADC, fully relational.
    # quantize trap: always CAST float32 to DOUBLE before *1000+0.5.
    sqls["ann_ivfpq_topk"] = """
WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
qe AS (SELECT pos, pos // 16 AS s, pos % 16 AS p, v FROM (
  SELECT generate_subscripts(e, 1) - 1 AS pos,
         CAST(floor(CAST(unnest(e) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v FROM q)),
nq AS (SELECT sum(v * v) AS nq FROM qe),
crows AS (SELECT embedding, row_number() OVER (ORDER BY vec_id) - 1 AS cid
          FROM embeddings ORDER BY vec_id LIMIT 8),
ce AS (SELECT cid, pos, pos // 16 AS s, pos % 16 AS p, v FROM (
  SELECT cid, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
  FROM crows)),
ve AS (SELECT vec_id, pos, v FROM (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
  FROM embeddings)),
ad2 AS (SELECT ve.vec_id, ce.cid, sum((ve.v - ce.v) * (ve.v - ce.v)) AS d2
        FROM ve JOIN ce USING (pos) GROUP BY 1, 2),
assign AS (SELECT vec_id,
                  struct_extract(min(struct_pack(d := d2, c := cid)), 'c') AS cid
           FROM ad2 GROUP BY 1),
qd2 AS (SELECT ce.cid, sum((qe.v - ce.v) * (qe.v - ce.v)) AS d2
        FROM qe JOIN ce USING (pos) GROUP BY 1),
probes AS (SELECT cid FROM qd2 ORDER BY d2, cid LIMIT 4),
srows AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS j
          FROM embeddings ORDER BY vec_id LIMIT 8),
sres AS (SELECT sr.j, ve.pos, ve.pos // 16 AS s, ve.pos % 16 AS p,
                ve.v - ce.v AS rv
         FROM srows sr
         JOIN ve ON ve.vec_id = sr.vec_id
         JOIN assign a ON a.vec_id = sr.vec_id
         JOIN ce ON ce.cid = a.cid AND ce.pos = ve.pos),
pv AS (SELECT ve.vec_id, a.cid, ve.pos, ve.pos // 16 AS s,
              ve.pos % 16 AS p, ve.v - ce.v AS rv
       FROM ve JOIN assign a USING (vec_id)
       JOIN ce ON ce.cid = a.cid AND ce.pos = ve.pos
       WHERE a.cid IN (SELECT cid FROM probes)),
d2 AS (SELECT pv.vec_id, pv.s, sres.j,
              sum((pv.rv - sres.rv) * (pv.rv - sres.rv)) AS d2
       FROM pv JOIN sres ON pv.s = sres.s AND pv.p = sres.p
       GROUP BY 1, 2, 3),
code AS (SELECT vec_id, s,
                struct_extract(min(struct_pack(d := d2, j := j)), 'j') AS j
         FROM d2 GROUP BY 1, 2),
qd AS (SELECT sres.s, sres.j, sum(qe.v * sres.rv) AS qd
       FROM sres JOIN qe ON qe.s = sres.s AND qe.p = sres.p
       GROUP BY 1, 2),
cn AS (SELECT s, j, sum(rv * rv) AS cn FROM sres GROUP BY 1, 2),
qc AS (SELECT ce.cid, sum(qe.v * ce.v) AS qc
       FROM ce JOIN qe USING (pos) GROUP BY 1),
cnorm AS (SELECT cid, sum(v * v) AS cnorm FROM ce GROUP BY 1),
cdot AS (SELECT ce.cid, sres.s, sres.j, sum(ce.v * sres.rv) AS cd
         FROM ce JOIN sres ON ce.s = sres.s AND ce.p = sres.p
         GROUP BY 1, 2, 3),
vc AS (SELECT DISTINCT vec_id, cid FROM pv),
ap AS (SELECT c.vec_id,
              any_value(qc.qc) + sum(qd.qd) AS adot,
              any_value(cnorm.cnorm) + sum(2 * cdot.cd + cn.cn) AS anorm
       FROM code c
       JOIN vc ON vc.vec_id = c.vec_id
       JOIN qc ON qc.cid = vc.cid
       JOIN cnorm ON cnorm.cid = vc.cid
       JOIN qd ON qd.s = c.s AND qd.j = c.j
       JOIN cn ON cn.s = c.s AND cn.j = c.j
       JOIN cdot ON cdot.cid = vc.cid AND cdot.s = c.s AND cdot.j = c.j
       GROUP BY 1),
cand AS (SELECT vec_id,
                adot / (sqrt(CAST(anorm AS DOUBLE)) * sqrt(nq.nq)) AS a
         FROM ap, nq WHERE anorm > 0
         ORDER BY a DESC, vec_id LIMIT 50),
fe AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
              CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
       FROM embeddings WHERE vec_id IN (SELECT vec_id FROM cand)),
fq AS (SELECT generate_subscripts(e, 1) AS pos,
              CAST(floor(CAST(unnest(e) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v FROM q),
nq2 AS (SELECT sum(v * v) AS nq FROM fq),
dx AS (SELECT fe.vec_id, sum(fe.v * fq.v) AS dot, sum(fe.v * fe.v) AS na
       FROM fe JOIN fq USING (pos) GROUP BY fe.vec_id)
SELECT vec_id,
       CAST(floor(dot / (sqrt(na) * sqrt(nq)) * 1000000 + 0.5) AS BIGINT)
         AS cos_e6
FROM dx, nq2 WHERE na > 0
ORDER BY dot / (sqrt(na) * sqrt(nq)) DESC, vec_id LIMIT 10
"""

    sqls["ann_pq_topk"] = """
WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
qe AS (SELECT pos // 16 AS s, pos % 16 AS p, v FROM (
  SELECT generate_subscripts(e, 1) - 1 AS pos,
         CAST(floor(CAST(unnest(e) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v FROM q)),
nq AS (SELECT sum(v * v) AS nq FROM qe),
cbrows AS (SELECT embedding,
                  row_number() OVER (ORDER BY vec_id) - 1 AS j
           FROM embeddings ORDER BY vec_id LIMIT 8),
cbe AS (SELECT j, pos // 16 AS s, pos % 16 AS p, v FROM (
  SELECT j, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
  FROM cbrows)),
ve AS (SELECT vec_id, pos // 16 AS s, pos % 16 AS p, v FROM (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
  FROM embeddings)),
d2 AS (SELECT ve.vec_id, cbe.s, cbe.j,
              sum((ve.v - cbe.v) * (ve.v - cbe.v)) AS d2
       FROM ve JOIN cbe ON ve.s = cbe.s AND ve.p = cbe.p
       GROUP BY 1, 2, 3),
code AS (SELECT vec_id, s,
                struct_extract(min(struct_pack(d := d2, j := j)), 'j') AS j
         FROM d2 GROUP BY 1, 2),
qd AS (SELECT cbe.s, cbe.j, sum(qe.v * cbe.v) AS qd
       FROM cbe JOIN qe ON qe.s = cbe.s AND qe.p = cbe.p
       GROUP BY 1, 2),
cn AS (SELECT s, j, sum(v * v) AS cn FROM cbe GROUP BY 1, 2),
ap AS (SELECT c.vec_id, sum(qd.qd) AS adot, sum(cn.cn) AS anorm
       FROM code c JOIN qd ON qd.s = c.s AND qd.j = c.j
                   JOIN cn ON cn.s = c.s AND cn.j = c.j
       GROUP BY 1),
cand AS (SELECT vec_id,
                adot / (sqrt(CAST(anorm AS DOUBLE)) * sqrt(nq.nq)) AS a
         FROM ap, nq WHERE anorm > 0
         ORDER BY a DESC, vec_id LIMIT 50),
ce AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
              CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
       FROM embeddings WHERE vec_id IN (SELECT vec_id FROM cand)),
cq AS (SELECT generate_subscripts(e, 1) AS pos,
              CAST(floor(CAST(unnest(e) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v FROM q),
nq2 AS (SELECT sum(v * v) AS nq FROM cq),
dx AS (SELECT e.vec_id, sum(e.v * q.v) AS dot, sum(e.v * e.v) AS na
       FROM ce e JOIN cq q USING (pos) GROUP BY e.vec_id)
SELECT vec_id,
       CAST(floor(dot / (sqrt(na) * sqrt(nq)) * 1000000 + 0.5) AS BIGINT)
         AS cos_e6
FROM dx, nq2 WHERE na > 0
ORDER BY cos_e6 DESC, vec_id LIMIT 10
"""

    # curation funnel retention table: input -> quality (the pinned
    # Gopher-style bounds, same arithmetic as sqls["quality_scores"])
    # -> exact md5 dedup (keep-first) -> 500-per-mille LCG sample
    sqls["curate_funnel"] = f"""
WITH f AS (
  SELECT doc_id, text,
         len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS n_tokens,
         length(text) AS n_chars,
         list_aggregate(list_transform(
             regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'),
             x -> length(x)), 'sum') AS tok_chars,
         length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS non_alnum
  FROM documents),
q AS (
  SELECT doc_id, text FROM f
  WHERE n_tokens >= 5
    AND floor(tok_chars * 1000000 / greatest(n_tokens, 1))
        BETWEEN 1500000 AND 12000000
    AND floor(non_alnum * 1000000 / greatest(n_chars, 1)) < 300000),
e AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
s AS (
  SELECT doc_id FROM e
  WHERE ((doc_id % 2147483647 + 2147483647) % 2147483647
         * 1103515245 + 12345) % 2147483647 % 1000 < 500),
n0 AS (SELECT count(*) AS c FROM documents),
n1 AS (SELECT count(*) AS c FROM q),
n2 AS (SELECT count(*) AS c FROM e),
n3 AS (SELECT count(*) AS c FROM s)
SELECT CAST(0 AS INT) AS stage_idx, 'input' AS stage,
       n0.c AS docs_in, n0.c AS docs_out FROM n0
UNION ALL SELECT CAST(1 AS INT), 'quality', n0.c, n1.c FROM n0, n1
UNION ALL SELECT CAST(2 AS INT), 'exact_dedup', n1.c, n2.c FROM n1, n2
UNION ALL SELECT CAST(3 AS INT), 'sample', n2.c, n3.c FROM n2, n3
"""

    # --- ES parent-child joins (has_child / has_parent / inner_hits) ----
    sqls["children_agg"] = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS doc_count,
       CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderstatus = 'F'
                       AND o_totalprice > 150000)
GROUP BY 1 ORDER BY 1
"""

    sqls["parent_agg"] = """
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS doc_count,
       CAST(floor(avg(o_totalprice) * 100 + 0.5) AS BIGINT)
         AS avg_price_e2
FROM orders
WHERE o_orderkey IN (SELECT DISTINCT l_orderkey FROM lineitem
                     WHERE l_returnflag = 'R')
GROUP BY 1 ORDER BY 1
"""

    sqls["has_child_topk"] = """
WITH folded AS (
  SELECT l_orderkey AS k, count(*) AS child_count,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS score_e2
  FROM lineitem
  WHERE l_returnflag = 'R' AND l_quantity >= 30
  GROUP BY 1 HAVING count(*) >= 2)
SELECT o_orderkey, CAST(child_count AS BIGINT) AS child_count, score_e2
FROM orders JOIN folded ON o_orderkey = k
ORDER BY score_e2 DESC, o_orderkey LIMIT 10
"""
    sqls["has_parent_topk"] = """
SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS score_e2
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT' AND o_totalprice >= 150000
ORDER BY score_e2 DESC, l_orderkey, l_linenumber LIMIT 20
"""
    sqls["has_child_inner_hits"] = """
WITH m AS (
  SELECT l_orderkey, l_linenumber,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
              AS BIGINT) AS cscore
  FROM lineitem WHERE l_returnflag = 'R'),
tops AS (
  SELECT l_orderkey AS k, CAST(sum(cscore) AS BIGINT) AS pscore_e2
  FROM m GROUP BY 1 ORDER BY pscore_e2 DESC, k LIMIT 5),
ranked AS (
  SELECT l_orderkey, l_linenumber,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY cscore DESC, l_linenumber) AS hit_rank
  FROM m),
ptab AS (
  SELECT k, pscore_e2,
         CAST(row_number() OVER (ORDER BY pscore_e2 DESC, k) AS INT)
           AS parent_rank
  FROM tops)
SELECT p.parent_rank, r.l_orderkey AS o_orderkey, p.pscore_e2,
       CAST(r.hit_rank AS INT) AS hit_rank,
       CAST(r.l_linenumber AS INT) AS l_linenumber, o.o_orderpriority
FROM ranked r JOIN ptab p ON r.l_orderkey = p.k
JOIN orders o ON o.o_orderkey = r.l_orderkey
WHERE r.hit_rank <= 2
"""

    # --- geo family ------------------------------------------------------
    # haversine on the ES mean-radius sphere; same double-precision
    # formula shape as sparkfts/geo.py (radians -> sin/cos -> asin).
    def _hav_sql(olat, olon):
        return (
            "2 * 6371008.7714 * asin(sqrt("
            f"pow(sin((radians(lat) - radians({olat})) / 2), 2)"
            f" + cos(radians({olat})) * cos(radians(lat))"
            f" * pow(sin((radians(lon) - radians({olon})) / 2), 2)))"
        )

    geo_pts = f"""
pts AS (
  SELECT doc_id, {_GEO_LAT_SQL} AS lat, {_GEO_LON_SQL} AS lon
  FROM documents)
"""
    sqls["geo_distance_topk"] = f"""
WITH {geo_pts},
d AS (SELECT doc_id, {_hav_sql(48.85, 2.35)} AS dist FROM pts)
SELECT doc_id, CAST(floor(dist * 10 + 0.5) AS BIGINT) AS dist_e1
FROM d WHERE dist <= 3000000.0
ORDER BY dist, doc_id LIMIT 15
"""
    sqls["geo_bbox"] = f"""
WITH {geo_pts}
SELECT doc_id,
       CAST(floor(lat * 1000000 + 0.5) AS BIGINT) AS lat_e6,
       CAST(floor(lon * 1000000 + 0.5) AS BIGINT) AS lon_e6
FROM pts
WHERE lat BETWEEN -20.0 AND 70.0 AND (lon >= 150.0 OR lon <= -120.0)
"""
    sqls["geotile_grid"] = f"""
WITH {geo_pts},
t AS (
  SELECT greatest(least(CAST(floor((lon + 180.0) / 360.0 * 16) AS BIGINT),
                        15), 0) AS x,
         greatest(least(CAST(floor(
           (1.0 - ln(tan(radians(greatest(least(lat, 85.0511287798066),
                                          -85.0511287798066)))
                     + 1.0 / cos(radians(greatest(least(lat,
                         85.0511287798066), -85.0511287798066)))) / pi())
           / 2.0 * 16) AS BIGINT), 15), 0) AS y
  FROM pts)
SELECT '4/' || CAST(x AS VARCHAR) || '/' || CAST(y AS VARCHAR) AS key,
       CAST(count(*) AS BIGINT) AS doc_count
FROM t GROUP BY 1 ORDER BY doc_count DESC, key
"""
    sqls["geo_distance_rings"] = f"""
WITH {geo_pts},
d AS (SELECT {_hav_sql(0.0, 0.0)} AS dist FROM pts)
SELECT CAST(0 AS INT) AS ring_idx,
       CAST(count(*) FILTER (dist < 3000000.0) AS BIGINT) AS doc_count
  FROM d
UNION ALL SELECT CAST(1 AS INT),
       CAST(count(*) FILTER (dist >= 3000000.0 AND dist < 8000000.0)
            AS BIGINT) FROM d
UNION ALL SELECT CAST(2 AS INT),
       CAST(count(*) FILTER (dist >= 8000000.0 AND dist < 14000000.0)
            AS BIGINT) FROM d
UNION ALL SELECT CAST(3 AS INT),
       CAST(count(*) FILTER (dist >= 14000000.0) AS BIGINT) FROM d
"""

    # --- runtime fields ---------------------------------------------------
    sqls["runtime_field_topk"] = """
WITH rt AS (
  SELECT doc_id, ln(1 + n_chars) * 10 - doc_id / 1000.0 AS rt
  FROM documents)
SELECT doc_id, CAST(floor(rt * 1000000 + 0.5) AS BIGINT) AS rt_e6
FROM rt WHERE rt > 50 ORDER BY rt DESC, doc_id LIMIT 12
"""
    sqls["runtime_field_agg"] = """
WITH rt AS (
  SELECT source, sqrt(CAST(n_chars AS DOUBLE)) + doc_id / 100000.0 AS rt
  FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS doc_count,
       CAST(sum(CAST(floor(rt * 10000 + 0.5) AS BIGINT)) AS BIGINT)
         AS rt_sum_e4
FROM rt GROUP BY 1 ORDER BY 1
"""

    sqls["multi_terms_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms}))
SELECT d.lang || '|' || d.source AS key,
       CAST(count(*) AS BIGINT) AS doc_count
FROM matched m JOIN documents d USING (doc_id)
WHERE d.lang IS NOT NULL AND d.source IS NOT NULL
GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 15
"""

    # BBQ ANN: phase-1 hamming over sign bits == popcount(xor) of the
    # packed words (the engine packs; the count-of-sign-mismatches form
    # here is the same integer, dim by dim); exact e3 rescore tail as sq8.
    sqls["ann_bbq_topk"] = """
WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
qs AS (SELECT generate_subscripts(e, 1) AS pos,
              CASE WHEN unnest(e) > 0 THEN 1 ELSE 0 END AS b FROM q),
es AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
              CASE WHEN unnest(embedding) > 0 THEN 1 ELSE 0 END AS b
       FROM embeddings),
ham AS (SELECT e.vec_id,
               sum(CASE WHEN e.b != q.b THEN 1 ELSE 0 END) AS h
        FROM es e JOIN qs q USING (pos) GROUP BY 1),
cand AS (SELECT vec_id FROM ham ORDER BY h, vec_id LIMIT 50),
ce AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
              CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
       FROM embeddings WHERE vec_id IN (SELECT vec_id FROM cand)),
cq AS (SELECT generate_subscripts(e, 1) AS pos,
              CAST(floor(CAST(unnest(e) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v FROM q),
nq AS (SELECT sum(v * v) AS nq FROM cq),
d2 AS (
  SELECT e.vec_id, sum(e.v * q.v) AS dot, sum(e.v * e.v) AS na
  FROM ce e JOIN cq q USING (pos) GROUP BY e.vec_id)
SELECT vec_id,
       CAST(floor(dot / (sqrt(na) * sqrt(nq.nq)) * 1000000 + 0.5) AS BIGINT)
         AS cos_e6
FROM d2, nq WHERE na > 0
ORDER BY cos_e6 DESC, vec_id LIMIT 10
"""

    sqls["dedup_incremental"] = f"""
{_MINHASH}
, keys AS (
  SELECT doc_id, i // 2 AS band,
         string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY i) AS band_key
  FROM sig GROUP BY doc_id, i // 2)
SELECT n.doc_id, CAST(min(r.doc_id) AS BIGINT) AS ref_doc_id
FROM keys n JOIN keys r
  ON n.band = r.band AND n.band_key = r.band_key
WHERE n.doc_id % 3 != 0 AND r.doc_id % 3 = 0
GROUP BY 1 ORDER BY 1
"""

    sqls["ingest_pipeline"] = """
SELECT doc_id, lower(lang) AS lang, source AS origin, 'web' AS corpus,
       CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))
            AS BIGINT) AS n_vowels
FROM documents
"""

    sqls["sorted_index_topk"] = """
SELECT CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS INT)
         AS rank,
       doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM documents WHERE lang = 'en'
ORDER BY n_chars DESC, doc_id LIMIT 15
"""

    # --- ES nested field type --------------------------------------------
    sqls["nested_query_topk"] = """
SELECT l_orderkey AS o_orderkey, CAST(count(*) AS INT) AS n_matched,
       CAST(sum(CAST(floor(l_extendedprice * l_quantity * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS score_e2
FROM lineitem
WHERE l_quantity >= 45 AND l_returnflag = 'R'
GROUP BY 1 ORDER BY score_e2 DESC, o_orderkey LIMIT 10
"""
    sqls["nested_reverse_agg"] = """
SELECT l_returnflag AS value,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS doc_count
FROM lineitem GROUP BY 1 ORDER BY doc_count DESC, value LIMIT 10
"""

    sqls["mixture_sample"] = """
WITH avail AS (
  SELECT lang AS grp, CAST(sum(n_chars) AS BIGINT) AS avail
  FROM documents GROUP BY 1),
w AS (SELECT * FROM (VALUES ('en', 0.4), ('de', 0.3), ('fr', 0.3))
      AS t(grp, weight)),
plan AS (
  SELECT a.grp, a.avail,
         CAST(floor(30000 * coalesce(w.weight, 0.0)) AS BIGINT) AS target
  FROM avail a LEFT JOIN w USING (grp)),
rates AS (
  SELECT grp, avail,
         least(CAST(1000 AS BIGINT),
               CAST(floor(target * 1000.0 / greatest(avail, 1))
                    AS BIGINT)) AS keep_permille
  FROM plan),
kept AS (
  SELECT d.lang AS grp, d.doc_id, d.n_chars
  FROM documents d JOIN rates r ON d.lang = r.grp
  WHERE ((d.doc_id % 2147483647 + 2147483647) % 2147483647
         * 1103515245 + 12345) % 2147483647 % 1000 < r.keep_permille)
SELECT r.grp AS "group", r.avail, r.keep_permille,
       CAST(coalesce(k.n, 0) AS BIGINT) AS kept_docs,
       CAST(coalesce(k.s, 0) AS BIGINT) AS kept_chars
FROM rates r LEFT JOIN (
  SELECT grp, count(*) AS n, sum(n_chars) AS s FROM kept GROUP BY 1
) k USING (grp)
ORDER BY 1
"""


    def _phrase_scored_cte(terms, sfx):
        vals = ", ".join(f"('{t}', {i})" for i, t in enumerate(terms))
        inl = ", ".join(f"'{t}'" for t in sorted(set(terms)))
        return f"""
pterms{sfx}(term, i) AS (VALUES {vals}),
dfs{sfx} AS (SELECT tok AS term, count(DISTINCT doc_id) AS df FROM toks
        WHERE tok IN ({inl}) GROUP BY 1),
idfsum{sfx} AS (
  SELECT sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))) AS isum
  FROM pterms{sfx} p JOIN dfs{sfx} d USING (term) CROSS JOIN stats s),
hits{sfx} AS (
  SELECT tk.doc_id, tk.pos - p.i AS st
  FROM toks tk JOIN pterms{sfx} p ON tk.tok = p.term
  WHERE tk.pos - p.i >= 0
  GROUP BY 1, 2 HAVING count(*) = {len(terms)}),
freq{sfx} AS (SELECT doc_id, count(*) AS tfp FROM hits{sfx} GROUP BY 1),
scored{sfx} AS (
  SELECT f.doc_id,
         i.isum * (f.tfp / (f.tfp + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                           / s.avgdl))) * 2.2 AS score
  FROM freq{sfx} f JOIN dl USING (doc_id) CROSS JOIN idfsum{sfx} i
  CROSS JOIN stats s)"""

    sqls["fts_intervals"] = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
toks AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
                unnest(tk) AS tok FROM t),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),{_phrase_scored_cte(PHRASE_QUERY.split(), "_a")},
{_phrase_scored_cte(INTERVALS_PHRASE_2.split(), "_b")},
u AS (SELECT doc_id, score FROM scored_a
      UNION ALL SELECT doc_id, score FROM scored_b),
best AS (SELECT doc_id, max(score) AS score FROM u GROUP BY 1)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM best ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["sparse_vector_topk"] = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
toks AS (SELECT doc_id, unnest(tk) AS term FROM t),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
topm AS (
  SELECT doc_id, term, tf * 1000 AS w,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tf DESC, term) AS rn
  FROM tf),
q(term, qw) AS (VALUES ('spark', 2000), ('join', 1000), ('vector', 500)),
dots AS (
  SELECT m.doc_id, CAST(sum(m.w * q.qw) AS BIGINT) AS dot
  FROM topm m JOIN q USING (term) WHERE m.rn <= 16 GROUP BY 1)
SELECT CAST(row_number() OVER (ORDER BY dot DESC, doc_id) AS INT) AS rank,
       doc_id, dot
FROM dots ORDER BY dot DESC, doc_id LIMIT 10
"""

    sqls["hybrid_linear_topk"] = f"""
{_bm25_scored_cte(hybrid_terms, conjunctive=False)},
br AS (
  SELECT doc_id, score FROM (
    SELECT doc_id, score,
           row_number() OVER (ORDER BY score DESC, doc_id) AS r
    FROM scored
  ) WHERE r <= 100
),
bmm AS (SELECT min(score) AS mn, max(score) AS mx FROM br),
bn AS (
  SELECT doc_id,
         CASE WHEN mx > mn THEN (score - mn) / (mx - mn) ELSE 0.0 END AS n
  FROM br, bmm),
qq AS (
  SELECT generate_subscripts(e, 1) AS pos,
         CAST(floor(CAST(unnest(e) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
  FROM (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
),
ee AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
              CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
       FROM embeddings),
dots AS (
  SELECT e.vec_id, sum(e.v * q.v) AS dot, sum(e.v * e.v) AS na
  FROM ee e JOIN qq q USING (pos) GROUP BY e.vec_id),
nq AS (SELECT sum(v * v) AS nq FROM qq),
coss AS (
  SELECT vec_id,
         CAST(floor(dot / (sqrt(na) * sqrt(nq)) * 1000000 + 0.5) AS BIGINT)
           AS cos_e6
  FROM dots, nq WHERE na > 0
),
ar AS (
  SELECT vec_id AS doc_id, CAST(cos_e6 AS DOUBLE) AS score FROM (
    SELECT vec_id, cos_e6,
           row_number() OVER (ORDER BY cos_e6 DESC, vec_id) AS r
    FROM coss
  ) WHERE r <= 100
),
amm AS (SELECT min(score) AS mn, max(score) AS mx FROM ar),
an AS (
  SELECT doc_id,
         CASE WHEN mx > mn THEN (score - mn) / (mx - mn) ELSE 0.0 END AS n
  FROM ar, amm),
fused AS (
  SELECT COALESCE(bn.doc_id, an.doc_id) AS doc_id,
         COALESCE(bn.n, 0) + 2.0 * COALESCE(an.n, 0) AS s
  FROM bn FULL OUTER JOIN an ON bn.doc_id = an.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank,
       doc_id,
       CAST(floor(s * 1000000000 + 0.5) AS BIGINT) AS score_e9
FROM fused ORDER BY s DESC, doc_id LIMIT 10
"""

    # date-math bounds resolve DRIVER-side (by design — replayable
    # jobs); the oracle embeds the resolved literals and checks the
    # half-open filter + agg
    from datetime import datetime as _dt

    from sparkfts.datemath import resolve_date_math as _rdm

    _dm_now = _dt.fromisoformat(DATEMATH_NOW)
    _dm_lo = _rdm("now-7d/d", _dm_now, False).isoformat(sep=" ")
    _dm_hi = _rdm("now/d", _dm_now, True).isoformat(sep=" ")
    sqls["date_math_range"] = f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS doc_count,
       CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS value_sum_e2
FROM events
WHERE ts >= TIMESTAMP '{_dm_lo}' AND ts < TIMESTAMP '{_dm_hi}'
GROUP BY 1 ORDER BY 1
"""

    # DSL query+aggs runner: match set = docs with any of the three
    # terms; terms buckets on lang x one stats row on n_chars
    sqls["fts_dsl_aggs"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok
  FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks
      WHERE tok IN ('spark', 'join', 'vector')),
t AS (
  SELECT lang AS key, CAST(count(*) AS BIGINT) AS doc_count
  FROM documents JOIN m USING (doc_id)
  GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 10
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(floor(avg(CAST(n_chars AS DOUBLE)) * 100 + 0.5) AS BIGINT)
           AS avg_chars_e2
  FROM documents JOIN m USING (doc_id)
)
SELECT key, doc_count, n, avg_chars_e2 FROM t CROSS JOIN s
ORDER BY doc_count DESC, key
"""

    # quality classifier: mean-pooled hashed-bag-of-words linear model,
    # pinned weights w[b] = ((b*2654435761) % 2000003)/1e6 - 1, dim 64,
    # intercept 0.1; empty-token docs score the bare intercept
    sqls["quality_clf_scores"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok
  FROM documents
),
bk AS (
  SELECT doc_id,
         (CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT)
          % 2147483647) % 64 AS bucket
  FROM toks
),
wv AS (
  SELECT doc_id,
         ((bucket * 2654435761) % 2000003) / 1000000.0 - 1.0 AS w
  FROM bk
),
pooled AS (SELECT doc_id, sum(w) / count(*) AS pooled FROM wv GROUP BY 1),
z AS (
  SELECT d.doc_id, 0.1 + COALESCE(p.pooled, 0.0) AS z
  FROM documents d LEFT JOIN pooled p USING (doc_id)
)
SELECT doc_id,
       CAST(floor((1.0 / (1.0 + exp(-z))) * 10000 + 0.5) AS BIGINT)
         AS prob_e4,
       z >= 0 AS kept
FROM z ORDER BY doc_id
"""

    sqls["quality_quantile_filter"] = """
WITH thr AS (
  SELECT lang, percentile_cont(0.3) WITHIN GROUP (ORDER BY n_chars)
           AS q_threshold
  FROM documents GROUP BY 1)
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
       CAST(floor(t.q_threshold * 10000 + 0.5) AS BIGINT) AS thr_e4
FROM documents d JOIN thr t USING (lang)
WHERE d.n_chars >= t.q_threshold
"""

    df_cte = _bm25_scored_cte(sorted(set(BM25_QUERY_OR.split())), False)
    sqls["fts_distance_feature"] = f"""
{df_cte}
SELECT s.doc_id,
       CAST(floor((s.score + 0.8 * (200.0 / (200.0
                   + abs(d.n_chars - 500.0)))) * 10000 + 0.5) AS BIGINT)
         AS score_e4
FROM scored s JOIN documents d USING (doc_id)
ORDER BY s.score + 0.8 * (200.0 / (200.0 + abs(d.n_chars - 500.0)))
         DESC, s.doc_id
LIMIT 10
"""
    sqls["fts_random_score"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms})),
h AS (
  SELECT doc_id,
         (((doc_id % 2147483647 + 2147483647) % 2147483647
           * 1103515245 + 12345 + (7 * 12345)) % 2147483647
          * 1103515245 + 12345) % 2147483647 AS hv
  FROM matched)
SELECT CAST(row_number() OVER (ORDER BY hv DESC, doc_id) AS INT) AS rank,
       doc_id,
       CAST(floor(hv / 2147483647.0 * 1000000000 + 0.5) AS BIGINT)
         AS score_e9
FROM h ORDER BY hv DESC, doc_id LIMIT 10
"""

    pin_cte = _bm25_scored_cte(sorted(set(BM25_QUERY_OR.split())), False)
    sqls["fts_pinned"] = f"""
{pin_cte},
pins(doc_id, score) AS (VALUES (CAST(7 AS BIGINT), 1000000000000.0),
                               (CAST(3 AS BIGINT), 999999999999.0)),
organic AS (
  SELECT doc_id, score FROM scored
  WHERE doc_id NOT IN (SELECT doc_id FROM pins)),
u AS (SELECT * FROM pins UNION ALL SELECT * FROM organic)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
         AS rank,
       doc_id,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_e4
FROM u ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["boxplot_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms})),
v AS (SELECT CAST(d.n_chars AS DOUBLE) AS v
      FROM matched m JOIN documents d USING (doc_id)),
qs AS (
  SELECT min(v) AS min_v, max(v) AS max_v,
         quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.5) AS q2,
         quantile_cont(v, 0.75) AS q3
  FROM v)
SELECT CAST(min_v AS BIGINT) AS min_v,
       CAST(floor(q1 * 10000 + 0.5) AS BIGINT) AS q1_e4,
       CAST(floor(q2 * 10000 + 0.5) AS BIGINT) AS q2_e4,
       CAST(floor(q3 * 10000 + 0.5) AS BIGINT) AS q3_e4,
       CAST(max_v AS BIGINT) AS max_v,
       CAST((SELECT min(v) FROM v, qs
             WHERE v >= q1 - 1.5 * (q3 - q1)) AS BIGINT) AS lower,
       CAST((SELECT max(v) FROM v, qs
             WHERE v <= q3 + 1.5 * (q3 - q1)) AS BIGINT) AS upper
FROM qs
"""
    sqls["t_test_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms})),
v AS (SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS v
      FROM matched m JOIN documents d USING (doc_id)),
s AS (
  SELECT CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS na,
         CAST(sum(CASE WHEN doc_id % 2 != 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS nb,
         CAST(sum(CASE WHEN doc_id % 2 = 0 THEN v ELSE 0 END) AS BIGINT)
           AS sa,
         CAST(sum(CASE WHEN doc_id % 2 != 0 THEN v ELSE 0 END) AS BIGINT)
           AS sb,
         CAST(sum(CASE WHEN doc_id % 2 = 0 THEN v * v ELSE 0 END)
              AS BIGINT) AS qa,
         CAST(sum(CASE WHEN doc_id % 2 != 0 THEN v * v ELSE 0 END)
              AS BIGINT) AS qb
  FROM v)
SELECT na AS n_a, nb AS n_b,
       CAST(floor(sa / na * 10000 + 0.5) AS BIGINT) AS mean_a_e4,
       CAST(floor(sb / nb * 10000 + 0.5) AS BIGINT) AS mean_b_e4,
       CAST(floor((sa / na - sb / nb)
                  / sqrt(((qa - sa * sa / na) / (na - 1)) / na
                         + ((qb - sb * sb / nb) / (nb - 1)) / nb)
                  * 1000000 + 0.5) AS BIGINT) AS t_e6
FROM s
"""

    sqls["knn_join_lsh"] = f"""
WITH ee AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS x
  FROM embeddings),
dots AS (
  SELECT vec_id, p,
         sum(x * ((1103515245 * ((p * 1024 + d + 1) % {HASH_P}) + 12345)
                  % {HASH_P} - {(HASH_P - 1) // 2})) AS dot
  FROM ee CROSS JOIN (SELECT unnest(range(0, 3)) AS p)
  GROUP BY 1, 2),
buckets AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)
              AS BIGINT) AS bucket
  FROM dots GROUP BY 1),
q AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
      FROM embeddings),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         sum(a.v * b.v) AS dot, sum(a.v * a.v) AS na,
         sum(b.v * b.v) AS nb
  FROM q a JOIN q b USING (pos)
  JOIN buckets ba ON ba.vec_id = a.vec_id
  JOIN buckets bb ON bb.vec_id = b.vec_id AND ba.bucket = bb.bucket
  WHERE a.vec_id != b.vec_id
  GROUP BY 1, 2),
scored AS (
  SELECT a_id, b_id,
         CAST(floor(dot / (sqrt(na) * sqrt(nb)) * 1000000 + 0.5)
              AS BIGINT) AS cos_e6
  FROM pairs WHERE na > 0 AND nb > 0),
ranked AS (
  SELECT a_id, b_id, cos_e6,
         row_number() OVER (PARTITION BY a_id
                            ORDER BY cos_e6 DESC, b_id) AS rank
  FROM scored)
SELECT a_id, CAST(rank AS INT) AS rank, b_id, cos_e6
FROM ranked WHERE rank <= 2 ORDER BY a_id, rank
"""

    sqls["semdedup"] = f"""
WITH RECURSIVE ee AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS x
  FROM embeddings),
dots AS (
  SELECT vec_id, p,
         sum(x * ((1103515245 * ((p * 1024 + d + 1) % {HASH_P}) + 12345)
                  % {HASH_P} - {(HASH_P - 1) // 2})) AS dot
  FROM ee CROSS JOIN (SELECT unnest(range(0, 3)) AS p)
  GROUP BY 1, 2),
buckets AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)
              AS BIGINT) AS bucket
  FROM dots GROUP BY 1),
q AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
      FROM embeddings),
cpairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM q a JOIN q b USING (pos)
  JOIN buckets ba ON ba.vec_id = a.vec_id
  JOIN buckets bb ON bb.vec_id = b.vec_id AND ba.bucket = bb.bucket
  WHERE a.vec_id < b.vec_id
  GROUP BY 1, 2
  HAVING sum(a.v * a.v) > 0 AND sum(b.v * b.v) > 0
     AND CAST(floor(sum(a.v * b.v)
              / (sqrt(sum(a.v * a.v)) * sqrt(sum(b.v * b.v)))
              * 1000000 + 0.5) AS BIGINT) >= 990000),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM cpairs
  UNION SELECT b_id, a_id FROM cpairs),
reach(vec_id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.vec_id),
clustered AS (
  SELECT vec_id, CAST(min(lbl) AS BIGINT) AS cluster_id
  FROM reach GROUP BY 1)
SELECT m.vec_id,
       CAST(coalesce(c.cluster_id, m.vec_id) AS BIGINT) AS cluster_id,
       coalesce(m.vec_id = c.cluster_id, TRUE) AS is_canonical
FROM embeddings m LEFT JOIN clustered c USING (vec_id)
ORDER BY m.vec_id
"""

    sqls["tfidf_keywords"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))
           AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf,
         t.tf * ln(1 + (n.n - d.df + 0.5) / (d.df + 0.5)) AS score
  FROM tf t JOIN dfs d USING (term) CROSS JOIN n),
ranked AS (
  SELECT doc_id, term, tf, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rank
  FROM scored)
SELECT doc_id, CAST(rank AS INT) AS rank, term, CAST(tf AS BIGINT) AS tf,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_e6
FROM ranked WHERE rank <= 3 AND doc_id < 50
ORDER BY doc_id, rank
"""

    sqls["collocations"] = f"""
WITH t AS (SELECT regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
bi AS (
  SELECT unnest([tk[i] || ' ' || tk[i + 1]
                 for i in range(1, len(tk))]) AS bigram
  FROM t WHERE len(tk) >= 2),
cab AS (SELECT bigram, count(*) AS cnt FROM bi GROUP BY 1),
nbi AS (SELECT count(*) AS n FROM bi),
uni AS (
  SELECT unnest(tk) AS term FROM t),
cu AS (SELECT term, count(*) AS cu FROM uni GROUP BY 1)
SELECT c.bigram, CAST(c.cnt AS BIGINT) AS count,
       CAST(floor(ln(nbi.n * c.cnt
                     / (CAST(c1.cu AS DOUBLE) * c2.cu)) * 1000000 + 0.5)
            AS BIGINT) AS pmi_e6
FROM cab c
JOIN cu c1 ON c1.term = split_part(c.bigram, ' ', 1)
JOIN cu c2 ON c2.term = split_part(c.bigram, ' ', 2)
CROSS JOIN nbi
WHERE c.cnt >= 5
ORDER BY count DESC, bigram LIMIT 25
"""

    sqls["maxsim_topk"] = """
WITH ev AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS p,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
  FROM embeddings),
dtok AS (SELECT vec_id, p // 16 AS dt, p % 16 AS d, v FROM ev),
qtok AS (SELECT p // 16 AS qt, p % 16 AS d, v AS qv
         FROM ev WHERE vec_id = 0),
dots AS (
  SELECT x.vec_id, x.dt, q.qt, sum(x.v * q.qv) AS dot
  FROM dtok x JOIN qtok q USING (d) GROUP BY 1, 2, 3),
best AS (SELECT vec_id, qt, max(dot) AS m FROM dots GROUP BY 1, 2),
tot AS (SELECT vec_id, CAST(sum(m) AS BIGINT) AS maxsim
        FROM best GROUP BY 1)
SELECT CAST(row_number() OVER (ORDER BY maxsim DESC, vec_id) AS INT)
         AS rank,
       vec_id, maxsim
FROM tot ORDER BY maxsim DESC, vec_id LIMIT 10
"""

    sqls["string_stats_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms})),
v AS (SELECT d.text AS v FROM matched m JOIN documents d USING (doc_id)
      WHERE d.text IS NOT NULL),
lens AS (SELECT count(*) AS n, min(length(v)) AS mn, max(length(v)) AS mx,
                avg(CAST(length(v) AS DOUBLE)) AS av FROM v),
chars AS (SELECT unnest(regexp_extract_all(v, '.', 0, 's')) AS ch FROM v),
hist AS (SELECT ch, count(*) AS cnt FROM chars GROUP BY ch),
ent AS (SELECT log2(sum(cnt)) - sum(cnt * log2(cnt)) / sum(cnt) AS e
        FROM hist)
SELECT CAST(n AS BIGINT) AS n, CAST(mn AS BIGINT) AS min_length,
       CAST(mx AS BIGINT) AS max_length,
       CAST(floor(av * 10000 + 0.5) AS BIGINT) AS avg_len_e4,
       CAST(floor(e * 10000 + 0.5) AS BIGINT) AS entropy_e4
FROM lens, ent
"""

    sqls["mad_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms})),
v AS (SELECT CAST(d.n_chars AS DOUBLE) AS v
      FROM matched m JOIN documents d USING (doc_id)),
med AS (SELECT count(*) AS n, quantile_cont(v, 0.5) AS m FROM v)
SELECT CAST(n AS BIGINT) AS n,
       CAST(floor(m * 10000 + 0.5) AS BIGINT) AS median_e4,
       CAST(floor((SELECT quantile_cont(abs(v.v - med.m), 0.5)
                   FROM v, med) * 10000 + 0.5) AS BIGINT) AS mad_e4
FROM med
"""

    sqls["matrix_stats_agg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms})),
v AS (SELECT CAST(d.n_chars AS BIGINT) AS x,
             CAST(len(regexp_extract_all(lower(d.text),
                                         '{TOKEN_RE_SQL}')) AS BIGINT) AS y
      FROM matched m JOIN documents d USING (doc_id)),
s AS (SELECT count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM v)
SELECT 'n_chars' AS field_x, 'n_chars' AS field_y,
       CAST(n AS BIGINT) AS count,
       CAST(floor(sx / n * 10000 + 0.5) AS BIGINT) AS mean_x_e4,
       CAST(floor(sx / n * 10000 + 0.5) AS BIGINT) AS mean_y_e4,
       CAST(floor((sxx - sx * sx / n) / (n - 1) * 10000 + 0.5) AS BIGINT)
         AS covariance_e4,
       CAST(floor((sxx - sx * sx / n) / (n - 1)
                  / sqrt(((sxx - sx * sx / n) / (n - 1))
                         * ((sxx - sx * sx / n) / (n - 1)))
                  * 1000000 + 0.5) AS BIGINT) AS corr_e6
FROM s
UNION ALL
SELECT 'n_chars', 'n_toks', CAST(n AS BIGINT),
       CAST(floor(sx / n * 10000 + 0.5) AS BIGINT),
       CAST(floor(sy / n * 10000 + 0.5) AS BIGINT),
       CAST(floor((sxy - sx * sy / n) / (n - 1) * 10000 + 0.5) AS BIGINT),
       CAST(floor((sxy - sx * sy / n) / (n - 1)
                  / sqrt(((sxx - sx * sx / n) / (n - 1))
                         * ((syy - sy * sy / n) / (n - 1)))
                  * 1000000 + 0.5) AS BIGINT)
FROM s
UNION ALL
SELECT 'n_toks', 'n_toks', CAST(n AS BIGINT),
       CAST(floor(sy / n * 10000 + 0.5) AS BIGINT),
       CAST(floor(sy / n * 10000 + 0.5) AS BIGINT),
       CAST(floor((syy - sy * sy / n) / (n - 1) * 10000 + 0.5) AS BIGINT),
       CAST(floor((syy - sy * sy / n) / (n - 1)
                  / sqrt(((syy - sy * sy / n) / (n - 1))
                         * ((syy - sy * sy / n) / (n - 1)))
                  * 1000000 + 0.5) AS BIGINT)
FROM s
"""

    sampler_cte = _bm25_scored_cte(
        sorted(set(BM25_QUERY_OR.split())), False
    )
    sqls["sampler_agg"] = f"""
{sampler_cte},
top AS (SELECT doc_id FROM scored ORDER BY score DESC, doc_id LIMIT 100),
v AS (SELECT CAST(d.n_chars AS BIGINT) AS v
      FROM top t JOIN documents d USING (doc_id))
SELECT count(*) AS sample_count,
       CAST(min(v) AS BIGINT) AS min_v, CAST(max(v) AS BIGINT) AS max_v,
       CAST(sum(v) AS BIGINT) AS sum_v,
       CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) * 1000000 + 0.5)
            AS BIGINT) AS avg_e6
FROM v
"""

    sqls["pipeline_normalize"] = f"""
{mb_cte}
SELECT bucket_epoch, CAST(doc_count AS BIGINT) AS doc_count,
       CAST(floor(CAST(doc_count AS DOUBLE) / sum(doc_count) OVER ()
                  * 1000000 + 0.5) AS BIGINT) AS pct_e6
FROM mb ORDER BY bucket_epoch
"""

    sqls["pipeline_moving_percentile"] = f"""
{mb_cte}
SELECT bucket_epoch,
       CAST(floor(mp * 10000 + 0.5) AS BIGINT) AS mp_e4
FROM (
  SELECT bucket_epoch,
         quantile_cont(CAST(doc_count AS DOUBLE), 0.5)
           OVER (ORDER BY bucket_epoch
                 ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS mp
  FROM mb)
WHERE mp IS NOT NULL ORDER BY bucket_epoch
"""

    sqls["fts_most_fields"] = f"""
WITH {_bm25_field_ctes("tx", tx_src, mf_terms, True)},
{_bm25_field_ctes("ti", ti_src, mf_terms, True)},
u AS (
  SELECT doc_id, score * 1.0 AS s FROM tx_scored
  UNION ALL SELECT doc_id, score * 2.0 FROM ti_scored
),
summed AS (SELECT doc_id, sum(s) AS score FROM u GROUP BY doc_id)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM summed ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["fts_ids"] = """
SELECT CAST(row_number() OVER (ORDER BY doc_id) AS INT) AS rank, doc_id
FROM documents WHERE doc_id IN (42, 7, 3, 11, 99999999)
ORDER BY doc_id LIMIT 10
"""

    sqls["fts_exists"] = """
SELECT CAST(row_number() OVER (ORDER BY doc_id) AS INT) AS rank, doc_id
FROM documents WHERE nullif(lang, 'de') IS NOT NULL
ORDER BY doc_id LIMIT 12
"""

    sqls["exact_substring_stats"] = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS t
  FROM documents),
win AS (
  SELECT doc_id, pos,
         CAST(('0x' || substr(md5(array_to_string(t[pos:pos+7], ' ')),
                              1, 15)) AS BIGINT) AS h60
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS pos
        FROM toks WHERE len(t) >= 8)),
g AS (SELECT h60, count(*) AS n_occ,
             min(struct_pack(d := doc_id, p := pos)) AS f
      FROM win GROUP BY 1),
dup AS (SELECT w.doc_id, w.pos FROM win w JOIN g USING (h60)
        WHERE g.n_occ >= 2
          AND NOT (w.doc_id = struct_extract(g.f, 'd')
                   AND w.pos = struct_extract(g.f, 'p'))),
mk AS (SELECT doc_id, pos,
         CASE WHEN max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             OR pos > max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           THEN 1 ELSE 0 END AS brk
       FROM dup),
isl AS (SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM mk),
spans AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 8 AS e
          FROM isl GROUP BY 1, 2),
pds AS (SELECT doc_id, count(*) AS n_spans,
               CAST(sum(e - s) AS BIGINT) AS removed
        FROM spans GROUP BY 1),
pdd AS (SELECT doc_id, count(*) AS dup_windows FROM dup GROUP BY 1)
SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(coalesce(pdd.dup_windows, 0) AS BIGINT) AS dup_windows,
       CAST(coalesce(pds.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(pds.removed, 0) AS BIGINT) AS removed_tokens
FROM toks t LEFT JOIN pdd USING (doc_id) LEFT JOIN pds USING (doc_id)
"""

    sqls["fts_span_multi"] = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') tk
           FROM documents),
toks AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
                unnest(tk) AS tok FROM t),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
dfs AS (SELECT tok AS term, count(DISTINCT doc_id) AS df FROM toks
        WHERE tok LIKE 's%' GROUP BY 1),
idfsum AS (
  SELECT sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))) AS isum
  FROM dfs d CROSS JOIN stats s),
freq AS (SELECT doc_id, count(*) AS tfp FROM toks
         WHERE tok LIKE 's%' GROUP BY 1),
scored AS (
  SELECT f.doc_id,
         i.isum * (f.tfp / (f.tfp + 1.2 * (1 - 0.75 + 0.75 * dl.doclen
                                           / s.avgdl))) * 2.2 AS score
  FROM freq f JOIN dl USING (doc_id) CROSS JOIN idfsum i CROSS JOIN stats s)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["geohash_grid"] = f"""
WITH {geo_pts},
ix AS (
  SELECT greatest(least(CAST(floor((lon + 180.0) / 360.0 * 256) AS BIGINT),
                        255), 0) AS li,
         greatest(least(CAST(floor((lat + 90.0) / 180.0 * 128) AS BIGINT),
                        127), 0) AS la
  FROM pts),
tw AS (SELECT ((li >> 7) & 1) * 16384
         + ((la >> 6) & 1) * 8192
         + ((li >> 6) & 1) * 4096
         + ((la >> 5) & 1) * 2048
         + ((li >> 5) & 1) * 1024
         + ((la >> 4) & 1) * 512
         + ((li >> 4) & 1) * 256
         + ((la >> 3) & 1) * 128
         + ((li >> 3) & 1) * 64
         + ((la >> 2) & 1) * 32
         + ((li >> 2) & 1) * 16
         + ((la >> 1) & 1) * 8
         + ((li >> 1) & 1) * 4
         + ((la >> 0) & 1) * 2
         + ((li >> 0) & 1) * 1 AS total FROM ix),
k AS (SELECT substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((total >> 10) & 31) AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((total >> 5) & 31) AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((total >> 0) & 31) AS INT) + 1, 1) AS key FROM tw)
SELECT key, CAST(count(*) AS BIGINT) AS doc_count
FROM k GROUP BY 1 ORDER BY doc_count DESC, key
"""

    sqls["pipeline_rate"] = f"""
{mb_cte}
SELECT bucket_epoch, CAST(doc_count AS BIGINT) AS doc_count,
       CAST(floor(CAST(doc_count AS DOUBLE)
                  / ((epoch(to_timestamp(bucket_epoch)
                            + INTERVAL 1 MONTH) - bucket_epoch)
                     / 86400.0)
                  * 1000000 + 0.5) AS BIGINT) AS rate_e6
FROM mb ORDER BY bucket_epoch
"""

    div_cte = _bm25_scored_cte(sorted(set(BM25_QUERY_OR.split())), False)
    sqls["diversified_sampler_agg"] = f"""
{div_cte},
ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored),
j AS (SELECT r.rank, d.lang, CAST(d.n_chars AS BIGINT) AS v
      FROM ranked r JOIN documents d USING (doc_id)),
occ AS (SELECT rank, v,
               row_number() OVER (PARTITION BY lang ORDER BY rank) AS o
        FROM j),
kept AS (SELECT v, row_number() OVER (ORDER BY rank) AS kr
         FROM occ WHERE o <= 2)
SELECT count(*) AS sample_count,
       CAST(min(v) AS BIGINT) AS min_v, CAST(max(v) AS BIGINT) AS max_v,
       CAST(sum(v) AS BIGINT) AS sum_v,
       CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) * 1000000 + 0.5)
            AS BIGINT) AS avg_e6
FROM kept WHERE kr <= 5
"""

    geo_pts = (
        f"SELECT {_GEO_LAT_SQL} AS lat, {_GEO_LON_SQL} AS lon "
        "FROM documents"
    )
    sqls["geo_centroid"] = f"""
WITH p AS ({geo_pts})
SELECT CAST(floor(avg(lat) * 1000000 + 0.5) AS BIGINT) AS lat_e6,
       CAST(floor(avg(lon) * 1000000 + 0.5) AS BIGINT) AS lon_e6,
       CAST(count(*) AS BIGINT) AS n_points
FROM p
"""

    sqls["geo_bounds"] = f"""
WITH p AS ({geo_pts})
SELECT CAST(floor(max(lat) * 1000000 + 0.5) AS BIGINT) AS top_e6,
       CAST(floor(min(lon) * 1000000 + 0.5) AS BIGINT) AS left_e6,
       CAST(floor(min(lat) * 1000000 + 0.5) AS BIGINT) AS bottom_e6,
       CAST(floor(max(lon) * 1000000 + 0.5) AS BIGINT) AS right_e6
FROM p
"""

    sqls["categorize_text"] = f"""
WITH toks AS (
  SELECT list_filter(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'),
                     t -> NOT regexp_matches(t, '[0-9]')) AS l
  FROM documents),
k AS (SELECT array_to_string(l[1:4], ' ') AS category FROM toks)
SELECT category, CAST(count(*) AS BIGINT) AS doc_count
FROM k WHERE length(category) > 0
GROUP BY 1 ORDER BY doc_count DESC, category LIMIT 15
"""

    sqls["random_sampler_agg"] = """
WITH kept AS (
  SELECT CAST(n_chars AS BIGINT) AS v FROM documents
  WHERE ((doc_id % 2147483647 + 2147483647) % 2147483647
         * 1103515245 + 12345) % 2147483647 % 1000 < 250)
SELECT CAST(count(*) AS BIGINT) AS sample_count,
       CAST(min(v) AS BIGINT) AS min_v, CAST(max(v) AS BIGINT) AS max_v,
       CAST(sum(v) AS BIGINT) AS sum_v,
       CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) * 1000000 + 0.5)
            AS BIGINT) AS avg_e6
FROM kept
"""

    sqls["variable_width_histogram"] = """
WITH t AS (
  SELECT CAST(n_chars AS DOUBLE) AS v,
         ntile(8) OVER (ORDER BY n_chars, doc_id) AS b
  FROM documents)
SELECT CAST(b AS BIGINT) AS bucket_idx,
       CAST(min(v) AS BIGINT) AS min_v,
       CAST(max(v) AS BIGINT) AS max_v,
       CAST(floor(avg(v) * 1000000 + 0.5) AS BIGINT) AS centroid_e6,
       CAST(count(*) AS BIGINT) AS doc_count
FROM t GROUP BY 1 ORDER BY 1
"""

    sqls["pipeline_bucket_correlation"] = f"""
{mb_cte},
r AS (SELECT CAST(doc_count AS DOUBLE) AS x,
             CAST(row_number() OVER (ORDER BY bucket_epoch) AS DOUBLE)
               AS y
      FROM mb)
SELECT CAST(floor((sum(x * y) - sum(x) * sum(y) / count(*))
         / sqrt((sum(x * x) - sum(x) * sum(x) / count(*))
              * (sum(y * y) - sum(y) * sum(y) / count(*)))
         * 1000000 + 0.5) AS BIGINT) AS corr_e6
FROM r
"""

    sqls["pipeline_ks_test"] = f"""
{mb_cte},
cd AS (SELECT CAST(sum(doc_count) OVER (ORDER BY bucket_epoch
                     ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                / sum(doc_count) OVER () AS ec,
              CAST(row_number() OVER (ORDER BY bucket_epoch) AS DOUBLE)
                / count(*) OVER () AS ef
       FROM mb)
SELECT CAST(floor(max(abs(ec - ef)) * 1000000 + 0.5) AS BIGINT) AS d_e6,
       CAST(floor(max(greatest(ec - ef, 0)) * 1000000 + 0.5) AS BIGINT)
         AS dplus_e6,
       CAST(floor(max(greatest(ef - ec, 0)) * 1000000 + 0.5) AS BIGINT)
         AS dminus_e6
FROM cd
"""

    sqls["c4_clean_stats"] = """
WITH l AS (
  SELECT doc_id, string_split(text, chr(10)) AS lines,
         (contains(lower(text), 'lorem ipsum')
          OR contains(text, chr(123))) AS page_bad
  FROM documents),
k AS (
  SELECT doc_id, page_bad, len(lines) AS n_lines_total,
         list_filter(lines, ln ->
             regexp_matches(ln, '[.!?"]\\s*$')
             AND len(list_filter(string_split_regex(ln, '\\s+'),
                                 w -> w <> '')) >= 5
             AND NOT contains(lower(ln), 'javascript')) AS kept
  FROM l)
SELECT doc_id,
       CAST(n_lines_total AS BIGINT) AS n_lines_total,
       CAST(len(kept) AS BIGINT) AS n_lines_kept,
       CAST(CASE WHEN page_bad OR len(kept) < 3 THEN 1 ELSE 0 END
            AS BIGINT) AS dropped,
       CAST(CASE WHEN page_bad OR len(kept) < 3 THEN 0
                 ELSE length(array_to_string(kept, chr(10))) END
            AS BIGINT) AS clean_chars
FROM k
"""

    sqls["fts_es_dsl"] = f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doclen) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM toks GROUP BY 1, 2),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
{_fuzzy_clause_ctes("m", must_terms)},
{_fuzzy_clause_ctes("s", should_terms)},
final AS (
  SELECT m.doc_id, m.score + COALESCE(s.score, 0) AS score
  FROM mscored m
  LEFT JOIN (SELECT doc_id, score FROM sscored
             WHERE nm = {len(should_terms)}) s USING (doc_id)
  WHERE m.nm = {len(must_terms)}
    AND m.doc_id NOT IN (SELECT doc_id FROM toks WHERE tok = 'stream')
    AND m.doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
)
SELECT doc_id, {_SCORE_E4} AS score_e4
FROM final ORDER BY score DESC, doc_id LIMIT 10
"""

    sqls["histogram_dense"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms})),
c AS (
  SELECT CAST(floor(d.n_chars / 200.0) AS BIGINT) AS bidx,
         count(*) AS doc_count
  FROM matched m JOIN documents d USING (doc_id) GROUP BY 1),
b AS (SELECT least(min(bidx), 0) AS lo,
             greatest(max(bidx), 60) AS hi FROM c),
ladder AS (SELECT unnest(generate_series(lo, hi)) AS bidx FROM b)
SELECT CAST(bidx * 200.0 AS BIGINT) AS bucket,
       CAST(COALESCE(doc_count, 0) AS BIGINT) AS doc_count
FROM ladder LEFT JOIN c USING (bidx) ORDER BY bucket
"""

    sqls["terms_order_by_avg"] = f"""
WITH matched AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE tok IN ({or_terms}))
SELECT d.lang AS value, count(*) AS doc_count,
       CAST(min(d.n_chars) AS BIGINT) AS min_chars,
       CAST(max(d.n_chars) AS BIGINT) AS max_chars,
       CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
       CAST(floor(avg(CAST(d.n_chars AS DOUBLE)) * 1000000 + 0.5)
            AS BIGINT) AS avg_e6
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1 ORDER BY avg(CAST(d.n_chars AS DOUBLE)) DESC, value LIMIT 3
"""

    sqls["frequent_item_sets"] = """
WITH it AS (
  SELECT 'lang:' || lang AS i1, 'source:' || source AS i2,
         'len_band:' || CAST(CAST(floor(n_chars / 2000) AS BIGINT)
                             AS VARCHAR) AS i3
  FROM documents),
s AS (
  SELECT i1 AS items, 1 AS set_size FROM it
  UNION ALL SELECT i2, 1 FROM it
  UNION ALL SELECT i3, 1 FROM it
  UNION ALL SELECT i1 || '|' || i2, 2 FROM it
  UNION ALL SELECT i1 || '|' || i3, 2 FROM it
  UNION ALL SELECT i2 || '|' || i3, 2 FROM it
  UNION ALL SELECT i1 || '|' || i2 || '|' || i3, 3 FROM it)
SELECT items, CAST(set_size AS BIGINT) AS set_size,
       CAST(count(*) AS BIGINT) AS doc_count
FROM s GROUP BY 1, 2 HAVING count(*) >= 5
ORDER BY doc_count DESC, set_size DESC, items LIMIT 15
"""

    sqls["geo_line_agg"] = f"""
WITH p AS (
  SELECT lang AS bucket, doc_id,
         CAST(floor(({_GEO_LAT_SQL}) * 1000000 + 0.5) AS BIGINT)
           AS lat6,
         CAST(floor(({_GEO_LON_SQL}) * 1000000 + 0.5) AS BIGINT)
           AS lon6
  FROM documents),
r AS (SELECT *, row_number() OVER (PARTITION BY bucket
                ORDER BY doc_id, lat6, lon6) AS rn FROM p)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_points,
       string_agg(CAST(lat6 AS VARCHAR) || ',' || CAST(lon6 AS VARCHAR),
                  ';' ORDER BY doc_id, lat6, lon6) AS line
FROM r WHERE rn <= 5 GROUP BY bucket ORDER BY bucket
"""

    sqls["significant_terms_chi2"] = f"""
WITH toks AS ({_TOKS}),
matched AS (SELECT DISTINCT doc_id FROM toks WHERE tok IN ({or_terms})),
nm AS (SELECT count(*) AS n FROM matched),
nd AS (SELECT count(*) AS n FROM documents),
fg AS (
  SELECT tok AS term, count(DISTINCT doc_id) AS df_fg
  FROM toks WHERE doc_id IN (SELECT doc_id FROM matched)
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
bg AS (SELECT tok AS term, count(DISTINCT doc_id) AS df_bg
       FROM toks GROUP BY 1),
cells AS (
  SELECT f.term, f.df_fg, b.df_bg,
         CAST(f.df_fg AS DOUBLE) AS a,
         (SELECT n FROM nm) - CAST(f.df_fg AS DOUBLE) AS b2,
         CAST(b.df_bg AS DOUBLE) - CAST(f.df_fg AS DOUBLE) AS c,
         ((SELECT n FROM nd) - (SELECT n FROM nm))
           - (CAST(b.df_bg AS DOUBLE) - CAST(f.df_fg AS DOUBLE)) AS d
  FROM fg f JOIN bg b USING (term)
  WHERE f.df_fg / (SELECT n * 1.0 FROM nm)
        > b.df_bg / (SELECT n * 1.0 FROM nd)),
scored AS (
  SELECT term, df_fg, df_bg,
         (SELECT n * 1.0 FROM nd) * (a * d - b2 * c) * (a * d - b2 * c)
           / ((a + b2) * (c + d) * (a + c) * (b2 + d)) AS s
  FROM cells)
SELECT term, df_fg, df_bg,
       CAST(floor(s * 1000 + 0.5) AS BIGINT) AS score_e3
FROM scored WHERE s > 0 ORDER BY s DESC, term LIMIT 10
"""

    ip_lo = 10 * 16777216
    sqls["ip_range_agg"] = f"""
WITH v AS (
  SELECT {ip_lo} + (doc_id * 1103515245 + 54321) % 16777216 AS ip
  FROM documents)
SELECT CAST(0 AS BIGINT) AS range_idx, '*-10.64.0.0' AS key,
       CAST(sum(CASE WHEN ip < {ip_lo + 64 * 65536} THEN 1 ELSE 0 END)
            AS BIGINT) AS doc_count FROM v
UNION ALL
SELECT 1, '10.64.0.0-10.192.0.0',
       CAST(sum(CASE WHEN ip >= {ip_lo + 64 * 65536}
                      AND ip < {ip_lo + 192 * 65536}
                THEN 1 ELSE 0 END) AS BIGINT) FROM v
UNION ALL
SELECT 2, '10.192.0.0-*',
       CAST(sum(CASE WHEN ip >= {ip_lo + 192 * 65536}
                THEN 1 ELSE 0 END) AS BIGINT) FROM v
UNION ALL
SELECT 3, '10.128.0.0/9',
       CAST(sum(CASE WHEN ip >= {ip_lo + 128 * 65536}
                      AND ip < {ip_lo + 128 * 65536 + 8388608}
                THEN 1 ELSE 0 END) AS BIGINT) FROM v
UNION ALL
SELECT 4, '10.32.77.0/24',
       CAST(sum(CASE WHEN ip >= {ip_lo + 32 * 65536 + 77 * 256}
                      AND ip < {ip_lo + 32 * 65536 + 77 * 256 + 256}
                THEN 1 ELSE 0 END) AS BIGINT) FROM v
ORDER BY range_idx
"""
    return sqls
