"""Warm query serving: an open index with cached postings + term stats.

The reference's search latency profile comes from Elasticsearch keeping
the Lucene index open between requests (reference ElasticsearchHandler.py
creates one client and reuses it across ``dataFetch`` calls). The
cold-path equivalent here (:func:`sparkfts.query.bm25_index_batch`)
re-lists and re-scans parquet per call; :class:`Searcher` is the serving
shape: construct once per index, then issue queries against

  - the postings DataFrame persisted in executor memory (decompressed
    columnar cache; filter-by-term happens in memory, no file listing),
  - a driver-side LRU of term -> global df (the term dictionary is only
    consulted for terms not yet seen — at web scale the dictionary is
    too big to collect, but query-term reuse is Zipfian too).

Scale note: on a cluster the persisted postings live across executors
(MEMORY_AND_DISK, partition-local); a query still touches only the
shards' cached blocks it needs. Nothing is collected to the driver except
k rows per query and the df values of queried terms.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkfts.analysis import tokenize_query
from sparkfts.query import RESULT_SCHEMA, _make_shard_scorer


class Searcher:
    """One open index. Thread-compatible with Spark's driver model."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        cache_postings: bool = True,
        df_cache_size: int = 100_000,
    ) -> None:
        from sparkfts.index import load_docmap, load_postings, load_terms, read_meta

        self.spark = spark
        self.index_dir = index_dir
        self.meta = read_meta(index_dir)
        self._terms = load_terms(spark, index_dir)
        self._postings = load_postings(spark, index_dir)
        if cache_postings:
            self._postings = self._postings.cache()
        self._docmap = load_docmap(spark, index_dir)
        self._df_lru: OrderedDict[str, int] = OrderedDict()
        self._df_cache_size = df_cache_size

    # -- term stats ---------------------------------------------------------

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        """Global df per term, LRU-cached; one pruned scan for the misses."""
        missing = [t for t in terms if t not in self._df_lru]
        if missing:
            from sparkfts.index import term_bucket

            buckets = sorted(
                {term_bucket(t, self.meta["n_tbuckets"]) for t in missing}
            )
            rows = (
                self._terms.where(
                    F.col("tbucket").isin(buckets)
                    & F.col("term").isin(missing)
                )
                .select("term", "df")
                .collect()
            )
            found = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                self._df_lru[t] = found.get(t, 0)
        out = {}
        for t in terms:
            self._df_lru.move_to_end(t)
            out[t] = self._df_lru[t]
        while len(self._df_lru) > self._df_cache_size:
            self._df_lru.popitem(last=False)
        return out

    # -- querying -----------------------------------------------------------

    def search_batch(
        self,
        queries: list[tuple[int, str, int]],
        mode: str = "and",
        use_blockmax: bool = True,
        resolve_urls: bool = False,
        offset: int = 0,
    ) -> DataFrame:
        """Same plan + kernels as ``bm25_index_batch``, warm inputs."""
        analyzed = [
            (qid, tokenize_query(text), k) for qid, text, k in queries
        ]
        analyzed = [(qid, t, k + int(offset)) for qid, t, k in analyzed if t]
        if not analyzed or self.meta["n_docs"] == 0:
            return self.spark.createDataFrame([], RESULT_SCHEMA)

        all_terms = sorted({t for _, terms, _ in analyzed for t in terms})
        df_map = self.term_dfs(all_terms)

        pruned = self._postings.where(F.col("term").isin(all_terms))
        joined = pruned.withColumn(
            "df",
            F.element_at(
                F.create_map(
                    *[
                        x
                        for t in all_terms
                        for x in (F.lit(t), F.lit(df_map.get(t, 0)))
                    ]
                ),
                F.col("term"),
            ),
        )
        scorer = _make_shard_scorer(
            analyzed,
            self.meta["n_docs"],
            self.meta["avgdl"],
            mode,
            use_blockmax,
            self.meta["block_size"],
        )
        local = joined.groupby("shard").applyInPandas(
            lambda pdf: scorer(pdf), "query_id int, doc_id long, score double"
        )
        k_map = F.create_map(
            *[x for qid, _, k in analyzed for x in (F.lit(qid), F.lit(k))]
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        out = (
            local.withColumn("rank", F.row_number().over(w))
            .where(
                (F.col("rank") <= F.element_at(k_map, F.col("query_id")))
                & (F.col("rank") > F.lit(int(offset)))
            )
            .select("query_id", F.col("rank").cast("int"), "doc_id", "score")
        )
        if resolve_urls:
            urls = self._docmap.select("doc_id", "url")
            out = out.join(urls, "doc_id", "left").select(
                "query_id", "rank", "doc_id", "url", "score"
            )
        return out.orderBy("query_id", "rank")

    def search(
        self, query: str, k: int = 10, mode: str = "and", **kw
    ) -> DataFrame:
        return self.search_batch(
            [(0, query, k)], mode=mode, **kw
        ).select("rank", "doc_id", "score")

    def warmup(self) -> int:
        """Materialize the postings cache; returns cached row count."""
        return self._postings.count()

    def close(self) -> None:
        self._postings.unpersist()
