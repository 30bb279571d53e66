"""Spark-side analysis stage: extraction, doc-id assignment, tokenization.

All kernels are Arrow-batched (``mapInPandas`` / ``pandas_udf``) wrapping
the pinned pure functions in :mod:`sparkfts.analysis` — no per-row Python
UDFs on the hot path (BASELINE.json ``input_hint``). This is the Spark
realization of what the reference delegates to Elasticsearch's analyzers
(reference ElasticsearchToNeo4jSync.py:92-99) plus its own lowercase
normalization (reference ElasticsearchToNeo4jSync.py:94).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkfts.analysis import TOKEN_RE, extract_text

TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("doclen", T.IntegerType(), False),
    ]
)

DOCMAP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("doclen", T.IntegerType(), False),
    ]
)


def sha1_doc_id(urls: pd.Series) -> pd.Series:
    """Deterministic 63-bit doc id: big-endian sha1(url)[0:8] >> 1.

    Hash-derived (no global sort / zipWithIndex) so id assignment is
    embarrassingly parallel and stable across runs, partitionings and
    cluster sizes — a requirement for resumable builds and rank-identity
    tie-breaks at 10^12 docs. The pure-Python oracle computes the same.
    """
    return pd.Series(
        [
            int.from_bytes(hashlib.sha1(u.encode("utf-8")).digest()[:8], "big") >> 1
            for u in urls
        ],
        index=urls.index,
        dtype="int64",
    )


@F.pandas_udf(T.LongType())
def doc_id_udf(urls: pd.Series) -> pd.Series:  # pragma: no cover - thin wrapper
    return sha1_doc_id(urls)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched wrapper of the pinned extraction (byte-identical to oracle)."""
    return html.map(extract_text)


_EMPTY_TOKENS_PDF = {
    "doc_id": "int64",
    "term": "object",
    "tf": "int32",
    "doclen": "int32",
}


def _stem_flat(flat_terms: np.ndarray, stemmer: str | None) -> np.ndarray:
    """Apply the pinned stemmer to a flat term stream via its unique set
    (the stem runs once per distinct surface form per batch, not once
    per token occurrence)."""
    from sparkfts.analysis import stem_fn

    fn = stem_fn(stemmer)
    if fn is None or flat_terms.size == 0:
        return flat_terms
    uniq, inv = np.unique(flat_terms, return_inverse=True)
    stemmed = np.array([fn(t) for t in uniq], dtype=object)
    return stemmed[inv]


def _tokenize_batch(
    pdf: pd.DataFrame,
    id_col: str,
    text_col: str,
    stopwords: frozenset | None = None,
    stemmer: str | None = None,
    expander: str | None = None,
) -> pd.DataFrame:
    """Vectorized batch tokenize -> one row per (doc, distinct term).

    pandas str ops + numpy grouping; the only per-row work is the regex
    findall itself (C-level via ``Series.str.findall``). With
    ``stopwords``, the flat term stream is masked with one ``np.isin``
    and doclen recomputed as the SURVIVING token count (the pinned
    stop-filter semantics, sparkfts.analysis.tokenize). ``stemmer``
    applies AFTER the stop filter (pinned chain order); two surface
    forms stemming alike merge into one (doc, term) row with summed tf
    (doclen is unchanged — stemming is 1:1).
    """

    def _empty():
        return pd.DataFrame(
            {
                c: pd.Series([], dtype=d)
                for c, d in _EMPTY_TOKENS_PDF.items()
            }
        )

    from sparkfts.analysis import _parse_chain, ascii_fold

    texts = pdf[text_col].fillna("")
    if _parse_chain(stemmer)[0]:  # asciifold char filter: PRE-tokenize
        texts = texts.map(ascii_fold)
    toks = texts.str.lower().str.findall(TOKEN_RE)
    if expander is not None:
        # index-time edge_ngram/shingle expansion (index-only — query
        # analysis stays standard); doclen counts the EXPANDED stream
        from sparkfts.analysis import expand_tokens

        toks = toks.map(lambda lst: expand_tokens(lst, expander))
    doclen = toks.str.len().astype("int32")
    n_per_doc = doclen.to_numpy()
    if n_per_doc.sum() == 0:
        return _empty()
    doc_ids = np.repeat(pdf[id_col].to_numpy(dtype="int64"), n_per_doc)
    flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in toks])
    if stopwords:
        keep = ~np.isin(flat_terms, sorted(stopwords))
        doc_ids, flat_terms = doc_ids[keep], flat_terms[keep]
        if doc_ids.size == 0:
            return _empty()
        flat_terms = _stem_flat(flat_terms, stemmer)
        tmp = pd.DataFrame({"doc_id": doc_ids, "term": flat_terms})
        dl = tmp.groupby("doc_id", sort=False).size()
        out = (
            tmp.groupby(["doc_id", "term"], sort=False)
            .size()
            .rename("tf")
            .reset_index()
        )
        out["doclen"] = out["doc_id"].map(dl).astype("int32")
        out["tf"] = out["tf"].astype("int32")
        return out[["doc_id", "term", "tf", "doclen"]]
    flat_terms = _stem_flat(flat_terms, stemmer)
    dls = np.repeat(doclen.to_numpy(), n_per_doc)
    # group by (doc, term): sort by term within doc blocks via pandas groupby
    out = (
        pd.DataFrame(
            {"doc_id": doc_ids, "term": flat_terms, "doclen": dls}
        )
        .groupby(["doc_id", "term", "doclen"], sort=False)
        .size()
        .rename("tf")
        .reset_index()
    )
    out["tf"] = out["tf"].astype("int32")
    return out[["doc_id", "term", "tf", "doclen"]]


def tokenize_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    stemmer: str | None = None,
    shard_col: str | None = None,
    expander: str | None = None,
) -> DataFrame:
    """``(id, text)`` -> ``(doc_id, term, tf, doclen)`` (one row per distinct term).

    tf is computed inside the Arrow batch (map-side), so the downstream
    shuffle moves one row per *distinct* (doc, term) — not one per token
    occurrence. At web scale that's the difference between shuffling
    ~10^14 token rows and ~10^13 distinct-pair rows.

    ``shard_col``: pass this int column of ``df`` through to the output
    (routed builds, where a doc's shard is NOT derivable from doc_id);
    a map-side per-batch pandas merge, no extra shuffle.
    """
    cols = [
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    ]
    if shard_col is not None:
        cols.append(F.col(shard_col).cast("int").alias("__shard"))
    src = df.select(*cols)
    sw = frozenset(stopwords) if stopwords else None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _tokenize_batch(
                pdf, "doc_id", "text", stopwords=sw, stemmer=stemmer,
                expander=expander,
            )
            if shard_col is not None:
                out = out.merge(
                    pdf[["doc_id", "__shard"]].rename(
                        columns={"__shard": "shard"}
                    ),
                    on="doc_id",
                )
            yield out

    if shard_col is None:
        return src.mapInPandas(gen, TOKENS_SCHEMA)
    schema = T.StructType(
        TOKENS_SCHEMA.fields
        + [T.StructField("shard", T.IntegerType(), False)]
    )
    return src.mapInPandas(gen, schema)


def prepare_pages(
    pages: DataFrame,
    validate_extraction: bool = False,
    id_source: str = "sha1",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Canonical webtext table -> ``(doc_id, url, text, lang, warc_ts)``.

    ``id_source="sha1"`` assigns hash doc ids from url (the default for
    webtext); ``"column"`` trusts an existing int64 ``doc_id`` column
    (driver testdata tables). Optionally re-extracts from ``html`` and
    asserts byte-identity with the stored ``text`` column (the input_hint
    invariant) by failing the job on the first mismatching url.
    """
    if id_source == "column":
        out = pages.withColumn("doc_id", F.col("doc_id").cast("long"))
    else:
        out = pages.withColumn("doc_id", doc_id_udf(F.col("url")))
    if validate_extraction:
        out = out.withColumn("_re_extracted", extract_text_udf(F.col("html")))
        mismatch = out.where(F.col("_re_extracted") != F.col("text"))
        bad = mismatch.select("url").limit(1).collect()
        if bad:
            raise AssertionError(
                f"extraction not byte-identical for url={bad[0][0]!r}"
            )
        out = out.drop("_re_extracted")
    # lang/warc_ts are carried through when present but nothing downstream
    # requires them (docmap + tokenize need doc_id/url/text only), so a
    # minimal (url, text) table indexes fine; keep_cols adds docvalue
    # columns the caller wants to survive into the docmap
    keep = ["doc_id", "url", "text"] + [
        c
        for c in (*("lang", "warc_ts"), *(keep_cols or []))
        if c in out.columns
    ]
    seen = []
    for c in keep:
        if c not in seen:
            seen.append(c)
    return out.select(*seen)


def build_docmap(
    pages_with_ids: DataFrame,
    text_col: str = "text",
    docvalue_cols: list[str] | None = None,
    stopwords: list[str] | None = None,
    stemmer: str | None = None,
    expander: str | None = None,
) -> DataFrame:
    """``(doc_id, url, doclen[, docvalues...])`` — per-doc metadata.

    ``docvalue_cols``: extra page columns stored alongside (the ES
    doc-values equivalent — aggregations/facets then need no side table).
    ``stopwords``: doclen counts SURVIVING tokens only (must match the
    tokenize pass's list for avgdl/doclen consistency). ``stemmer``
    matters here ONLY for its asciifold char-filter component — folding
    can merge split tokens ("naïve" is two ASCII runs unfolded, one
    folded), so doclen must count the FOLDED stream; stemming itself is
    1:1 and never changes doclen.
    """
    from sparkfts.analysis import _parse_chain, ascii_fold, expand_tokens

    sw = frozenset(stopwords) if stopwords else None
    fold = _parse_chain(stemmer)[0]

    @F.pandas_udf(T.IntegerType())
    def doclen_udf(text: pd.Series) -> pd.Series:
        text = text.fillna("")
        if fold:
            text = text.map(ascii_fold)
        if expander is not None:
            toks = text.str.lower().str.findall(TOKEN_RE)
            return toks.map(
                lambda lst: len(expand_tokens(lst, expander))
            ).astype("int32")
        if sw:
            toks = text.str.lower().str.findall(TOKEN_RE)
            return toks.map(
                lambda lst: sum(1 for t in lst if t not in sw)
            ).astype("int32")
        return (
            text.str.lower().str.count(TOKEN_RE.pattern).astype("int32")
        )

    extra = [c for c in (docvalue_cols or []) if c not in ("doc_id", "url")]
    return pages_with_ids.select(
        "doc_id", "url", doclen_udf(F.col(text_col)).alias("doclen"), *extra
    )
