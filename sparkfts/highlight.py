"""Result highlighting (ES ``highlight`` equivalent).

Pinned spec (deterministic, oracle-checkable at the token level):
analyze the query to its distinct term set; per document, walk the
analyzer's token stream (``[a-z0-9]+`` over lowercased text, so token i
here IS token i everywhere else in the engine) and report

  - ``first_tok_pos``: token index of the first query-term hit (the
    SQL-expressible part the driver oracle checks),
  - ``n_hit_tokens``: total query-term token occurrences,
  - ``fragment``: a ~``fragment_size``-char window of the ORIGINAL text
    centered on the first hit, with every query-term occurrence inside
    the window wrapped in ``pre_tag``/``post_tag`` (original casing
    preserved; pytest-pinned).

Docs with no hit get null spans. Shape note: highlighting runs over the
top-k RESULT docs (a k-row join against the corpus by doc_id), never the
corpus — the per-row regex here is result-page work, not a data-plane
kernel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkfts.analysis import TOKEN_RE, tokenize_query

HIGHLIGHT_SCHEMA = T.StructType(
    [
        T.StructField("first_tok_pos", T.IntegerType(), True),
        T.StructField("n_hit_tokens", T.IntegerType(), True),
        T.StructField("fragment", T.StringType(), True),
    ]
)


def _highlight_one(
    text: str,
    terms: frozenset[str],
    pre: str,
    post: str,
    frag: int,
):
    if not text:
        return (None, None, None)
    lowered = text.lower()
    # Spans are computed on the lowered text but sliced into the ORIGINAL.
    # For characters whose lowercase expands length ('İ' U+0130 -> 'i̇'),
    # every span after that point would shift and corrupt tag placement —
    # fall back to casefolding character-by-character, which preserves
    # per-char positions (maps each original char to its lowered form,
    # truncated to 1 char when lowering expands; query terms are ASCII
    # [a-z0-9]+ so expanded-lowercase chars can never themselves be hits).
    if len(lowered) != len(text):
        lowered = "".join((c.lower() or c)[0] for c in text)
    first_pos = None
    first_span = None
    n_hits = 0
    spans = []
    for i, m in enumerate(TOKEN_RE.finditer(lowered)):
        if m.group(0) in terms:
            n_hits += 1
            if first_pos is None:
                first_pos = i
                first_span = m.span()
            spans.append(m.span())
    if first_pos is None:
        return (None, None, None)
    s, e = first_span
    half = max((frag - (e - s)) // 2, 0)
    w0, w1 = max(0, s - half), min(len(text), e + half)
    # wrap every hit inside the window, right-to-left (stable offsets)
    out = text[w0:w1]
    for hs, he in reversed([sp for sp in spans if sp[0] >= w0 and sp[1] <= w1]):
        out = out[: hs - w0] + pre + out[hs - w0 : he - w0] + post + out[he - w0 :]
    prefix = "..." if w0 > 0 else ""
    suffix = "..." if w1 < len(text) else ""
    return (first_pos, n_hits, prefix + out + suffix)


def highlight(
    docs: DataFrame,
    query: str,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
    fragment_size: int = 60,
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, first_tok_pos, n_hit_tokens, fragment). Apply to the
    top-k result docs (join results to the corpus by doc_id first)."""
    terms = frozenset(tokenize_query(query))

    @F.pandas_udf(HIGHLIGHT_SCHEMA)
    def hl(text: pd.Series) -> pd.DataFrame:
        rows = [
            _highlight_one(t, terms, pre_tag, post_tag, fragment_size)
            for t in text
        ]
        return pd.DataFrame(
            rows, columns=["first_tok_pos", "n_hit_tokens", "fragment"]
        )

    return docs.select(
        "doc_id",
        hl(F.col(text_col)).alias("_hl"),
    ).select(
        "doc_id",
        F.col("_hl.first_tok_pos").alias("first_tok_pos"),
        F.col("_hl.n_hit_tokens").alias("n_hit_tokens"),
        F.col("_hl.fragment").alias("fragment"),
    )
