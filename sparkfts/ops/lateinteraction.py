"""Late-interaction retrieval: ColBERT-style MaxSim over multi-vector
documents (ES 8.16 ``rank_vectors`` / late-interaction rescoring).

Modern retrieval's third vector family after dense-single and sparse:
each document stores a SEQUENCE of token vectors and the query scores

    maxsim(q, d) = sum over query vectors qi of
                   max over doc vectors dj of dot(qi, dj)

— per-query-token best-match, summed. The engine pins the arithmetic
to the e3 integer quantization shared by every embedding op (exact
int64 dots, so cross-engine reproducible to the bit).

Spark-first shape: doc token vectors live in ONE ``array<array<float>>``
column (no explode in the scoring path); the query's vectors become
literal arrays, and the whole MaxSim is a rowwise Catalyst
higher-order expression — ``transform`` (per doc vector) +
``aggregate`` (dot) + ``array_max`` + sum over the query side,
evaluated inside codegen. Top-k is a distributed TakeOrdered. Cost is
``|docs| x n_doc_tokens x n_query_tokens x dim`` multiplies exactly
like a GPU maxsim, but streaming over the scan — at billion-doc scale
run it as the RESCORE stage over a first-phase candidate set (the
standard ColBERT serving shape; compose with any ANN op here).

No model runs in this container: :func:`split_token_vectors` derives
deterministic multi-vectors by slicing the test embeddings into
fixed-width token vectors — a real late-interaction export plugs in
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_token_vectors(
    emb: DataFrame,
    n_tokens: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Slice a flat embedding into ``n_tokens`` equal sub-vectors ->
    ``(vec_id, vectors array<array<float>>)`` (the deterministic
    multi-vector stand-in)."""
    if n_tokens < 1:
        raise ValueError("n_tokens must be >= 1")
    size = F.size(F.col(vec_col))
    width = (size / n_tokens).cast("int")
    vectors = F.transform(
        F.sequence(F.lit(0), F.lit(n_tokens - 1)),
        lambda t: F.slice(
            F.col(vec_col), t * width + 1, width
        ),
    )
    return emb.select(
        F.col(id_col).alias("vec_id"), vectors.alias("vectors")
    )


def _q3(vec: list[float]) -> list[int]:
    import math

    return [int(math.floor(x * 1000 + 0.5)) for x in vec]


def maxsim_topk(
    docs: DataFrame,
    query_vectors: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vectors_col: str = "vectors",
) -> DataFrame:
    """MaxSim top-k -> ``(rank, vec_id, maxsim)`` with ``maxsim`` the
    exact integer e3-quantized score (ties vec_id asc)."""
    if not query_vectors:
        raise ValueError("query_vectors must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    widths = {len(q) for q in query_vectors}
    if len(widths) != 1:
        raise ValueError("query vectors must share one dimension")
    per_q = []
    for q in query_vectors:
        qlit = F.array(*[F.lit(v).cast("long") for v in _q3(q)])
        dots = F.transform(
            F.col(vectors_col),
            lambda d: F.aggregate(
                F.zip_with(
                    F.transform(
                        d,
                        lambda x: F.floor(x * 1000 + 0.5).cast("long"),
                    ),
                    qlit,
                    lambda a, b: a * b,
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
        per_q.append(F.array_max(dots))
    total = per_q[0]
    for c in per_q[1:]:
        total = total + c
    scored = docs.select(
        F.col(id_col).alias("vec_id"), total.alias("maxsim")
    )
    top = scored.orderBy(F.desc("maxsim"), F.asc("vec_id")).limit(int(k))
    w = Window.orderBy(F.desc("maxsim"), F.asc("vec_id"))  # <= k rows
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "vec_id", F.col("maxsim").cast("long").alias("maxsim")
    )
