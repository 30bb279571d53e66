"""BPE vocabulary training + segmentation over the corpus.

The tokenizer-training step of a pretraining pipeline (Sennrich et al.
2016; the GPT-2 byte-level variant differs only in the base alphabet).
Classic BPE has exactly one corpus-scale stage: the WORD FREQUENCY
table. The merge loop itself never touches the corpus again — it
iterates over (word, count) rows, a vocabulary-sized table — so the
scale shape here is:

1. one distributed job: analyzer-word counts (map-side partial agg),
   pruned to the ``max_words`` most frequent words (count desc, word
   asc — a TakeOrdered, no full sort). At web scale the unpruned tail
   is hapax junk; every production tokenizer trains on a pruned table.
2. a driver-side merge loop over the <= ``max_words`` collected rows
   (the coordinator-reduce shape — same reasoning as pipeline aggs):
   per iteration, count adjacent symbol pairs weighted by word count,
   merge the most frequent pair. Pinned tie-break: count desc, then
   pair lexicographic asc (classic BPE leaves ties undefined; pinning
   makes training reproducible across cluster sizes and engines).

``apply_bpe`` then segments the corpus distributed (Arrow-batched,
greedy lowest-merge-rank application — the GPT-2 encoder algorithm),
which IS corpus-scale and stays in mapInPandas.

Word symbolization: ``list(word chars)`` with ``</w>`` appended as a
separate end-of-word symbol.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfts.ops.textstats import tokens_col

EOW = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text", max_words: int | None = None
) -> DataFrame:
    """(word, cnt) under the pinned analyzer; optionally pruned to the
    ``max_words`` most frequent (count desc, word asc)."""
    wc = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    if max_words is not None:
        wc = wc.orderBy(F.desc("cnt"), F.asc("word")).limit(int(max_words))
    return wc


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pc: Counter = Counter()
    for syms, cnt in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += cnt
    return pc


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    ab = a + b
    out: dict[tuple[str, ...], int] = {}
    for syms, cnt in vocab.items():
        merged, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                merged.append(ab)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out[tuple(merged)] = out.get(tuple(merged), 0) + cnt
    return out


def learn_bpe(
    docs: DataFrame,
    n_merges: int,
    max_words: int = 50_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges -> ordered merge list. Stops
    early when no pair occurs twice (nothing left worth merging)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    rows = word_counts(docs, text_col, max_words=max_words).collect()
    vocab = {
        tuple(list(r["word"]) + [EOW]): int(r["cnt"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pc = _pair_counts(vocab)
        if not pc:
            break
        pair, cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append(pair)
        vocab = _merge_vocab(vocab, pair)
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Greedy lowest-rank merge application (the GPT-2 encoder)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best, best_rank, best_i = None, None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank, best_i = pair, r, i
        if best is None:
            break
        syms[best_i:best_i + 2] = [best[0] + best[1]]
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Segment the corpus with a learned merge list -> (doc_id,
    n_words, n_bpe_tokens). Distributed: Arrow-batched mapInPandas
    with a per-executor encoded-word cache; the merge table rides in
    the closure (vocabulary-sized, broadcast by Spark's task pickle).
    """
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    src = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sparkfts.analysis import tokenize

        cache: dict[str, int] = {}

        def n_tokens(word: str) -> int:
            n = cache.get(word)
            if n is None:
                n = len(_encode_word(word, ranks))
                cache[word] = n
            return n

        for pdf in batches:
            words = pdf["text"].map(tokenize)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": words.map(len),
                    "n_bpe_tokens": words.map(
                        lambda ws: sum(n_tokens(w) for w in ws)
                    ),
                }
            )

    return src.mapInPandas(
        gen, "doc_id long, n_words long, n_bpe_tokens long"
    )
