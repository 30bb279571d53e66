"""SentencePiece-style unigram-LM tokenizer training + segmentation.

The OTHER production tokenizer family next to BPE (Kudo 2018,
"Subword Regularization"; sentencepiece's default). Same scale shape
as :mod:`sparkfts.ops.bpe` (round-4 VERDICT next-round #9): exactly one
corpus-scale stage — the pruned word-frequency table — then a
driver-side coordinator reduce over <= ``max_words`` rows; segmentation
of the corpus is the distributed part (Arrow-batched mapInPandas with a
per-executor word cache).

Pinned DETERMINISTIC variant (documented where Kudo leaves freedom):

1. Seed inventory: every single character present, plus the
   ``seed_size`` most frequent substrings of length 2..``max_piece_len``
   (total occurrence count weighted by word count; ties piece asc).
2. Hard-EM (Viterbi-EM) for ``em_iters`` rounds: segment each word by
   Viterbi under current piece log-probs; re-estimate probs from the
   Viterbi counts (word-count weighted). Kudo's full EM uses
   forward-backward expectations; hard EM is the pinned reproducible
   choice (integer counts, no float accumulation order sensitivity in
   the E step).
3. Prune to ``vocab_size`` pieces by (prob desc, piece asc), ALWAYS
   retaining every single character (coverage: any word stays
   segmentable).
4. Viterbi tie-break, pinned: higher score wins; on equal score the
   segmentation whose LAST piece is longer wins (applied at each DP
   position, so the pin is total).

Log-probs are computed as ``log(count) - log(total)`` over exact int64
counts — bit-identical on any engine evaluating libm log the same way;
the segmenter compares float sums, so cross-engine rank identity is
pinned only through the shared implementation (the oracle entry is
rows-only, like BPE's, by documented design).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfts.ops.bpe import word_counts


def _seed_pieces(
    words: list[tuple[str, int]], seed_size: int, max_piece_len: int
) -> Counter:
    """Substring occurrence counts (word-count weighted): all single
    chars + the top multi-char substrings."""
    chars: Counter = Counter()
    subs: Counter = Counter()
    for w, c in words:
        n = len(w)
        for i in range(n):
            chars[w[i]] += c
            for ln in range(2, min(max_piece_len, n - i) + 1):
                subs[w[i:i + ln]] += c
    top = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    out = Counter(dict(top))
    out.update(chars)
    return out


def _viterbi(
    word: str,
    logp: dict[str, float],
    max_len: int,
    unk_logp: float | None = None,
) -> list[str]:
    """Best segmentation under the pinned tie-break (module docstring).
    ``unk_logp``: score for single characters outside the vocabulary
    (segmentation time — the corpus can contain alphabet the pruned
    training table never saw); ``None`` = fail loud (training time)."""
    n = len(word)
    # best[i] = (score, last_piece_len) for word[:i]
    best: list[tuple[float, int] | None] = [None] * (n + 1)
    best[0] = (0.0, 0)
    for i in range(1, n + 1):
        cand: tuple[float, int] | None = None
        for ln in range(1, min(max_len, i) + 1):
            prev = best[i - ln]
            if prev is None:
                continue
            lp = logp.get(word[i - ln:i])
            if lp is None and ln == 1:
                lp = unk_logp
            if lp is None:
                continue
            score = prev[0] + lp
            if cand is None or score > cand[0] or (
                score == cand[0] and ln > cand[1]
            ):
                cand = (score, ln)
        best[i] = cand
    if best[n] is None:
        raise ValueError(f"word {word!r} not segmentable")
    pieces: list[str] = []
    i = n
    while i > 0:
        ln = best[i][1]
        pieces.append(word[i - ln:i])
        i -= ln
    pieces.reverse()
    return pieces


def learn_unigram(
    docs: DataFrame,
    vocab_size: int,
    max_words: int = 50_000,
    text_col: str = "text",
    em_iters: int = 4,
    max_piece_len: int = 8,
    seed_factor: int = 4,
) -> list[tuple[str, float]]:
    """Train a unigram-LM piece vocabulary -> ``[(piece, logprob)]``
    sorted by (logprob desc, piece asc). Single chars are always
    retained, so ``len(result)`` can exceed ``vocab_size`` when the
    alphabet alone is larger."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    rows = word_counts(docs, text_col, max_words=max_words).collect()
    words = [(r["word"], int(r["cnt"])) for r in rows]
    if not words:
        return []
    counts = _seed_pieces(words, seed_factor * int(vocab_size),
                          max_piece_len)
    chars = {w[i] for w, _ in words for i in range(len(w))}
    for _ in range(int(em_iters)):
        total = sum(counts.values())
        logp = {
            p: math.log(c) - math.log(total) for p, c in counts.items()
        }
        new: Counter = Counter()
        for w, c in words:
            for piece in _viterbi(w, logp, max_piece_len):
                new[piece] += c
        # coverage: the alphabet survives even at zero Viterbi count
        for ch in chars:
            if ch not in new:
                new[ch] = 1
        counts = new
    keep = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    pieces: dict[str, int] = {}
    for p, c in keep:
        if len(pieces) < int(vocab_size) or len(p) == 1:
            pieces[p] = c
    total = sum(pieces.values())
    out = [
        (p, math.log(c) - math.log(total)) for p, c in pieces.items()
    ]
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return out


def apply_unigram(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    text_col: str = "text",
    max_piece_len: int = 8,
) -> DataFrame:
    """Segment the corpus with a learned vocabulary -> (doc_id,
    n_words, n_unigram_tokens). Distributed Viterbi (Arrow-batched,
    per-executor word cache); the vocabulary rides in the closure,
    vocabulary-sized like BPE's merge table."""
    logp = dict(vocab)
    src = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sparkfts.analysis import tokenize

        cache: dict[str, int] = {}

        def n_pieces(word: str) -> int:
            n = cache.get(word)
            if n is None:
                n = len(
                    _viterbi(word, logp, max_piece_len, unk_logp=-100.0)
                )
                cache[word] = n
            return n

        for pdf in batches:
            words = pdf["text"].map(tokenize)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": words.map(len),
                    "n_unigram_tokens": words.map(
                        lambda ws: sum(n_pieces(w) for w in ws)
                    ),
                }
            )

    return src.mapInPandas(
        gen, "doc_id long, n_words long, n_unigram_tokens long"
    )
