"""Deterministic synthetic webtext corpus + query-set generator (FIXTURES.md).

Produces the canonical input table of BASELINE.json ``input_hint``:
``(url string, warc_ts timestamp, html binary, text string, lang string)``
with realistic head-term skew (Zipf s=1.07 over a ~10k-term vocabulary) and
lognormal document lengths. ``text`` is the ground truth
``analysis.extract_text(html)`` applied at generation time, so the engine's
extraction UDF is checked for per-url byte identity against stored data.

Everything is seed-fixed (numpy PCG64, seed=42 by default): no wall clock,
no network, no external data — the same call always produces byte-identical
parquet content.
"""

from __future__ import annotations

import datetime
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sparkfts.analysis import extract_text

# canonical webtext page schema (BASELINE.json input_hint), importable by
# streaming sources that must declare a schema up front
PAGE_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

VOCAB_SIZE = 10_000
ZIPF_S = 1.07
LOGNORM_MU = 4.5
LOGNORM_SIGMA = 0.7
LEN_MIN, LEN_MAX = 5, 2000
LANGS = ["en", "es", "de", "fr", "zh"]
LANG_W = [0.6, 0.1, 0.1, 0.1, 0.1]
EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

_COMMON = (
    "the of and to a in is it you that he was for on are as with his they "
    "at be this have from or one had by word but not what all were we when "
    "your can said there use an each which she do how their if will up "
    "other about out many then them these so some her would make like him "
    "into time has look two more write go see number no way could people"
).split()

_SYLLABLES = (
    "ba be bi bo bu ca ce ci co cu da de di do du fa fe fi fo fu ga ge gi "
    "go gu ha he hi ho hu ja jo ka ke ki ko ku la le li lo lu ma me mi mo "
    "mu na ne ni no nu pa pe pi po pu ra re ri ro ru sa se si so su ta te "
    "ti to tu va ve vi vo vu wa we wi wo za zo"
).split()

# Deterministic HTML quirks exercised by extraction (FIXTURES.md §1).
_ENTITY_SNIPPET = "fish &amp; chips &lt;tag&gt; &quot;quoted&quot; &#169; &#x2603;"
_MULTILINGUAL = "café naïve größe 中文 日本語"


def build_vocab(size: int = VOCAB_SIZE) -> list[str]:
    """Fixed vocabulary: common English head + synthetic syllable words."""
    rng = np.random.Generator(np.random.PCG64(7))
    vocab = list(_COMMON)
    seen = set(vocab)
    while len(vocab) < size:
        n_syl = int(rng.integers(2, 5))
        w = "".join(rng.choice(_SYLLABLES) for _ in range(n_syl))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab[:size]


def _zipf_probs(n: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


def gen_corpus(n_docs: int, seed: int = 42) -> pa.Table:
    """Generate the webtext table as a pyarrow Table (columns per input_hint)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = np.array(build_vocab(), dtype=object)
    probs = _zipf_probs(len(vocab))

    lengths = np.exp(rng.normal(LOGNORM_MU, LOGNORM_SIGMA, n_docs))
    lengths = np.clip(lengths.astype(np.int64), LEN_MIN, LEN_MAX)
    lang_idx = rng.choice(len(LANGS), size=n_docs, p=LANG_W)

    # one draw for all tokens, then split per doc (fast + deterministic)
    total = int(lengths.sum())
    token_idx = rng.choice(len(vocab), size=total, p=probs)
    bounds = np.concatenate(([0], np.cumsum(lengths)))

    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(n_docs):
        toks = vocab[token_idx[bounds[i] : bounds[i + 1]]]
        title = " ".join(toks[:4])
        body_words = list(toks[4:]) if len(toks) > 4 else list(toks)
        # split body into paragraphs of <=40 words
        paras = [
            " ".join(body_words[j : j + 40]) for j in range(0, len(body_words), 40)
        ] or [""]
        extra = ""
        if i % 17 == 0:
            extra += f"<p>{_ENTITY_SNIPPET}</p>"
        if i % 23 == 0:
            extra += f"<p>{_MULTILINGUAL}</p>"
        if i % 31 == 0:
            extra += "<script>var x = 'NEVER_VISIBLE';</script>"
            extra += "<!-- hidden comment -->"
        body = "".join(f"<p>{p}</p>" for p in paras) + extra
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body><h1>{title}</h1>{body}</body></html>"
        )
        url = f"https://site{i % 1000}.example/" + hashlib.sha1(
            str(i).encode()
        ).hexdigest()[:8]
        urls.append(url)
        tss.append(EPOCH + datetime.timedelta(seconds=int(i) * 137))
        htmls.append(html.encode("utf-8"))
        texts.append(extract_text(html.encode("utf-8")))
        langs.append(LANGS[lang_idx[i]])

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_corpus(path: str, n_docs: int, seed: int = 42) -> pa.Table:
    tbl = gen_corpus(n_docs, seed)
    # small row groups keep the file splittable: parquet scans can only
    # split at row-group boundaries, and the build's expensive stage
    # (extract+tokenize) parallelizes no finer than the scan does
    pq.write_table(tbl, path, row_group_size=2048)
    return tbl


def gen_queries(texts: list[str], n_queries: int = 50, seed: int = 43) -> list[dict]:
    """Reference query set spanning the df spectrum (FIXTURES.md §2).

    Includes: head/mid/tail terms, an out-of-vocab term (empty result),
    mixed-case input (case folding), and a nowhere-co-occurring pair
    (empty conjunctive intersection). k defaults to 10 with 1/100 variants.
    """
    from collections import Counter

    from sparkfts.analysis import tokenize

    df: Counter[str] = Counter()
    for t in texts:
        df.update(set(tokenize(t)))
    by_df = [w for w, _ in df.most_common()]
    n = len(by_df)
    head = by_df[: max(1, n // 50)]
    mid = by_df[n // 3 : n // 3 + max(1, n // 10)]
    tail = [w for w, c in df.items() if c == 1] or by_df[-10:]

    rng = np.random.Generator(np.random.PCG64(seed))
    queries: list[dict] = []

    def add(q: str, k: int = 10) -> None:
        queries.append({"query_id": len(queries), "query": q, "k": k})

    add(head[0])                                # single head term
    add(tail[0])                                # single tail term (df=1)
    add("zzqqxxnotaword")                       # absent from vocab -> empty
    add(head[0].upper())                        # mixed case folds
    add(f"{head[0]} {tail[0]} {tail[-1]}")      # likely empty intersection
    add(head[0], k=1)
    add(head[0], k=100)
    while len(queries) < n_queries:
        n_terms = int(rng.integers(1, 5))
        pool = [head, mid, tail][int(rng.integers(0, 3))]
        terms = [pool[int(rng.integers(0, len(pool)))] for _ in range(n_terms)]
        k = [10, 10, 10, 1, 100][int(rng.integers(0, 5))]
        add(" ".join(terms), k)
    return queries
