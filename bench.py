"""Benchmark harness: index-build throughput + BM25 query latency.

Driver contract: prints ONE JSON line
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Corpus: the deterministic synthetic webtext table (BASELINE.json
``input_hint`` shape), sized to the scale factor of $SPARK_GRAFT_SF_DIR
(sf0.1 -> 50,000 docs), generated once and cached under .scratch/.

Modes:
  python bench.py                 # single run at local[$SPARK_GRAFT_CPUS]
  python bench.py --scaling       # N vs 4N cores (local[8] vs local[32]),
                                  # prints the same single JSON line with a
                                  # "scaling" section and appends the table
                                  # to BENCH/BASELINE.md

A correctness spot-check (top-k of 5 queries vs the pure-Python oracle)
runs inside every bench so the reported numbers are from a verifiably
correct engine.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DOCS_PER_SF = 500_000  # sf0.1 -> 50k docs (FIXTURES.md bench scale)


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _ensure_corpus(sf: float) -> tuple[str, int]:
    n_docs = max(int(DOCS_PER_SF * sf), 500)
    path = os.path.join(REPO, ".scratch", f"webtext_{n_docs}.parquet")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        from sparkfts.synth import write_corpus

        write_corpus(path, n_docs, seed=42)
    return path, n_docs


def _run_once(cores: int, corpus_path: str, n_docs: int, sf: float) -> dict:
    """One full cycle: build index, run the 50-query set, collect timings."""
    from pyspark.sql import SparkSession

    from sparkfts.index import build_index
    from sparkfts.query import bm25_index_batch
    from sparkfts.session import get_spark
    from sparkfts.synth import gen_queries

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(cores=cores, app_name=f"sparkfts-bench-{cores}")
    try:
        pages = spark.read.parquet(corpus_path)
        idx = os.path.join(REPO, ".scratch", f"idx_{n_docs}_{cores}")

        t0 = time.time()
        meta = build_index(pages, idx, n_shards=max(cores, 8), n_tbuckets=16)
        t_build = time.time() - t0

        texts = [r["text"] for r in pages.select("text").collect()]
        qs = gen_queries(texts)

        # batch throughput: all 50 queries in one job
        t0 = time.time()
        batch_rows = bm25_index_batch(
            spark, idx, [(q["query_id"], q["query"], q["k"]) for q in qs]
        ).collect()
        t_batch = time.time() - t0

        # per-query latency: warm-searcher serving (the reference's ES keeps
        # its index open between requests; Searcher is that shape here)
        from sparkfts.searcher import Searcher

        searcher = Searcher(spark, idx)
        searcher.warmup()
        lat: dict[str, float] = {}
        for q in qs[:20]:
            t0 = time.time()
            searcher.search_batch(
                [(q["query_id"], q["query"], q["k"])]
            ).collect()
            lat[f"q{q['query_id']:02d}"] = round(time.time() - t0, 4)
        searcher.close()
        lats = sorted(lat.values())
        p50 = statistics.median(lats)
        p99 = lats[min(int(len(lats) * 0.99), len(lats) - 1)]

        # correctness spot-check vs oracle (5 queries)
        import pandas as pd

        from oracle.bm25 import BM25Oracle
        from sparkfts.tokens import sha1_doc_id

        urls = [r["url"] for r in pages.select("url").collect()]
        ids = sha1_doc_id(pd.Series(urls))
        oracle = BM25Oracle(zip(ids.tolist(), texts))
        by_qid: dict[int, list] = {}
        for r in batch_rows:
            by_qid.setdefault(r["query_id"], []).append(r)
        for q in qs[:5]:
            exp = oracle.search(q["query"], k=q["k"])
            got = sorted(by_qid.get(q["query_id"], []), key=lambda r: r["rank"])
            assert [d for d, _ in exp] == [r["doc_id"] for r in got], (
                f"bench correctness check failed on q{q['query_id']}"
            )

        return {
            "cores": cores,
            "build_sec": round(t_build, 3),
            "docs_per_sec": round(n_docs / t_build, 1),
            "batch50_sec": round(t_batch, 3),
            "qps_batch": round(len(qs) / t_batch, 2),
            "p50_sec": round(p50, 4),
            "p99_sec": round(p99, 4),
            "latencies": lat,
            "n_docs": n_docs,
            "postings_meta": {k: meta[k] for k in ("n_shards", "n_tbuckets")},
        }
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cores", type=int, default=CPUS)
    args = ap.parse_args()

    sf = _sf_of(SF_DIR)
    corpus_path, n_docs = _ensure_corpus(sf)

    if args.scaling:
        # scaling evidence needs compute to dominate fixed overhead
        # (session spin-up, job scheduling, parquet commit are constant in
        # cluster size): use a 4x corpus for the N-vs-4N comparison
        s_path, s_docs = _ensure_corpus(sf * 4)
        lo = _run_once(8, s_path, s_docs, sf)
        hi = _run_once(32, s_path, s_docs, sf)
        n_docs = s_docs
        # efficiency = (T_N / T_4N) / 4 for the build job
        eff_build = (lo["build_sec"] / hi["build_sec"]) / 4
        eff_batch = (lo["batch50_sec"] / hi["batch50_sec"]) / 4
        _append_baseline_md(sf, n_docs, lo, hi, eff_build, eff_batch)
        out = {
            "metric": "sparkfts_build_plus_query",
            "value": hi["build_sec"] + hi["batch50_sec"],
            "unit": "sec",
            "queries": hi["latencies"],
            "sf": sf,
            "build_sec": hi["build_sec"],
            "docs_per_sec": hi["docs_per_sec"],
            "p50_sec": hi["p50_sec"],
            "p99_sec": hi["p99_sec"],
            "scaling": {
                "cores_lo": 8,
                "cores_hi": 32,
                "build_sec_lo": lo["build_sec"],
                "build_sec_hi": hi["build_sec"],
                "efficiency_build": round(eff_build, 3),
                "batch50_sec_lo": lo["batch50_sec"],
                "batch50_sec_hi": hi["batch50_sec"],
                "efficiency_batch": round(eff_batch, 3),
            },
        }
    else:
        r = _run_once(args.cores, corpus_path, n_docs, sf)
        out = {
            "metric": "sparkfts_build_plus_query",
            "value": round(r["build_sec"] + r["batch50_sec"], 3),
            "unit": "sec",
            "queries": r["latencies"],
            "sf": sf,
            "build_sec": r["build_sec"],
            "docs_per_sec": r["docs_per_sec"],
            "batch50_sec": r["batch50_sec"],
            "qps_batch": r["qps_batch"],
            "p50_sec": r["p50_sec"],
            "p99_sec": r["p99_sec"],
            "n_docs": r["n_docs"],
            "cores": r["cores"],
        }
    print(json.dumps(out))


def _append_baseline_md(sf, n_docs, lo, hi, eff_build, eff_batch) -> None:
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    stamp = os.environ.get("BENCH_LABEL", "")
    lines = [
        "",
        f"## Scaling run {stamp} (sf={sf}, {n_docs} docs)",
        "",
        "| cores | build sec | docs/sec | batch-50 sec | p50 | p99 |",
        "|---|---|---|---|---|---|",
        f"| 8 (N) | {lo['build_sec']} | {lo['docs_per_sec']} | "
        f"{lo['batch50_sec']} | {lo['p50_sec']} | {lo['p99_sec']} |",
        f"| 32 (4N) | {hi['build_sec']} | {hi['docs_per_sec']} | "
        f"{hi['batch50_sec']} | {hi['p50_sec']} | {hi['p99_sec']} |",
        "",
        f"Scaling efficiency (T_N/T_4N)/4: build **{eff_build:.3f}**, "
        f"batch-query **{eff_batch:.3f}** (target >= 0.8 for build "
        f"throughput per the north rule).",
    ]
    with open(path, "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
