"""Plan-shape audit: assert physical-plan invariants over EVERY driver
entry at a small SF.

The scale contract this repo is graded on is not only "right answers"
but "right plans" — no row-at-a-time Python, no accidental cartesian
products, no unpartitioned global sorts over unbounded frames. This
tool builds each ``__spark_entry__.queries()`` DataFrame (plan only —
the terminal job is never run) and scans the executed plan string:

- ``BatchEvalPython`` (row-at-a-time Python UDF) — forbidden anywhere.
- ``CartesianProduct`` — forbidden outside the explicit whitelist
  (documented exact-oracle branches that are intentionally quadratic).
- ``Exchange SinglePartition`` feeding a Sort — allowed only when the
  upstream frame is bounded (top-k merges, reduced agg frames); the
  audit can't prove boundedness, so it REPORTS these for eyeball +
  whitelist rather than failing.

Run: ``python tools/plan_audit.py [sf_dir]`` -> one JSON line per
entry + a summary; non-zero exit on hard violations. The pytest
wrapper (tests/test_plan_audit.py) enforces the hard rules in CI.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Entries allowed a CartesianProduct/BroadcastNestedLoopJoin: the
# documented exact-oracle or broadcast-vs-centroid branches.
CROSS_WHITELIST = {
    "dedup_embedding_cosine",  # exact all-pairs oracle branch (documented)
    "ann_ivf_topk",            # broadcast vs n_centroids (bounded side)
    "ann_ivfpq_topk",          # same ivf_assign broadcast-vs-centroids leg
    "ann_pq_topk",             # broadcast codebook (bounded side)
    "ann_sq8_topk",            # scalar norm broadcast
    "ann_bbq_topk",
    "ann_cosine_topk",         # query-vector literal vs corpus (1 x N map)
    # inequality joins with a BROADCAST bounded side (query terms /
    # suggest candidates vs the dictionary, length-band pre-filter):
    # Spark plans these as BroadcastNestedLoopJoin by necessity; cost is
    # |dict| x |q_terms| cheap comparisons, the documented fuzzy shape
    "fts_fuzzy_topk",
    "term_suggest",
    # 1-row totals scalar crossJoin(broadcast(...)) — bounded by design
    "unigram_logppl",
    # 1x1 scalar join: length-stats row x entropy row
    "string_stats_agg",
    # rank_eval combines per-metric frames of n_requests rows each; with
    # a single request the equality join keys constant-fold to literals
    # and Catalyst plans a (1 x 1)-row nested loop — bounded by the
    # request batch, never by data size
    "rank_eval_metrics",
    # cosine leg: query-vector literal vs corpus (the ann_cosine shape)
    "hybrid_linear_topk",
    # entry-level presentation join: <= size terms buckets x the ONE
    # already-reduced stats row (both sides coordinator-bounded)
    "fts_dsl_aggs",
}


def audit(sf_dir: str) -> tuple[list[dict], int]:
    import __spark_entry__ as entry
    from sparkfts.session import get_spark

    spark = get_spark(app_name="plan-audit")
    out: list[dict] = []
    hard = 0
    for name, fn in sorted(entry.queries().items()):
        rec: dict = {"entry": name}
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # build error IS a finding
            rec["error"] = f"{type(e).__name__}: {e}"[:200]
            hard += 1
            out.append(rec)
            continue
        rec["batch_eval_python"] = plan.count("BatchEvalPython")
        rec["cartesian"] = plan.count("CartesianProduct") + plan.count(
            "BroadcastNestedLoopJoin"
        )
        rec["single_partition_sorts"] = plan.count(
            "Exchange SinglePartition"
        )
        if rec["batch_eval_python"]:
            rec["violation"] = "row-at-a-time Python UDF"
            hard += 1
        elif rec["cartesian"] and name not in CROSS_WHITELIST:
            rec["violation"] = "unwhitelisted cartesian/nested-loop join"
            hard += 1
        out.append(rec)
    return out, hard


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    rows, hard = audit(sf_dir)
    for r in rows:
        print(json.dumps(r))
    n_cross = sum(1 for r in rows if r.get("cartesian"))
    n_sp = sum(1 for r in rows if r.get("single_partition_sorts"))
    print(
        json.dumps(
            {
                "entries": len(rows),
                "hard_violations": hard,
                "with_cartesian": n_cross,
                "with_single_partition_exchange": n_sp,
            }
        )
    )
    return 1 if hard else 0


if __name__ == "__main__":
    raise SystemExit(main())
