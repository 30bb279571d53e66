"""Model-based quality classifier (sparkfts.ops.qualityclf): scoring
mirror against the md5-bucket formula, empty-doc pin, distributed
logistic training on planted separable data."""

from __future__ import annotations

import hashlib
import math

import pytest

from sparkfts.ops.qualityclf import (
    clf_scores,
    logloss,
    pinned_weights,
    train_logreg,
)
from sparkfts.ops.textstats import HASH_P


def _bucket(tok: str, dim: int) -> int:
    return (int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            % HASH_P) % dim


def test_scoring_mirror(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "spark spark spark"),
            (3, ""),
            (4, "Zzz!!! 123"),
        ],
        "doc_id long, text string",
    )
    dim = 8
    w = pinned_weights(dim)
    got = {
        r["doc_id"]: (r["z"], r["prob"], r["kept"])
        for r in clf_scores(docs, w, intercept=0.25).collect()
    }
    import re

    for doc_id, text in [
        (1, "the quick brown fox"), (2, "spark spark spark"),
        (3, ""), (4, "Zzz!!! 123"),
    ]:
        toks = re.findall("[a-z0-9]+", text.lower())
        z = 0.25 + (
            sum(w[_bucket(t, dim)] for t in toks) / len(toks)
            if toks else 0.0
        )
        assert got[doc_id][0] == pytest.approx(z, abs=1e-12)
        assert got[doc_id][1] == pytest.approx(
            1 / (1 + math.exp(-z)), abs=1e-12
        )
        assert got[doc_id][2] == (z >= 0)
    # threshold variant
    kept = {
        r["doc_id"]: r["kept"]
        for r in clf_scores(docs, w, 0.25, threshold=0.99).collect()
    }
    assert not any(kept.values())
    with pytest.raises(ValueError):
        clf_scores(docs, [])


def test_training_separates_planted_labels(spark):
    """Linearly separable corpus: positive docs carry 'excellent',
    negative carry 'terrible' (+ shared noise). Training must reach
    100% accuracy and strictly reduce the loss."""
    rows = []
    for i in range(40):
        noise = f"common{i % 5} filler words here"
        if i % 2 == 0:
            rows.append((i, f"excellent insightful {noise}", 1))
        else:
            rows.append((i, f"terrible spam {noise}", 0))
    ex = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w0 = [0.0] * 64
    loss0 = logloss(ex, w0, 0.0)
    w, b = train_logreg(ex, dim=64, iters=25, lr=4.0)
    loss1 = logloss(ex, w, b)
    assert loss1 < loss0 * 0.5
    scored = clf_scores(ex, w, b).join(
        ex.select("doc_id", "label"), "doc_id"
    )
    acc = scored.selectExpr(
        "avg(CASE WHEN kept = (label = 1) THEN 1.0 ELSE 0.0 END) a"
    ).collect()[0]["a"]
    assert acc == 1.0
    with pytest.raises(ValueError):
        train_logreg(ex.limit(0), dim=8, iters=1)


def test_cli_quality_clf(spark, corpus, tmp_path, capsys):
    import json

    from sparkfts.cli import main

    inp = str(tmp_path / "docs.parquet")
    spark.createDataFrame(corpus.to_pandas()).write.parquet(inp)
    main(["quality-clf", "--input", inp, "--dim", "64", "--cores", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["weights"] == "pinned" and out["docs"] == 400
    assert 0 <= out["keep_rate"] <= 1
    # trained path on a tiny labeled set
    rows = [(i, ("excellent text " if i % 2 else "terrible spam ") + "x",
             1 if i % 2 else 0) for i in range(20)]
    lab = str(tmp_path / "labeled.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, label int"
    ).write.parquet(lab)
    main(["quality-clf", "--input", lab, "--train", lab, "--dim", "32",
          "--iters", "8", "--lr", "4.0", "--cores", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["weights"] == "trained" and out["docs"] == 20
