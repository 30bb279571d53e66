"""Round-5 wave-4 surface: geo_centroid / geo_bounds, categorize_text,
random_sampler, variable_width_histogram, bucket_correlation /
bucket_count_ks_test, C4 cleaning, _clone / _forcemerge."""

from __future__ import annotations

import math
import os
import re

import pytest
from pyspark.sql import functions as F


# ---- geo_centroid / geo_bounds ---------------------------------------------


@pytest.fixture(scope="module")
def pts(spark):
    rows = [
        (1, 10.0, 170.0), (2, -5.0, 175.0), (3, 20.0, -178.0),
        (4, 0.0, -170.0), (5, 7.5, 179.5),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lat double, lon double"
    )


def test_geo_centroid(spark, pts):
    from sparkfts.geo import geo_centroid

    r = geo_centroid(pts, "lat", "lon").collect()[0]
    assert math.isclose(r["lat"], (10 - 5 + 20 + 0 + 7.5) / 5)
    assert math.isclose(r["lon"], (170 + 175 - 178 - 170 + 179.5) / 5)
    assert r["count"] == 5


def test_geo_bounds_plain(spark, pts):
    from sparkfts.geo import geo_bounds

    r = geo_bounds(pts, "lat", "lon").collect()[0]
    assert (r["top"], r["bottom"]) == (20.0, -5.0)
    assert (r["left"], r["right"]) == (-178.0, 179.5)


def test_geo_bounds_wrap_crosses_antimeridian(spark, pts):
    from sparkfts.geo import geo_bounds

    # points cluster around the antimeridian: the smallest covering
    # interval is [170, -170] (wrapped), not [-178, 179.5]
    r = geo_bounds(pts, "lat", "lon", wrap_longitude=True).collect()[0]
    assert (r["left"], r["right"]) == (170.0, -170.0)
    assert r["left"] > r["right"]  # ES's wrapped-box encoding


def test_geo_bounds_wrap_no_cross(spark):
    from sparkfts.geo import geo_bounds

    df = spark.createDataFrame(
        [(1, 0.0, -10.0), (2, 0.0, 5.0), (3, 0.0, 30.0)],
        "doc_id long, lat double, lon double",
    )
    # largest gap is the long way around (30 -> 350 circularly), so the
    # wrap box equals the plain box
    r = geo_bounds(df, "lat", "lon", wrap_longitude=True).collect()[0]
    assert (r["left"], r["right"]) == (-10.0, 30.0)


def test_geo_bounds_wrap_single_point(spark):
    from sparkfts.geo import geo_bounds

    df = spark.createDataFrame(
        [(1, 3.0, 42.0)], "doc_id long, lat double, lon double"
    )
    r = geo_bounds(df, "lat", "lon", wrap_longitude=True).collect()[0]
    assert (r["left"], r["right"]) == (42.0, 42.0)


# ---- categorize_text --------------------------------------------------------


def test_categorize_text(spark):
    from sparkfts.aggs import categorize_text

    rows = [
        (1, "Error 404 fetching page from host alpha"),
        (2, "Error 500 fetching page from host beta"),
        (3, "Error 404 fetching page from host gamma"),
        (4, "User logged in at 12:30"),
        (5, "User logged in at 09:15"),
        (6, "12345 67890"),  # only numeric tokens -> skipped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["category"], r["doc_count"])
        for r in categorize_text(df, "text", max_matched_tokens=4)
        .collect()
    ]
    # digit tokens (404/500, timestamps) are variable parts — dropped
    assert got == [
        ("error fetching page from", 3),
        ("user logged in at", 2),
    ]
    with pytest.raises(ValueError):
        categorize_text(df, "text", max_matched_tokens=0)
    with pytest.raises(ValueError):
        categorize_text(df, "text", size=0)


# ---- random_sampler ---------------------------------------------------------


def _lcg_bucket(doc_id: int) -> int:
    p, a, b = 2_147_483_647, 1_103_515_245, 12_345
    return ((doc_id % p + p) % p * a + b) % p % 1000


def test_random_sampler_exact_keep_set(spark):
    from sparkfts.aggs import random_sampler_agg

    rows = [(i, i * 7 + 3) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    got = random_sampler_agg(df, "v", probability_permille=300)
    r = got.collect()[0]
    kept = [v for i, v in rows if _lcg_bucket(i) < 300]
    assert r["sample_count"] == len(kept)
    assert r["min_v"] == min(kept)
    assert r["max_v"] == max(kept)
    assert r["sum_v"] == sum(kept)
    assert math.isclose(r["avg_v"], sum(kept) / len(kept))
    with pytest.raises(ValueError):
        random_sampler_agg(df, "v", probability_permille=0)
    with pytest.raises(ValueError):
        random_sampler_agg(df, "v", probability_permille=1001)


# ---- variable_width_histogram -----------------------------------------------


def test_variable_width_histogram(spark):
    from sparkfts.aggs import variable_width_histogram

    rows = [(i, [1, 1, 2, 5, 9, 9, 9, 40, 41, 100][i]) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    got = variable_width_histogram(df, "v", buckets=3).collect()
    # ntile(3) over 10 rows -> sizes 4,3,3 in (v, doc_id) order
    assert [(r["bucket_idx"], r["doc_count"]) for r in got] == [
        (1, 4), (2, 3), (3, 3)
    ]
    assert (got[0]["min_v"], got[0]["max_v"]) == (1.0, 5.0)
    assert (got[1]["min_v"], got[1]["max_v"]) == (9.0, 9.0)
    assert (got[2]["min_v"], got[2]["max_v"]) == (40.0, 100.0)
    assert math.isclose(got[2]["centroid"], (40 + 41 + 100) / 3)
    # buckets never overlap and are value-ordered
    for a, b in zip(got, got[1:]):
        assert a["max_v"] <= b["min_v"]
    with pytest.raises(ValueError):
        variable_width_histogram(df, "v", buckets=0)


# ---- bucket_correlation / bucket_count_ks_test ------------------------------


@pytest.fixture(scope="module")
def bucket_frame(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 15.0), (4, 40.0)],
        "bucket int, doc_count double",
    )


def _pearson(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    vx = sum((x - mx) ** 2 for x in xs)
    vy = sum((y - my) ** 2 for y in ys)
    return cov / math.sqrt(vx * vy)


def test_bucket_correlation(spark, bucket_frame):
    from sparkfts.pipelineaggs import bucket_correlation

    got = bucket_correlation(
        bucket_frame, "doc_count", [1.0, 2.0, 3.0, 4.0]
    ).collect()[0]["correlation"]
    want = _pearson([10.0, 20.0, 15.0, 40.0], [1.0, 2.0, 3.0, 4.0])
    assert math.isclose(got, want, rel_tol=1e-12)
    with pytest.raises(ValueError):
        bucket_correlation(bucket_frame, "doc_count", [])
    with pytest.raises(Exception, match="does not match"):
        bucket_correlation(
            bucket_frame, "doc_count", [1.0, 2.0]
        ).collect()


def test_bucket_count_ks_test(spark, bucket_frame):
    from sparkfts.pipelineaggs import bucket_count_ks_test

    got = bucket_count_ks_test(bucket_frame).collect()[0]
    counts = [10.0, 20.0, 15.0, 40.0]
    tot = sum(counts)
    ec = [sum(counts[: i + 1]) / tot for i in range(4)]
    ef = [(i + 1) / 4 for i in range(4)]
    dplus = max(max(a - b, 0.0) for a, b in zip(ec, ef))
    dminus = max(max(b - a, 0.0) for a, b in zip(ec, ef))
    assert math.isclose(got["d_plus"], dplus)
    assert math.isclose(got["d_minus"], dminus)
    assert math.isclose(got["d_statistic"], max(dplus, dminus))
    # explicit fractions: concentrating expectation on bucket 1 grows D
    got2 = bucket_count_ks_test(
        bucket_frame, fractions=[0.97, 0.01, 0.01, 0.01]
    ).collect()[0]
    assert got2["d_statistic"] > got["d_statistic"]
    with pytest.raises(Exception, match="does not match"):
        bucket_count_ks_test(bucket_frame, fractions=[1.0]).collect()


# ---- C4 cleaning ------------------------------------------------------------


def _c4_mirror(text):
    lines = text.split("\n")
    kept = [
        ln for ln in lines
        if re.search(r'[.!?"]\s*$', ln)
        and len(ln.split()) >= 5
        and "javascript" not in ln.lower()
    ]
    page_bad = "lorem ipsum" in text.lower() or "{" in text
    dropped = page_bad or len(kept) < 3
    clean = "" if dropped else "\n".join(kept)
    return len(lines), len(kept), dropped, len(clean)


def test_c4_clean_mirror(spark):
    from sparkfts.ops.textclean import c4_clean

    texts = [
        "A good long sentence that ends properly.\nshort.\n"
        "Another fine sentence with enough words here.\n"
        "And a third one to make the page survive!",
        "This page mentions Lorem Ipsum somewhere in the body.\n"
        "Even though it has several proper sentences right here.\n"
        "They will not save it from the page rule.",
        "no terminal punctuation on this line\n"
        "Enable JavaScript to view this page correctly.\n"
        "Only one good sentence survives on this page today.",
        "A config page with code { return 42; }\nplus text.",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in c4_clean(df).collect()}
    for i, t in enumerate(texts):
        nt, nk, dropped, chars = _c4_mirror(t)
        assert got[i]["n_lines_total"] == nt, i
        assert got[i]["n_lines_kept"] == nk, i
        assert got[i]["page_dropped"] == dropped, i
        assert got[i]["clean_chars"] == chars, i
    # page 0 survives with all 3 long lines kept
    assert got[0]["page_dropped"] is False
    assert got[0]["n_lines_kept"] == 3
    # page 1 dies on lorem ipsum despite 3 good lines
    assert got[1]["page_dropped"] is True and got[1]["n_lines_kept"] == 3
    assert got[1]["clean_text"] == ""
    # page 3 dies on the curly brace
    assert got[3]["page_dropped"] is True


# ---- _clone / _forcemerge ---------------------------------------------------


def test_clone_and_forcemerge(spark, pages_df, queries, tmp_path):
    from sparkfts.index import build_index
    from sparkfts.lifecycle import clone_index, forcemerge
    from sparkfts.query import bm25_index_batch

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    build_index(pages_df, src, n_shards=2, n_tbuckets=4)
    info = clone_index(src, dst)
    assert info["n_files"] > 0
    q = queries[0]["query"]
    exp = bm25_index_batch(spark, src, [(0, q, 10)]).collect()
    got = bm25_index_batch(spark, dst, [(0, q, 10)]).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in exp
    ]
    with pytest.raises(ValueError, match="already exists"):
        clone_index(src, dst)
    with pytest.raises(ValueError, match="does not exist"):
        clone_index(str(tmp_path / "nope"), str(tmp_path / "x"))
    # forcemerge on an already-compact clone is the identity
    meta = forcemerge(spark, dst)
    assert int(meta["n_docs"]) > 0
    got2 = bm25_index_batch(spark, dst, [(0, q, 10)]).collect()
    assert [(r["doc_id"], r["score"]) for r in got2] == [
        (r["doc_id"], r["score"]) for r in exp
    ]
    assert os.path.isdir(dst)
