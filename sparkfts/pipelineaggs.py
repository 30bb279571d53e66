"""ES pipeline aggregations: second-pass aggs over a parent
multi-bucket aggregation's REDUCED bucket frame.

In Elasticsearch every pipeline aggregation (``cumulative_sum``,
``derivative``, ``moving_fn``, ``serial_diff``, ``bucket_script``,
``bucket_selector``, ``bucket_sort`` and the sibling ``*_bucket``
family) runs on the coordinating node at reduce time, AFTER the shards
have produced and merged the parent histogram/terms buckets.  The input
is therefore always a small frame — bounded by the time range divided
by the interval, or by the terms agg's ``size`` — never by corpus
size.  The Spark translation keeps that contract: these helpers take
the parent agg's output DataFrame (e.g. :func:`sparkfts.aggs.
date_histogram`) and compose plain column expressions / window
functions over it.  The deliberate ``coalesce(1)`` + unpartitioned
window mirrors the ES coordinator reduce and is the CORRECT shape at
100 TB, because the 100-TB-sized work (matching + bucketing) already
happened map-side in the parent agg; only (n_buckets) rows reach this
layer.

Reference parity: the reference delegates all aggregations to
Elasticsearch via its single ``client.search`` call
(ElasticsearchHandler.py:69); pipeline aggs are the standard ES
dashboard layer over the date_histogram facets this engine already
serves.

Pinned semantics (all ES-documented):
- ``cumulative_sum``: running sum in bucket order; defined from the
  first bucket.
- ``derivative``: ``metric[i] - metric[i-1]``; the first bucket has no
  derivative (NULL — ES omits the field).
- ``moving_fn`` (avg): window of ``window`` buckets shifted by
  ``shift``; with the ES default ``shift=0`` the window is
  ``[i-window, i)`` — the current bucket is EXCLUDED.  Buckets whose
  window is empty yield NULL.
- ``serial_diff``: ``metric[i] - metric[i-lag]``; NULL while no lagged
  bucket exists.
- ``bucket_script``: arbitrary arithmetic over the bucket's metrics.
- ``bucket_selector``: drops buckets where the predicate is false.
- ``bucket_sort``: re-sorts buckets by metrics with from/size paging;
  order of surviving buckets is the pipeline sort, not the parent's.
- sibling ``stats_bucket`` / ``sum_bucket`` / ``avg_bucket`` /
  ``min_bucket`` / ``max_bucket``: one-row aggregate over the parent's
  per-bucket metric.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordered(buckets: DataFrame, order_by: str) -> tuple[DataFrame, Window]:
    """One-partition frame + bucket-order window (ES coordinator
    reduce shape; input is a reduced bucket set, never corpus-sized)."""
    w = Window.orderBy(F.asc(order_by))
    return buckets.coalesce(1), w


def cumulative_sum(
    buckets: DataFrame,
    metric: str,
    order_by: str = "bucket",
    out: str = "cumulative_sum",
) -> DataFrame:
    """ES ``cumulative_sum`` pipeline agg."""
    df, w = _ordered(buckets, order_by)
    return df.withColumn(
        out, F.sum(metric).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def derivative(
    buckets: DataFrame,
    metric: str,
    order_by: str = "bucket",
    out: str = "derivative",
) -> DataFrame:
    """ES ``derivative`` pipeline agg (first bucket -> NULL)."""
    df, w = _ordered(buckets, order_by)
    return df.withColumn(out, F.col(metric) - F.lag(metric, 1).over(w))


def serial_diff(
    buckets: DataFrame,
    metric: str,
    lag: int = 1,
    order_by: str = "bucket",
    out: str = "serial_diff",
) -> DataFrame:
    """ES ``serial_diff`` pipeline agg (lag-``lag`` difference)."""
    df, w = _ordered(buckets, order_by)
    return df.withColumn(out, F.col(metric) - F.lag(metric, lag).over(w))


def moving_avg(
    buckets: DataFrame,
    metric: str,
    window: int,
    shift: int = 0,
    order_by: str = "bucket",
    out: str = "moving_avg",
) -> DataFrame:
    """ES ``moving_fn`` with ``MovingFunctions.unweightedAvg``.

    Window spans ``[i - window + shift, i + shift)`` in bucket order —
    the ES default ``shift=0`` EXCLUDES the current bucket, so the
    first bucket (empty window) is NULL.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    df, w = _ordered(buckets, order_by)
    frame = w.rowsBetween(-window + shift, shift - 1)
    return df.withColumn(out, F.avg(F.col(metric).cast("double")).over(frame))


def bucket_script(
    buckets: DataFrame, out: str, expr: Column
) -> DataFrame:
    """ES ``bucket_script``: a computed metric over each bucket's
    existing metrics (the ``buckets_path`` variables are just the
    frame's columns here)."""
    return buckets.withColumn(out, expr)


def bucket_selector(buckets: DataFrame, predicate: Column) -> DataFrame:
    """ES ``bucket_selector``: keep buckets where ``predicate`` holds."""
    return buckets.where(predicate)


def bucket_sort(
    buckets: DataFrame,
    sort: list[tuple[str, str]],
    from_: int = 0,
    size: int | None = None,
) -> DataFrame:
    """ES ``bucket_sort``: re-order buckets by metric columns with
    from/size paging.  ``sort`` is [(column, 'asc'|'desc'), ...]."""
    cols = [
        F.asc(c) if d == "asc" else F.desc(c) for c, d in sort
    ]
    df = buckets.orderBy(*cols)
    if from_:
        w = Window.orderBy(*cols)
        df = (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") > from_)
            .drop("__rn")
            .orderBy(*cols)
        )
    if size is not None:
        df = df.limit(size)
    return df


def stats_bucket(
    buckets: DataFrame, metric: str
) -> DataFrame:
    """ES sibling ``stats_bucket``: one row of count/min/max/sum/avg
    over the parent agg's per-bucket metric."""
    c = F.col(metric).cast("double")
    return buckets.agg(
        F.count(metric).alias("count"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.avg(c).alias("avg"),
    )


def sum_bucket(buckets: DataFrame, metric: str) -> DataFrame:
    """ES sibling ``sum_bucket``."""
    return buckets.agg(F.sum(F.col(metric).cast("double")).alias("value"))


def avg_bucket(buckets: DataFrame, metric: str) -> DataFrame:
    """ES sibling ``avg_bucket``."""
    return buckets.agg(F.avg(F.col(metric).cast("double")).alias("value"))


def min_bucket(buckets: DataFrame, metric: str) -> DataFrame:
    """ES sibling ``min_bucket``."""
    return buckets.agg(F.min(F.col(metric).cast("double")).alias("value"))


def max_bucket(buckets: DataFrame, metric: str) -> DataFrame:
    """ES sibling ``max_bucket``."""
    return buckets.agg(F.max(F.col(metric).cast("double")).alias("value"))


NORMALIZE_METHODS = (
    "rescale_0_1",
    "rescale_0_100",
    "percent_of_sum",
    "mean",
    "z-score",
    "softmax",
)


def normalize_buckets(
    buckets: DataFrame,
    metric: str,
    method: str = "percent_of_sum",
    order_by: str = "bucket",
    out: str = "normalized",
) -> DataFrame:
    """ES ``normalize`` pipeline agg: rescale a parent agg's per-bucket
    metric. All six ES methods, pinned to their documented formulas:

    - ``rescale_0_1``:    ``(x - min) / (max - min)``
    - ``rescale_0_100``:  ``100 * (x - min) / (max - min)``
    - ``percent_of_sum``: ``x / sum(x)``
    - ``mean``:           ``(x - mean) / (max - min)``  (ES's "mean")
    - ``z-score``:        ``(x - mean) / stddev_pop``
    - ``softmax``:        ``exp(x) / sum(exp(x))``

    Coordinator-reduce shape (bounded bucket frame; the one-partition
    window mirrors ES reduce — see module docstring)."""
    if method not in NORMALIZE_METHODS:
        raise ValueError(
            f"unknown normalize method {method!r}; one of "
            f"{NORMALIZE_METHODS}"
        )
    df, w = _ordered(buckets, order_by)
    frame = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    x = F.col(metric).cast("double")
    if method == "rescale_0_1":
        expr = (x - F.min(x).over(frame)) / (
            F.max(x).over(frame) - F.min(x).over(frame)
        )
    elif method == "rescale_0_100":
        expr = (
            F.lit(100.0)
            * (x - F.min(x).over(frame))
            / (F.max(x).over(frame) - F.min(x).over(frame))
        )
    elif method == "percent_of_sum":
        expr = x / F.sum(x).over(frame)
    elif method == "mean":
        expr = (x - F.avg(x).over(frame)) / (
            F.max(x).over(frame) - F.min(x).over(frame)
        )
    elif method == "z-score":
        expr = (x - F.avg(x).over(frame)) / F.stddev_pop(x).over(frame)
    else:  # softmax
        expr = F.exp(x) / F.sum(F.exp(x)).over(frame)
    return df.withColumn(out, expr)


def moving_percentile(
    buckets: DataFrame,
    metric: str,
    window: int,
    percent: float = 50.0,
    shift: int = 0,
    order_by: str = "bucket",
    out: str = "moving_percentile",
) -> DataFrame:
    """ES ``moving_percentiles`` pipeline agg (one requested percent):
    the percentile of the metric over the sliding window
    ``[i - window + shift, i + shift)`` in bucket order — the
    :func:`moving_avg` window contract; empty windows yield NULL.

    ES computes the window percentile by merging the buckets'
    t-digests; this pins the EXACT linear-interpolated percentile of
    the window's metric values (the :func:`sparkfts.aggs.
    percentiles_agg` pin): with the window values sorted ascending and
    ``r = p * (n-1)``, the value is
    ``v[floor(r)] + (r - floor(r)) * (v[floor(r)+1] - v[floor(r)])``.
    Spark can't run ``percentile`` as a window function, so the window
    collects into a bounded array (<= ``window`` values per bucket —
    the frame is already coordinator-reduce-sized) and the
    interpolation is pure column arithmetic."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if not (0.0 <= percent <= 100.0):
        raise ValueError("percent must be in [0, 100]")
    df, w = _ordered(buckets, order_by)
    frame = w.rowsBetween(-window + shift, shift - 1)
    arr = F.array_sort(
        F.collect_list(F.col(metric).cast("double")).over(frame)
    )
    n = F.size(arr)
    r = F.lit(percent / 100.0) * (n - F.lit(1)).cast("double")
    lo = F.floor(r).cast("int")
    frac = r - lo.cast("double")
    v_lo = F.element_at(arr, lo + 1)
    v_hi = F.element_at(arr, F.least(lo + F.lit(2), n))
    return df.withColumn(
        out,
        F.when(n > 0, v_lo + frac * (v_hi - v_lo)).otherwise(F.lit(None)),
    )


def percentiles_bucket(
    buckets: DataFrame,
    metric: str,
    percents: list[float] | None = None,
) -> DataFrame:
    """ES sibling ``percentiles_bucket`` pipeline agg -> one row per
    requested percent ``(pct, value)`` over the parent's per-bucket
    metric. ES documents linear interpolation between closest bucket
    values for non-exact ranks — the same ``percentile_cont`` pin as
    :func:`sparkfts.aggs.percentiles_agg` (DuckDB ``quantile_cont``
    reproduces it bit-for-bit). Coordinator-reduce sized: the input is
    the reduced bucket frame."""
    pcts = percents if percents is not None else [25.0, 50.0, 75.0, 95.0]
    if any(not (0.0 <= p <= 100.0) for p in pcts):
        raise ValueError("percents must be in [0, 100]")
    vals = buckets.coalesce(1).agg(
        F.percentile(
            F.col(metric).cast("double"),
            F.array(*[F.lit(p / 100.0) for p in pcts]),
        ).alias("vals")
    )
    pct_arr = F.array(*[F.lit(float(p)) for p in pcts])
    return vals.select(
        F.explode(
            F.arrays_zip(pct_arr.alias("pct"), F.col("vals").alias("value"))
        ).alias("z")
    ).select(F.col("z.pct").alias("pct"), F.col("z.value").alias("value"))


def cumulative_cardinality(
    rows: DataFrame,
    bucket_col: str,
    value_col: str,
    out: str = "cumulative_cardinality",
) -> DataFrame:
    """ES ``cumulative_cardinality`` parent pipeline agg -> one row per
    bucket ``(bucket, first_seen, <out>)``: how many DISTINCT values
    have appeared in this bucket or any earlier one (the "total unique
    visitors so far" dashboard line).

    Unlike every other helper in this module it takes the RAW
    ``(bucket, value)`` rows, not the reduced bucket frame — cross-
    bucket distinctness cannot be recovered from per-bucket
    cardinalities, which is exactly why ES carries mergeable HLL
    sketches across buckets. This engine pins the EXACT form (ES is
    HLL-approximate): a value is attributed to its FIRST bucket
    (``min(bucket)``), per-bucket first-seen counts are summed in
    bucket order, and ``cumulative_cardinality[i]`` equals the true
    distinct count of values in buckets ``<= i``.

    Plan: one corpus-scale ``groupBy(value).min(bucket)`` (map-side
    partial agg — the same shuffle class as the exact cardinality
    agg), one bounded ``groupBy(bucket)`` count, then the coordinator
    cumsum over n_buckets rows. Buckets present in ``rows`` but with
    no first-seen values still get a row (count carries forward)."""
    firsts = (
        rows.where(F.col(value_col).isNotNull())
        .groupBy(value_col)
        .agg(F.min(bucket_col).alias("bucket"))
    )
    per = firsts.groupBy("bucket").agg(F.count("*").alias("first_seen"))
    all_buckets = (
        rows.select(F.col(bucket_col).alias("bucket")).distinct()
    )
    joined = (
        all_buckets.join(per, "bucket", "left")
        .na.fill({"first_seen": 0})
    )
    w = Window.orderBy(F.asc("bucket")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        joined.coalesce(1)
        .withColumn(out, F.sum("first_seen").over(w))
        .orderBy("bucket")
    )


RATE_UNIT_SECONDS = {
    "second": 1, "minute": 60, "hour": 3600, "day": 86400,
    "week": 604800,
}


def rate_buckets(
    buckets: DataFrame,
    metric: str,
    interval: str,
    unit: str = "day",
    bucket_col: str = "bucket",
    out: str = "rate",
) -> DataFrame:
    """ES ``rate`` aggregation inside a date_histogram: each bucket's
    metric scaled to a per-``unit`` rate. ``interval`` is the PARENT
    histogram's calendar_interval (explicit — a January month bucket
    is also a year boundary, so it cannot be inferred from the
    timestamps).

    Pin (documented): the divisor is the bucket's ACTUAL span in
    ``unit``s — a month bucket divides by its true day count (28-31),
    stepped with calendar arithmetic; fixed units use exact second
    ratios. ES's rate instead uses fixed average ratios for calendar
    intervals (month = 1/12 year); the actual-span divisor is the
    physically meaningful rate and is pinned here, cross-engine
    reproducible from the same timestamp arithmetic.

    Works on any :func:`sparkfts.aggs.date_histogram`-shaped frame
    (bucket timestamp + numeric metric); coordinator-reduce sized."""
    if unit not in RATE_UNIT_SECONDS:
        raise ValueError(
            f"unit must be one of {sorted(RATE_UNIT_SECONDS)}"
        )
    b = F.col(bucket_col)
    months = {"month": 1, "quarter": 3, "year": 12}
    if interval in months:
        span_s = (
            F.unix_timestamp(F.add_months(b, months[interval]))
            - F.unix_timestamp(b)
        )
    elif interval in RATE_UNIT_SECONDS:
        span_s = F.lit(RATE_UNIT_SECONDS[interval])
    else:
        raise ValueError(
            f"interval must be one of "
            f"{sorted(months) + sorted(RATE_UNIT_SECONDS)}"
        )
    return buckets.withColumn(
        out,
        F.col(metric).cast("double")
        / (span_s.cast("double") / F.lit(float(RATE_UNIT_SECONDS[unit]))),
    )


def bucket_correlation(
    buckets: DataFrame,
    metric: str,
    indicator: list[float],
    order_by: str = "bucket",
    out: str = "correlation",
) -> DataFrame:
    """ES ``bucket_correlation`` sibling pipeline agg -> one row
    ``(out,)``: the Pearson correlation between the buckets' metric
    (in ``order_by`` order) and a caller-provided indicator vector —
    ES's count_correlation use case (metric drift vs an expected
    curve).

    The indicator must have exactly one value per bucket (ES fails the
    request otherwise; so do we, fail-loud at plan time via a count
    check folded into the join). Coordinator-reduce sized: the buckets
    frame is already an aggregated n_buckets-row frame; one window +
    one scalar reduce over it."""
    from pyspark.sql import Window

    if not indicator:
        raise ValueError("indicator must be non-empty")
    n = len(indicator)
    w = Window.orderBy(F.asc(order_by))
    spark = buckets.sparkSession
    ind = spark.createDataFrame(
        [(i + 1, float(x)) for i, x in enumerate(indicator)],
        "_i int, _y double",
    )
    j = (
        buckets.select(
            F.col(metric).cast("double").alias("_x"),
            F.row_number().over(w).alias("_i"),
        )
        .join(F.broadcast(ind), "_i", "full")
    )
    # fail-loud on length mismatch: a full join leaves a null side
    agg = j.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(F.col("_x").isNull() | F.col("_y").isNull(), 1)
              .otherwise(0)).alias("_bad"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    nn = F.col("_n").cast("double")
    cov = F.col("_sxy") - F.col("_sx") * F.col("_sy") / nn
    vx = F.col("_sxx") - F.col("_sx") * F.col("_sx") / nn
    vy = F.col("_syy") - F.col("_sy") * F.col("_sy") / nn
    return agg.select(
        F.when(
            F.col("_bad") > 0,
            F.raise_error(F.lit(
                f"bucket_correlation: indicator length {n} does not "
                "match bucket count"
            )).cast("double"),
        )
        .otherwise(cov / F.sqrt(vx * vy))
        .alias(out)
    )


def bucket_count_ks_test(
    buckets: DataFrame,
    metric: str = "doc_count",
    fractions: list[float] | None = None,
    order_by: str = "bucket",
) -> DataFrame:
    """ES ``bucket_count_ks_test`` sibling pipeline agg -> one row
    ``(d_statistic, d_plus, d_minus)``: the exact Kolmogorov-Smirnov
    distance between the buckets' count CDF (in ``order_by`` order)
    and an expected CDF (``fractions``, default uniform — ES's
    default).

    Pin (documented): ES returns Monte-Carlo p-values for
    less/greater/two_sided alternatives; the deterministic pin is the
    exact D statistics themselves (``d_plus`` = greater, ``d_minus`` =
    less, ``d_statistic`` = two_sided), from which any caller can table
    p-values. Coordinator-reduce sized: cumulative-sum window + scalar
    reduce over the already-aggregated bucket frame."""
    from pyspark.sql import Window

    w = Window.orderBy(F.asc(order_by))
    df = buckets.select(
        F.col(metric).cast("double").alias("_c"),
        F.row_number().over(w).alias("_i"),
    )
    if fractions is not None:
        if not fractions:
            raise ValueError("fractions must be non-empty when given")
        spark = buckets.sparkSession
        fr = spark.createDataFrame(
            [(i + 1, float(x)) for i, x in enumerate(fractions)],
            "_i int, _f double",
        )
        df = df.join(F.broadcast(fr), "_i", "full")
        bad = F.col("_c").isNull() | F.col("_f").isNull()
        df = df.select(
            F.when(
                bad,
                F.raise_error(F.lit(
                    "bucket_count_ks_test: fractions length does not "
                    "match bucket count"
                )).cast("double"),
            ).otherwise(F.col("_c")).alias("_c"),
            "_i", "_f",
        )
    else:
        df = df.withColumn("_f", F.lit(1.0))
    cum = Window.orderBy(F.asc("_i")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.orderBy(F.asc("_i")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cdfs = df.select(
        (F.sum("_c").over(cum) / F.sum("_c").over(tot)).alias("_ec"),
        (F.sum("_f").over(cum) / F.sum("_f").over(tot)).alias("_ef"),
    )
    return cdfs.agg(
        F.max(F.abs(F.col("_ec") - F.col("_ef"))).alias("d_statistic"),
        F.max(F.greatest(F.col("_ec") - F.col("_ef"), F.lit(0.0)))
        .alias("d_plus"),
        F.max(F.greatest(F.col("_ef") - F.col("_ec"), F.lit(0.0)))
        .alias("d_minus"),
    )
