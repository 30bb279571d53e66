"""Geo queries and aggregations: ES ``geo_distance`` / ``geo_bounding_box``
queries, distance sort, ``geotile_grid`` and ``geo_distance`` aggs.

The ES backend the reference delegates to (reference
ElasticsearchHandler.py:69) supports ``geo_point`` fields; web corpora
routinely carry page/host coordinates (geo-IP, sitemap metadata), and
"pages near X" / density-grid dashboards are the standard geo uses.

Semantics pinned to ES:

- Distances are haversine great-circle metres on the mean-radius
  sphere ``R = 6371008.7714`` m (Lucene ``GeoUtils.EARTH_MEAN_RADIUS``,
  what ES ``arc`` distance uses).
- ``geo_distance`` query: ``distance(doc, origin) <= radius``.
- ``geo_bounding_box``: inclusive edges; a box whose ``left > right``
  crosses the antimeridian and matches ``lon >= left OR lon <= right``
  (ES behavior).
- ``geotile_grid``: map-tile buckets ``"z/x/y"`` (web-mercator slippy
  tiles — the integer-math grid ES recommends over geohash for
  aggregations). Latitude is clamped to the mercator domain
  ±85.0511287798066; ``x = floor((lon+180)/360 * 2^z)``,
  ``y = floor((1 - asinh(tan(lat))/pi) / 2 * 2^z)``, both clamped to
  ``[0, 2^z - 1]``. Buckets ordered count desc, key asc.
- ``geo_distance`` agg: half-open ``[from, to)`` metre rings around an
  origin, ES key format ``"from-to"`` with ``*`` for open ends.

Scale shape: everything here is a rowwise JVM expression over the scan
(whole-stage codegen; lat/lon column pruning + any combined predicates
push down) followed by, at most, one partially-aggregated ``groupBy``
whose key cardinality is the tile/ring count — never a doc-sized
shuffle. Distance sort is a distributed TakeOrdered (per-partition
heaps, no global sort).

Float caveat (documented contract): trig is IEEE-754 double libm on
both engines; results agree to ~1 ulp, so quantize emitted distances
(>= e1) and avoid placing ring/filter edges within ~1e-6 m of a data
point when exact cross-engine equality matters. Tile keys are integer
floors of mercator projections — same 1-ulp caveat at tile borders.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_MEAN_RADIUS_M = 6371008.7714
MAX_MERCATOR_LAT = 85.0511287798066


def _c(x: str | Column) -> Column:
    return F.col(x) if isinstance(x, str) else x


def haversine_m(
    lat1: str | Column,
    lon1: str | Column,
    lat2: str | Column | float,
    lon2: str | Column | float,
) -> Column:
    """Great-circle distance in metres (ES ``arc`` distance formula)."""
    la1, lo1 = F.radians(_c(lat1)), F.radians(_c(lon1))
    la2 = F.radians(F.lit(lat2) if isinstance(lat2, (int, float)) else _c(lat2))
    lo2 = F.radians(F.lit(lon2) if isinstance(lon2, (int, float)) else _c(lon2))
    dphi = (la2 - la1) / 2.0
    dlam = (lo2 - lo1) / 2.0
    h = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(la1) * F.cos(la2) * F.sin(dlam) * F.sin(dlam)
    )
    return 2.0 * EARTH_MEAN_RADIUS_M * F.asin(F.sqrt(h))


def geo_distance(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    origin_lat: float,
    origin_lon: float,
    radius_m: float,
    distance_alias: str = "distance_m",
) -> DataFrame:
    """ES geo_distance query: rows within ``radius_m`` of the origin,
    with the computed distance attached."""
    d = haversine_m(lat_col, lon_col, origin_lat, origin_lon)
    return df.withColumn(distance_alias, d).where(
        F.col(distance_alias) <= F.lit(float(radius_m))
    )


def geo_bounding_box(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    top: float,
    left: float,
    bottom: float,
    right: float,
) -> DataFrame:
    """ES geo_bounding_box query (inclusive edges, antimeridane-aware)."""
    if not (-90.0 <= bottom <= top <= 90.0):
        raise ValueError("need -90 <= bottom <= top <= 90")
    lat_ok = _c(lat_col).between(F.lit(bottom), F.lit(top))
    if left <= right:
        lon_ok = _c(lon_col).between(F.lit(left), F.lit(right))
    else:  # crosses the antimeridian
        lon_ok = (_c(lon_col) >= F.lit(left)) | (_c(lon_col) <= F.lit(right))
    return df.where(lat_ok & lon_ok)


def geo_distance_sort(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    origin_lat: float,
    origin_lon: float,
    k: int,
    tiebreak: str | None = None,
    distance_alias: str = "distance_m",
) -> DataFrame:
    """ES ``sort: {_geo_distance: ...}``: k nearest rows (distance asc,
    tie by ``tiebreak`` asc). Distributed TakeOrdered — per-partition
    heaps of k, never a global sort."""
    d = haversine_m(lat_col, lon_col, origin_lat, origin_lon)
    out = df.withColumn(distance_alias, d)
    order = [F.col(distance_alias).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    return out.orderBy(*order).limit(int(k))


def geotile_key(
    lat_col: str | Column, lon_col: str | Column, zoom: int
) -> Column:
    """``"z/x/y"`` slippy-tile key column for ``geotile_grid``."""
    if not (0 <= zoom <= 29):
        raise ValueError("zoom must be in [0, 29] (ES precision range)")
    n = F.lit(float(1 << zoom))
    lat = _c(lat_col)
    lat = F.greatest(
        F.least(lat, F.lit(MAX_MERCATOR_LAT)), F.lit(-MAX_MERCATOR_LAT)
    )
    lon = _c(lon_col)
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * n).cast("long")
    latr = F.radians(lat)
    # asinh(tan(lat)) written as ln(tan + sec): identical on both engines
    merc = F.log(F.tan(latr) + F.lit(1.0) / F.cos(latr))
    y = F.floor((F.lit(1.0) - merc / F.lit(math.pi)) / F.lit(2.0) * n).cast(
        "long"
    )
    top = F.lit((1 << zoom) - 1)
    x = F.greatest(F.least(x, top), F.lit(0))
    y = F.greatest(F.least(y, top), F.lit(0))
    return F.concat_ws("/", F.lit(str(zoom)), x.cast("string"),
                       y.cast("string"))


def geotile_grid(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    zoom: int,
    size: int | None = None,
) -> DataFrame:
    """ES geotile_grid agg: ``(key, doc_count)`` per populated tile,
    count desc then key asc; optional top-``size`` (ES default 10000).
    One partially-aggregated groupBy keyed on <= 4^zoom tiles."""
    keyed = df.select(geotile_key(lat_col, lon_col, zoom).alias("key"))
    out = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("doc_count"))
    out = out.orderBy(F.desc("doc_count"), F.asc("key"))
    return out.limit(int(size)) if size is not None else out


def geo_distance_agg(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    origin_lat: float,
    origin_lon: float,
    ranges: list[tuple[float | None, float | None]],
) -> DataFrame:
    """ES geo_distance agg: doc counts in half-open ``[from, to)``
    metre rings. Returns ``(key, from_m, to_m, doc_count)`` in request
    order (ES keeps ranges as given); empty rings report 0.

    One pass: the distance expression feeds N conditional sums that
    partial-aggregate map-side — a single scalar row per ring crosses
    the exchange.
    """
    if not ranges:
        raise ValueError("ranges must be non-empty")
    d = haversine_m(lat_col, lon_col, origin_lat, origin_lon)
    aggs = []
    meta = []
    for i, (lo, hi) in enumerate(ranges):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (d >= F.lit(float(lo)))
        if hi is not None:
            cond = cond & (d < F.lit(float(hi)))
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"__r{i}")
        )
        key = (
            ("*" if lo is None else f"{float(lo):g}")
            + "-"
            + ("*" if hi is None else f"{float(hi):g}")
        )
        meta.append((key, lo, hi))
    row = df.agg(*aggs)
    spark = df.sparkSession
    kdf = spark.createDataFrame(
        [
            (i, key, float(lo) if lo is not None else None,
             float(hi) if hi is not None else None)
            for i, (key, lo, hi) in enumerate(meta)
        ],
        "ring_idx int, key string, from_m double, to_m double",
    )
    counts = row.select(
        F.stack(
            F.lit(len(meta)),
            *[
                x
                for i in range(len(meta))
                for x in (F.lit(i), F.col(f"__r{i}"))
            ],
        ).alias("ring_idx", "doc_count")
    )
    return (
        kdf.join(counts, "ring_idx")
        .orderBy("ring_idx")
        .select(
            "ring_idx", "key", "from_m", "to_m",
            F.col("doc_count").cast("long").alias("doc_count"),
        )
    )


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_key(
    lat_col: str | Column, lon_col: str | Column, precision: int
) -> Column:
    """Classic geohash (Niemeyer base-32) cell key column for
    ``geohash_grid`` — ES precision range 1..12.

    Integer formulation (equal to the textbook range-halving encoder,
    pinned by the Wikipedia test vector in test_geo): with ``b = 5p``
    total bits, longitude takes ``ceil(b/2)`` (bit 0, the MSB, is a
    longitude bit) and latitude ``floor(b/2)``; each coordinate's bit
    string is just ``floor((v - lo) / range * 2^bits)`` clamped, and
    the geohash is the base-32 rendering of the interleaved word. All
    int64 column arithmetic after two float divisions — identical
    cross-engine."""
    if not (1 <= precision <= 12):
        raise ValueError("precision must be in [1, 12] (ES range)")
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    lon_idx = F.greatest(
        F.least(
            F.floor(
                (_c(lon_col) + F.lit(180.0)) / F.lit(360.0)
                * F.lit(float(1 << lon_bits))
            ).cast("long"),
            F.lit((1 << lon_bits) - 1),
        ),
        F.lit(0),
    )
    lat_idx = F.greatest(
        F.least(
            F.floor(
                (_c(lat_col) + F.lit(90.0)) / F.lit(180.0)
                * F.lit(float(1 << lat_bits))
            ).cast("long"),
            F.lit((1 << lat_bits) - 1),
        ),
        F.lit(0),
    )
    total = F.lit(0).cast("long")
    for j in range(bits):
        src, src_bits = (
            (lon_idx, lon_bits) if j % 2 == 0 else (lat_idx, lat_bits)
        )
        bit = F.shiftright(src, src_bits - 1 - j // 2).bitwiseAND(
            F.lit(1)
        )
        total = total + bit * F.lit(1 << (bits - 1 - j))
    chars = F.array(*[F.lit(ch) for ch in GEOHASH_ALPHABET])
    parts = [
        F.element_at(
            chars,
            (
                F.shiftright(total, 5 * (precision - 1 - c))
                .bitwiseAND(F.lit(31))
                + F.lit(1)
            ).cast("int"),
        )
        for c in range(precision)
    ]
    return F.concat(*parts)


def geohash_grid(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    precision: int,
    size: int | None = None,
) -> DataFrame:
    """ES geohash_grid agg: ``(key, doc_count)`` per populated geohash
    cell, count desc then key asc; optional top-``size`` (ES default
    10000). Same one-groupBy shape as :func:`geotile_grid` — the key
    space is bounded by 32^precision, partial aggregation collapses
    map-side."""
    keyed = df.select(geohash_key(lat_col, lon_col, precision).alias("key"))
    out = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("doc_count"))
    out = out.orderBy(F.desc("doc_count"), F.asc("key"))
    return out.limit(int(size)) if size is not None else out


def geo_centroid(
    df: DataFrame, lat_col: str, lon_col: str
) -> DataFrame:
    """ES ``geo_centroid`` agg -> one row ``(lat, lon, count)``: the
    arithmetic mean of the coordinates in degrees (ES's documented
    accumulation — a running weighted average per dimension; docs
    without coordinates are excluded by the caller's frame).

    One scalar reduce: partial sums collapse map-side, a single row
    crosses the exchange."""
    lat = _c(lat_col).cast("double")
    lon = _c(lon_col).cast("double")
    return df.agg(
        F.avg(lat).alias("lat"),
        F.avg(lon).alias("lon"),
        F.count(F.lit(1)).cast("long").alias("count"),
    )


def geo_bounds(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    wrap_longitude: bool = False,
) -> DataFrame:
    """ES ``geo_bounds`` agg -> one row ``(top, left, bottom, right)``
    in degrees.

    ``wrap_longitude=False``: plain min/max per dimension (one scalar
    reduce, map-side partials).

    ``wrap_longitude=True`` (ES's default): the smallest longitude
    interval covering every point, allowed to cross the antimeridian —
    pinned as the exact complement of the LARGEST circular gap between
    adjacent distinct longitudes (ties on gap size: the gap starting at
    the smallest longitude; a wrapped box reports ``left > right``,
    ES's encoding). Cost: one distinct on longitudes + one total-order
    window over the distinct values — bounded by distinct coordinates,
    the exact-percentiles cost class, and only taken when wrapping is
    requested."""
    from pyspark.sql import Window

    lat = _c(lat_col).cast("double")
    lon = _c(lon_col).cast("double")
    base = df.agg(
        F.max(lat).alias("top"),
        F.min(lat).alias("bottom"),
        F.min(lon).alias("left"),
        F.max(lon).alias("right"),
    )
    if not wrap_longitude:
        return base.select("top", "left", "bottom", "right")
    lons = df.select(lon.alias("_lon")).where(
        F.col("_lon").isNotNull()
    ).distinct()
    w = Window.orderBy(F.asc("_lon"))
    gaps = lons.select(
        "_lon",
        F.lead("_lon").over(w).alias("_next"),
        F.min("_lon").over(
            w.rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing)
        ).alias("_first"),
    ).select(
        "_lon",
        F.coalesce("_next", F.col("_first") + F.lit(360.0)).alias("_nxt"),
    ).select(
        "_lon",
        (F.col("_nxt") - F.col("_lon")).alias("_gap"),
        F.when(F.col("_nxt") >= 180.0, F.col("_nxt") - 360.0)
        .otherwise(F.col("_nxt")).alias("_left"),
    )
    best = gaps.orderBy(F.desc("_gap"), F.asc("_lon")).limit(1).select(
        F.col("_left").alias("left"), F.col("_lon").alias("right")
    )
    return base.select("top", "bottom").crossJoin(F.broadcast(best)).select(
        "top", "left", "bottom", "right"
    )


def geo_line(
    df: DataFrame,
    bucket_col: str,
    lat_col: str,
    lon_col: str,
    sort_col: str,
    size: int = 100,
) -> DataFrame:
    """ES ``geo_line`` agg -> one row per bucket ``(bucket, n_points,
    line)``: the track connecting each bucket's points in ``sort_col``
    order, truncated to the FIRST ``size`` points by sort order (ES's
    truncation rule), rendered as ``"lat,lon;lat,lon;..."`` with
    coordinates quantized to integer micro-degrees (exact cross-engine
    string).

    Scale shape: one window partitioned by bucket bounds every group
    to ``size`` rows BEFORE any collection (the per-group top-N
    shape), then one grouped sort_array+join over <= size points per
    bucket — per-bucket memory is config-bounded, never data-bounded.
    Ties on ``sort_col`` break by (lat, lon) so the string is
    deterministic."""
    from pyspark.sql import Window

    if size < 1:
        raise ValueError("size must be >= 1")
    lat6 = F.floor(_c(lat_col).cast("double") * 1e6 + 0.5).cast("long")
    lon6 = F.floor(_c(lon_col).cast("double") * 1e6 + 0.5).cast("long")
    w = Window.partitionBy("bucket").orderBy(
        F.asc(sort_col), F.asc("_lat6"), F.asc("_lon6")
    )
    pts = (
        df.select(
            F.col(bucket_col).alias("bucket"),
            F.col(sort_col),
            lat6.alias("_lat6"),
            lon6.alias("_lon6"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.lit(int(size)))
    )
    pt = F.struct(
        F.col(sort_col), F.col("_lat6"), F.col("_lon6")
    )
    return (
        pts.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(pt)),
                    lambda p: F.concat_ws(
                        ",",
                        p["_lat6"].cast("string"),
                        p["_lon6"].cast("string"),
                    ),
                ),
                ";",
            ).alias("line"),
        )
        .orderBy("bucket")
    )
