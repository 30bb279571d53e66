"""Geo queries/aggs vs an independent python mirror (math module)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from sparkfts.geo import (
    EARTH_MEAN_RADIUS_M,
    MAX_MERCATOR_LAT,
    geo_bounding_box,
    geo_distance,
    geo_distance_agg,
    geo_distance_sort,
    geotile_grid,
)


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dphi = (p2 - p1) / 2
    dlam = (math.radians(lon2) - math.radians(lon1)) / 2
    h = math.sin(dphi) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlam) ** 2
    return 2 * EARTH_MEAN_RADIUS_M * math.asin(math.sqrt(h))


def _tile(lat, lon, z):
    lat = max(min(lat, MAX_MERCATOR_LAT), -MAX_MERCATOR_LAT)
    n = 1 << z
    x = int(math.floor((lon + 180.0) / 360.0 * n))
    latr = math.radians(lat)
    merc = math.log(math.tan(latr) + 1.0 / math.cos(latr))
    y = int(math.floor((1.0 - merc / math.pi) / 2.0 * n))
    return f"{z}/{max(min(x, n - 1), 0)}/{max(min(y, n - 1), 0)}"


def _points():
    # deterministic spread incl. poles-ish, antimeridian, origin-near
    rows = []
    for i in range(200):
        lat = ((i * 7919 + 13) % 17000) / 100.0 - 85.0
        lon = ((i * 104729 + 7) % 35900) / 100.0 - 179.5
        rows.append((i, lat, lon))
    rows.append((200, 89.9, 10.0))   # above mercator clamp
    rows.append((201, -89.9, -10.0))
    return rows


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(
        pd.DataFrame(_points(), columns=["id", "lat", "lon"])
    )


def test_geo_distance_filter(pts):
    origin, radius = (48.85, 2.35), 3_000_000.0
    got = {
        r["id"]: r["distance_m"]
        for r in geo_distance(pts, "lat", "lon", *origin, radius).collect()
    }
    exp = {
        i: _hav(lat, lon, *origin)
        for i, lat, lon in _points()
        if _hav(lat, lon, *origin) <= radius
    }
    assert set(got) == set(exp)
    for i in exp:
        assert got[i] == pytest.approx(exp[i], rel=1e-12)


def test_geo_bounding_box(pts):
    got = {r["id"] for r in geo_bounding_box(
        pts, "lat", "lon", top=60, left=-30, bottom=-10, right=40
    ).collect()}
    exp = {i for i, lat, lon in _points()
           if -10 <= lat <= 60 and -30 <= lon <= 40}
    assert got == exp
    # antimeridian crossing: left > right
    got = {r["id"] for r in geo_bounding_box(
        pts, "lat", "lon", top=90, left=170, bottom=-90, right=-170
    ).collect()}
    exp = {i for i, lat, lon in _points() if lon >= 170 or lon <= -170}
    assert got == exp
    with pytest.raises(ValueError):
        geo_bounding_box(pts, "lat", "lon", top=-10, left=0, bottom=10,
                         right=1)


def test_geo_distance_sort(pts):
    origin = (0.0, 0.0)
    got = geo_distance_sort(
        pts, "lat", "lon", *origin, k=7, tiebreak="id"
    ).collect()
    exp = sorted(
        ((_hav(lat, lon, *origin), i) for i, lat, lon in _points())
    )[:7]
    assert [r["id"] for r in got] == [i for _, i in exp]
    dists = [r["distance_m"] for r in got]
    assert dists == sorted(dists)


@pytest.mark.parametrize("zoom", [0, 3, 7])
def test_geotile_grid(pts, zoom):
    got = {
        r["key"]: r["doc_count"]
        for r in geotile_grid(pts, "lat", "lon", zoom).collect()
    }
    exp: dict[str, int] = {}
    for i, lat, lon in _points():
        k = _tile(lat, lon, zoom)
        exp[k] = exp.get(k, 0) + 1
    assert got == exp
    # order: count desc, key asc; size bounds
    rows = geotile_grid(pts, "lat", "lon", zoom, size=3).collect()
    full = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["key"], r["doc_count"]) for r in rows] == full


def test_geotile_mercator_clamp(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"id": [0, 1], "lat": [89.9, -89.9],
                      "lon": [0.0, 0.0]})
    )
    rows = geotile_grid(df, "lat", "lon", 4).collect()
    keys = {r["key"] for r in rows}
    assert keys == {_tile(89.9, 0.0, 4), _tile(-89.9, 0.0, 4)}
    assert _tile(89.9, 0.0, 4) == "4/8/0"  # clamped into the top row
    with pytest.raises(ValueError):
        geotile_grid(df, "lat", "lon", 30)


def test_geo_distance_agg(pts):
    origin = (10.0, 10.0)
    ranges = [(None, 1e6), (1e6, 5e6), (5e6, 12e6), (12e6, None)]
    rows = geo_distance_agg(pts, "lat", "lon", *origin, ranges).collect()
    assert [r["key"] for r in rows] == [
        "*-1e+06", "1e+06-5e+06", "5e+06-1.2e+07", "1.2e+07-*",
    ]
    dists = [_hav(lat, lon, *origin) for _, lat, lon in _points()]
    for r, (lo, hi) in zip(rows, ranges):
        exp = sum(
            1
            for d in dists
            if (lo is None or d >= lo) and (hi is None or d < hi)
        )
        assert r["doc_count"] == exp
    assert sum(r["doc_count"] for r in rows) == len(_points())
    # empty ring reports 0, request order preserved
    rows = geo_distance_agg(
        pts, "lat", "lon", *origin, [(0.0, 1.0), (None, None)]
    ).collect()
    assert rows[0]["doc_count"] == 0
    assert rows[1]["doc_count"] == len(_points())
    with pytest.raises(ValueError):
        geo_distance_agg(pts, "lat", "lon", 0, 0, [])


# ---- geohash_grid (round-5 wave 2) -----------------------------------------


def _py_geohash(lat, lon, precision):
    """Textbook range-halving encoder (Niemeyer)."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    bits, even, ch, out = 0, True, 0, []
    while len(out) < precision:
        if even:
            mid = (lon_rng[0] + lon_rng[1]) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_rng[0] = mid
            else:
                ch <<= 1
                lon_rng[1] = mid
        else:
            mid = (lat_rng[0] + lat_rng[1]) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_rng[0] = mid
            else:
                ch <<= 1
                lat_rng[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(alphabet[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_key_matches_textbook_encoder(spark):
    from sparkfts.geo import geohash_key

    pts = [
        (57.64911, 10.40744),   # wikipedia vector -> u4pruydqqvj
        (0.0, 0.0), (-90.0, -180.0), (89.999, 179.999),
        (48.85, 2.35), (-33.86, 151.21), (40.71, -74.0),
        (1e-9, -1e-9), (-45.5, 90.25),
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for p in (1, 3, 6, 11):
        got = [
            r["g"]
            for r in df.select(
                geohash_key("lat", "lon", p).alias("g")
            ).collect()
        ]
        exp = [_py_geohash(la, lo, p) for la, lo in pts]
        assert got == exp, p
    assert _py_geohash(57.64911, 10.40744, 11) == "u4pruydqqvj"
    with pytest.raises(ValueError):
        geohash_key("lat", "lon", 0)
    with pytest.raises(ValueError):
        geohash_key("lat", "lon", 13)


def test_geohash_grid_counts(spark):
    from sparkfts.geo import geohash_grid

    pts = [(10.0 + i * 0.001, 20.0) for i in range(5)] + [
        (-40.0, -70.0), (-40.1, -70.1)
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = geohash_grid(df, "lat", "lon", precision=2).collect()
    exp = {}
    for la, lo in pts:
        k = _py_geohash(la, lo, 2)
        exp[k] = exp.get(k, 0) + 1
    assert {(r["key"], r["doc_count"]) for r in got} == set(exp.items())
    counts = [r["doc_count"] for r in got]
    assert counts == sorted(counts, reverse=True)
    top1 = geohash_grid(df, "lat", "lon", precision=2, size=1).collect()
    assert len(top1) == 1 and top1[0]["doc_count"] == max(counts)
