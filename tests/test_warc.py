"""WARC source reader: synthesized files -> canonical page frame."""

from __future__ import annotations

import gzip
import os

import pytest

from sparkfts.warc import (
    parse_warc_bytes,
    read_warc,
    synthesize_warc,
    warc_to_pages,
)

RECS = [
    ("https://a.example/x", "2024-01-01T00:00:00Z", 200,
     b"<html><title>alpha beta</title><p>gamma delta</p></html>"),
    ("https://b.example/y", "2024-02-02T12:30:45Z", 404,
     b"<html>not found</html>"),
    ("https://c.example/z", "2024-03-03T23:59:59Z", 200,
     b"<html><p>epsilon \xe2\x82\xac zeta</p></html>"),
]


def _write(tmp_path, name, data):
    p = os.path.join(str(tmp_path), name)
    with open(p, "wb") as f:
        f.write(data)
    return p


def test_parse_roundtrip_plain_and_gz():
    plain = synthesize_warc(RECS)
    for data in (plain, gzip.compress(plain), synthesize_warc(RECS, True)):
        rows = parse_warc_bytes(data)
        assert len(rows) == 3 if data is plain else True
        got = [(r["url"], r["http_status"], r["html"]) for _, r in rows]
        assert got == [(u, s, b) for u, t, s, b in RECS]
        # offsets strictly increase
        offs = [o for o, _ in rows]
        assert offs == sorted(set(offs))


def test_parse_skips_non_response_records():
    req = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: 5\r\n\r\nrobot\r\n\r\n"
    )
    data = req + synthesize_warc(RECS[:1])
    rows = parse_warc_bytes(data)
    assert len(rows) == 1 and rows[0][1]["url"] == RECS[0][0]


def test_parse_strict_vs_lenient():
    bad = b"WARC/1.0\r\nWARC-Type: response\r\nno-content-length\r\n\r\n"
    with pytest.raises(ValueError):
        parse_warc_bytes(bad)
    data = b"NOT-A-WARC"
    with pytest.raises(ValueError):
        parse_warc_bytes(data)


def test_read_warc_spark(spark, tmp_path):
    _write(tmp_path, "part1.warc", synthesize_warc(RECS[:2]))
    _write(tmp_path, "part2.warc.gz", synthesize_warc(RECS[2:], True))
    df = read_warc(spark, str(tmp_path), status_filter=None)
    rows = sorted(df.collect(), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == [u for u, *_ in sorted(RECS)]
    by_url = {r["url"]: r for r in rows}
    a = by_url["https://a.example/x"]
    assert a["http_status"] == 200
    assert bytes(a["html"]) == RECS[0][3]
    assert str(a["warc_ts"]) == "2024-01-01 00:00:00"
    assert a["content_type"].startswith("text/html")
    assert a["warc_file"].endswith("part1.warc")
    # default filter keeps only 200s
    ok = read_warc(spark, str(tmp_path)).collect()
    assert sorted(r["url"] for r in ok) == [RECS[0][0], RECS[2][0]]


def test_warc_to_pages_feeds_build(spark, tmp_path):
    """End-to-end: WARC file -> page frame -> index -> query."""
    from sparkfts.index import build_index
    from sparkfts.query import bm25_index_batch

    _write(tmp_path, "crawl.warc", synthesize_warc(RECS))
    pages = warc_to_pages(read_warc(spark, str(tmp_path)))
    rows = {r["url"]: r["text"] for r in pages.collect()}
    assert "alpha beta" in rows["https://a.example/x"]
    assert "NEVER" not in rows["https://a.example/x"]
    idx = os.path.join(str(tmp_path), "idx")
    build_index(pages, idx, n_shards=2, n_tbuckets=4)
    hits = bm25_index_batch(spark, idx, [(0, "epsilon zeta", 5)]).collect()
    assert len(hits) == 1  # only doc c contains both terms
