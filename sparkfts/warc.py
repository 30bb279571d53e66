"""WARC source: read Web ARChive files into the canonical webtext table.

The corpus this engine indexes is web crawl output; the interchange
format for web crawls (Common Crawl, Internet Archive, every serious
crawler) is WARC (ISO 28500). This module turns a directory of
``.warc`` / ``.warc.gz`` files into the engine's page frame
``(url, warc_ts, html, text)`` — the same shape as
``sparkfts.synth.gen_corpus`` and the ``prepare_pages`` input — so a
real crawl plugs into the existing build path unchanged.

Execution model (the standard Spark-on-CommonCrawl shape): Spark's
``binaryFile`` source lists the files and assigns ONE FILE PER TASK
(WARC members are not block-splittable without an index; gzip members
must be read sequentially), and a ``mapInPandas`` parser walks each
file's records streaming Arrow batches out. Parallelism therefore
equals file count — crawls ship thousands of ~1 GB WARCs, which is
exactly the right granularity for a 1000-executor cluster. Filters on
the OUTPUT frame (e.g. status 200 only) are applied inside the parser
batch-side before rows materialize.

Format subset handled (the response-record core of ISO 28500):
``WARC/1.0``/``1.1`` headers, ``WARC-Type: response`` records with an
HTTP/1.x response payload (status line + headers + body) or a raw
body, per-record or whole-file gzip. Non-response records (request,
metadata, warcinfo, revisit) are skipped. Malformed records fail loud
by default (``strict=True``) or are counted and skipped.

No external WARC library is used — the parser is ~100 lines of pinned
byte arithmetic (stdlib ``gzip`` for members), deterministic and
test-synthesizable.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "warc_file string, record_offset long, url string, "
    "warc_ts timestamp, http_status int, content_type string, "
    "html binary"
)


def synthesize_warc(
    records: Iterable[tuple[str, str, int, bytes]],
    gzip_members: bool = False,
) -> bytes:
    """Build WARC bytes from ``(url, iso_ts, http_status, body)`` rows —
    the deterministic test/bench fixture (one response record per row,
    HTTP payload, optional per-record gzip members as crawlers write)."""
    out = io.BytesIO()
    for url, ts, status, body in records:
        http = (
            f"HTTP/1.1 {status} OK\r\n"
            "Content-Type: text/html; charset=utf-8\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("ascii") + body
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("ascii")
        rec = hdr + http + b"\r\n\r\n"
        out.write(gzip.compress(rec, 6) if gzip_members else rec)
    return out.getvalue()


def _split_records(data: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield ``(offset, record_bytes)`` per WARC record (header+payload),
    walking Content-Length — never scanning payload bytes for
    separators (payloads may contain them)."""
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"not a WARC record at offset {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated WARC header at offset {pos}")
        header = data[pos : hdr_end].decode("utf-8", "replace")
        clen = None
        for line in header.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            if k.strip().lower() == "content-length":
                clen = int(v.strip())
        if clen is None:
            raise ValueError(f"WARC record without Content-Length at {pos}")
        body_start = hdr_end + 4
        yield pos, data[pos : body_start + clen]
        pos = body_start + clen


def _parse_record(rec: bytes) -> dict | None:
    """One WARC record -> row dict, or None for non-response records."""
    hdr_end = rec.find(b"\r\n\r\n")
    header = rec[:hdr_end].decode("utf-8", "replace")
    fields: dict[str, str] = {}
    for line in header.split("\r\n")[1:]:
        k, _, v = line.partition(":")
        fields[k.strip().lower()] = v.strip()
    if fields.get("warc-type") != "response":
        return None
    payload = rec[hdr_end + 4 :]
    status: int | None = None
    ctype: str | None = None
    body = payload
    if payload[:5] in (b"HTTP/",):  # HTTP response payload
        p_end = payload.find(b"\r\n\r\n")
        if p_end >= 0:
            http_hdr = payload[:p_end].decode("utf-8", "replace")
            lines = http_hdr.split("\r\n")
            parts = lines[0].split(" ", 2)
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
            for line in lines[1:]:
                k, _, v = line.partition(":")
                if k.strip().lower() == "content-type":
                    ctype = v.strip()
            body = payload[p_end + 4 :]
    return {
        "url": fields.get("warc-target-uri"),
        "warc_ts": fields.get("warc-date"),
        "http_status": status,
        "content_type": ctype,
        "html": body,
    }


def parse_warc_bytes(
    data: bytes, strict: bool = True
) -> list[tuple[int, dict]]:
    """All response rows of one WARC file's bytes (gzip-transparent:
    whole-file gzip and concatenated per-record members both decompress
    via stdlib multi-member support)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    out = []
    for off, rec in _split_records(data):
        try:
            row = _parse_record(rec)
        except Exception:
            if strict:
                raise
            continue
        if row is not None:
            out.append((off, row))
    return out


def read_warc(
    spark: SparkSession,
    path: str,
    strict: bool = True,
    status_filter: int | None = 200,
) -> DataFrame:
    """Directory/glob of ``.warc``/``.warc.gz`` -> DataFrame per
    WARC_SCHEMA. One file per task (binaryFile semantics); rows stream
    out as Arrow batches. ``status_filter`` drops non-200 responses
    inside the parser (before any row materializes); pass None to keep
    everything."""
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                rows = []
                for off, r in parse_warc_bytes(bytes(content), strict):
                    if (
                        status_filter is not None
                        and r["http_status"] is not None
                        and r["http_status"] != status_filter
                    ):
                        continue
                    rows.append(
                        {
                            "warc_file": fpath,
                            "record_offset": off,
                            "url": r["url"],
                            "warc_ts": pd.Timestamp(r["warc_ts"]),
                            "http_status": r["http_status"],
                            "content_type": r["content_type"],
                            "html": r["html"],
                        }
                    )
                if rows:
                    out = pd.DataFrame(rows)
                    out["warc_ts"] = (
                        pd.to_datetime(out["warc_ts"], utc=True)
                        .dt.tz_localize(None)
                        .astype("datetime64[us]")
                    )
                    yield out

    return files.mapInPandas(gen, WARC_SCHEMA)


def warc_to_pages(warc_df: DataFrame) -> DataFrame:
    """WARC response frame -> the canonical page table
    ``(url, warc_ts, html, text)`` feeding ``prepare_pages`` /
    ``build_index`` — text via the engine's pinned HTML extractor
    (byte-identical to the analysis chain the index uses)."""
    from sparkfts.tokens import extract_text_udf

    pages = warc_df.select("url", "warc_ts", "html")
    return pages.withColumn(
        "text", extract_text_udf(pages["html"])
    ).select("url", "warc_ts", "html", "text")
