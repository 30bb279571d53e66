"""Gap-based sessionization: batch window idiom + applyInPandasWithState."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from sparkfts.sessions import session_windows, sessionize_stream


def _mk_events(spark, specs):
    """specs: list of (user_id, [minute offsets]) -> events DataFrame."""
    base = datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for uid, offsets in specs:
        for m in offsets:
            rows.append((eid, uid, base + timedelta(minutes=m)))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )


def test_session_windows_batch(spark):
    # user 1: two sessions (gap 45 min > 30); user 2: one session
    ev = _mk_events(spark, [(1, [0, 10, 20, 65, 70]), (2, [0, 29, 58])])
    got = {
        (r["user_id"], r["session_id"]): (
            r["session_start_epoch"], r["n_events"], r["duration_sec"]
        )
        for r in session_windows(ev).collect()
    }
    base = int(datetime(2024, 1, 1).timestamp())
    assert got == {
        (1, 0): (base, 3, 20 * 60),
        (1, 1): (base + 65 * 60, 2, 5 * 60),
        (2, 0): (base, 3, 58 * 60),
    }


def test_session_windows_exact_gap_boundary(spark):
    """A gap of exactly gap_sec does NOT break the session (> semantics)."""
    ev = _mk_events(spark, [(7, [0, 30, 60])])  # 30-min gaps == threshold
    rows = session_windows(ev).collect()
    assert len(rows) == 1 and rows[0]["n_events"] == 3


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Streamed closed sessions == batch sessions minus each user's final
    (still-open) session."""
    src = os.path.join(str(tmp_path), "events_src")
    os.makedirs(src)
    ev = _mk_events(
        spark,
        [
            (1, [0, 10, 20, 65, 70, 140]),   # 3 sessions; last stays open
            (2, [0, 29, 58, 120, 125]),      # 2 sessions; last stays open
            (3, [0]),                        # 1 session; stays open
        ],
    )
    # one flat file: the file-stream source does not recurse into the
    # directory a DataFrame write would create
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = ev.toPandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pq.write_table(
        pa.Table.from_pandas(pdf), os.path.join(src, "wave1.parquet")
    )

    stream = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp"
    ).parquet(src)
    q = (
        sessionize_stream(stream, flush_timeouts=False)
        .writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option(
            "checkpointLocation", os.path.join(str(tmp_path), "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start_epoch"]): (
            r["n_events"], r["duration_sec"]
        )
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }
    batch = session_windows(ev).collect()
    last_sid = {}
    for r in batch:
        last_sid[r["user_id"]] = max(
            last_sid.get(r["user_id"], -1), r["session_id"]
        )
    expected = {
        (r["user_id"], r["session_start_epoch"]): (
            r["n_events"], r["duration_sec"]
        )
        for r in batch
        if r["session_id"] < last_sid[r["user_id"]]
    }
    assert got == expected
    assert len(got) == 3  # users 1 and 2 closed 2 + 1 sessions
