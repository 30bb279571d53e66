"""Gap-based session windows over the events stream.

Batch form: the classic window idiom — ``lag(ts)`` per user, a session
break wherever the gap exceeds the threshold, a running sum of breaks as
the session ordinal, then one grouped aggregate per session. All
built-in expressions (two window passes + one groupBy over the same
user-keyed shuffle — Catalyst reuses the partitioning).

Streaming form (:func:`sessionize_stream`): the same semantics as a
CUSTOM STATEFUL OPERATOR via ``applyInPandasWithState`` — per-user state
carries the open session (start, last_ts, count); an event either
extends it or closes it (emitting the closed session) and opens a new
one; ``GroupStateTimeout`` flushes sessions whose gap elapsed between
micro-batches. Used with watermarking, late events beyond the watermark
are dropped by the engine before the operator sees them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_SEC = 1800  # 30 min, the classic default

SESSION_SCHEMA = (
    "user_id long, session_id int, session_start_epoch long, "
    "n_events long, duration_sec long"
)


def session_windows(
    events: DataFrame, gap_sec: int = SESSION_GAP_SEC
) -> DataFrame:
    """-> (user_id, session_id, session_start_epoch, n_events,
    duration_sec); session_id is the user's 0-based session ordinal in
    time order (ties by event_id — pinned)."""
    base = events.select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").cast("long").alias("epoch"),
    )
    w = Window.partitionBy("user_id").orderBy("epoch", "event_id")
    prev = F.lag("epoch").over(w)
    brk = F.when(
        prev.isNull() | (F.col("epoch") - prev > F.lit(int(gap_sec))), 1
    ).otherwise(0)
    marked = base.withColumn("brk", brk).withColumn(
        "session_id",
        (F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ) - 1).cast("int"),
    )
    return (
        marked.groupBy("user_id", "session_id")
        .agg(
            F.min("epoch").alias("session_start_epoch"),
            F.count("*").alias("n_events"),
            (F.max("epoch") - F.min("epoch")).alias("duration_sec"),
        )
        .orderBy("user_id", "session_id")
    )


def _session_state_fn(gap_sec: int, use_timeout: bool):
    """applyInPandasWithState handler factory (closed-session emitter)."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        user_id = key[0]
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed = []
        if use_timeout and state.hasTimedOut:
            if start is not None:
                closed.append((user_id, start, n, last - start))
            state.remove()
        else:
            events = pd.concat(list(pdfs), ignore_index=True)
            if len(events):
                epochs = (
                    events["ts"].astype("int64") // 1_000_000_000
                ).sort_values().tolist()
                for e in epochs:
                    if start is None:
                        start, last, n = e, e, 1
                    elif e - last > gap_sec:
                        closed.append((user_id, start, n, last - start))
                        start, last, n = e, e, 1
                    else:
                        last = max(last, e)
                        n += 1
            state.update((start, last, n))
            if use_timeout:
                state.setTimeoutDuration(gap_sec * 1000)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start_epoch", "n_events",
                    "duration_sec",
                ],
            )

    return fn


CLOSED_SESSION_SCHEMA = (
    "user_id long, session_start_epoch long, n_events long, "
    "duration_sec long"
)
STATE_SCHEMA = "start long, last long, n long"


def sessionize_stream(
    events_stream: DataFrame,
    gap_sec: int = SESSION_GAP_SEC,
    flush_timeouts: bool = True,
) -> DataFrame:
    """Streaming sessionization: emits each session once, when it CLOSES
    (a later event exceeds the gap, or — with ``flush_timeouts`` — the
    processing-time timeout fires). Input needs (user_id, ts) columns.

    ``flush_timeouts=False`` disables the timeout flush (open sessions
    stay in state until a closing event arrives). Use it for bounded
    drains (``trigger(availableNow=True)``): a registered processing-time
    timeout keeps the micro-batch engine alive firing empty batches
    waiting for timers, so an available-now query would never terminate.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_state_fn(gap_sec, flush_timeouts),
            outputStructType=CLOSED_SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if flush_timeouts
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
