"""ES date math: ``now-7d/d``-style expressions for range filters.

Every Kibana time-picker query the ES backend receives (reference
ElasticsearchHandler.py:69 is the delegation point) carries date-math
range bounds: an anchor (``now`` or an ISO date followed by ``||``),
a chain of ``+N unit`` / ``-N unit`` offsets, and an optional
``/unit`` truncation (round DOWN to the unit's start; ES rounds the
UPPER bound of a range up — callers pick via ``round_up``).

Pinned grammar (ES's, minus fractional units which ES also rejects):

    expr   := anchor op*
    anchor := 'now' | ISODATE '||'
    op     := ('+'|'-') INT unit | '/' unit
    unit   := y | M | w | d | h | H | m | s

``now`` must be supplied by the caller (``now=``) — the engine never
reads the wall clock (replayable jobs, driver-contract determinism).
Evaluation is pure driver-side ``datetime`` arithmetic; the result
plugs into any Catalyst filter as a literal, so the parquet scan
min/max-prunes on it like any constant timestamp. Calendar semantics
pinned: months add by calendar month with day clamped to the target
month's last day (ES/Joda behavior); weeks truncate to Monday (ISO).

Malformed expressions fail loudly at parse time on the driver.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta

_OP_RE = re.compile(r"([+\-/])(\d*)([yMwdhHms])")
_UNITS = set("yMwdhHms")


def _add_months(dt: datetime, n: int) -> datetime:
    y, m = divmod(dt.year * 12 + (dt.month - 1) + n, 12)
    last = calendar.monthrange(y, m + 1)[1]
    return dt.replace(year=y, month=m + 1, day=min(dt.day, last))


def _truncate(dt: datetime, unit: str, round_up: bool) -> datetime:
    if unit == "y":
        lo = dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                        microsecond=0)
        hi = lo.replace(year=lo.year + 1)
    elif unit == "M":
        lo = dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        hi = _add_months(lo, 1)
    elif unit == "w":  # ISO week: Monday 00:00
        day0 = dt.replace(hour=0, minute=0, second=0, microsecond=0)
        lo = day0 - timedelta(days=dt.weekday())
        hi = lo + timedelta(days=7)
    elif unit == "d":
        lo = dt.replace(hour=0, minute=0, second=0, microsecond=0)
        hi = lo + timedelta(days=1)
    elif unit in ("h", "H"):
        lo = dt.replace(minute=0, second=0, microsecond=0)
        hi = lo + timedelta(hours=1)
    elif unit == "m":
        lo = dt.replace(second=0, microsecond=0)
        hi = lo + timedelta(minutes=1)
    else:  # "s"
        lo = dt.replace(microsecond=0)
        hi = lo + timedelta(seconds=1)
    # ES rounds an upper bound to the LAST instant of the unit; the
    # half-open convention here returns the next unit start (use `<`)
    return hi if round_up else lo


def resolve_date_math(
    expr: str, now: datetime, round_up: bool = False
) -> datetime:
    """Evaluate an ES date-math expression against an explicit ``now``.

    ``round_up`` applies to ``/unit`` truncations (ES uses it for the
    upper bound of a range; pair the result with ``<``).
    """
    if not expr or not expr.strip():
        raise ValueError("empty date-math expression")
    expr = expr.strip()
    if expr.startswith("now"):
        dt, rest = now, expr[3:]
    else:
        anchor, sep, rest = expr.partition("||")
        if not sep:
            raise ValueError(
                f"date-math anchor must be 'now' or 'ISO||...': {expr!r}"
            )
        try:
            dt = datetime.fromisoformat(anchor)
        except ValueError as e:
            raise ValueError(f"bad date-math anchor {anchor!r}: {e}")
    pos = 0
    while pos < len(rest):
        m = _OP_RE.match(rest, pos)
        if not m:
            raise ValueError(
                f"date-math syntax error at {rest[pos:]!r} in {expr!r}"
            )
        op, num, unit = m.groups()
        if op == "/":
            if num:
                raise ValueError(f"'/{num}{unit}': rounding takes no count")
            dt = _truncate(dt, unit, round_up)
        else:
            if not num:
                raise ValueError(f"'{op}{unit}' needs a count")
            n = int(num) * (1 if op == "+" else -1)
            if unit == "y":
                dt = _add_months(dt, 12 * n)
            elif unit == "M":
                dt = _add_months(dt, n)
            else:
                delta = {
                    "w": timedelta(weeks=1),
                    "d": timedelta(days=1),
                    "h": timedelta(hours=1),
                    "H": timedelta(hours=1),
                    "m": timedelta(minutes=1),
                    "s": timedelta(seconds=1),
                }[unit]
                dt = dt + n * delta
        pos = m.end()
    return dt


def date_range_filter(
    df,
    ts_col: str,
    gte: str | None,
    lt: str | None,
    now: datetime,
    lte: str | None = None,
):
    """ES range query with date-math bounds -> filtered DataFrame.

    ES bound semantics, pinned (round-4 ADVICE fix — ``lt`` previously
    rounded UP, which is ES's ``lte`` behavior):

    - ``gte``: ``/unit`` rounds DOWN, predicate ``>=``.
    - ``lt``:  ``/unit`` rounds DOWN, predicate ``<`` — ``lt: now/d``
      excludes today entirely, exactly like ES.
    - ``lte``: ``/unit`` rounds UP (to the next unit start), predicate
      ``<`` — equivalent to ES's "last instant of the unit" at any
      timestamp precision; without a ``/`` rounding the resolved
      instant itself is included (``<=``).

    ``lt`` and ``lte`` are mutually exclusive. All bounds become
    literal timestamps, so Catalyst pushes them into the scan (parquet
    row-group min/max pruning)."""
    from pyspark.sql import functions as F

    if gte is None and lt is None and lte is None:
        raise ValueError("need at least one bound")
    if lt is not None and lte is not None:
        raise ValueError("lt and lte are mutually exclusive")
    out = df
    if gte is not None:
        out = out.where(
            F.col(ts_col) >= F.lit(resolve_date_math(gte, now, False))
        )
    if lt is not None:
        out = out.where(
            F.col(ts_col) < F.lit(resolve_date_math(lt, now, False))
        )
    if lte is not None:
        bound = resolve_date_math(lte, now, True)
        if "/" in lte:
            out = out.where(F.col(ts_col) < F.lit(bound))
        else:
            out = out.where(F.col(ts_col) <= F.lit(bound))
    return out
