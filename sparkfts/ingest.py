"""ES ingest pipelines: declarative processor chains over the page frame.

ES applies *ingest pipelines* (ordered processor lists) to every
document before indexing — the reference's sync loop feeds documents
to that machinery via the bulk path behind its ES client (reference
ElasticsearchHandler.py:69). This module pins the processor subset
that covers the standard web-corpus pipelines and compiles the WHOLE
chain to a single Catalyst projection: one ``select`` per pipeline,
no UDFs, no per-processor passes — Catalyst collapses the chain into
the scan stage, so an ingest pipeline is free at any scale.

Processors (each a dict, ES body shape, applied in list order):

- ``{"set": {"field": f, "value": v}}`` — literal assign (overwrites).
- ``{"set": {"field": f, "copy_from": g}}`` — copy another field.
- ``{"rename": {"field": f, "target_field": g}}`` — move (f dropped).
- ``{"remove": {"field": f}}`` — drop.
- ``{"lowercase"|"uppercase"|"trim": {"field": f}}`` — string ops.
- ``{"gsub": {"field": f, "pattern": p, "replacement": r}}`` — regex
  replace (Java/RE2 common subset, same contract as redact_pii).
- ``{"split": {"field": f, "separator": s}}`` — string -> array.
- ``{"join": {"field": f, "separator": s}}`` — array -> string.
- ``{"convert": {"field": f, "type": "integer"|"long"|"double"|
  "string"|"boolean"}}`` — cast.
- ``{"date": {"field": f, "target_field": g, "formats": [fmt]}}`` —
  parse a timestamp (Spark datetime pattern; pin one format).
- ``{"fail": {"message": m, "if_missing": f}}`` — job-level guard:
  raises at plan time if ``f`` is not a column (schema contract check).

Unknown processor names or malformed bodies fail loudly at compile
time, on the driver, before any job runs (the engine-wide fail-loud
convention for config surfaces, same as the CLI and query_string).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STR_OPS = {
    "lowercase": F.lower,
    "uppercase": F.upper,
    "trim": F.trim,
}

_CONVERT = {
    "integer": "int",
    "long": "long",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
}


def _need(body: dict, *keys: str) -> list:
    missing = [k for k in keys if k not in body]
    if missing:
        raise ValueError(f"processor body missing {missing}: {body!r}")
    return [body[k] for k in keys]


def apply_pipeline(df: DataFrame, processors: list[dict]) -> DataFrame:
    """Run an ingest pipeline -> transformed DataFrame (one projection).

    Field state is tracked driver-side as a name -> Column mapping, so
    consecutive processors compose into ONE ``select`` — the plan shows
    a single Project over the scan regardless of pipeline length.
    """
    cols: dict[str, Column] = {c: F.col(c) for c in df.columns}
    order: list[str] = list(df.columns)

    def get(f: str) -> Column:
        if f not in cols:
            raise ValueError(f"processor references unknown field {f!r}")
        return cols[f]

    def put(f: str, c: Column) -> None:
        if f not in cols:
            order.append(f)
        cols[f] = c

    for proc in processors:
        if not isinstance(proc, dict) or len(proc) != 1:
            raise ValueError(f"each processor must be one-key dict: {proc!r}")
        (name, body), = proc.items()
        if name == "set":
            if "copy_from" in body:
                f, src = _need(body, "field", "copy_from")
                put(f, get(src))
            else:
                f, v = _need(body, "field", "value")
                put(f, F.lit(v))
        elif name == "rename":
            f, g = _need(body, "field", "target_field")
            c = get(f)
            del cols[f]
            if g in cols:  # overwrite: drop the old occurrence
                del cols[g]
                order.remove(g)
            order[order.index(f)] = g  # keep the field's position
            cols[g] = c
        elif name == "remove":
            (f,) = _need(body, "field")
            get(f)
            del cols[f]
            order.remove(f)
        elif name in _STR_OPS:
            (f,) = _need(body, "field")
            put(f, _STR_OPS[name](get(f)))
        elif name == "gsub":
            f, p, r = _need(body, "field", "pattern", "replacement")
            put(f, F.regexp_replace(get(f), p, r))
        elif name == "split":
            f, s = _need(body, "field", "separator")
            put(f, F.split(get(f), s))
        elif name == "join":
            f, s = _need(body, "field", "separator")
            put(f, F.array_join(get(f), s))
        elif name == "convert":
            f, t = _need(body, "field", "type")
            if t not in _CONVERT:
                raise ValueError(f"convert type {t!r} not in {sorted(_CONVERT)}")
            put(f, get(f).cast(_CONVERT[t]))
        elif name == "date":
            f, g, fmts = _need(body, "field", "target_field", "formats")
            if not fmts or len(fmts) != 1:
                raise ValueError("date processor pins exactly one format")
            put(g, F.to_timestamp(get(f), fmts[0]))
        elif name == "fail":
            (f,) = _need(body, "if_missing")
            if f not in cols:
                raise ValueError(
                    body.get("message", f"required field {f!r} missing")
                )
        else:
            raise ValueError(f"unknown ingest processor {name!r}")
    return df.select(*[cols[f].alias(f) for f in order])
