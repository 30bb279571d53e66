"""Graph-dyad shaping: the reference's native output plane, on DataFrames.

The reference turns search hits into Neo4j dyads through a chain of
dict-plumbing generators (reference ElasticsearchToNeo4jSync.py:109-303)
and a Cypher string sink (reference Neo4jHandler.py:32-215). This module
re-expresses that plane as columnar operators over a typed nested schema
— no graph DB, no string-assembled queries (the reference's injection-
prone f-string Cypher, Neo4jHandler.py:47, is replaced by typed MAP
columns; SURVEY.md §3.4 item 16):

- nested-entity threshold filter  (reference ElasticsearchToNeo4jSync.py:252-271)
- node-type taxonomy + closed-world validation (reference nodeType.py:5-48,
  Neo4jHandler.py:92-94)
- projection + propMap rename + str() coercion (reference
  ElasticsearchToNeo4jSync.py:186-204, Neo4jHandler.py:47)
- zip-join of parallel config lists (reference
  ElasticsearchToNeo4jSync.py:127-140, with ``equalize_list_values``)
- micro-batched idempotent sink (reference Neo4jHandler.py:188-215,
  chunkSize 10,000 at ElasticsearchToNeo4jSync.py:338) — including the
  tail rows the reference's modulus loop silently drops (SURVEY.md §3.4
  item 14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfts.querybuilder import equalize_list_values

# Node-type taxonomy parity (reference nodeType.py:5-45): every concrete
# type collapses onto one of three schema.org super-types via schema().
SCHEMA_MAP = {
    "organization": "Organization",
    "vendor": "Organization",
    "company": "Organization",
    "person": "Person",
    "relatedpersons": "Person",
    "relatedorganizations": "Organization",
    "amount": "Thing",
    "thing": "Thing",
    "relationship": "Relationship",
}
VALID_SCHEMAS = {"Organization", "Person", "Thing"}

DEFAULT_CONFIG = {
    # reference self.neo4jParams intent (ElasticsearchToNeo4jSync.py:37-53)
    "from": ["vendor"],
    "fromProps": [["name"]],
    "to": ["relatedPersons"],
    "toProps": [["name", "score"]],
    "relationship": ["RELATED_TO"],
    "relationshipProps": [[]],
    "propMap": {"answer": "name"},  # ElasticsearchToNeo4jSync.py:47
    "threshold": 0.9,  # per-field thresholds, all 0.9 (:29-34)
    "chunkSize": 10_000,  # :338
}


def node_type_of(key: str) -> str:
    """Entity key -> schema super-type; closed-world (raises on unknown).

    Parity with ``NodeType(...).schema()`` + the validTypes check
    (reference nodeType.py:47-48, Neo4jHandler.py:29,92-94). Keys are
    case-folded (the reference's config uses lowercase type names while
    the enum capitalizes — defect §3.4 item 9 — so the engine pins
    case-insensitive lookup as the evident intent).
    """
    schema = SCHEMA_MAP.get(key.lower())
    if schema is None or (
        schema != "Relationship" and schema not in VALID_SCHEMAS
    ):
        raise ValueError(f"invalid node type {key!r}")
    return schema


def filter_entities(
    docs: DataFrame, entity_cols: list[str], threshold: float = 0.9
) -> DataFrame:
    """Drop nested entities scoring below threshold.

    Array columns (``array<struct<..., score>>``) filter in place with the
    higher-order ``F.filter`` — no explode/regroup round trip; struct
    columns null out below threshold. Parity: ``processDocument``'s
    ``entity.get('score', 0) >= threshold`` (reference
    ElasticsearchToNeo4jSync.py:266-270; missing score counts as 0).
    """
    out = docs
    for c in entity_cols:
        dtype = dict(docs.dtypes)[c]
        if dtype.startswith("array"):
            out = out.withColumn(
                c,
                F.filter(
                    F.col(c),
                    lambda e: F.coalesce(e["score"], F.lit(0.0))
                    >= F.lit(threshold),
                ),
            )
        else:
            out = out.withColumn(
                c,
                F.when(
                    F.coalesce(F.col(c)["score"], F.lit(0.0))
                    >= F.lit(threshold),
                    F.col(c),
                ),
            )
    return out


def _props_map(entity, prop_names: list[str], prop_map: dict) -> F.Column:
    """Project + rename + stringify entity fields into a MAP column.

    Parity: ``getProps`` dict-comp rename (reference
    ElasticsearchToNeo4jSync.py:204) + ``str(v)`` coercion of every value
    (reference Neo4jHandler.py:47).
    """
    pairs = []
    for p in prop_names:
        out_name = prop_map.get(p, p)
        pairs.append(F.lit(out_name))
        pairs.append(entity[p].cast("string"))
    return F.create_map(*pairs)


def build_dyads(docs: DataFrame, config: dict | None = None) -> DataFrame:
    """Nested hit documents -> dyad rows.

    Output: ``(from_type, from_props MAP, edge_type, edge_props MAP,
    to_type, to_props MAP)`` — the typed replacement of the reference's
    Cypher pattern strings (reference Neo4jHandler.py:123-162).

    The i-th entries of the parallel config lists form the i-th dyad spec
    (``graphDataGen`` positional zip, reference
    ElasticsearchToNeo4jSync.py:127-140), normalized first with
    ``equalize_list_values`` (:61-71). Per doc, every surviving from-
    entity pairs with every surviving to-entity for each spec.
    """
    cfg = equalize_list_values({**DEFAULT_CONFIG, **(config or {})})
    # equalize_list_values pads to the LONGEST list, so an all-empty (or
    # partially-empty with empty max) config yields zero dyad specs —
    # name the problem instead of failing on parts[0] below
    empty = [
        k
        for k in ("from", "fromProps", "to", "toProps",
                  "relationship", "relationshipProps")
        if not cfg[k]
    ]
    if empty:
        raise ValueError(
            f"build_dyads: empty dyad config list(s) {empty}; every "
            "parallel list needs at least one entry"
        )
    prop_map = cfg["propMap"]
    entity_cols = sorted(set(cfg["from"]) | set(cfg["to"]))
    filtered = filter_entities(docs, entity_cols, cfg["threshold"])

    parts = []
    specs = zip(
        cfg["from"], cfg["fromProps"], cfg["to"], cfg["toProps"],
        cfg["relationship"], cfg["relationshipProps"],
    )
    dtypes = dict(docs.dtypes)
    for f_key, f_props, t_key, t_props, rel, rel_props in specs:
        f_type, t_type = node_type_of(f_key), node_type_of(t_key)
        src = filtered
        f_col, t_col = F.col(f_key), F.col(t_key)
        if dtypes[f_key].startswith("array"):
            src = src.withColumn("_from_e", F.explode(f_col))
        else:
            src = src.where(f_col.isNotNull()).withColumn("_from_e", f_col)
        if dtypes[t_key].startswith("array"):
            src = src.withColumn("_to_e", F.explode(t_col))
        else:
            src = src.where(t_col.isNotNull()).withColumn("_to_e", t_col)
        edge_props = F.create_map(
            *[
                x
                for p in rel_props
                for x in (F.lit(prop_map.get(p, p)), F.lit(None).cast("string"))
            ]
        ) if rel_props else F.create_map().cast("map<string,string>")
        parts.append(
            src.select(
                F.lit(f_type).alias("from_type"),
                _props_map(F.col("_from_e"), f_props, prop_map).alias(
                    "from_props"
                ),
                F.lit(str(rel)).alias("edge_type"),
                edge_props.alias("edge_props"),
                F.lit(t_type).alias("to_type"),
                _props_map(F.col("_to_e"), t_props, prop_map).alias("to_props"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_dyads(
    dyads: DataFrame, path: str, chunk_size: int = 10_000
) -> None:
    """Micro-batched idempotent sink.

    ``maxRecordsPerFile`` is the native Spark form of the reference's
    flush-every-chunk loop (reference Neo4jHandler.py:206-210) — and
    unlike that loop it never drops the tail remainder (defect §3.4 item
    14). ``overwrite`` gives idempotent re-runs (the parquet stand-in for
    Cypher MERGE upsert semantics / an Iceberg ``MERGE INTO``).
    """
    (
        dyads.write.mode("overwrite")
        .option("maxRecordsPerFile", int(chunk_size))
        .parquet(path)
    )


def search_to_dyads(
    tokens: DataFrame,
    docs: DataFrame,
    entity_docs: DataFrame,
    cloud_event: dict,
    n_docs: int,
    avgdl: float,
    config: dict | None = None,
    properties: tuple[str, ...] = ("name",),
) -> DataFrame | None:
    """End-to-end ``startProcess`` parity (reference
    ElasticsearchToNeo4jSync.py:305-344): query cloud event -> search
    request -> fuzzy conjunctive BM25 top-k -> join hits to their nested
    entity documents -> threshold filter -> dyads. Returns ``None`` for a
    malformed event (the reference's error path, :103-105); the caller
    sinks the result with :func:`write_dyads`.

    ``entity_docs``: ``(doc_id, vendor, relatedPersons, ...)`` — the
    nested-entity view of the corpus (what the reference reads from each
    hit's ``_source``, :241-249).
    """
    from sparkfts.querybuilder import build_search_request, run_search_request

    req = build_search_request(cloud_event, properties=properties)
    if req is None:
        return None
    hits = run_search_request(tokens, docs, req, n_docs, avgdl)
    joined = hits.select("doc_id", "score").join(entity_docs, "doc_id")
    return build_dyads(joined, config)
