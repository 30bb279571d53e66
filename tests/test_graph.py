"""Graph-dyad shaping parity tests (reference output plane, SURVEY.md §2.2-2.3).

Fixture names follow the reference's own test goldens (Tom Hanks /
birthyear, reference TestNeo4jHandler.py:26-28).
"""

from __future__ import annotations

import os

import pytest

from sparkfts.graph import (
    build_dyads,
    filter_entities,
    node_type_of,
    write_dyads,
)


@pytest.fixture(scope="module")
def hits_df(spark):
    schema = (
        "doc_id long, "
        "vendor struct<name:string, score:double>, "
        "relatedPersons array<struct<name:string, score:double, answer:string>>"
    )
    rows = [
        (
            1,
            ("Acme Corp", 0.95),
            [
                ("Tom Hanks", 0.97, "actor"),
                ("Low Conf", 0.2, "noise"),  # filtered out (< 0.9)
            ],
        ),
        (2, ("Globex", 0.85), [("Rita Wilson", 0.99, "actor")]),  # vendor < 0.9
        (3, ("Initech", 0.92), []),  # no surviving persons -> no dyads
    ]
    return spark.createDataFrame(rows, schema)


def test_node_type_taxonomy():
    assert node_type_of("vendor") == "Organization"
    assert node_type_of("relatedPersons") == "Person"
    assert node_type_of("AMOUNT") == "Thing"  # case-folded (ref defect 9)
    with pytest.raises(ValueError):
        node_type_of("nonsense")


def test_filter_entities_nested_and_struct(hits_df):
    out = filter_entities(hits_df, ["vendor", "relatedPersons"], 0.9)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert [e["name"] for e in rows[1]["relatedPersons"]] == ["Tom Hanks"]
    assert rows[2]["vendor"] is None  # struct nulled below threshold
    assert rows[3]["vendor"]["name"] == "Initech"


def test_build_dyads_shape_and_propmap(hits_df):
    dyads = build_dyads(
        hits_df,
        {
            "toProps": [["answer", "score"]],  # answer -> name via propMap
        },
    ).collect()
    # doc 1: Acme->Tom Hanks only; doc 2 dropped (vendor filtered);
    # doc 3 has no to-entities
    assert len(dyads) == 1
    d = dyads[0]
    assert d["from_type"] == "Organization" and d["to_type"] == "Person"
    assert d["edge_type"] == "RELATED_TO"
    assert d["from_props"] == {"name": "Acme Corp"}
    assert d["to_props"]["score"] == "0.97"  # str(v) coercion (ref :47)
    assert d["to_props"]["name"] == "actor"  # propMap rename (ref :47,:204)


def test_write_dyads_batched_no_tail_loss(spark, hits_df, tmp_path):
    dyads = build_dyads(hits_df)
    path = os.path.join(str(tmp_path), "dyads")
    write_dyads(dyads, path, chunk_size=1)
    back = spark.read.parquet(path)
    assert back.count() == dyads.count()  # tail rows survive (ref bug 14)
    write_dyads(dyads, path, chunk_size=1)  # idempotent re-run
    assert spark.read.parquet(path).count() == dyads.count()


def test_search_to_dyads_end_to_end(spark, hits_df):
    """Full startProcess parity over a tiny corpus with nested entities."""
    from sparkfts.graph import search_to_dyads
    from sparkfts.stats import avgdl_of
    from sparkfts.tokens import tokenize_docs

    docs = spark.createDataFrame(
        [
            (1, "acme corporation builds rockets"),
            (2, "globex world domination plans"),
            (3, "initech tps reports stapler"),
        ],
        "doc_id long, text string",
    )
    tokens = tokenize_docs(docs)
    avgdl = avgdl_of(tokens, 3)
    event = {
        "searchQueries": [
            {"properties": [{"subject": "name", "value": "ROCKETS"}]}
        ]
    }
    dyads = search_to_dyads(
        tokens, docs.select("doc_id"), hits_df, event, 3, avgdl
    )
    rows = dyads.collect()
    # only doc 1 matches "rockets"; its one surviving dyad comes through
    assert len(rows) == 1
    assert rows[0]["from_props"] == {"name": "Acme Corp"}
    # malformed event -> None (reference error path)
    assert search_to_dyads(tokens, docs, hits_df, {}, 3, avgdl) is None


def test_build_dyads_empty_config_list_raises(hits_df):
    """An empty parallel config list names itself instead of an
    IndexError on parts[0] (padding skips empty lists by design)."""
    with pytest.raises(ValueError, match="from"):
        build_dyads(hits_df, {"from": [], "fromProps": []})
