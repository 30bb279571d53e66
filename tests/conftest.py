"""Shared Spark/corpus fixtures for the test suite."""

from __future__ import annotations

import pytest

from sparkfts.session import get_spark
from sparkfts.synth import gen_corpus, gen_queries


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=4, app_name="sparkfts-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus():
    """Deterministic 400-doc webtext corpus (pyarrow table)."""
    return gen_corpus(400, seed=42)


@pytest.fixture(scope="session")
def queries(corpus):
    return gen_queries(corpus.column("text").to_pylist())


@pytest.fixture(scope="session")
def pages_df(spark, corpus):
    return spark.createDataFrame(corpus.to_pandas())
