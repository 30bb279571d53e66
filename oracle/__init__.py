"""Executable oracle: single-process, pure-Python spec of the engine.

The reference repo's search semantics live behind one opaque call to
Elasticsearch (reference ElasticsearchHandler.py:69) and its committed code
cannot execute (SURVEY.md §3.4), so the engine's correctness contract is
anchored here instead: a pinned, dependency-light BM25 implementation that
imports the *same* analysis functions the Spark engine uses
(``sparkfts.analysis``). The Spark engine must match this oracle
rank-identically (docIDs exactly, scores to <=1e-9 relative).
"""

from oracle.bm25 import BM25Oracle  # noqa: F401
