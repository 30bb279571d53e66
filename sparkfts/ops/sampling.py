"""Corpus-shaping ops for pretraining pipelines: per-group caps and
deterministic stratified sampling.

Both are standard large-scale training-data moves the reference's
pipeline would need downstream of search/sync (SURVEY.md LLM-pipeline
family): bound any one domain/source's contribution, and down-sample
strata (languages, sources) to a target mix — reproducibly, with no RNG
(runs must be replayable and cluster-size-invariant).

Scale shapes:

- ``cap_per_group``: one window partitioned by the group key — the
  exact per-group top-N shape (shuffle keyed on group; AQE's skew-join
  split handles a pathologically hot host). Nothing is collected.
- ``stratified_sample``: a pure rowwise integer-hash predicate — no
  shuffle at all, evaluates inside the scan's codegen stage and pushes
  column pruning through. The hash is an integer LCG mod a Mersenne
  prime (the engine-reproducible arithmetic family used by
  sparkfts.ops.similarity), so DuckDB replays the exact keep set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# LCG constants (same arithmetic family as ops/similarity.py's
# engine-reproducible hyperplanes): all intermediates stay < 2^63 in
# both Spark and DuckDB BIGINT, so neither engine overflows.
HASH_P = 2_147_483_647  # 2^31 - 1
HASH_A = 1_103_515_245
HASH_B = 12_345


def cap_per_group(
    docs: DataFrame,
    group_col: str = "source",
    cap: int = 5,
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` docs per ``group_col`` value (deterministic:
    lowest ``order_col`` first). The per-host/per-source cap every web
    pretraining pipeline applies so no single domain dominates."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    w = Window.partitionBy(group_col).orderBy(F.asc(order_col))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.lit(int(cap)))
        .drop("_rn")
    )


def _keep_hash(key_col: str) -> F.Column:
    """Deterministic per-doc hash in [0, 1000) — integer LCG mod 2^31-1
    folded to per-mille buckets; identical arithmetic in DuckDB:
    ``((doc_id % P + P) % P * A + B) % P % 1000``."""
    h = F.pmod(F.col(key_col).cast("long"), F.lit(HASH_P))
    return F.pmod(h * F.lit(HASH_A) + F.lit(HASH_B), F.lit(HASH_P)) % F.lit(
        1000
    )


def stratified_sample(
    docs: DataFrame,
    rates_per_mille: dict[str, int],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: int = 0,
) -> DataFrame:
    """Deterministic stratified down-sample: keep a doc iff its integer
    hash bucket (0-999) falls below its stratum's rate.

    ``rates_per_mille``: stratum value -> keep rate in per-mille
    (e.g. ``{"en": 500, "de": 100}`` keeps ~50% of en, ~10% of de);
    strata absent from the map keep ``default_rate`` per-mille. The keep
    decision is a pure function of (key, stratum rate): re-runs, ledger
    audits and the DuckDB oracle all reproduce the same rows.
    """
    from sparkfts.index import lit_map

    for k, v in rates_per_mille.items():
        if not (0 <= int(v) <= 1000):
            raise ValueError(f"rate for {k!r} must be in [0, 1000]")
    rate_map = lit_map(
        (k, int(v)) for k, v in sorted(rates_per_mille.items())
    )
    rate = F.coalesce(
        F.element_at(rate_map, F.col(strata_col)),
        F.lit(int(default_rate)),
    )
    return docs.where(_keep_hash(key_col) < rate)
