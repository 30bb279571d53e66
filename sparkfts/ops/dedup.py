"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale shapes:
  - exact: hash-groupBy (one shuffle on a 32-hex key, partial agg applies)
  - ngram Jaccard: shingle explode -> self-equi-join on shingle ->
    per-pair intersection counts (quadratic only within shingle buckets)
  - MinHash+LSH: signature = k modular permutation mins (one explode +
    groupBy), banding -> bucket-groupBy; candidate pairs only within a
    bucket — the classic way near-dup detection survives 10^12 docs
  - SimHash: per-bit weighted majority over token hashes -> 32-bit key;
    near-dups collide on key or small hamming distance

All hashes are md5-prefix -> int64 mod 2^31-1, bit-identical in DuckDB
(see __spark_entry__.oracle_sql) so every operator is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfts.ops.textstats import HASH_P, term_hash31, tokens_col

MINHASH_A = 1_103_515_245
MINHASH_B = 12_345


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash -> (content_md5, n_dups)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_doc_id"))
        .where(F.col("n_dups") > 1)
        .orderBy("content_md5")
    )


def shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles -> (doc_id, shingle)."""
    assert n == 3, "pinned to 3-gram for the oracle pair"
    toks = tokens_col(F.col(text_col))
    grams = F.expr(
        "transform(sequence(1, greatest(size(toks) - 2, 0)), "
        "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
    )
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.2,
    max_doc_id: int | None = None,
) -> DataFrame:
    """Near-dup pairs by 3-gram Jaccard >= threshold -> (a, b, jaccard_e6).

    Self-join on shingle buckets: only docs sharing at least one shingle
    are ever paired (never a full cross join). ``max_doc_id`` bounds the
    candidate universe for the small-scale oracle check.
    """
    s = shingles(docs, text_col)
    if max_doc_id is not None:
        s = s.where(F.col("doc_id") < max_doc_id)
    sizes = s.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = s.alias("a")
    b = s.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("a_id"), F.col("n_sh").alias("n_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("b_id"), F.col("n_sh").alias("n_b")
    )
    jac = (
        inter.join(F.broadcast(sa), "a_id")
        .join(F.broadcast(sb), "b_id")
        .withColumn(
            "jaccard_e6",
            F.floor(
                F.col("n_inter")
                * 1_000_000
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).cast("long"),
        )
    )
    return (
        jac.where(F.col("jaccard_e6") >= int(threshold * 1_000_000))
        .select("a_id", "b_id", "jaccard_e6")
        .orderBy("a_id", "b_id")
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", n_hashes: int = 8
) -> DataFrame:
    """MinHash signature -> (doc_id, i, minhash) for i in [0, n_hashes).

    h_i(g) = (a_i * g31 + b_i) mod P over distinct 3-gram shingles, with
    a_i = A*(i+1) mod P, b_i = B*(i+1) mod P, g31 = md5-based 31-bit gram
    hash. Products stay < 2^62: exact int64 on both engines.
    """
    s = shingles(docs, text_col).withColumn(
        "g31", term_hash31(F.col("shingle"))
    )
    hashes = F.explode(
        F.array(*[F.lit(i) for i in range(n_hashes)])
    ).alias("i")
    exploded = s.select("doc_id", "g31", hashes)
    i64 = F.col("i").cast("long")
    a = (F.lit(MINHASH_A).cast("long") * (i64 + 1)) % F.lit(HASH_P)
    b = (F.lit(MINHASH_B).cast("long") * (i64 + 1)) % F.lit(HASH_P)
    h = (a * F.col("g31") + b) % F.lit(HASH_P)
    return (
        exploded.withColumn("h", h)
        .groupBy("doc_id", "i")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_buckets(
    docs: DataFrame,
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """LSH banding -> (band, band_key, n_docs) for buckets holding >1 doc.

    band_key = ordered concatenation of the band's minhash values; docs
    sharing a bucket are near-dup candidates (join within bucket next).
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(docs, text_col, n_hashes)
    banded = sig.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
    keys = (
        banded.groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("i"), F.col("minhash")))
                    ),
                    lambda x: x["minhash"].cast("string"),
                ),
                ",",
            ).alias("band_key")
        )
    )
    return (
        keys.groupBy("band", "band_key")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .where(F.col("n_docs") > 1)
        .orderBy("band", "band_key")
    )


def lsh_candidate_pairs(
    docs: DataFrame, text_col: str = "text", n_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """Distinct candidate pairs from shared LSH buckets -> (a_id, b_id)."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(docs, text_col, n_hashes)
    banded = sig.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
    keys = banded.groupBy("doc_id", "band").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("i"), F.col("minhash")))
                ),
                lambda x: x["minhash"].cast("string"),
            ),
            ",",
        ).alias("band_key")
    )
    a = keys.alias("a")
    b = keys.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
        .orderBy("a_id", "b_id")
    )


def simhash32(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """32-bit SimHash per doc -> (doc_id, simhash).

    Per bit position b: v_b = sum over (term, tf) of tf * (2*bit_b(h)-1);
    bit set iff v_b > 0. Near-dup docs land on nearby keys (small hamming
    distance); exact formulation is cross-engine reproducible.
    """
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    tf = tf.withColumn("h", term_hash31(F.col("tok")))
    bits = tf.select(
        "doc_id",
        "tf",
        "h",
        F.explode(F.array(*[F.lit(b) for b in range(32)])).alias("b"),
    )
    signed = bits.withColumn(
        "v",
        F.col("tf")
        * (F.expr("shiftright(h, cast(b as int)) & 1") * 2 - 1),
    )
    return (
        signed.groupBy("doc_id", "b")
        .agg(F.sum("v").alias("vb"))
        .withColumn(
            "bit",
            F.when(
                F.col("vb") > 0, F.expr("shiftleft(1L, cast(b as int))")
            ).otherwise(F.lit(0)),
        )
        .groupBy("doc_id")
        .agg(F.sum("bit").alias("simhash"))
        .orderBy("doc_id")
    )
