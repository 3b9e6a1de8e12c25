"""Candidate-pair generation: the join layer.

pairs = blocks ⋈ blocks on block_key with id1 < id2, then canonical
dedup across key families (J5: least/greatest + groupBy). The self-join
shuffles both sides by block_key once; AQE skew-join splits any
residual hot key (cap_blocks has already removed pathological ones).

`salted_join` is the explicit skew tool for dimension joins (J2-style
hash->records expansion): the hot-key build side is replicated S ways
instead of landing on one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_pairs(blocks: DataFrame) -> DataFrame:
    """(id1, id2) with id1 < id2, distinct across all block collisions.

    Singleton keys are dropped HERE (semi-join on count >= 2) rather
    than in cap_blocks: they cannot produce a pair, so removing them
    before the self-join only trims shuffle volume — and doing it at
    join time lets the checkpointed block table keep singletons for
    the incremental attach, where a new record can make them pairable."""
    pairable = (
        blocks.groupBy("block_key").count().filter(F.col("count") >= 2).select("block_key")
    )
    blocks = blocks.join(pairable, on="block_key", how="left_semi")
    a = blocks.alias("a")
    b = blocks.alias("b")
    return (
        a.join(b, on="block_key")
        .filter(F.col("a.record_id") < F.col("b.record_id"))
        .select(
            F.col("a.record_id").alias("id1"),
            F.col("b.record_id").alias("id2"),
        )
        .dropDuplicates(["id1", "id2"])
    )


def dedup_scored_pairs(scored: DataFrame, id1: str = "id1", id2: str = "id2",
                       conf: str = "confidence") -> DataFrame:
    """J5: canonical (least, greatest) ordering, keep max confidence
    (reference src/batch_processor.py:561-572)."""
    return (
        scored.select(
            F.least(F.col(id1), F.col(id2)).alias(id1),
            F.greatest(F.col(id1), F.col(id2)).alias(id2),
            F.col(conf),
        )
        .groupBy(id1, id2)
        .agg(F.max(conf).alias(conf))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: fact rows get a random-but-deterministic
    salt in [0, S); the dim side is replicated S times with every salt
    value; join on (key, salt). Turns one hot reducer into S.

    Use when a handful of keys dominate (the reference's hot
    person-hash problem, src/classification.py:492-498) and the dim
    side is too big to broadcast outright.
    """
    fact_s = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(num_salts)).cast("int")
    )
    dim_s = dim.crossJoin(
        F.broadcast(
            fact.sparkSession.range(num_salts).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    return fact_s.join(dim_s, on=[key, "_salt"], how=how).drop("_salt")
