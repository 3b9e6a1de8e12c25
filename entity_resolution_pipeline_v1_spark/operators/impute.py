"""Vector hot-deck imputation (reference §2.11).

Null field -> use the record's composite vector -> top-10 same-field
neighbors above min similarity -> imputed value = nearest neighbor's
text; a rank-decayed weighted-average vector is also produced
(reference src/imputation.py:140-298: J7 kNN join, W1-W3 windows,
A9 weighted average, decay 0.9^rank).

Spark shape: candidates come from the ANN layer (brute-force or IVF
top-k against the unique-string embedding table), then pure window +
aggregate expressions. No index mutation — downstream joins read
base ∪ imputed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .simsearch import ivf_topk, train_centroids


def impute_field(
    records_wide: DataFrame,
    unique_embeddings: DataFrame,
    field: str,
    k: int = 10,
    min_similarity: float = 0.3,
    n_centroids: int = 16,
    nprobe: int | None = None,
) -> DataFrame:
    """Records with NULL `field` get (record_id, imputed_value,
    imputed_vector) hot-decked from nearest same-field neighbors of
    their composite vector.

    unique_embeddings: (hash, field, value, vector) — the distinct
    string dictionary with vectors (preprocess.embed_unique joined back
    to values).

    The kNN runs through the IVF cell join, NOT brute_force_topk: the
    query side here is every record with a NULL field (~40% of the
    corpus on the fixtures) — an unbounded population that must never
    be broadcast. Both IVF sides shuffle on `cell`. ``nprobe`` defaults
    to ALL cells, which is exact (identical results to brute force)
    while keeping the scale-safe join shape; pass a smaller nprobe to
    trade recall for a (n_centroids/nprobe)× smaller join at scale.
    """
    targets = records_wide.filter(
        F.col(field).isNull() & F.col("composite_vec").isNotNull()
    ).select(F.col("record_id").alias("query_id"), F.col("composite_vec").alias("embedding"))

    donors = unique_embeddings.filter(F.col("field") == field).select(
        F.col("hash").alias("vec_id"), F.col("value"), F.col("vector").alias("embedding")
    )

    centroids = train_centroids(donors, n_centroids=n_centroids)
    topk = ivf_topk(
        donors.select("vec_id", "embedding"),
        targets,
        centroids,
        k=k,
        nprobe=len(centroids) if nprobe is None else nprobe,
        id_col="vec_id",
        vec_col="embedding",
        query_id_col="query_id",
    ).filter(F.col("cosine") >= min_similarity)

    # W2: rank-decay weights sim * 0.9^(rank-1); A9: weighted mean vector
    weighted = (
        topk.join(donors.select(F.col("vec_id").alias("neighbor_id"), "value", "embedding"),
                  on="neighbor_id")
        .withColumn("weight", F.col("cosine") * F.pow(F.lit(0.9), F.col("rank") - 1))
    )

    w1 = Window.partitionBy("query_id").orderBy(F.col("rank"))
    nearest = (
        weighted.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select(F.col("query_id").alias("record_id"), F.col("value").alias("imputed_value"))
    )

    per_dim = (
        weighted.select("query_id", "weight", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("query_id", "pos")
        .agg(
            (F.sum(F.col("val") * F.col("weight")) / F.sum("weight")).alias("mean_val")
        )
    )
    avg_vec = (
        per_dim.groupBy("query_id")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "mean_val"))).alias("dims"))
        .select(
            F.col("query_id").alias("record_id"),
            F.transform(F.col("dims"), lambda d: d["mean_val"].cast("float")).alias(
                "imputed_vector"
            ),
        )
    )
    return nearest.join(avg_vec, on="record_id", how="left")
