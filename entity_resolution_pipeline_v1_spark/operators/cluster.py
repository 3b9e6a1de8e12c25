"""Transitive clustering: connected components on the match-edge graph.

The reference materializes a networkx graph on one machine
(reference src/clustering.py:45-105). That dies at web scale, so the
engine implements the iterative **large-star / small-star** algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) purely as DataFrame ops: each round is two groupBy/join
shuffles, converging in O(log n) rounds; lineage is cut with an
eager localCheckpoint every round (the edge set shrinks toward stars,
so each materialization is smaller than the last).

Labels come out as (record_id, cluster_id=min record in component),
then size filtering + dense relabeling (G5, src/clustering.py:163-195).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bidirect(edges: DataFrame) -> DataFrame:
    """Both directions of an ORIENTED, DISTINCT edge set. No distinct
    of its own: every caller feeds edges with src != dst oriented one
    way (the loop's per-round output ends in distinct over
    (least, greatest)-style pairs), so fwd and rev are disjoint and
    already duplicate-free — the old .distinct() here was a full extra
    exchange+aggregate per CC round that could never remove a row."""
    fwd = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    rev = edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    return fwd.unionByName(rev).filter(F.col("u") != F.col("v"))


def _large_star(nbrs: DataFrame) -> DataFrame:
    """For each u: m = min(N(u) ∪ {u}); emit (v, m) for v in N(u), v > u."""
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.withColumn("m", F.least(F.col("mn"), F.col("u"))).select("u", "m")
    return (
        nbrs.join(mins, on="u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient u > v; for each u: m = min(N(u) ∪ {u}); emit (v, m) for
    v in N(u) ∪ {u}, v != m."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).distinct()
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    pairs = (
        oriented.join(mins, on="u")
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .unionByName(mins.select(F.col("u").alias("src"), F.col("m").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return pairs


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """edges(src, dst) -> labels(record_id, cluster_id).

    Alternates large-star / small-star until the edge set fixpoints
    (count + order-insensitive xxhash64 fingerprint). Isolated nodes
    never appear in `edges`, so callers union them back if needed.

    Per-round materialization cuts the exponentially-growing lineage.
    Default is ``localCheckpoint`` (blocks live in executor storage —
    fastest, fine for local mode), but those blocks DIE WITH THEIR
    EXECUTOR: on a real cluster a lost executor mid-iteration kills the
    job because the truncated lineage cannot recompute. Pass
    ``checkpoint_dir`` (HDFS/S3/any shared FS) to use reliable
    ``df.checkpoint()`` instead — each round's edge set persists to the
    shared store and survives executor loss. Convergence is identical
    either way (the knob changes only where the materialization lives).
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

        def _materialize(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:

        def _materialize(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    cur = _materialize(
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    prev_fp = _fingerprint(cur)
    for _ in range(max_iterations):
        # eager materialization each round: the edge set shrinks toward
        # stars, truncating lineage makes the fingerprint action free
        # of recompute
        cur = _materialize(_small_star(_large_star(_bidirect(cur))))
        fp = _fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
    # fixpoint: every edge is (node -> component-min root)
    labels = cur.select(F.col("src").alias("record_id"), F.col("dst").alias("cluster_id"))
    roots = cur.select(F.col("dst").alias("record_id")).distinct().withColumn(
        "cluster_id", F.col("record_id")
    )
    return labels.unionByName(roots).groupBy("record_id").agg(
        F.min("cluster_id").alias("cluster_id")
    )


def position_in_cluster(labels: DataFrame) -> DataFrame:
    """W4: deterministic 1-based member position within each cluster
    (window partitioned BY CLUSTER — parallel across clusters, ordered
    by record_id; reference src/clustering.py cluster member ordering)."""
    w = Window.partitionBy("cluster_id").orderBy("record_id")
    return labels.withColumn("position", F.row_number().over(w))


def filter_and_relabel(
    labels: DataFrame,
    min_cluster_size: int = 2,
    max_cluster_size: int = 100,
) -> DataFrame:
    """G5: drop clusters under min size, keep-but-flag those over max,
    densely renumber by first-seen (min record) order."""
    from .blocking import global_rank

    sizes = labels.groupBy("cluster_id").count()
    kept = sizes.filter(F.col("count") >= min_cluster_size)
    renum = global_rank(
        kept,
        [F.col("cluster_id")],
        "rank",
        bucket_expr=F.substring(F.col("cluster_id").cast("string"), 1, 8),
    ).select(
        "cluster_id",
        (F.col("rank") - 1).alias("dense_cluster_id"),
        (F.col("count") > max_cluster_size).alias("oversized"),
    )
    return (
        labels.join(renum, on="cluster_id")
        .select(
            "record_id",
            F.col("dense_cluster_id").alias("cluster_id"),
            "oversized",
        )
    )
