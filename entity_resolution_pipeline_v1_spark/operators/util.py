"""Shared physical-plan guards for operator inputs."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition a frame whose scan parallelism is below
    the cluster's cores. Per-row compute downstream of a BROADCAST
    join runs in the STREAM side's partitions: a small frame arriving
    as one parquet file (a checkpointed stage, a test fixture) would
    run every row in ONE task while the other cores idle (measured
    twice: the whole 360k-pair ivf stage on a single core ~9s, and the
    incremental attach's 62k-pair classify stage 54s serial vs ~4s
    spread). At real scale the input has >= cores partitions and this
    is a no-op — the guard never shuffles data that is already
    spread."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
