"""Sinks: stage checkpoints, cluster JSONL, metrics + lineage.

The reference checkpoints every stage to pickle and resumes by file
existence (reference src/pipeline.py:84-96, src/utils.py:53-74). Here
a stage checkpoint is a parquet (Iceberg-shaped) table plus a
`_MANIFEST.json` marker; resume = manifest exists. Metrics/lineage
rows (north_rule) are appended to a `metrics` table per stage with
per-partition row counts.
"""

from __future__ import annotations

import json
import os
import time
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stage_path(work_dir: str, stage: str) -> str:
    return os.path.join(work_dir, f"stage={stage}")


def manifest_path(work_dir: str, stage: str) -> str:
    return os.path.join(work_dir, f"stage={stage}", "_MANIFEST.json")


def stage_complete(work_dir: str, stage: str, fingerprint: str | None = None) -> bool:
    """True iff the stage manifest exists AND (when a fingerprint is
    given) was written under the same config/model fingerprint.
    A mismatch means the checkpoint is STALE — re-running the same
    work_dir with a different config or model must not silently reuse
    it; the stage is invalidated (recomputed) with a warning."""
    mp = manifest_path(work_dir, stage)
    if not os.path.exists(mp):
        return False
    if fingerprint is None:
        return True
    try:
        with open(mp) as fh:
            recorded = json.load(fh).get("fingerprint")
    except (OSError, json.JSONDecodeError):
        return False
    if recorded != fingerprint:
        warnings.warn(
            f"stage '{stage}' checkpoint in {work_dir} was written under a "
            f"different config/model fingerprint ({recorded} != {fingerprint}); "
            "invalidating and recomputing",
            stacklevel=2,
        )
        return False
    return True


def write_stage(
    df: DataFrame,
    work_dir: str,
    stage: str,
    partition_by: list[str] | None = None,
    fingerprint: str | None = None,
) -> DataFrame:
    """Persist a stage table + manifest; returns the re-read DataFrame
    (truncates lineage — the Spark analogue of the pickle checkpoint)."""
    path = stage_path(work_dir, stage)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    spark = df.sparkSession
    out = spark.read.parquet(path)
    with open(manifest_path(work_dir, stage), "w") as fh:
        json.dump(
            {
                "stage": stage,
                "rows": out.count(),
                "columns": out.columns,
                "completed_at": time.time(),
                "fingerprint": fingerprint,
            },
            fh,
        )
    return out


def read_stage(spark: SparkSession, work_dir: str, stage: str) -> DataFrame:
    return spark.read.parquet(stage_path(work_dir, stage))


def record_metrics(df: DataFrame, work_dir: str, stage: str, wall_sec: float | None = None) -> None:
    """Append per-partition lineage rows (stage, partition, rows) plus a
    stage summary row to the metrics table."""
    spark = df.sparkSession
    per_part = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .count()
        .withColumn("stage", F.lit(stage))
        .withColumn("kind", F.lit("partition_rows"))
        .withColumn("wall_sec", F.lit(wall_sec).cast("double"))
        .select("stage", "kind", "partition_id", F.col("count").alias("rows"), "wall_sec")
    )
    summary = spark.createDataFrame(
        [(stage, "stage_rows", -1, per_part.agg(F.sum("rows")).collect()[0][0] or 0, wall_sec)],
        "stage string, kind string, partition_id int, rows bigint, wall_sec double",
    )
    metrics_dir = os.path.join(work_dir, "metrics")
    per_part.unionByName(summary).write.mode("append").parquet(metrics_dir)


def write_clusters_jsonl(clusters: DataFrame, path: str) -> None:
    """JSONL sink: one line per cluster {cluster_id, size, entities}
    (reference src/clustering.py:197-219)."""
    (
        clusters.groupBy("cluster_id")
        .agg(F.sort_array(F.collect_list("record_id")).alias("entities"))
        .withColumn("size", F.size("entities"))
        .select("cluster_id", "size", "entities")
        .write.mode("overwrite")
        .json(path)
    )
