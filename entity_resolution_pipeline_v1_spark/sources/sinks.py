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


def manifest_rows(work_dir: str, stage: str) -> int:
    """Row count recorded in the stage manifest — write_stage already
    paid that count job, so stage bookkeeping reads it back instead of
    launching a second count over the same parquet."""
    try:
        with open(manifest_path(work_dir, stage)) as fh:
            return int(json.load(fh).get("rows", -1))
    except (OSError, json.JSONDecodeError, TypeError, ValueError):
        return -1


def record_metrics(df: DataFrame, work_dir: str, stage: str, wall_sec: float | None = None) -> None:
    """Append per-partition lineage rows (stage, partition, rows) plus a
    stage summary row to the metrics table. ONE job: the per-partition
    counts collect to the driver (bounded by the partition count, never
    the row count) and feed both the lineage rows and the summary sum —
    the previous two-pass form re-ran the groupBy for the summary."""
    spark = df.sparkSession
    per_part = df.groupBy(F.spark_partition_id().alias("partition_id")).count().collect()
    rows = [
        (stage, "partition_rows", int(r["partition_id"]), int(r["count"]), wall_sec)
        for r in per_part
    ]
    rows.append((stage, "stage_rows", -1, sum(r["count"] for r in per_part), wall_sec))
    metrics_dir = os.path.join(work_dir, "metrics")
    spark.createDataFrame(
        rows, "stage string, kind string, partition_id int, rows bigint, wall_sec double"
    ).write.mode("append").parquet(metrics_dir)


def _hadoop_path_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence check via the JVM Hadoop FS API
    (works for file://, hdfs://, s3a://, ... — os.path.exists only
    sees the local filesystem)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf).exists(p)


def idempotent_upsert(
    df: DataFrame,
    path: str,
    key_col: str,
    num_buckets: int = 64,
) -> DataFrame:
    """S6: idempotent keyed upsert onto a parquet table, the engine
    analogue of the reference's deterministic-UUID upsert
    (reference src/indexing.py:154-169).

    Rows land in `bucket=pmod(xxhash64(key), num_buckets)` partitions.
    Only the buckets PRESENT IN THE BATCH are rewritten: existing rows
    of those buckets are read back, rows whose key appears in the new
    batch are dropped (new wins), and the merged bucket is overwritten
    via dynamic partition overwrite — untouched buckets' files are
    never rewritten. Re-running the same batch is a no-op by value:
    same keys -> same buckets -> same merged content. This is the
    MERGE-by-key discipline expressible on plain parquet; on Iceberg
    or Delta the same call maps to a native MERGE INTO.

    Duplicate keys WITHIN one batch are collapsed to an arbitrary
    single row first (dropDuplicates) — 'new wins' is otherwise
    unspecified inside a batch. Table existence is detected through
    the Hadoop FileSystem API, so HDFS/S3/ABFS paths work (a plain
    os.path.exists is local-only and would silently DROP pre-existing
    rows of touched buckets on remote filesystems)."""
    spark = df.sparkSession
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets)).cast("int")
    batch = df.dropDuplicates([key_col]).withColumn("bucket", bucket)
    if _hadoop_path_exists(spark, path):
        existing = spark.read.parquet(path)
        touched = batch.select("bucket").distinct()
        keep = (
            existing.join(F.broadcast(touched), on="bucket", how="left_semi")
            .join(batch.select(key_col).distinct(), on=key_col, how="left_anti")
        )
        # materialize before writing: the merged plan reads the same
        # path the dynamic overwrite rewrites, and Spark (correctly)
        # refuses to overwrite a path it is still reading from. Only
        # the touched buckets' survivors are held, not the table.
        merged = keep.select(*batch.columns).unionByName(batch).localCheckpoint()
    else:
        merged = batch
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(path)
    )
    return spark.read.parquet(path)


def read_labeled_pairs(spark: SparkSession, path: str) -> DataFrame:
    """S2: ground-truth labeled pairs source — CSV (with header) or
    parquet, normalized to the (left, right, match) contract the
    trainer consumes (reference src/preprocessing.py:237-247 reads the
    labeled CSV)."""
    if path.endswith(".csv") or path.endswith(".csv.gz"):
        df = spark.read.option("header", True).csv(path)
    else:
        df = spark.read.parquet(path)
    cols = {c.lower(): c for c in df.columns}
    left = cols.get("left") or cols.get("id1") or cols.get("record_id1")
    right = cols.get("right") or cols.get("id2") or cols.get("record_id2")
    match = cols.get("match") or cols.get("label") or cols.get("is_match")
    if not (left and right and match):
        raise ValueError(
            f"labeled pairs at {path} must carry left/right/match-like columns; got {df.columns}"
        )
    return df.select(
        F.col(left).cast("string").alias("left"),
        F.col(right).cast("string").alias("right"),
        F.col(match).cast("boolean").alias("match"),
    )


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
