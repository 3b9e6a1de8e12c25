"""Structured-Streaming ingest: incremental pages -> block keys.

The reference is pure batch (SURVEY.md §2.13); this module is the
v1 incremental-ingest surface, not a port of anything: new page files
stream in, text is extracted and block keys are emitted append-only,
so a downstream batch job only re-pairs the affected blocks. Windowed
page-rate stats come with a watermark for late WARC timestamps.

Local smoke path: file-source parquet stream + memory sink driven by
processAllAvailable() (synchronous, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import blocking, extract, preprocess

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_pages_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def block_keys_stream(pages_stream: DataFrame) -> DataFrame:
    """Streaming extract -> parse -> block-key emission (stateless, so
    it runs in append mode with no shuffle-state)."""
    extracted = extract.extract_text(pages_stream, mode="main")
    records = preprocess.parse_records(extracted)
    return blocking.build_blocks(records, use_sorted_neighborhood=False)


def page_rate_stats(pages_stream: DataFrame, window: str = "1 minute") -> DataFrame:
    """Watermarked per-lang page counts per event-time window."""
    return (
        pages_stream.withWatermark("warc_ts", "10 minutes")
        .groupBy(F.window("warc_ts", window), "lang")
        .agg(F.count("*").alias("n_pages"))
    )


def incremental_attach_writer(pages_stream: DataFrame, pipe) -> "DataStreamWriter":
    """Stream pages INTO the batch-maintained clustering: each
    micro-batch runs ERPipeline.incremental (delta-proportional
    scoring + touched-component CC merge, plans/pipeline.py), the
    standard Spark pattern for maintaining a batch index from a stream
    (foreachBatch). Returns the un-started writer so the caller picks
    trigger/checkpointLocation; empty micro-batches are skipped.

    The per-batch work is a batch job, so exactly-once hinges on
    incremental()'s record-id anti-join: a replayed micro-batch after
    a crash re-parses but then drops every already-ingested record,
    yielding an empty increment — labels are untouched and nothing is
    double-counted."""

    def _attach(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pipe.incremental(batch_df)

    return pages_stream.writeStream.outputMode("append").foreachBatch(_attach)


def run_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drive a streaming query to completion against a memory sink
    (smoke-test harness)."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
