"""Readers for the driver-provided testdata tables and generic IO.

Parquet is the canonical storage; an Iceberg catalog would slot in by
swapping the format string (jars not present in this image, so the
reader is format-parameterized and Iceberg is gated behind a try).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a persisted pages table. `fmt='iceberg'` works when the
    runtime ships the Iceberg connector; parquet otherwise."""
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").load(path)
        except Exception:  # connector not on classpath in this image
            pass
    return spark.read.parquet(path)
