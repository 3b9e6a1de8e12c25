"""SparkSession factory tuned for this engine.

Local-mode settings mirror what the production submit
(``spark-submit --py-files``) would set cluster-side: AQE on
(runtime coalescing + skew-join splitting), Arrow transport for the
pandas-UDF surface, UTC session timezone so DuckDB oracle comparisons
are stable, and shuffle partitions sized to cores rather than the
200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


_MIN_SHM_FREE_BYTES = 8 << 30  # need real headroom before trusting tmpfs


def _local_dir() -> str:
    """Pick spark.local.dir: explicit $SPARK_GRAFT_LOCAL_DIR wins;
    otherwise /dev/shm when it has >=8GB free (RAM-backed shuffle),
    else the standard disk temp dir."""
    explicit = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if explicit:
        return explicit
    try:
        st = os.statvfs("/dev/shm")
        if st.f_bavail * st.f_frsize >= _MIN_SHM_FREE_BYTES:
            return "/dev/shm/spark-local"
    except OSError:
        pass
    import tempfile

    return os.path.join(tempfile.gettempdir(), "spark-local")


def get_spark(
    app_name: str = "entity_resolution_pipeline_v1_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores. On a real
    cluster these settings travel unchanged; only ``master`` differs.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    # CRITICAL for the pandas-UDF hot path: every Spark task gets its
    # own Python worker, and numpy's BLAS would otherwise spawn a FULL
    # set of threads PER WORKER (cores² threads total). Measured here:
    # the 2.5M-pair scoring stage runs 163s at local[32] with default
    # BLAS threading vs 38s pinned to 1 thread per worker. Parallelism
    # belongs to Spark's task scheduler, not to BLAS.
    for var in (
        "OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
        "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS",
    ):
        os.environ.setdefault(var, "1")

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # scan-parallelism FLOOR, derived from core count (not a byte
        # constant): a 100-200MB single-file input splits into at most
        # bytes/128MB tasks under the default maxPartitionBytes, so a
        # 6M-row lineitem scan feeds its partial aggregates from 1-2
        # tasks while 30 cores idle. minPartitionNum makes the planner
        # shrink splits until the scan has at least `cpus` of them —
        # a no-op at cluster scale where inputs already carry more
        # splits than cores. (Splitting cannot cross parquet row-group
        # boundaries; single-row-group files still need an explicit
        # repartition — see operators/util.ensure_parallelism.)
        .config("spark.sql.files.minPartitionNum", str(cpus))
        # shuffle/spill space: RAM-backed when /dev/shm is roomy (the
        # local analogue of the NVMe scratch a real cluster provisions
        # per executor — this host's root disk writes at ~370 MB/s and
        # would serialize vector-fat shuffles), but only after probing
        # free space: containers often cap /dev/shm at 64MB, where
        # shuffles would die with ENOSPC instead of degrading to disk
        .config("spark.local.dir", _local_dir())
        # same single-threaded-BLAS discipline on real cluster executors
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
