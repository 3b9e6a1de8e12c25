"""Stateful streaming candidate pairs (applyInPandasWithState).

Contract: the union of pairs emitted across micro-batches equals the
batch self-join's pairs on the same block table (per key family), each
cross-batch pair arriving exactly once — plus the hot-key state cap
and replay idempotence that make the operator's state bounded.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from entity_resolution_pipeline_v1_spark.streaming import pairs as SP

BLOCKS_DDL = "record_id string, block_key string"


def _drive(spark, blocks_dir, max_block_size=2000, max_files=1, name="sp_out"):
    stream = (
        spark.readStream.schema(BLOCKS_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(blocks_dir)
    )
    out = SP.streaming_candidate_pairs(stream, max_block_size=max_block_size)
    q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"select * from {name}")


def _batch_pairs(spark, blocks_dir):
    from entity_resolution_pipeline_v1_spark.operators import pairs as BP

    return {
        (r["id1"], r["id2"])
        for r in BP.candidate_pairs(spark.read.parquet(blocks_dir)).collect()
    }


def test_stream_pairs_match_batch_self_join(spark, tmp_path):
    """Many micro-batches, interleaved keys: the emitted pair set
    (deduped across key families, exactly like batch) must equal
    candidate_pairs on the same block table."""
    rows = []
    for i in range(40):
        rows.append((f"r{i:02d}", f"k{i % 5}"))      # 5 blocks of 8
        if i % 3 == 0:
            rows.append((f"r{i:02d}", "shared"))     # second family key
    df = spark.createDataFrame(rows, BLOCKS_DDL)
    blocks_dir = str(tmp_path / "blocks")
    # 8 files -> 8 micro-batches with maxFilesPerTrigger=1
    df.repartition(8).write.mode("overwrite").parquet(blocks_dir)

    got_df = _drive(spark, blocks_dir, name="sp_parity")
    got = {(r["id1"], r["id2"]) for r in got_df.dropDuplicates(["id1", "id2"]).collect()}
    assert got == _batch_pairs(spark, blocks_dir) and got

    # exactly-once per key family: no duplicate (key, pair) rows even
    # though records arrived across many micro-batches
    assert got_df.count() == got_df.dropDuplicates(["block_key", "id1", "id2"]).count()


def test_stream_pairs_hot_key_cap_bounds_state_and_output(spark, tmp_path):
    """A celebrity key stops emitting once its state holds
    max_block_size ids: output is capped at C(cap, 2) pairs instead of
    C(n, 2), and the state never grows past the cap."""
    rows = [(f"h{i:03d}", "hot") for i in range(30)] + [
        (f"c{i}", "cold") for i in range(3)
    ]
    blocks_dir = str(tmp_path / "blocks_hot")
    spark.createDataFrame(rows, BLOCKS_DDL).repartition(4).write.mode(
        "overwrite"
    ).parquet(blocks_dir)

    got = _drive(spark, blocks_dir, max_block_size=5, name="sp_hot")
    hot = got.filter(F.col("block_key") == "hot").count()
    cold = got.filter(F.col("block_key") == "cold").count()
    assert hot == 5 * 4 // 2  # C(5,2), not C(30,2)=435
    assert cold == 3  # under the cap: full C(3,2)=3


def test_stream_pairs_replay_is_idempotent(spark, tmp_path):
    """Appending the SAME records again (a replayed upstream export)
    emits zero new pairs — ids already in state are skipped."""
    rows = [(f"r{i}", "k") for i in range(6)]
    blocks_dir = str(tmp_path / "blocks_replay")
    df = spark.createDataFrame(rows, BLOCKS_DDL).coalesce(1)
    df.write.mode("overwrite").parquet(blocks_dir)

    stream = (
        spark.readStream.schema(BLOCKS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(blocks_dir)
    )
    out = SP.streaming_candidate_pairs(stream)
    q = out.writeStream.outputMode("append").format("memory").queryName("sp_rp").start()
    try:
        q.processAllAvailable()
        n1 = spark.sql("select * from sp_rp").count()
        assert n1 == 6 * 5 // 2
        df.write.mode("append").parquet(blocks_dir)  # replay identical rows
        q.processAllAvailable()
        assert spark.sql("select * from sp_rp").count() == n1
    finally:
        q.stop()
