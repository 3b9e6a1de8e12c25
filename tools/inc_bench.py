"""Incremental-attach throughput evidence (not part of the official
bench — run standalone; results recorded in BASELINE.md).

Measures the production question incremental ER answers: with a
clustered base corpus of N records, how much cheaper is attaching a
new batch of k records via ERPipeline.incremental than re-running the
full pipeline over N+k — at identical final output (the equivalence is
pinned by tests/test_incremental.py; this tool measures only wall
time).

Usage: python tools/inc_bench.py [base_records] [new_records] [cpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(base_n: int = 20000, new_n: int = 1000, cpus: int = 32) -> dict:
    from entity_resolution_pipeline_v1_spark.config import PipelineConfig
    from entity_resolution_pipeline_v1_spark.plans.pipeline import ERPipeline
    from entity_resolution_pipeline_v1_spark.session import get_spark
    from entity_resolution_pipeline_v1_spark.sources import pages as P

    spark = get_spark(app_name="inc-bench", cpus=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    corpus = P.generate_corpus(spark, n_records=base_n + new_n, seed=42).cache()
    corpus.count()
    is_new = F.pmod(F.xxhash64("url"), F.lit((base_n + new_n) // new_n)) == 0
    old = corpus.filter(~is_new).cache()
    new = corpus.filter(is_new).cache()
    n_old, n_new = old.count(), new.count()

    tmp = tempfile.mkdtemp(prefix="inc_bench_")
    try:
        # full rerun over N+k: what a deployment without incremental pays
        t0 = time.time()
        full_pipe = ERPipeline(spark, PipelineConfig(checkpoint_dir=f"{tmp}/full"))
        full_labels = full_pipe.run(P.pages_view(corpus))
        full_labels.count()
        full_sec = time.time() - t0

        # base run (untimed setup), then the timed incremental attach
        base_pipe = ERPipeline(spark, PipelineConfig(checkpoint_dir=f"{tmp}/base"))
        base_pipe.run(P.pages_view(old))
        t0 = time.time()
        inc_labels = base_pipe.incremental(P.pages_view(new))
        inc_labels.count()
        inc_sec = time.time() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    return {
        "metric": "incremental_attach_speedup",
        "base_records": n_old,
        "new_records": n_new,
        "full_rerun_sec": round(full_sec, 2),
        "incremental_sec": round(inc_sec, 2),
        "speedup": round(full_sec / max(inc_sec, 1e-9), 2),
        "cpus": cpus,
        "inc_stages": {
            r.name: [r.rows, round(r.wall_sec, 2)]
            for r in base_pipe.results
            if r.name.startswith("inc")
        },
        "full_stages": {
            r.name: [r.rows, round(r.wall_sec, 2)] for r in full_pipe.results
        },
    }


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    print(json.dumps(main(*args)))
