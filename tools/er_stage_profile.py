"""Per-stage wall-clock profile of the bench er_throughput workload.

Answers round-4's question: er_pairs_per_sec is ~5.8k at local[32]
while the scoring-only fixture does 140k/s at local[8] — so which
NON-scoring stage eats the 103s? Each stage is forced with the same
materialization the bench uses (parquet checkpoint on tmpfs or an
aggregate), timed separately.

Usage: python tools/er_stage_profile.py [n_records] [cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32

from pyspark.sql import functions as F  # noqa: E402

from entity_resolution_pipeline_v1_spark.config import PipelineConfig  # noqa: E402
from entity_resolution_pipeline_v1_spark.operators import (  # noqa: E402
    blocking,
    classify,
    extract,
    features,
    pairs,
    preprocess,
)
from entity_resolution_pipeline_v1_spark.plans.pipeline import _no_aqe_coalesce  # noqa: E402
from entity_resolution_pipeline_v1_spark.session import get_spark  # noqa: E402
from entity_resolution_pipeline_v1_spark.sources import pages as P  # noqa: E402

spark = get_spark(app_name="er-stage-profile", cpus=CPUS)
cfg = PipelineConfig()
base = "/dev/shm" if os.path.isdir("/dev/shm") else None
work = tempfile.mkdtemp(prefix="er_prof_", dir=base)
walls: dict[str, float] = {}


def timed(name):
    class _T:
        def __enter__(self):
            self.t0 = time.time()

        def __exit__(self, *a):
            walls[name] = round(time.time() - self.t0, 2)
            print(f"  {name}: {walls[name]}s", flush=True)

    return _T()


def ckpt(df, name):
    path = f"{work}/{name}"
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


with _no_aqe_coalesce(spark):
    with timed("generate+extract+parse(records ckpt)"):
        corpus = P.generate_corpus(spark, n_records=N, seed=42)
        ext = extract.extract_text(P.pages_view(corpus), mode="main")
        records = ckpt(preprocess.parse_records(ext), "records")

    with timed("unique_strings+embed"):
        uniq = preprocess.unique_strings(preprocess.long_form(records))
        emb = preprocess.embed_unique(uniq, cfg.embedding_dim)
        emb.write.mode("overwrite").parquet(f"{work}/emb")
        emb = spark.read.parquet(f"{work}/emb")

    with timed("records_wide ckpt"):
        wide = ckpt(preprocess.records_wide(records, emb), "wide")

    with timed("blocks ckpt"):
        blocks = ckpt(
            blocking.cap_blocks(blocking.build_blocks(records), cfg.max_block_size),
            "blocks",
        )

    with timed("candidate_pairs ckpt"):
        par = spark.sparkContext.defaultParallelism * 2
        cand = ckpt(pairs.candidate_pairs(blocks).repartition(par), "cand")

    with timed("score(features+classify+agg)"):
        featured = features.staged_feature_matrix(cand, wide, dim=cfg.embedding_dim)
        model = classify.Model.golden()
        scored = classify.classify_pairs(
            featured, model, cfg, year_match_col=F.col("year_match")
        )
        row = scored.agg(
            F.count("*").alias("n"), F.sum("confidence").alias("s")
        ).collect()[0]

total = round(sum(walls.values()), 2)
print(
    json.dumps(
        {
            "n_records": N,
            "cpus": CPUS,
            "pairs": int(row["n"]),
            "total_sec": total,
            "pairs_per_sec": round(int(row["n"]) / total, 1),
            "stages": walls,
        }
    )
)
shutil.rmtree(work, ignore_errors=True)
spark.stop()
