"""Diagnose the bimodal local[8] scoring throughput: run the exact
score-worker workload with event logging on, then summarize per-stage
task metrics (cpu, GC, spill, peak memory) from the event log.

Usage: python tools/score_spill_diag.py <fixture_dir> <cpus> [tag]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

fixture_dir, cpus = sys.argv[1], int(sys.argv[2])
tag = sys.argv[3] if len(sys.argv) > 3 else "diag"
os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
log_dir = f"/tmp/sparklogs_{tag}"
os.makedirs(log_dir, exist_ok=True)

from pyspark.sql import functions as F  # noqa: E402

from entity_resolution_pipeline_v1_spark.config import PipelineConfig  # noqa: E402
from entity_resolution_pipeline_v1_spark.operators import classify, features  # noqa: E402
from entity_resolution_pipeline_v1_spark.operators.features import (  # noqa: E402
    EXTRA_FEATURE_NAMES,
)
from entity_resolution_pipeline_v1_spark.session import get_spark  # noqa: E402

spark = get_spark(
    app_name=f"spill-diag-{tag}",
    cpus=cpus,
    shuffle_partitions=cpus * 4,
    extra_conf={
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": log_dir,
    },
)
cfg = PipelineConfig()
cand = spark.read.parquet(f"{fixture_dir}/cand")
wide = spark.read.parquet(f"{fixture_dir}/wide")
n_pairs_est = cand.count()
sp = max(cpus * 4, -(-n_pairs_est // 200_000))
spark.conf.set("spark.sql.shuffle.partitions", str(sp))


def run_agg(c):
    featured = features.staged_feature_matrix(c, wide, dim=cfg.embedding_dim)
    df = classify.classify_pairs(
        featured, classify.Model.golden(), cfg,
        year_match_col=F.col("year_match"), keep_columns=EXTRA_FEATURE_NAMES,
    )
    aggs = [F.count("*").alias("n"), F.sum("confidence").alias("s_conf")] + [
        F.sum(x).alias(f"s_{x}") for x in EXTRA_FEATURE_NAMES
    ]
    return df.agg(*aggs).collect()[0]


run_agg(cand.limit(20_000))  # warmup
t0 = time.time()
row = run_agg(cand)
sec = time.time() - t0
app_id = spark.sparkContext.applicationId
print(json.dumps({"pairs": int(row["n"]), "sec": round(sec, 2),
                  "pairs_per_sec": round(int(row["n"]) / sec, 1)}), flush=True)
spark.stop()
time.sleep(2)

# summarize the event log per stage
stages: dict[int, dict] = {}
path = glob.glob(f"{log_dir}/{app_id}*")[0]
for ln in open(path):
    try:
        ev = json.loads(ln)
    except json.JSONDecodeError:
        continue
    if ev.get("Event") == "SparkListenerTaskEnd":
        sid = ev["Stage ID"]
        m = ev.get("Task Metrics") or {}
        s = stages.setdefault(sid, {
            "tasks": 0, "run_ms": 0, "cpu_ms": 0, "gc_ms": 0,
            "mem_spill": 0, "disk_spill": 0, "peak_mem": 0,
        })
        s["tasks"] += 1
        s["run_ms"] += m.get("Executor Run Time", 0)
        s["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
        s["gc_ms"] += m.get("JVM GC Time", 0)
        s["mem_spill"] += m.get("Memory Bytes Spilled", 0)
        s["disk_spill"] += m.get("Disk Bytes Spilled", 0)
        s["peak_mem"] = max(s["peak_mem"], m.get("Peak Execution Memory", 0))

total_cpu = sum(s["cpu_ms"] for s in stages.values())
print(f"total executor cpu: {total_cpu/1000:.1f}s across {len(stages)} stages")
for sid in sorted(stages, key=lambda k: -stages[k]["cpu_ms"])[:10]:
    s = stages[sid]
    print(
        f"stage {sid}: tasks={s['tasks']} cpu={s['cpu_ms']/1000:.1f}s "
        f"run={s['run_ms']/1000:.1f}s gc={s['gc_ms']/1000:.1f}s "
        f"spill_mem={s['mem_spill']>>20}MB spill_disk={s['disk_spill']>>20}MB "
        f"peak_exec_mem={s['peak_mem']>>20}MB"
    )
