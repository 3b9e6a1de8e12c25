"""spark-submit-able CLI for the ER pipeline.

Mirrors the reference's click CLI semantics (reference main.py:100-178:
--stage/--mode/--reset, per-stage timing) on argparse (no third-party
CLI dependency — spark-submit environments are lean):

    spark-submit --py-files erp.zip -m entity_resolution_pipeline_v1_spark ...
    python -m entity_resolution_pipeline_v1_spark \
        --input /data/pages.parquet --work-dir /tmp/er_work --stage all

With no --input, --records N generates the deterministic synthetic
corpus (dev mode; the reference's dev-mode record limit P9 maps to
--records). --reset wipes the work dir first; otherwise completed
stages resume from checkpoint. Exit prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time

STAGES = (
    "extract", "preprocess", "unique_strings", "embed", "records_wide",
    "block", "pairs", "score", "classify", "cluster",
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="entity_resolution_pipeline_v1_spark",
        description="PySpark-native entity-resolution pipeline",
    )
    p.add_argument("--input", help="parquet path with pages(url, warc_ts, html, text, lang)")
    p.add_argument("--records", type=int, default=1000,
                   help="dev mode: generate a synthetic corpus of N records (used when --input absent)")
    p.add_argument("--work-dir", default="/tmp/erp_spark_work",
                   help="checkpoint/work directory (stages resume from here)")
    p.add_argument("--stage", default="all", choices=("all", *STAGES),
                   help="run up to and including this stage (default: all)")
    p.add_argument("--reset", action="store_true", help="wipe the work dir before running")
    p.add_argument("--model", help="path to a model JSON (skip training)")
    p.add_argument("--train-labels", help="parquet path with (left, right, match) labeled pairs")
    p.add_argument("--reports", action="store_true", help="write the report file set")
    p.add_argument("--clusters-out", help="also write the cluster JSONL to this path")
    p.add_argument("--cpus", type=int, default=None, help="local[] core count (default: env/all)")
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from .config import PipelineConfig
    from .operators.classify import Model
    from .plans.pipeline import ERPipeline
    from .session import get_spark
    from .sources import pages as P
    from .sources.sinks import write_clusters_jsonl

    if args.reset:
        shutil.rmtree(args.work_dir, ignore_errors=True)

    spark = get_spark(app_name="erp-cli", cpus=args.cpus)
    cfg = PipelineConfig(checkpoint_dir=args.work_dir, generate_reports=args.reports)

    if args.input:
        pages = spark.read.parquet(args.input)
    else:
        pages = P.pages_view(P.generate_corpus(spark, n_records=args.records, seed=args.seed))

    model = Model.load(args.model) if args.model else None
    labels_df = spark.read.parquet(args.train_labels) if args.train_labels else None

    pipe = ERPipeline(spark, cfg)
    t0 = time.time()
    out = pipe.run(
        pages,
        labeled_pairs=labels_df,
        model=model,
        until=None if args.stage == "all" else args.stage,
    )
    n = out.count()
    wall = time.time() - t0
    if args.clusters_out and args.stage in ("all", "cluster"):
        write_clusters_jsonl(out, args.clusters_out)
    for r in pipe.results:
        status = "skipped" if r.skipped else f"{r.wall_sec:.1f}s rows={r.rows}"
        print(f"stage {r.name}: {status}", file=sys.stderr)
    print(json.dumps({
        "stage": args.stage,
        "rows": n,
        "wall_sec": round(wall, 2),
        "work_dir": args.work_dir,
        "stages": [
            {"name": r.name, "rows": r.rows, "wall_sec": round(r.wall_sec, 2),
             "skipped": r.skipped}
            for r in pipe.results
        ],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
