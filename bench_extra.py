#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times each named query with
the noop sink so the computation — not the count()-pruned subtree or a
real sink — is what's measured, and dumps .explain("formatted") to
plans/r06/<query>_<tag>.txt.

Usage:
  python bench_extra.py [--sf-dir DIR] [--tag before|after] [--plans]
                        [--repeat N] q1 q2 ...
  (no query names = the full bench.HEADLINE list)

This file is NOT bench.py: the frozen driver contract stays untouched.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = SF_DIR
    tag = "before"
    dump_plans = False
    repeat = 1
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf-dir":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--tag":
            tag = args[i + 1]
            i += 2
        elif a == "--repeat":
            repeat = int(args[i + 1])
            i += 2
        elif a == "--plans":
            dump_plans = True
            i += 1
        else:
            names.append(a)
            i += 1

    import __spark_entry__ as E
    import bench
    from entity_resolution_pipeline_v1_spark.session import get_spark

    if not names:
        names = list(bench.HEADLINE)
        names.remove("er_pipeline") if "er_pipeline" in names else None

    spark = get_spark(app_name="bench_extra", cpus=CPUS)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = E.queries()
    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plan_dir, exist_ok=True)
    timings: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        if dump_plans:
            df = fn(spark, sf_dir)
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        for _ in range(repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings.setdefault(name, []).append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: timings[name]}), flush=True)
    out = {
        "sf_dir": sf_dir,
        "cpus": CPUS,
        "tag": tag,
        "sink": "noop",
        "timings": {k: min(v) for k, v in timings.items()},
        "samples": timings,
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
