#!/usr/bin/env python
"""Regenerate the pinned golden hashes in tests/test_entry_oracle.py
for the sketch queries DuckDB cannot oracle (simhash_docs,
minhash_near_dup). Run, then paste the printed values into
GOLDEN_HASHES."""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from entity_resolution_pipeline_v1_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

if __name__ == "__main__":
    spark = get_spark(app_name="golden-hashes", cpus=8)
    for name in ("simhash_docs", "minhash_near_dup", "winnow_docs", "winnow_dedup"):
        df = E.queries()[name](spark, SF_DIR)
        rows = sorted(tuple(r) for r in df.collect())
        h = hashlib.md5(repr(rows).encode()).hexdigest()
        print(f'    "{name}": "{h}",  # {len(rows)} rows')
    spark.stop()
