"""Driver-contract test: every queries() entry vs its DuckDB oracle.

Mimics the driver's CORRECTNESS check (row-count + column names +
order-insensitive value comparison) at sf0.001 so mismatches surface
in pytest before the driver runs sf0.01.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t)}.parquet'"
        )
    return con


def _canon(rows, cols):
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, bool):
            return str(v).lower()
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{round(v, 6):.6f}"
        if isinstance(v, int):
            return str(v)
        return repr(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = E.queries()[name]
    sdf = q(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    res = duck.execute(E.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sc, dc = _canon(srows, scols), _canon(drows, dcols)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_rows_only_queries_run(spark):
    for name in set(E.queries()) - set(E.oracle_sql()):
        df = E.queries()[name](spark, SF_DIR)
        assert df.count() >= 0
        assert df.columns


def test_entry_runs(spark):
    df = E.entry(spark)
    assert df.columns
    assert df.count() >= 0


# Golden-hash pins for the sketch queries, kept ALONGSIDE the DuckDB
# oracles (round 5 upgraded all four to full oracle rows): the hashes
# freeze the exact sketch definitions (fixed seeds, sketches.py), so a
# definition drift is caught even if both engines drift together.
# Regenerate with tools/golden_hashes.py if changed ON PURPOSE.
GOLDEN_HASHES = {
    "simhash_docs": "3d02d5a1a719d7b6e195f7e0000071d1",  # 500 rows
    "minhash_near_dup": "26925a51e9dbca7143bbeea6a6efd94b",  # 28 rows
    "winnow_docs": "5c25c58c90e4367d93935612b778a245",  # 43698 rows (scalar explode)
    "winnow_dedup": "3fc8365f0494b5b51669d52e4b4f4c87",  # 28 rows
}


@pytest.mark.parametrize("name", sorted(GOLDEN_HASHES))
def test_sketch_queries_golden_hash(spark, name):
    import hashlib

    df = E.queries()[name](spark, SF_DIR)
    rows = sorted(tuple(r) for r in df.collect())
    got = hashlib.md5(repr(rows).encode()).hexdigest()
    assert got == GOLDEN_HASHES[name], (
        f"{name}: output drifted from the pinned golden hash "
        f"({got} != {GOLDEN_HASHES[name]}); if the sketch definition "
        f"changed intentionally, regenerate with tools/golden_hashes.py"
    )
