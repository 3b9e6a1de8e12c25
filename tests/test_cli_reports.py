"""CLI entry point (reference main.py:100-178 semantics) + reporting
layer (reference src/reporting.py:85-160, src/classification.py:148-155)."""

import csv
import json
import os
import subprocess
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

from entity_resolution_pipeline_v1_spark import reports

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(*args):
    proc = subprocess.run(
        [sys.executable, "-m", "entity_resolution_pipeline_v1_spark", *args],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    work = str(tmp_path_factory.mktemp("cli_work"))
    out = _run_cli("--records", "120", "--work-dir", work, "--reset",
                   "--reports", "--cpus", "4")
    return work, out


def test_cli_fresh_run_and_resume(cli_run):
    cli_work, out = cli_run
    assert out["stage"] == "all" and out["rows"] > 0
    assert [s["name"] for s in out["stages"]] == [
        "extract", "preprocess", "unique_strings", "embed", "records_wide",
        "block", "pairs", "score", "classify", "cc_raw", "cluster",
    ]
    assert not any(s["skipped"] for s in out["stages"])
    # resume: identical invocation skips every stage
    out2 = _run_cli("--records", "120", "--work-dir", cli_work, "--cpus", "4")
    assert all(s["skipped"] for s in out2["stages"])
    assert out2["rows"] == out["rows"]
    # single-stage run stops early (uses the checkpoints)
    out3 = _run_cli("--records", "120", "--work-dir", cli_work, "--cpus", "4",
                    "--stage", "block")
    assert [s["name"] for s in out3["stages"]][-1] == "block"
    # report files exist
    rd = os.path.join(cli_work, "reports")
    for f in ["summary_report.json", "cluster_statistics.json",
              "confidence_histogram.csv", "cluster_size_distribution.csv",
              "model_parameters.json", "model_weights.csv",
              "feature_correlation.csv", "matches_per_entity.csv"]:
        assert os.path.exists(os.path.join(rd, f)), f
    assert os.path.isdir(os.path.join(rd, "match_pairs.csv"))


def test_cluster_statistics_against_duckdb(cli_run, spark):
    """The reported aggregates must equal a DuckDB recomputation over
    the same stage parquet."""
    cli_work, _ = cli_run
    stats = json.load(open(os.path.join(cli_work, "reports", "cluster_statistics.json")))
    con = duckdb.connect()
    row = con.execute(
        f"""SELECT count(*) n_clusters, sum(sz) n_records,
                   min(sz) min_size, max(sz) max_size, avg(sz) mean_size,
                   quantile_cont(sz, 0.5) median_size, stddev(sz) std_size
            FROM (SELECT cluster_id, count(*) sz
                  FROM read_parquet('{cli_work}/stage=cluster/*.parquet')
                  GROUP BY cluster_id)"""
    ).fetchone()
    assert stats["n_clusters"] == row[0]
    assert stats["n_records"] == row[1]
    assert stats["min_size"] == row[2] and stats["max_size"] == row[3]
    assert stats["mean_size"] == pytest.approx(row[4])
    assert stats["median_size"] == pytest.approx(row[5])
    assert stats["std_size"] == pytest.approx(row[6], rel=1e-9)


def test_feature_correlation_against_duckdb(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    X = rng.rand(200, 3)
    X[:, 2] = X[:, 0] * 0.8 + rng.rand(200) * 0.2
    df = spark.createDataFrame(
        [tuple(map(float, r)) for r in X], "a double, b double, c double"
    )
    out = {(r["f1"], r["f2"]): r["corr"]
           for r in reports.feature_correlation(df, ("a", "b", "c")).collect()}
    ref = np.corrcoef(X, rowvar=False)
    assert out[("a", "b")] == pytest.approx(ref[0, 1], abs=1e-9)
    assert out[("a", "c")] == pytest.approx(ref[0, 2], abs=1e-9)
    assert out[("b", "c")] == pytest.approx(ref[1, 2], abs=1e-9)
    assert out[("a", "c")] > 0.7


def test_matches_per_entity(spark):
    pairs = spark.createDataFrame(
        [("a", "b", 0.9), ("a", "c", 0.8), ("b", "c", 0.85)],
        "id1 string, id2 string, confidence double",
    )
    got = {r["record_id"]: r["n_matches"]
           for r in reports.matches_per_entity(pairs).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}
    stats = reports.matches_per_entity_stats(pairs)
    assert stats["n_entities"] == 3 and stats["mean_matches"] == pytest.approx(2.0)


def test_pairwise_metrics_counts_unlabeled_records_as_misses(spark):
    """A ground-truth match pair whose second record carries NO cluster
    label (CC only emits nodes on edges; size filters drop clusters)
    must count as a FALSE NEGATIVE, not vanish into a (True, NULL)
    confusion-matrix key and inflate recall (ADVICE r3-medium)."""
    labels = spark.createDataFrame(
        [("a", 1), ("b", 1)], "record_id string, cluster_id int"
    )
    truth = spark.createDataFrame(
        # (a,b) clustered together: tp. (a,x): x is a singleton with no
        # label row at all -> fn. (b,y): likewise fn.
        [("a", "b", True), ("a", "x", True), ("b", "y", True)],
        "left string, right string, match boolean",
    )
    m = reports.pairwise_metrics(labels, truth)
    assert m["tp"] == 1 and m["fn"] == 2 and m["fp"] == 0
    assert m["recall"] == pytest.approx(1 / 3)


def test_feature_means(spark):
    df = spark.createDataFrame(
        [(1.0, 0.2, True), (0.8, 0.4, True), (0.1, 0.9, False)],
        "f1 double, f2 double, is_match boolean",
    )
    got = {r["feature"]: (r["mean_match"], r["mean_non_match"])
           for r in reports.feature_means(df, ("f1", "f2")).collect()}
    assert got["f1"][0] == pytest.approx(0.9) and got["f1"][1] == pytest.approx(0.1)
    assert got["f2"][0] == pytest.approx(0.3) and got["f2"][1] == pytest.approx(0.9)


def test_idempotent_upsert(spark, tmp_path):
    from entity_resolution_pipeline_v1_spark.sources.sinks import idempotent_upsert

    path = str(tmp_path / "upsert")
    b1 = spark.createDataFrame(
        [("k1", "v1"), ("k2", "v2"), ("k3", "v3")], "k string, v string"
    )
    out1 = idempotent_upsert(b1, path, "k")
    assert out1.count() == 3
    # overlapping batch: k2 updated, k4 inserted; k1/k3 untouched
    b2 = spark.createDataFrame([("k2", "v2b"), ("k4", "v4")], "k string, v string")
    out2 = idempotent_upsert(b2, path, "k")
    got = {r["k"]: r["v"] for r in out2.collect()}
    assert got == {"k1": "v1", "k2": "v2b", "k3": "v3", "k4": "v4"}
    # replaying the same batch is a no-op by value
    out3 = idempotent_upsert(b2, path, "k")
    assert {r["k"]: r["v"] for r in out3.collect()} == got
    assert out3.groupBy("k").count().filter("count > 1").count() == 0
    # intra-batch duplicate keys collapse to ONE stored row
    b4 = spark.createDataFrame([("k5", "a"), ("k5", "b")], "k string, v string")
    out4 = idempotent_upsert(b4, path, "k")
    assert out4.filter("k = 'k5'").count() == 1


def test_read_labeled_pairs_csv(spark, tmp_path):
    from entity_resolution_pipeline_v1_spark.sources.sinks import read_labeled_pairs

    p = tmp_path / "labels.csv"
    p.write_text("id1,id2,label\nr1,r2,true\nr1,r3,false\n")
    df = read_labeled_pairs(spark, str(p))
    assert df.columns == ["left", "right", "match"]
    rows = {(r["left"], r["right"]): r["match"] for r in df.collect()}
    assert rows == {("r1", "r2"): True, ("r1", "r3"): False}


def test_error_analysis_reports(spark, tmp_path):
    """Confusion matrix / test-set summary / misclassified examples /
    potential misclassifications: schema + counts must agree with a
    hand-computed confusion matrix over a crafted labeled-scored set."""
    import csv as _csv

    rows = [
        # (id1, id2, match, confidence)
        ("a", "b", True, 0.95),   # TP
        ("c", "d", True, 0.80),   # TP
        ("e", "f", True, 0.40),   # FN (scored low)
        ("g", "h", True, None),   # FN (never a candidate)
        ("i", "j", False, 0.90),  # FP
        ("k", "l", False, 0.10),  # TN
        ("m", "n", False, 0.73),  # TN, near threshold (margin 0.05)
        ("o", "p", True, 0.77),   # TP, near threshold
    ]
    df = spark.createDataFrame(rows, "id1 string, id2 string, match boolean, confidence double")
    rd = str(tmp_path / "reports")
    summary = reports.error_analysis(df, rd, threshold=0.75, margin=0.05)
    assert (summary["tp"], summary["fp"], summary["fn"], summary["tn"]) == (3, 1, 2, 2)
    assert summary["n_pairs"] == 8
    assert summary["precision"] == round(3 / 4, 6)
    assert summary["recall"] == round(3 / 5, 6)

    cm = {
        (r["actual"], r["predicted"]): int(r["count"])
        for r in _csv.DictReader(open(os.path.join(rd, "confusion_matrix.csv")))
    }
    assert cm == {("True", "True"): 3, ("False", "True"): 1,
                  ("True", "False"): 2, ("False", "False"): 2}

    mis = list(_csv.DictReader(open(os.path.join(rd, "misclassified_examples.csv"))))
    assert len(mis) == 3  # 1 FP + 2 FN
    assert {m["id1"] for m in mis} == {"e", "g", "i"}
    # FN with NULL confidence (never a candidate) sorts first among FNs
    fns = [m for m in mis if m["actual"] == "True"]
    assert fns[0]["id1"] == "g" and fns[0]["confidence"] == ""

    near = json.load(open(os.path.join(rd, "potential_misclassifications.json")))
    assert {r["id1"] for r in near} == {"m", "o"}  # correct but within ±0.05
    assert os.path.exists(os.path.join(rd, "potential_misclassifications.csv"))
    ts = json.load(open(os.path.join(rd, "test_set_summary.json")))
    assert ts == summary
