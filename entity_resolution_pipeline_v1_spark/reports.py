"""Reporting layer: the file outputs users of the reference read daily.

Mirrors the reference's report suite (reference src/reporting.py:85-160
summary + detailed reports, src/analysis.py:1271-1384 cluster/entity
statistics, src/classification.py:148-155 feature correlation) on
Spark terms: every aggregate is computed distributed as a DataFrame —
one agg pass each — and only the tiny aggregate results land on the
driver for the JSON/CSV files. The one potentially-large artifact
(match_pairs) is written as a distributed CSV directory, never
collect()ed.

Layout under <work_dir>/reports:
    summary_report.json            run-level counts + stage walls
    match_pairs.csv/               (id1, id2, confidence) distributed CSV
    confidence_histogram.csv       20 fixed bins (reporting.py:350-414)
    cluster_statistics.json        size min/max/mean/median/std
    cluster_size_distribution.csv  (size, n_clusters)
    matches_per_entity.csv         per-entity match-count stats (A7)
    model_parameters.json          weights/bias/threshold (+train stats)
    model_weights.csv              (feature, weight) rows
    feature_correlation.csv        (f1, f2, corr) upper triangle (A12)
"""

from __future__ import annotations

import csv
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.classify import Model


def _ensure(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def pairwise_metrics(labels: DataFrame, labeled_pairs: DataFrame) -> dict:
    """Pairwise precision/recall/F1 of cluster labels against labeled
    ground-truth pairs (left, right, match) — the BASELINE.json quality
    metric, computed as one distributed confusion-matrix agg."""
    lab = labeled_pairs.withColumnRenamed("left", "id1").withColumnRenamed("right", "id2")
    l1 = labels.select(F.col("record_id").alias("id1"), F.col("cluster_id").alias("c1"))
    l2 = labels.select(F.col("record_id").alias("id2"), F.col("cluster_id").alias("c2"))
    j = (
        lab.join(l1, "id1", "left")
        .join(l2, "id2", "left")
        # coalesce to False: labels genuinely miss records (CC only emits
        # nodes on edges; size filters drop clusters), and `c1 == c2`
        # with one NULL side yields NULL — those ground-truth pairs
        # would land in groupBy key (True, NULL), silently escaping fn
        # and inflating the recall/F1 this function gates at >= 0.99
        .withColumn(
            "pred",
            F.coalesce(
                F.col("c1").isNotNull()
                & F.col("c2").isNotNull()
                & (F.col("c1") == F.col("c2")),
                F.lit(False),
            ),
        )
    )
    cm = {(r["match"], r["pred"]): r["count"] for r in j.groupBy("match", "pred").count().collect()}
    tp = cm.get((True, True), 0)
    fn = cm.get((True, False), 0)
    fp = cm.get((False, True), 0)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    return {"precision": round(prec, 6), "recall": round(rec, 6), "f1": round(f1, 6),
            "tp": tp, "fp": fp, "fn": fn}


# -- distributed aggregates -------------------------------------------------

def confidence_histogram(scored: DataFrame, bins: int = 20,
                         conf_col: str = "confidence") -> DataFrame:
    """(bin, n) over fixed-width bins (reference reporting.py:383-395)."""
    b = F.least(F.floor(F.col(conf_col) * bins), F.lit(bins - 1)).cast("int")
    return scored.select(b.alias("bin")).groupBy("bin").count().withColumnRenamed("count", "n")


def cluster_size_distribution(labels: DataFrame) -> DataFrame:
    """(size, n_clusters) (reference reporting.py:458-469)."""
    sizes = labels.groupBy("cluster_id").count().withColumnRenamed("count", "size")
    return sizes.groupBy("size").count().withColumnRenamed("count", "n_clusters")


def cluster_statistics_df(labels: DataFrame) -> DataFrame:
    """One-row DataFrame of cluster size stats
    (reference reporting.py:471-486, analysis.py:1271-1384)."""
    sizes = labels.groupBy("cluster_id").count().withColumnRenamed("count", "size")
    return sizes.agg(
        F.count("*").alias("n_clusters"),
        F.sum("size").alias("n_records"),
        F.min("size").alias("min_size"),
        F.max("size").alias("max_size"),
        F.avg("size").alias("mean_size"),
        F.expr("percentile(size, 0.5)").alias("median_size"),
        F.stddev("size").alias("std_size"),
    )


def cluster_statistics(labels: DataFrame) -> dict:
    row = cluster_statistics_df(labels).collect()[0]
    return {k: (float(v) if v is not None else None) for k, v in row.asDict().items()}


def matches_per_entity(pairs: DataFrame, id1: str = "id1", id2: str = "id2") -> DataFrame:
    """(record_id, n_matches): how many accepted match edges touch each
    entity (A7, reference analysis.py 'most connected entities').

    Both endpoints come out of ONE pass over the pair frame
    (explode of a 2-element array) instead of a union of two selects:
    the union form plants the pairs subtree twice in the plan, so an
    expensive upstream (a distinct over millions of candidate edges)
    executes twice unless exchange reuse happens to fire. Same row
    multiset either way."""
    both = pairs.select(
        F.explode(F.array(F.col(id1), F.col(id2))).alias("record_id")
    )
    return both.groupBy("record_id").count().withColumnRenamed("count", "n_matches")


def matches_per_entity_stats(pairs: DataFrame) -> dict:
    row = matches_per_entity(pairs).agg(
        F.count("*").alias("n_entities"),
        F.min("n_matches").alias("min_matches"),
        F.max("n_matches").alias("max_matches"),
        F.avg("n_matches").alias("mean_matches"),
    ).collect()[0]
    return {k: (float(v) if v is not None else None) for k, v in row.asDict().items()}


def feature_means(
    featured: DataFrame, names: tuple[str, ...], label_col: str = "is_match"
) -> DataFrame:
    """A11: per-feature means split by match label, one distributed agg
    (reference src/analysis.py feature statistics of true matches).
    Output: (feature, mean_match, mean_non_match)."""
    agg = featured.groupBy(F.col(label_col).cast("boolean").alias("_m")).agg(
        *[F.avg(n).alias(n) for n in names]
    )
    rows = {r["_m"]: r for r in agg.collect()}
    spark = featured.sparkSession
    data = [
        (
            n,
            float(rows[True][n]) if True in rows and rows[True][n] is not None else None,
            float(rows[False][n]) if False in rows and rows[False][n] is not None else None,
        )
        for n in names
    ]
    return spark.createDataFrame(
        data, "feature string, mean_match double, mean_non_match double"
    )


def feature_correlation(featured: DataFrame, names: tuple[str, ...]) -> DataFrame:
    """Pearson correlation for every feature pair i<j, computed in ONE
    distributed agg pass (k*(k-1)/2 F.corr aggregates map-side-combined
    together), then unpivoted to (f1, f2, corr) rows. The Spark-native
    form of the reference's np.corrcoef over test features
    (src/classification.py:148-155)."""
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]
    aggs = [F.corr(a, b).alias(f"{a}|{b}") for a, b in pairs]
    row = featured.agg(*aggs)
    stack_args = ", ".join(f"'{a}', '{b}', `{a}|{b}`" for a, b in pairs)
    return row.select(
        F.expr(f"stack({len(pairs)}, {stack_args}) as (f1, f2, corr)")
    )


def confusion_matrix_df(labeled_scored: DataFrame, threshold: float) -> DataFrame:
    """(actual, predicted, count) over labeled scored pairs — all four
    cells present (zero-filled). ``labeled_scored`` carries (match,
    confidence); a NULL confidence (pair never became a candidate)
    predicts False, exactly like pairwise_metrics' coalesce."""
    pred = F.coalesce(F.col("confidence") >= F.lit(threshold), F.lit(False))
    cm = (
        labeled_scored.select(F.col("match").cast("boolean").alias("actual"), pred.alias("predicted"))
        .groupBy("actual", "predicted")
        .agg(F.count("*").alias("count"))
    )
    spark = labeled_scored.sparkSession
    cells = spark.createDataFrame(
        [(a, p) for a in (True, False) for p in (True, False)],
        "actual boolean, predicted boolean",
    )
    return cells.join(cm, on=["actual", "predicted"], how="left").select(
        "actual", "predicted", F.coalesce(F.col("count"), F.lit(0)).alias("count")
    )


def error_analysis(
    labeled_scored: DataFrame,
    reports_dir: str,
    threshold: float,
    top_n: int = 100,
    margin: float = 0.05,
    feature_names: tuple[str, ...] = (),
) -> dict:
    """The error-analysis report set the reference's users read daily
    (reference src/reporting.py:85-160; output/detailed/
    confusion_matrix.csv, test_set_summary.json,
    misclassified_examples.csv, potential_misclassifications.{csv,json}).

    ``labeled_scored``: (id1, id2, match, confidence[, feature cols…])
    — labeled ground-truth pairs scored by the classifier (NULL
    confidence = never a candidate → predicted False).

    Everything is computed distributed; only the four-cell confusion
    matrix and the top-N example rows (bounded by construction) land on
    the driver. Returns the test_set_summary dict."""
    _ensure(reports_dir)
    pred = F.coalesce(F.col("confidence") >= F.lit(threshold), F.lit(False))
    scored = labeled_scored.withColumn("predicted", pred).withColumn(
        "actual", F.col("match").cast("boolean")
    )

    cm_df = confusion_matrix_df(labeled_scored, threshold)
    _write_small_csv(
        cm_df.orderBy(F.desc("actual"), F.desc("predicted")),
        os.path.join(reports_dir, "confusion_matrix.csv"),
    )
    cm = {(r["actual"], r["predicted"]): r["count"] for r in cm_df.collect()}
    tp, fp = cm[(True, True)], cm[(False, True)]
    fn, tn = cm[(True, False)], cm[(False, False)]
    n = tp + fp + fn + tn
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    summary = {
        "n_pairs": n,
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "accuracy": round((tp + tn) / max(n, 1), 6),
        "precision": round(prec, 6),
        "recall": round(rec, 6),
        "f1": round(f1, 6),
        "threshold": threshold,
    }
    with open(os.path.join(reports_dir, "test_set_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)

    keep = ["id1", "id2", "actual", "predicted", "confidence", *[
        c for c in feature_names if c in labeled_scored.columns
    ]]
    # worst offenders first: FPs by confidence descending (most
    # confidently wrong), FNs ascending (most confidently missed;
    # never-candidates sort first as NULLs)
    fps = (
        scored.filter(~F.col("actual") & F.col("predicted"))
        .orderBy(F.desc("confidence"), "id1", "id2").limit(top_n).select(*keep)
    )
    fns = (
        scored.filter(F.col("actual") & ~F.col("predicted"))
        .orderBy(F.asc_nulls_first("confidence"), "id1", "id2").limit(top_n).select(*keep)
    )
    _write_small_csv(
        fps.unionByName(fns), os.path.join(reports_dir, "misclassified_examples.csv")
    )

    # near-threshold pairs that happen to be CORRECT today — one
    # retraining away from flipping (the reference's 'potential
    # misclassifications' list)
    near = (
        scored.filter(
            (F.col("actual") == F.col("predicted"))
            & F.col("confidence").isNotNull()
            & (F.abs(F.col("confidence") - F.lit(threshold)) <= F.lit(margin))
        )
        .orderBy(F.abs(F.col("confidence") - F.lit(threshold)), "id1", "id2")
        .limit(top_n)
        .select(*keep)
    )
    near_rows = near.collect()
    with open(os.path.join(reports_dir, "potential_misclassifications.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(near.columns)
        for r in near_rows:
            w.writerow([r[c] for c in near.columns])
    with open(os.path.join(reports_dir, "potential_misclassifications.json"), "w") as fh:
        json.dump([r.asDict() for r in near_rows], fh, indent=2, default=str)
    return summary


# -- file writers -------------------------------------------------------------

def write_model_parameters(model: Model, reports_dir: str) -> None:
    """model_parameters.json + model_weights.csv (reference
    src/reporting.py:517-546; format of output/detailed/model_parameters.json)."""
    with open(os.path.join(reports_dir, "model_parameters.json"), "w") as fh:
        json.dump(
            {
                "bias": model.bias,
                "weights": model.weights,
                "threshold": model.threshold,
                "feature_min": model.feature_min,
                "feature_range": model.feature_range,
            },
            fh,
            indent=2,
        )
    with open(os.path.join(reports_dir, "model_weights.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["feature", "weight"])
        for name, weight in model.weights.items():
            w.writerow([name, weight])


def _write_small_csv(df: DataFrame, path: str) -> None:
    """Single-file CSV for a SMALL aggregate (collected; caller
    guarantees boundedness — histograms, distributions, correlations)."""
    rows = df.collect()
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(df.columns)
        for r in rows:
            w.writerow([r[c] for c in df.columns])


def write_reports(
    work_dir: str,
    scored_pairs: DataFrame,
    labels: DataFrame,
    model: Model | None = None,
    featured: DataFrame | None = None,
    feature_names: tuple[str, ...] | None = None,
    stage_summary: list[dict] | None = None,
    evaluation: dict | None = None,
) -> str:
    """Write the full report set; returns the reports directory."""
    rd = _ensure(os.path.join(work_dir, "reports"))

    # match_pairs: potentially huge -> distributed CSV, never collected
    scored_pairs.select("id1", "id2", "confidence").write.mode("overwrite").option(
        "header", True
    ).csv(os.path.join(rd, "match_pairs.csv"))

    _write_small_csv(
        confidence_histogram(scored_pairs).orderBy("bin"),
        os.path.join(rd, "confidence_histogram.csv"),
    )
    _write_small_csv(
        cluster_size_distribution(labels).orderBy("size"),
        os.path.join(rd, "cluster_size_distribution.csv"),
    )
    cstats = cluster_statistics(labels)
    with open(os.path.join(rd, "cluster_statistics.json"), "w") as fh:
        json.dump(cstats, fh, indent=2)
    _write_small_csv(
        matches_per_entity(scored_pairs.filter(F.col("confidence").isNotNull()))
        .orderBy(F.desc("n_matches"), "record_id")
        .limit(1000),
        os.path.join(rd, "matches_per_entity.csv"),
    )
    summary = {
        "n_match_pairs": scored_pairs.count(),
        "cluster_statistics": cstats,
        "matches_per_entity": matches_per_entity_stats(scored_pairs),
        "stages": stage_summary or [],
    }
    if evaluation is not None:
        # records WHICH hyperparameters produced the quality numbers so
        # a tuned-gate F1 is never mistaken for the out-of-the-box one
        summary["evaluation"] = evaluation
    if model is not None:
        write_model_parameters(model, rd)
        summary["model_bias"] = model.bias
        summary["model_threshold"] = model.threshold
    if featured is not None and feature_names:
        _write_small_csv(
            feature_correlation(featured, tuple(feature_names)),
            os.path.join(rd, "feature_correlation.csv"),
        )
        # A11: feature means of accepted matches vs the rest
        flagged = featured.join(
            scored_pairs.select("id1", "id2").withColumn("is_match", F.lit(True)),
            on=["id1", "id2"],
            how="left",
        ).withColumn("is_match", F.coalesce(F.col("is_match"), F.lit(False)))
        _write_small_csv(
            feature_means(flagged, tuple(feature_names)),
            os.path.join(rd, "feature_means.csv"),
        )
    with open(os.path.join(rd, "summary_report.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    return rd
