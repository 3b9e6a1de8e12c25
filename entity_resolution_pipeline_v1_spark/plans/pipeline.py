"""End-to-end ER pipeline plan: the stage DAG with checkpoint/resume.

Mirrors the reference's resumable stage loop (reference
src/pipeline.py:84-96, main.py:138-178) on Spark terms: every stage
writes a parquet table + manifest; a re-run with the same work_dir
skips completed stages; metrics/lineage rows land in the metrics
table per stage (north_rule).

    extract -> preprocess -> embed -> block -> pairs -> score
            -> classify -> cluster -> outputs
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from contextlib import contextmanager
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators.features import ALL_FEATURE_NAMES
from ..operators import blocking, classify, cluster, extract, features, pairs, preprocess
from ..sources import sinks


@contextmanager
def _no_aqe_coalesce(spark: SparkSession):
    """Suspend AQE partition coalescing (runtime conf) for a stage
    whose shuffles are byte-skinny but CPU-dense — byte-based
    coalescing would run the expensive per-row compute in a handful
    of tasks regardless of cluster size. Restores the prior setting."""
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


@dataclass
class StageResult:
    name: str
    rows: int
    wall_sec: float
    skipped: bool = False


class ERPipeline:
    """Batch ER pipeline over a pages DataFrame."""

    def __init__(self, spark: SparkSession, cfg: PipelineConfig | None = None):
        self.spark = spark
        self.cfg = cfg or PipelineConfig()
        self.results: list[StageResult] = []
        self.model: classify.Model | None = None
        self.train_metrics: dict | None = None

    # -- checkpoint fingerprint ---------------------------------------------
    def _fingerprint(self, extra: str = "") -> str:
        """Config (+ optional model) fingerprint recorded in each stage
        manifest. Resuming the same checkpoint_dir under a different
        config or model invalidates the stale stages instead of
        silently reusing them. Execution-only knobs are excluded —
        moving the work dir, toggling report output, or changing the
        CC lineage-checkpoint cadence does not change any stage's
        semantics."""
        exec_only = {"checkpoint_dir", "generate_reports"}
        cfg = {k: v for k, v in asdict(self.cfg).items() if k not in exec_only}
        blob = json.dumps(cfg, sort_keys=True, default=str) + "|" + extra
        return hashlib.md5(blob.encode("utf-8")).hexdigest()

    def _model_fp(self) -> str:
        if self.model is None:
            return ""
        return json.dumps(
            {"w": self.model.weights, "b": self.model.bias, "t": self.model.threshold},
            sort_keys=True,
        )

    # -- stage runner ------------------------------------------------------
    def _stage(self, name: str, build, resume: bool = True, partition_by=None,
               extra_fp: str = "") -> DataFrame:
        work = self.cfg.checkpoint_dir
        fp = self._fingerprint(extra_fp)
        if resume and sinks.stage_complete(work, name, fp):
            df = sinks.read_stage(self.spark, work, name)
            self.results.append(StageResult(name, -1, 0.0, skipped=True))
            return df
        t0 = time.time()
        df = build()
        out = sinks.write_stage(df, work, name, partition_by, fingerprint=fp)
        wall = time.time() - t0
        sinks.record_metrics(out, work, name, wall)
        self.results.append(StageResult(name, out.count(), wall))
        return out

    # -- full run ----------------------------------------------------------
    def run(
        self,
        pages: DataFrame,
        labeled_pairs: DataFrame | None = None,
        model: classify.Model | None = None,
        resume: bool = True,
        until: str | None = None,
    ) -> DataFrame:
        """Run the stage DAG; ``until`` stops after (and returns the
        output of) the named stage — the reference's --stage semantics
        (reference main.py:100-178): earlier stages resume from
        checkpoint, later ones don't run."""
        cfg = self.cfg

        extracted = self._stage(
            "extract", lambda: extract.extract_text(pages, mode="main"), resume
        )
        if until == "extract":
            return extracted
        records = self._stage(
            "preprocess", lambda: preprocess.parse_records(extracted), resume
        )
        if until == "preprocess":
            return records
        uniques = self._stage(
            "unique_strings",
            lambda: preprocess.unique_strings(
                preprocess.long_form(records), cfg.min_string_frequency
            ),
            resume,
        )
        if until == "unique_strings":
            return uniques
        embeddings = self._stage(
            "embed", lambda: preprocess.embed_unique(uniques, cfg.embedding_dim), resume
        )
        if until == "embed":
            return embeddings
        wide = self._stage(
            "records_wide", lambda: preprocess.records_wide(records, embeddings), resume
        )
        if until == "records_wide":
            return wide
        blocks = self._stage(
            "block",
            lambda: blocking.cap_blocks(
                blocking.build_blocks(
                    records,
                    num_hashes=cfg.minhash_num_hashes,
                    bands=cfg.minhash_bands,
                    sn_window=cfg.sorted_neighborhood_window,
                ),
                cfg.max_block_size,
            ),
            resume,
        )
        if until == "block":
            return blocks
        cand = self._stage("pairs", lambda: pairs.candidate_pairs(blocks), resume)
        if until == "pairs":
            return cand
        # staged scoring: string features (incl. the Arrow JW) over
        # a names-only hydrate, then vector hydration + codegen
        # cosines — same values as the single-phase path (tested),
        # but the Arrow node never splits the dot-product stage
        # into an over-64KB codegen method (features.py docstring).
        # AQE partition COALESCING is suspended for this stage: pair
        # scoring is byte-skinny but CPU-dense, and byte-based
        # coalescing collapses it onto a handful of tasks (measured
        # 2.5x loss at 8 cores on the 8.9M-pair fixture); skew-join
        # splitting stays enabled.
        with _no_aqe_coalesce(self.spark):
            featured = self._stage(
                "score",
                lambda: features.staged_feature_matrix(
                    cand, wide, dim=cfg.embedding_dim, names=ALL_FEATURE_NAMES
                ),
                resume,
            )
        if until == "score":
            return featured

        # -- model: train on labels if given, else golden weights ----------
        if model is not None:
            self.model = model
        elif labeled_pairs is not None:
            self.model = self._train(labeled_pairs, wide)
        else:
            self.model = classify.Model.golden()

        edges = self._stage(
            "classify",
            lambda: classify.classify_pairs(
                featured, self.model, cfg, year_match_col=F.col("year_match")
            ).filter(F.col("is_match")),
            resume,
            extra_fp=self._model_fp(),
        )
        if until == "classify":
            return edges
        deduped = pairs.dedup_scored_pairs(edges, "id1", "id2", "confidence")
        labels = self._stage(
            "cluster",
            lambda: cluster.filter_and_relabel(
                cluster.connected_components(
                    deduped.filter(F.col("confidence") >= cfg.edge_threshold).select(
                        F.col("id1").alias("src"), F.col("id2").alias("dst")
                    ),
                ),
                cfg.min_cluster_size,
                cfg.max_cluster_size,
            ),
            resume,
            extra_fp=self._model_fp(),  # cluster input is classify output
        )
        if cfg.generate_reports:
            from .. import reports

            # evaluation block: the config that PRODUCED these numbers
            # travels with them — a tuned-gate F1 is distinguishable
            # from the out-of-the-box default-config F1 in the report
            evaluation: dict = {
                "config": {
                    "learning_rate": cfg.learning_rate,
                    "max_iterations": cfg.max_iterations,
                    "l2_lambda": cfg.l2_lambda,
                    "match_threshold": cfg.match_threshold,
                    "edge_threshold": cfg.edge_threshold,
                    "is_default_config": cfg.is_default_training_config(),
                },
                "train_metrics": self.train_metrics,
            }
            if labeled_pairs is not None:
                evaluation["pairwise"] = reports.pairwise_metrics(labels, labeled_pairs)
                # error-analysis set (confusion matrix, test-set
                # summary, misclassified / near-threshold examples)
                # over the labeled pairs scored through the SAME
                # feature+classify path the production pairs take
                evaluation["test_set"] = reports.error_analysis(
                    self._score_labeled(labeled_pairs, wide),
                    os.path.join(cfg.checkpoint_dir, "reports"),
                    cfg.match_threshold,
                    feature_names=ALL_FEATURE_NAMES,
                )
            reports.write_reports(
                cfg.checkpoint_dir,
                deduped,
                labels,
                model=self.model,
                featured=featured,
                feature_names=ALL_FEATURE_NAMES,
                stage_summary=[
                    {"name": r.name, "rows": r.rows, "wall_sec": round(r.wall_sec, 3),
                     "skipped": r.skipped}
                    for r in self.results
                ],
                evaluation=evaluation,
            )
        return labels

    def _score_labeled(self, labels: DataFrame, wide: DataFrame) -> DataFrame:
        """(id1, id2, match, …features…, confidence, is_match) for the
        labeled ground-truth pairs, scored through the same hydration +
        feature + classify path as production candidates — the input to
        reports.error_analysis."""
        pair_ids = labels.select(
            F.col("left").alias("id1"), F.col("right").alias("id2"), "match"
        )
        feat = features.with_all_features(
            features.hydrate_pairs(pair_ids, wide), dim=self.cfg.embedding_dim
        )
        return classify.classify_pairs(
            feat,
            self.model,
            self.cfg,
            year_match_col=F.col("year_match"),
            keep_columns=("match", *ALL_FEATURE_NAMES),
        )

    # -- training path ------------------------------------------------------
    def _train(self, labels: DataFrame, wide: DataFrame) -> classify.Model:
        """J6 hydration: labels ⋈ records_wide twice -> features ->
        driver-side deterministic GD (the labeled set is tiny by
        construction; this is the same scale split the reference makes)."""
        import numpy as np

        pair_ids = labels.select(
            F.col("left").alias("id1"), F.col("right").alias("id2"), "match"
        )
        hydrated = features.hydrate_pairs(pair_ids, wide)
        feat = features.with_all_features(hydrated, dim=self.cfg.embedding_dim).select(
            *ALL_FEATURE_NAMES, F.col("match").cast("int").alias("y")
        )
        pdf = feat.toPandas()
        X = pdf[list(ALL_FEATURE_NAMES)].to_numpy(dtype=float)
        y = pdf["y"].to_numpy(dtype=float)
        model, metrics = classify.train(X, y, self.cfg, feature_names=ALL_FEATURE_NAMES)
        self.train_metrics = metrics
        return model

    def summary(self) -> dict:
        return {
            "stages": [
                {"name": r.name, "rows": r.rows, "wall_sec": round(r.wall_sec, 3), "skipped": r.skipped}
                for r in self.results
            ],
            "model_bias": self.model.bias if self.model else None,
        }
