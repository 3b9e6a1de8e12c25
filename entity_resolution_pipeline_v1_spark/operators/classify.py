"""Pair classifier: deterministic logistic regression + prefilters.

Training reproduces the reference's hand-rolled batch gradient descent
(reference src/classification.py:191-303): seed-42 init 0.01*randn,
lr 0.01, L2 λ=0.01, <=1000 iterations, early stop patience 5 on val
loss, 80/10/10 split. The labeled-pair feature matrix is tiny relative
to the corpus, so training runs driver-side in numpy over a
toPandas() pull — exactly the scale split the reference makes.

Prediction is a PURE column expression (sigmoid of the normalized
weighted sum, C2), preceded by the prefilter decision cascade (C4-C6,
src/classification.py:543-619) — no Python anywhere in the scoring
path.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import (
    FEATURE_NAMES,
    GOLDEN_BIAS,
    GOLDEN_THRESHOLD,
    GOLDEN_WEIGHTS,
    PipelineConfig,
)
from ..functions.similarity import sigmoid


@dataclass
class Model:
    weights: dict[str, float]
    bias: float
    threshold: float = 0.75
    # predict-time min-max normalization uses TRAIN stats
    # (reference src/classification.py:361-370) — stored with the model
    feature_min: dict[str, float] = field(default_factory=dict)
    feature_range: dict[str, float] = field(default_factory=dict)

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(asdict(self), fh, indent=2)

    @classmethod
    def load(cls, path: str) -> "Model":
        with open(path) as fh:
            return cls(**json.load(fh))

    @classmethod
    def golden(cls) -> "Model":
        """The reference's published parameters
        (output/detailed/model_parameters.json); identity normalization."""
        return cls(
            weights=dict(GOLDEN_WEIGHTS),
            bias=GOLDEN_BIAS,
            threshold=GOLDEN_THRESHOLD,
            feature_min={k: 0.0 for k in FEATURE_NAMES},
            feature_range={k: 1.0 for k in FEATURE_NAMES},
        )


def train(
    features: "np.ndarray",
    labels: "np.ndarray",
    cfg: PipelineConfig | None = None,
    feature_names: tuple[str, ...] = FEATURE_NAMES,
) -> tuple[Model, dict]:
    """Deterministic GD trainer. Returns (model, metrics)."""
    cfg = cfg or PipelineConfig()
    rng = np.random.RandomState(cfg.seed)
    X = np.asarray(features, dtype=np.float64)
    y = np.asarray(labels, dtype=np.float64)

    fmin = X.min(axis=0)
    frange = X.max(axis=0) - fmin
    frange[frange == 0] = 1.0
    Xn = (X - fmin) / frange

    n = len(y)
    idx = rng.permutation(n)
    n_train = int(0.8 * n)
    n_val = int(0.1 * n)
    tr, va, te = (
        idx[:n_train],
        idx[n_train : n_train + n_val],
        idx[n_train + n_val :],
    )

    w = 0.01 * rng.randn(X.shape[1])
    b = 0.0
    lr, lam = cfg.learning_rate, cfg.l2_lambda

    def loss(Xs, ys):
        z = Xs @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -709, 709)))
        p = np.clip(p, 1e-12, 1 - 1e-12)
        return float(-np.mean(ys * np.log(p) + (1 - ys) * np.log(1 - p)) + lam * np.sum(w**2))

    best_val = np.inf
    best_w, best_b = w.copy(), b
    patience = 0
    for _ in range(cfg.max_iterations):
        z = Xn[tr] @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -709, 709)))
        g = p - y[tr]
        w -= lr * (Xn[tr].T @ g / len(tr) + 2 * lam * w)
        b -= lr * float(np.mean(g))
        vl = loss(Xn[va], y[va]) if len(va) else loss(Xn[tr], y[tr])
        if vl < best_val - 1e-9:
            best_val, best_w, best_b, patience = vl, w.copy(), b, 0
        else:
            patience += 1
            if patience >= cfg.early_stop_patience:
                break
    w, b = best_w, best_b

    def prf(Xs, ys, thr=0.5):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        pred = p >= thr
        tp = float(np.sum(pred & (ys == 1)))
        fp = float(np.sum(pred & (ys == 0)))
        fn = float(np.sum(~pred & (ys == 1)))
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        return {"precision": prec, "recall": rec, "f1": f1}

    metrics = prf(Xn[te], y[te]) if len(te) else prf(Xn[tr], y[tr])
    model = Model(
        weights={name: float(wi) for name, wi in zip(feature_names, w)},
        bias=float(b),
        threshold=cfg.match_threshold,
        feature_min={name: float(v) for name, v in zip(feature_names, fmin)},
        feature_range={name: float(v) for name, v in zip(feature_names, frange)},
    )
    return model, metrics


def score_expr(model: Model) -> Column:
    """C2 as one codegen'd expression: sigmoid(Σ wᵢ·(xᵢ-minᵢ)/rangeᵢ + b).
    The model's weight keys define its feature set (14 golden features
    or 14+extras for a trained engine model)."""
    z = F.lit(model.bias)
    for name in model.weights:
        norm = (F.col(name) - F.lit(model.feature_min.get(name, 0.0))) / F.lit(
            model.feature_range.get(name, 1.0)
        )
        z = z + F.lit(model.weights[name]) * norm
    return sigmoid(z)


def confidence_expr(
    model: Model,
    cfg: PipelineConfig | None = None,
    year_match_col: Column | None = None,
) -> Column:
    """Prefilter cascade (C4-C6) wrapping the LR score (C2):

      composite_cosine >= autoaccept thr  -> autoaccept confidence (C4)
      birth/death years exactly equal     -> 0.95 (C5)
      person_cosine < autoreject thr      -> 0.25 (C6 auto-reject)
      otherwise                           -> sigmoid LR score (C2)

    C4/C6 are skipped when their threshold is None (the default —
    their reference values assume OpenAI embeddings; see
    PipelineConfig.reference_parity())."""
    cfg = cfg or PipelineConfig()
    base = score_expr(model)
    branches: list[tuple[Column, Column]] = []
    if cfg.composite_cosine_autoaccept is not None:
        branches.append(
            (
                F.col("composite_cosine") >= cfg.composite_cosine_autoaccept,
                F.lit(cfg.autoaccept_confidence),
            )
        )
    if year_match_col is not None:
        # the reference fires C5 on pairs already ANN-screened for name
        # similarity; key-collision blocking admits arbitrary neighbors,
        # so the year accept is gated on a name-similarity floor to keep
        # coincidental year equality from auto-matching strangers
        branches.append(
            (
                (year_match_col >= 1.0)
                & (F.col("person_cosine") >= cfg.year_accept_min_person_sim),
                F.lit(cfg.year_match_confidence),
            )
        )
    if cfg.person_cosine_autoreject is not None:
        branches.append(
            (
                F.col("person_cosine") < cfg.person_cosine_autoreject,
                F.lit(cfg.autoreject_confidence),
            )
        )
    if not branches:
        return base
    expr = F.when(*branches[0])
    for cond, val in branches[1:]:
        expr = expr.when(cond, val)
    return expr.otherwise(base)


def classify_pairs(
    featured: DataFrame,
    model: Model,
    cfg: PipelineConfig | None = None,
    year_match_col: Column | None = None,
    keep_columns: tuple[str, ...] = (),
) -> DataFrame:
    """Featured pairs -> (id1, id2[, keep_columns...], confidence,
    is_match). ``keep_columns`` carries named feature columns through
    (benchmarks aggregate over them so Catalyst cannot prune feature
    work out of the measured plan; the production path keeps none)."""
    cfg = cfg or PipelineConfig()
    conf = confidence_expr(model, cfg, year_match_col)
    if cfg.require_corroboration_low_info and "low_info_name" in featured.columns:
        # a low-information name ('Dubois, S.') is consistent with many
        # distinct people; cap its confidence below threshold unless an
        # independent field corroborates the match
        corroborated = (
            (F.col("title_jaccard") >= cfg.corroboration_title_jaccard)
            | (F.col("subjects_jaccard") >= cfg.corroboration_subjects_jaccard)
            | (F.col("year_match") >= 1.0)
        )
        conf = F.when(
            (F.col("low_info_name") >= 1.0) & ~corroborated,
            F.least(conf, F.lit(cfg.low_info_confidence_cap)),
        ).otherwise(conf)
    return featured.select(
        "id1",
        "id2",
        *[c for c in keep_columns if c in featured.columns],
        conf.alias("confidence"),
    ).withColumn("is_match", F.col("confidence") >= F.lit(cfg.match_threshold))
