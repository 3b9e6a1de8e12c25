"""Feature contract (reference §2.9) + classifier parity and training."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_resolution_pipeline_v1_spark.config import (
    FEATURE_NAMES,
    GOLDEN_BIAS,
    GOLDEN_WEIGHTS,
    PipelineConfig,
)
from entity_resolution_pipeline_v1_spark.operators import classify, features


def test_feature_order_is_reference_order():
    assert FEATURE_NAMES == (
        "composite_cosine", "person_cosine", "title_cosine", "provision_cosine",
        "subjects_cosine", "person_levenshtein", "person_title_harmonic",
        "person_provision_harmonic", "person_subjects_harmonic",
        "title_subjects_harmonic", "title_provision_harmonic",
        "provision_subjects_harmonic", "person_subjects_product",
        "composite_subjects_ratio",
    )


def _hydrated_row(spark):
    """One hand-written pair with known vectors/strings."""
    v = lambda *x: [float(t) for t in x]
    row = {
        "id1": "a", "id2": "b",
        "l_person": "Smith, John", "r_person": "Smith, Jon",
        "l_title": "T", "r_title": "T", "l_provision": None, "r_provision": None,
        "l_subjects": "Math", "r_subjects": "Math",
        "l_composite_vec": v(1, 0), "r_composite_vec": v(1, 0),
        "l_person_vec": v(0.6, 0.8), "r_person_vec": v(1, 0),
        "l_title_vec": v(0, 1), "r_title_vec": v(0, 1),
        "l_provision_vec": None, "r_provision_vec": None,
        "l_subjects_vec": v(1, 1), "r_subjects_vec": v(1, 1),
    }
    schema = (
        "id1 string, id2 string, l_person string, r_person string, l_title string,"
        " r_title string, l_provision string, r_provision string, l_subjects string,"
        " r_subjects string, l_composite_vec array<float>, r_composite_vec array<float>,"
        " l_person_vec array<float>, r_person_vec array<float>, l_title_vec array<float>,"
        " r_title_vec array<float>, l_provision_vec array<float>, r_provision_vec array<float>,"
        " l_subjects_vec array<float>, r_subjects_vec array<float>"
    )
    return spark.createDataFrame([tuple(row.values())], schema)


def test_feature_values_hand_checked(spark):
    out = features.with_features(_hydrated_row(spark)).collect()[0]
    assert out["composite_cosine"] == pytest.approx(1.0)
    assert out["person_cosine"] == pytest.approx(0.6)
    assert out["title_cosine"] == pytest.approx(1.0)
    assert out["provision_cosine"] == 0.0  # missing vector -> 0.0
    assert out["subjects_cosine"] == pytest.approx(1.0)
    # lev("Smith, John","Smith, Jon") = 1 deletion over maxlen 11
    assert out["person_levenshtein"] == pytest.approx(1 - 1 / 11)
    assert out["person_title_harmonic"] == pytest.approx(2 * 0.6 * 1.0 / 1.6)
    assert out["person_provision_harmonic"] == 0.0
    assert out["person_subjects_product"] == pytest.approx(0.6)
    assert out["composite_subjects_ratio"] == pytest.approx(1.0)


def test_extra_features(spark):
    out = features.with_extra_features(features.with_features(_hydrated_row(spark))).collect()[0]
    assert out["person_jaccard"] == pytest.approx(1 / 3)
    assert out["title_jaccard"] == 1.0
    assert out["subjects_jaccard"] == 1.0
    assert out["year_match"] == 0.0
    assert out["low_info_name"] == 0.0
    assert 0.8 < out["person_jaro_winkler"] <= 1.0


def test_fused_features_match_unfused(spark, corpus):
    """The single-Arrow-transit fused scorer must produce byte-identical
    features to the two-step with_extra_features(with_features(...))
    path over real hydrated pairs."""
    from entity_resolution_pipeline_v1_spark.operators import (
        blocking, extract, pairs, preprocess,
    )
    from entity_resolution_pipeline_v1_spark.operators.features import ALL_FEATURE_NAMES
    from entity_resolution_pipeline_v1_spark.sources import pages as P

    ext = extract.extract_text(P.pages_view(corpus), mode="main")
    records = preprocess.parse_records(ext)
    uniq = preprocess.unique_strings(preprocess.long_form(records))
    emb = preprocess.embed_unique(uniq, 16)
    wide = preprocess.records_wide(records, emb)
    cand = pairs.candidate_pairs(
        blocking.cap_blocks(blocking.build_blocks(records), 2000)
    ).limit(200)
    hydrated = features.hydrate_pairs(cand, wide).cache()
    cols = ["id1", "id2", *ALL_FEATURE_NAMES]
    a = features.with_all_features(hydrated, fused=True, dim=16).select(*cols)
    b = features.with_all_features(hydrated, fused=False).select(*cols)
    rows_a = {(r["id1"], r["id2"]): r for r in a.collect()}
    rows_b = {(r["id1"], r["id2"]): r for r in b.collect()}
    assert rows_a.keys() == rows_b.keys() and rows_a
    for k in rows_a:
        for name in ALL_FEATURE_NAMES:
            # fused dot == cosine up to the float32 unit-norm rounding
            # of the stored vectors (embedder normalizes in float64,
            # stores float32)
            assert rows_a[k][name] == pytest.approx(rows_b[k][name], abs=2e-6), (k, name)
    hydrated.unpersist()


@pytest.mark.parametrize("strategy", ["dict", "join"])
def test_staged_feature_matrix_matches_single_phase(spark, corpus, strategy):
    """staged_feature_matrix (two-phase hydration, the pipeline's score
    stage) must produce the same values as the single-phase
    with_all_features path over real candidate pairs — under BOTH
    cosine strategies ('auto' resolves to 'dict': records_wide carries
    the {f}_hash columns)."""
    from entity_resolution_pipeline_v1_spark.operators import (
        blocking, extract, pairs, preprocess,
    )
    from entity_resolution_pipeline_v1_spark.operators.features import ALL_FEATURE_NAMES
    from entity_resolution_pipeline_v1_spark.sources import pages as P

    ext = extract.extract_text(P.pages_view(corpus), mode="main")
    records = preprocess.parse_records(ext)
    uniq = preprocess.unique_strings(preprocess.long_form(records))
    emb = preprocess.embed_unique(uniq, 16)
    wide = preprocess.records_wide(records, emb).cache()
    cand = pairs.candidate_pairs(
        blocking.cap_blocks(blocking.build_blocks(records), 2000)
    ).limit(300).cache()
    a = features.staged_feature_matrix(cand, wide, dim=16, cosine_strategy=strategy)
    b = features.feature_matrix(
        features.with_all_features(features.hydrate_pairs(cand, wide), dim=16),
        names=ALL_FEATURE_NAMES,
    )
    rows_a = {(r["id1"], r["id2"]): r for r in a.collect()}
    rows_b = {(r["id1"], r["id2"]): r for r in b.collect()}
    assert rows_a.keys() == rows_b.keys() and rows_a
    for k in rows_a:
        for name in ALL_FEATURE_NAMES:
            assert rows_a[k][name] == pytest.approx(rows_b[k][name], abs=1e-9), (k, name)
    cand.unpersist()
    wide.unpersist()


def test_staged_feature_matrix_strategy_validation(spark, corpus):
    from entity_resolution_pipeline_v1_spark.operators import extract, preprocess
    from entity_resolution_pipeline_v1_spark.sources import pages as P

    records = preprocess.parse_records(
        extract.extract_text(P.pages_view(corpus), mode="main")
    )
    emb = preprocess.embed_unique(
        preprocess.unique_strings(preprocess.long_form(records)), 16
    )
    wide = preprocess.records_wide(records, emb)
    cand = spark.createDataFrame([("a", "b")], "id1 string, id2 string")
    with pytest.raises(ValueError, match="cosine_strategy"):
        features.staged_feature_matrix(cand, wide, dim=16, cosine_strategy="bogus")
    # explicit 'dict' without the hash columns must refuse, not silently
    # fall back (the round-3 dead-parameter seam, ADVICE r3-medium)
    no_hashes = wide.drop(*[f"{f}_hash" for f in features.EMBED_FIELDS])
    with pytest.raises(ValueError, match="_hash"):
        features.staged_feature_matrix(cand, no_hashes, dim=16, cosine_strategy="dict")
    # 'auto' without hashes falls back to the inline-join plan
    assert features.staged_feature_matrix(cand, no_hashes, dim=16).columns

    def plan(**kw):
        return (
            features.staged_feature_matrix(cand, wide, **kw)
            ._jdf.queryExecution().optimizedPlan().toString()
        )

    # 'auto' is dim-based (measured, see the docstring): small dims keep
    # the fused inline dots (per-pair vector hydration in the plan) ...
    assert "l_person_vec" in plan(dim=16)
    # ... above FUSED_COSINE_MAX_DIM it switches to the distinct-pair
    # dictionary: no `{f}_vec` column is ever hydrated per pair
    assert "l_person_vec" not in plan(dim=features.FUSED_COSINE_MAX_DIM + 1)
    # explicit 'dict' honors the request at any dim
    assert "l_person_vec" not in plan(dim=16, cosine_strategy="dict")


def test_score_stage_compiles_under_strict_codegen(spark, corpus):
    """Round-3's strict xfail, flipped green by cosine_strategy='dict':
    the per-pair hot stages carry hash keys instead of vectors and
    never evaluate a dim-term dot product, so no projection exceeds the
    JVM's 64KB codegen method limit — the whole score plan compiles
    under spark.sql.codegen.fallback=false (interpreted fallback
    disabled). 'dict' is requested explicitly: at dim 64 'auto'
    deliberately keeps the inline-join plan, whose one interpreted
    stage is 2x cheaper than the dict plan's extra shuffles (measured
    — see the staged_feature_matrix docstring); this test pins that
    the strict-codegen-clean plan EXISTS and is what 'auto' selects at
    reference dimensionality (1536)."""
    from entity_resolution_pipeline_v1_spark.operators import (
        blocking, extract, pairs, preprocess,
    )
    from entity_resolution_pipeline_v1_spark.sources import pages as P

    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        records = preprocess.parse_records(
            extract.extract_text(P.pages_view(corpus), mode="main")
        )
        emb = preprocess.embed_unique(
            preprocess.unique_strings(preprocess.long_form(records)), 64
        )
        wide = preprocess.records_wide(records, emb)
        cand = pairs.candidate_pairs(
            blocking.cap_blocks(blocking.build_blocks(records), 2000)
        )
        featured = features.staged_feature_matrix(
            cand, wide, dim=64, cosine_strategy="dict"
        )
        # parquet write = the pipeline's real score-stage sink; a bare
        # count() would let Catalyst prune the cosine projections away
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            featured.write.mode("overwrite").parquet(f"{d}/featured")
            assert spark.read.parquet(f"{d}/featured").count() > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")


def test_reference_dim_1536_cosine_path(spark):
    """At the reference's embedding dimensionality (1536, reference
    config.yml:46) the fused path must auto-switch cosines to the
    Arrow einsum UDF — the 5x1536-term unrolled expression would blow
    the JVM's 64KB codegen method budget — and the values must match
    numpy to float32 precision."""
    import numpy as np

    assert features.FUSED_COSINE_MAX_DIM < 1536
    rng = np.random.RandomState(7)
    dim, n = 1536, 20
    def unit(v):
        return (v / np.linalg.norm(v)).astype(np.float32).tolist()
    rows, expect = [], []
    for i in range(n):
        lv = {f: rng.randn(dim) for f in ("composite", "person", "title", "provision", "subjects")}
        rv = {f: rng.randn(dim) for f in lv}
        row = {"id1": f"a{i}", "id2": f"b{i}",
               "l_person": "Smith, John", "r_person": "Smith, Jon",
               "l_title": "T", "r_title": "T", "l_provision": "P", "r_provision": "P",
               "l_subjects": "Math", "r_subjects": "Math"}
        for f in lv:
            row[f"l_{f}_vec"] = unit(lv[f])
            row[f"r_{f}_vec"] = unit(rv[f])
        rows.append(tuple(row.values()))
        expect.append({
            f: float(np.dot(row[f"l_{f}_vec"], row[f"r_{f}_vec"])
                     / (np.linalg.norm(row[f"l_{f}_vec"]) * np.linalg.norm(row[f"r_{f}_vec"])))
            for f in lv
        })
    schema = (
        "id1 string, id2 string, l_person string, r_person string, l_title string,"
        " r_title string, l_provision string, r_provision string, l_subjects string,"
        " r_subjects string,"
        + ",".join(
            f" l_{f}_vec array<float>, r_{f}_vec array<float>"
            for f in ("composite", "person", "title", "provision", "subjects")
        )
    )
    hydrated = spark.createDataFrame(rows, schema)
    out = features.with_all_features(hydrated, fused=True, dim=dim)
    got = {r["id1"]: r for r in out.collect()}
    assert len(got) == n
    for i in range(n):
        for f in ("composite", "person", "title", "provision", "subjects"):
            assert got[f"a{i}"][f"{f}_cosine"] == pytest.approx(expect[i][f], abs=1e-6), (i, f)


def test_golden_score_expr_matches_numpy(spark):
    model = classify.Model.golden()
    vals = {name: 0.5 + 0.02 * i for i, name in enumerate(FEATURE_NAMES)}
    df = spark.createDataFrame(
        [tuple(vals.values())], ", ".join(f"{n} double" for n in FEATURE_NAMES)
    )
    got = df.select(classify.score_expr(model).alias("p")).collect()[0]["p"]
    z = GOLDEN_BIAS + sum(GOLDEN_WEIGHTS[n] * vals[n] for n in FEATURE_NAMES)
    assert got == pytest.approx(1 / (1 + math.exp(-z)), rel=1e-9)


def test_train_is_deterministic_and_learns():
    rng = np.random.RandomState(0)
    n = 400
    X = rng.rand(n, len(FEATURE_NAMES))
    y = (X[:, 1] + X[:, 5] > 1.0).astype(float)  # person_cosine + levenshtein
    cfg = PipelineConfig(learning_rate=0.5, max_iterations=2000, early_stop_patience=50)
    m1, met1 = classify.train(X, y, cfg)
    m2, met2 = classify.train(X, y, cfg)
    assert m1.weights == m2.weights and m1.bias == m2.bias
    assert met1["f1"] > 0.9
    assert m1.weights["person_cosine"] > m1.weights["provision_cosine"]


def test_prefilters(spark):
    # C4/C6 are opt-in (reference-parity preset): defaults ship disabled
    # because the thresholds assume the reference's OpenAI embeddings
    model = classify.Model.golden()
    cfg = PipelineConfig.reference_parity()
    base_cols = {n: 0.0 for n in FEATURE_NAMES}
    rows = [
        {**base_cols, "composite_cosine": 0.9, "person_cosine": 0.9},  # C4 autoaccept
        {**base_cols, "composite_cosine": 0.1, "person_cosine": 0.1},  # C6 autoreject
    ]
    df = spark.createDataFrame(
        [tuple(r.values()) for r in rows], ", ".join(f"{n} double" for n in base_cols)
    )
    out = classify.classify_pairs(
        df.withColumn("id1", F.lit("a")).withColumn("id2", F.lit("b")), model, cfg
    ).collect()
    assert out[0]["confidence"] == pytest.approx(cfg.autoaccept_confidence)
    assert out[1]["confidence"] == pytest.approx(cfg.autoreject_confidence)


def test_low_info_corroboration_cap(spark):
    model = classify.Model.golden()
    cfg = PipelineConfig()  # C4/C6 disabled by default
    cols = {n: 0.9 for n in FEATURE_NAMES}
    extra = {"title_jaccard": 0.0, "subjects_jaccard": 0.0, "year_match": 0.0, "low_info_name": 1.0}
    df = spark.createDataFrame(
        [tuple({**cols, **extra}.values())],
        ", ".join(f"{n} double" for n in {**cols, **extra}),
    ).withColumn("id1", F.lit("a")).withColumn("id2", F.lit("b"))
    out = classify.classify_pairs(df, model, cfg).collect()[0]
    assert out["confidence"] <= cfg.low_info_confidence_cap
    # with corroboration the cap lifts
    df2 = df.withColumn("title_jaccard", F.lit(0.9))
    out2 = classify.classify_pairs(df2, model, cfg).collect()[0]
    assert out2["confidence"] > cfg.low_info_confidence_cap


def test_golden_confidence_pinned_to_reference(spark):
    """VERDICT #8 normalization-parity check: the reference normalizes
    predict-time features with TRAIN min/range
    (src/classification.py:361-370), but its published
    model_parameters.json carries NO train stats — so identity
    normalization is the only reproducible contract, and Model.golden()
    ships it. This pins engine confidences for fixed feature rows to
    sigmoid(w·x + b) computed directly from the reference's published
    weights/bias (values precomputed outside Spark)."""
    model = classify.Model.golden()
    rows = [
        {n: 0.5 + 0.02 * i for i, n in enumerate(FEATURE_NAMES)},
        {n: 0.9 for n in FEATURE_NAMES},
    ]
    df = spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        ", ".join(f"{n} double" for n in FEATURE_NAMES),
    ).withColumn("id1", F.lit("a")).withColumn("id2", F.lit("b"))
    out = classify.classify_pairs(df, model, PipelineConfig()).collect()
    # reference-side: sigmoid(bias + Σ w_i x_i) over model_parameters.json
    assert out[0]["confidence"] == pytest.approx(0.727616604357, abs=1e-9)
    assert out[1]["confidence"] == pytest.approx(0.858880364529, abs=1e-9)
    assert out[0]["is_match"] is False   # threshold 0.75
    assert out[1]["is_match"] is True


def test_model_save_load(tmp_path):
    m = classify.Model.golden()
    p = str(tmp_path / "m.json")
    m.save(p)
    m2 = classify.Model.load(p)
    assert m2.weights == m.weights and m2.bias == m.bias
