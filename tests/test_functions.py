"""Unit tests for scalar similarity functions vs python/numpy oracles.

Semantics pinned to the reference (SURVEY.md §2.8): levenshtein
(src/utils.py:212-229), harmonic mean (src/features.py:371-376),
product/ratio (src/features.py:226-238), cosine (src/utils.py:146-177).
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_resolution_pipeline_v1_spark.functions import similarity as S


def _one(spark, expr, **cols):
    schema = ", ".join(f"{k} {'string' if isinstance(v, (str, type(None))) else 'double'}" for k, v in cols.items())
    df = spark.createDataFrame([tuple(cols.values())], schema)
    return df.select(expr.alias("out")).collect()[0]["out"]


@pytest.mark.parametrize(
    "a,b,expected",
    [
        ("kitten", "sitting", 1 - 3 / 7),
        ("abc", "abc", 1.0),
        ("abc", "", 0.0),
        ("", "", 1.0),
        (None, "abc", 0.0),
        ("a", "b", 0.0),
    ],
)
def test_levenshtein_sim(spark, a, b, expected):
    out = _one(spark, S.levenshtein_sim(F.col("a"), F.col("b")), a=a, b=b)
    assert out == pytest.approx(expected)


@pytest.mark.parametrize(
    "a,b,expected",
    [(0.5, 0.5, 0.5), (0.2, 0.8, 2 * 0.2 * 0.8 / 1.0), (0.0, 0.9, 0.0), (-0.1, 0.9, 0.0)],
)
def test_harmonic_mean(spark, a, b, expected):
    out = _one(spark, S.harmonic_mean(F.col("a"), F.col("b")), a=a, b=b)
    assert out == pytest.approx(expected)


@pytest.mark.parametrize(
    "a,b,expected",
    [
        (0.5, 0.5, 0.5),                      # normal branch
        (0.2, 0.8, 2 * 0.2 * 0.8 / 1.0),      # normal branch
        (0.0, 0.9, 0.09),                     # one side floored -> 0.1x other
        (0.0005, 0.6, 0.06),                  # at/below threshold counts as zero
        (0.7, 0.001, 0.07),                   # other side floored
        (0.0, 0.0, 0.0),                      # both floored
        (0.001, 0.001, 0.0),                  # both exactly at threshold
    ],
)
def test_harmonic_mean_smoothed(spark, a, b, expected):
    # reference parallel_features.py:402-417 semantics
    out = _one(spark, S.harmonic_mean_smoothed(F.col("a"), F.col("b")), a=a, b=b)
    assert out == pytest.approx(expected)


def test_product_and_ratio(spark):
    assert _one(spark, S.product(F.col("a"), F.col("b")), a=0.5, b=0.4) == pytest.approx(0.2)
    assert _one(spark, S.safe_ratio(F.col("a"), F.col("b")), a=0.5, b=0.25) == pytest.approx(2.0)
    assert _one(spark, S.safe_ratio(F.col("a"), F.col("b")), a=0.5, b=0.0) == 0.0


def test_sigmoid(spark):
    out = _one(spark, S.sigmoid(F.col("a")), a=0.3)
    assert out == pytest.approx(1 / (1 + math.exp(-0.3)))


def test_token_jaccard(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"], ["b", "c", "d"]), (["a"], ["a"]), ([], ["a"]), (None, ["a"])],
        "a array<string>, b array<string>",
    )
    out = [r["j"] for r in df.select(S.token_jaccard("a", "b").alias("j")).collect()]
    assert out[0] == pytest.approx(2 / 4)
    assert out[1] == 1.0
    assert out[2] == 0.0
    assert out[3] == 0.0


def test_cosine_udf_matches_numpy(spark):
    rng = np.random.RandomState(42)
    rows = []
    for _ in range(50):
        a = rng.randn(16).astype(np.float32)
        b = rng.randn(16).astype(np.float32)
        rows.append((a.tolist(), b.tolist()))
    rows.append((None, rows[0][1]))
    rows.append(([0.0] * 16, rows[0][1]))  # zero norm -> 0.0
    df = spark.createDataFrame(rows, "a array<float>, b array<float>")
    got = [r["c"] for r in df.select(S.cosine_udf("a", "b").alias("c")).collect()]
    for (a, b), g in zip(rows, got):
        if a is None or np.linalg.norm(a) == 0:
            assert g == 0.0
        else:
            exp = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert g == pytest.approx(exp, rel=1e-5)


def test_cosine_expr_matches_udf(spark):
    rng = np.random.RandomState(7)
    rows = [(rng.randn(8).astype(np.float32).tolist(), rng.randn(8).astype(np.float32).tolist()) for _ in range(20)]
    df = spark.createDataFrame(rows, "a array<float>, b array<float>")
    got = df.select(
        S.cosine_udf("a", "b").alias("u"), S.cosine_expr("a", "b").alias("e")
    ).collect()
    for r in got:
        assert r["u"] == pytest.approx(r["e"], rel=1e-5)


def test_jw_batch_matches_scalar_including_single_char():
    """The vectorized JW must (a) survive a batch whose longest string
    is a single char — the (0,8] bucket then has an EMPTY match window
    (d = -1), which crashed argmax before the round-4 clamp (ADVICE
    r3-high) — and (b) agree with the scalar implementation pairwise."""
    from entity_resolution_pipeline_v1_spark.functions.similarity import (
        _jaro_winkler,
        _jaro_winkler_batch,
    )

    # the ADVICE repro: all-single-char batch
    sa = np.array(["a", "b", "c"], dtype=object)
    sb = np.array(["b", "a", "c"], dtype=object)
    assert _jaro_winkler_batch(sa, sb).tolist() == [0.0, 0.0, 1.0]
    # randomized parity vs the scalar, short strings included
    rng = np.random.RandomState(3)
    alpha = np.array(list("abcdef "))
    pairs = [
        (
            "".join(rng.choice(alpha, rng.randint(0, 12))),
            "".join(rng.choice(alpha, rng.randint(0, 12))),
        )
        for _ in range(300)
    ]
    got = _jaro_winkler_batch(
        np.array([p[0] for p in pairs], dtype=object),
        np.array([p[1] for p in pairs], dtype=object),
    )
    for (x, y), g in zip(pairs, got):
        assert g == pytest.approx(_jaro_winkler(x, y), abs=1e-12), (x, y)


def test_jw_batch_hypothesis_parity():
    """Property fuzz: the length-bucketed numpy JW must agree with the
    scalar on arbitrary unicode batches — mixed lengths in one batch
    exercise every bucket boundary, empty strings, repeats, and
    codepoints outside the test alphabet."""
    from hypothesis import given, settings, strategies as st

    from entity_resolution_pipeline_v1_spark.functions.similarity import (
        _jaro_winkler,
        _jaro_winkler_batch,
    )

    pair = st.tuples(st.text(max_size=40), st.text(max_size=40))

    @settings(max_examples=60, deadline=None)
    @given(st.lists(pair, min_size=1, max_size=25))
    def _check(pairs):
        got = _jaro_winkler_batch(
            np.array([p[0] for p in pairs], dtype=object),
            np.array([p[1] for p in pairs], dtype=object),
        )
        for (x, y), g in zip(pairs, got):
            assert g == pytest.approx(_jaro_winkler(x, y), abs=1e-12), (x, y)

    _check()


def test_jaro_winkler_pathological_lengths(spark):
    """Multi-KB 'names' must neither blow the batch char matrix nor
    distort results: inputs are capped at JW_MAX_LEN, so two strings
    identical through the cap score 1.0 and the call returns quickly."""
    long_a = "x" * 50_000
    df = spark.createDataFrame(
        [(long_a, long_a), (long_a, long_a[:-1] + "y"), (long_a, "short")],
        "a string, b string",
    )
    got = [r["j"] for r in df.select(S.jaro_winkler_udf("a", "b").alias("j")).collect()]
    assert got[0] == 1.0
    assert got[1] == 1.0  # differs only beyond the cap
    assert 0.0 <= got[2] < 1.0


def test_jaro_winkler(spark):
    df = spark.createDataFrame(
        [("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("abc", "abc"), ("", "abc"), (None, "x")],
        "a string, b string",
    )
    got = [r["j"] for r in df.select(S.jaro_winkler_udf("a", "b").alias("j")).collect()]
    assert got[0] == pytest.approx(0.9611, abs=1e-3)
    assert got[1] == pytest.approx(0.8133, abs=1e-3)
    assert got[2] == 1.0
    assert got[3] == 0.0
    assert got[4] == 0.0


def test_embed_batch_parity_scalar():
    """The batch-vectorized embedder must be BIT-IDENTICAL to the
    scalar reference embed_string (the E2E F1 gate and every pinned
    golden number depend on the vectors): mixed unicode, empties,
    nulls, astral-plane codepoints, and both dims."""
    import random

    import pandas as pd

    from entity_resolution_pipeline_v1_spark.functions.embedder import (
        _embed_batch,
        embed_string,
    )

    cases = [None, "", "a", "ab", "abc", "Smith, John", "SMITH, JOHN  ",
             "Müller, Jürgen", "Ünïçødé ♞ 𝔘𝔫𝔦", "日本語のテキスト", "x" * 500,
             "é", "naïve", "𠀀𠀁𠀂", "  spaces  ", "\t\n", "^$", "a\x00b"]
    rng = random.Random(3)
    words = ["smith", "john", "garcía", "lópez", "wang", "孙", "иван", "ωμέγα"]
    for _ in range(300):
        cases.append(" ".join(rng.choice(words) for _ in range(rng.randrange(1, 6))))
    for dim in (16, 64):
        got = _embed_batch(pd.Series(cases, dtype=object), dim)
        for i, s in enumerate(cases):
            exp = embed_string(s, dim)
            g = got.iloc[i]
            if exp is None:
                assert g is None, (i, s)
            else:
                assert g == exp, (i, s)


def test_embed_batch_hypothesis_parity():
    """Property fuzz vectorized-vs-scalar (the round-4 JW NUL bug was
    found this way, not by seeded-random tests)."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from entity_resolution_pipeline_v1_spark.functions.embedder import (
        _embed_batch,
        embed_string,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.one_of(st.none(), st.text(max_size=30)), min_size=1, max_size=20))
    def _check(texts):
        got = _embed_batch(pd.Series(texts, dtype=object), 16)
        for i, s in enumerate(texts):
            exp = embed_string(s, 16)
            g = got.iloc[i]
            if exp is None:
                assert g is None, (i, s)
            else:
                assert g == exp, (i, s)

    _check()


def test_embed_udf_no_per_row_python(spark):
    """The Spark-side UDF path: vectors through make_embed_udf equal the
    scalar reference, and the UDF body is the batch implementation (no
    per-row map in the hot path — VERDICT r4 'What's wrong' #3)."""
    import inspect

    from entity_resolution_pipeline_v1_spark.functions import embedder as EM

    rows = [(1, "Smith, John"), (2, "smith, john"), (3, None), (4, ""), (5, "Müller")]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {r["id"]: r["v"] for r in df.select("id", EM.make_embed_udf(32)(F.col("s")).alias("v")).collect()}
    for i, s in rows:
        exp = EM.embed_string(s, 32)
        if exp is None:
            assert got[i] is None
        else:
            assert got[i] == exp
    src = inspect.getsource(EM._embed_batch)
    assert ".map(" not in src and "for i in range(len(" not in src


def test_jw_distinct_pair_dedup_feeds_any_backend(monkeypatch):
    """The factorize sits ABOVE the backend choice: on a dup-heavy
    batch the scoring kernel receives only the DISTINCT pairs, and the
    broadcast-back leaves per-row values identical to scalar JW."""
    import pandas as pd

    from entity_resolution_pipeline_v1_spark.functions import similarity as SIM

    pairs = [("martha", "marhta"), ("dixon", "dicksonx"), ("ab", "ab")]
    a = pd.Series([p[0] for p in pairs] * 400)   # 1200 rows, 3 distinct
    b = pd.Series([p[1] for p in pairs] * 400)
    seen = {}
    orig = SIM._jw_score_unique

    def counting(ua, ub):
        seen["n_unique_scored"] = len(ua)
        return orig(ua, ub)

    monkeypatch.setattr(SIM, "_jw_score_unique", counting)
    out = SIM._jw_batch_impl(a, b)
    assert seen["n_unique_scored"] == 3, "backend saw repeats — factorize not hoisted"
    for i in range(len(a)):
        assert out.iloc[i] == pytest.approx(SIM._jaro_winkler(a.iloc[i], b.iloc[i]), abs=1e-12)
    # nulls stay 0.0 and never reach the kernel
    a2 = pd.Series(["x", None, "y"])
    b2 = pd.Series([None, "x", "y"])
    out2 = SIM._jw_batch_impl(a2, b2)
    assert list(out2) == [0.0, 0.0, 1.0]
