"""MinHash / SimHash / winnowing sketch behavior."""

import numpy as np
from pyspark.sql import functions as F

from entity_resolution_pipeline_v1_spark.functions import sketches as SK
from entity_resolution_pipeline_v1_spark.functions import text as TX


def test_minhash_deterministic_and_similarity_sensitive(spark):
    rows = [
        ("a", ["x", "y", "z", "w"]),
        ("b", ["x", "y", "z", "w"]),          # identical
        ("c", ["x", "y", "z", "q"]),          # 3/5 jaccard
        ("d", ["p", "q", "r", "s"]),          # disjoint from a
    ]
    df = spark.createDataFrame(rows, "id string, toks array<string>")
    sigs = {
        r["id"]: r["sig"]
        for r in df.select("id", SK.minhash_signature("toks", 16).alias("sig")).collect()
    }
    assert sigs["a"] == sigs["b"]
    overlap_c = sum(x == y for x, y in zip(sigs["a"], sigs["c"]))
    overlap_d = sum(x == y for x, y in zip(sigs["a"], sigs["d"]))
    assert overlap_c > overlap_d


def test_minhash_null_on_empty(spark):
    df = spark.createDataFrame([([],), (None,)], "toks array<string>")
    got = df.select(SK.minhash_signature("toks", 8).alias("s")).collect()
    assert all(r["s"] is None for r in got)


def test_lsh_band_keys(spark):
    df = spark.createDataFrame([(["x", "y", "z", "w"],), (["x", "y", "z", "w"],)], "toks array<string>")
    sig = SK.minhash_signature("toks", 16)
    keys = df.select(SK.lsh_band_keys(sig, 16, 4).alias("k")).collect()
    assert keys[0]["k"] == keys[1]["k"]
    assert len(keys[0]["k"]) == 4


def test_simhash_near_vs_far(spark):
    doc = "the quick brown fox jumps over the lazy dog again and again".split()
    near = doc[:-1] + ["often"]
    far = "completely different words with nothing shared at all here now".split()
    df = spark.createDataFrame([(doc,), (near,), (far,)], "toks array<string>")
    sims = [r["s"] for r in df.select(SK.simhash_udf("toks").alias("s")).collect()]
    d01 = bin(np.uint64(sims[0]) ^ np.uint64(sims[1])).count("1")
    d02 = bin(np.uint64(sims[0]) ^ np.uint64(sims[2])).count("1")
    assert d01 < d02
    # hamming64 column expr agrees with python
    df2 = spark.createDataFrame([(sims[0], sims[1])], "a long, b long")
    got = df2.select(SK.hamming64("a", "b").alias("h")).collect()[0]["h"]
    assert got == d01


def test_winnow_fingerprint(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",),
         ("the quick brown fox jumps over the lazy dog",),
         ("completely unrelated text body goes here",), ("ab",)],
        "t string",
    )
    fps = [r["f"] for r in df.select(SK.winnow_fingerprint_udf("t").alias("f")).collect()]
    assert fps[0] == fps[1]
    assert set(fps[0]) != set(fps[2])
    assert fps[3] == []


def test_simhash_band_keys_pigeonhole(spark):
    # distance-1 pair must collide on >= 3 of 4 band keys
    a = np.int64(0x0F0F0F0F0F0F0F0F)
    b = np.int64(a ^ 1)
    df = spark.createDataFrame([(int(a),), (int(b),)], "s long")
    keys = [r["k"] for r in df.select(SK.simhash_band_keys("s", 4).alias("k")).collect()]
    assert len(set(keys[0]) & set(keys[1])) >= 3


def test_simhash_matches_scalar_definition(spark):
    """Golden oracle for the batch-vectorized simhash_udf: it must
    reproduce the scalar SimHash definition bit for bit — md5-based
    token hash, ±1 per bit over the distinct token set, (h >> k) & 1
    bit order."""
    import hashlib

    def scalar_simhash(toks):
        if not toks:
            return 0
        acc = [0] * 64
        for tok in set(toks):
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            for k in range(64):
                acc[k] += ((h >> k) & 1) * 2 - 1
        sim = 0
        for k in range(64):
            if acc[k] > 0:
                sim |= 1 << k
        return np.uint64(sim).astype(np.int64).item() if sim >= 2**63 else sim

    rows = [
        (["alpha", "beta", "gamma"],),
        (["alpha", "beta", "gamma", "alpha"],),  # dup token collapses
        (["one"],),
        ([],),
        (None,),
        (["日本語", "токен", "mixed"],),
    ]
    df = spark.createDataFrame(rows, "toks array<string>")
    got = [r["s"] for r in df.select(SK.simhash_udf("toks").alias("s")).collect()]
    want = [scalar_simhash(t[0]) for t in rows]
    assert got == want


def test_minhash_est_expr_matches_udf(spark):
    """The codegen zip_with estimator (the production prune path) must
    be bit-identical to the Arrow UDF estimator on the same signature
    pairs — including NULL handling semantics (expr: NULL, udf: 0.0;
    the prune filter treats both as 'below threshold')."""
    import random

    rng = random.Random(7)
    rows = []
    for _ in range(200):
        a = [rng.randrange(0, 50) for _ in range(64)]
        # force varying agreement rates
        b = [x if rng.random() < rng.random() else rng.randrange(0, 50) for x in a]
        rows.append((a, b))
    rows.append((None, [1] * 64))
    rows.append(([2] * 64, None))
    df = spark.createDataFrame(rows, "sig1 array<bigint>, sig2 array<bigint>")
    got = df.select(
        SK.minhash_est_jaccard_expr(F.col("sig1"), F.col("sig2"), 64).alias("e"),
        SK.minhash_est_jaccard_udf(F.col("sig1"), F.col("sig2")).alias("u"),
    ).collect()
    for r in got:
        if r["e"] is None:
            assert r["u"] == 0.0  # NULL side: expr NULL, udf 0.0 — both pruned
        else:
            assert r["e"] == r["u"]
