"""Preprocess dictionary semantics + blocking recall/cap behavior."""

from pyspark.sql import functions as F

from entity_resolution_pipeline_v1_spark.operators import blocking, extract, pairs, preprocess
from entity_resolution_pipeline_v1_spark.sources import pages as P


def test_long_form_and_unique_strings(spark):
    records = spark.createDataFrame(
        [
            ("r1", "c1", "A", "T", None, "S"),
            ("r2", "c1", "A", "T2", "P", None),
        ],
        "record_id string, composite string, person string, title string, provision string, subjects string",
    )
    long = preprocess.long_form(records)
    # nulls dropped: each record has 4 non-null fields of 5
    assert long.count() == 8
    uniq = preprocess.unique_strings(long)
    a = uniq.filter((F.col("field") == "person") & (F.col("value") == "A")).collect()[0]
    assert a["frequency"] == 2
    # same value in different fields are separate dictionary entries
    assert uniq.filter(F.col("value") == "c1").count() == 1


def test_parse_records_roundtrip(spark, corpus):
    ext = extract.extract_text(P.pages_view(corpus), mode="main")
    recs = preprocess.parse_records(ext)
    joined = recs.join(
        corpus.select("record_id", F.col("person").alias("p0"), F.col("title").alias("t0"),
                      F.col("provision").alias("pr0"), F.col("subjects").alias("s0")),
        on="record_id",
    )
    bad = joined.filter(
        (F.col("person") != F.col("p0"))
        | (F.col("title") != F.col("t0"))
        | ~(F.col("provision").eqNullSafe(F.col("pr0")))
        | ~(F.col("subjects").eqNullSafe(F.col("s0")))
    ).count()
    assert bad == 0
    assert recs.count() == corpus.count()


def test_parse_records_nonconforming_urls_keep_distinct_ids(spark, corpus):
    """regexp_extract returns '' (not NULL) on no-match: without a
    fallback, EVERY url that misses the /p/<id> pattern in a web-scale
    corpus would collapse into one empty-string record identity —
    catastrophic skew and wrong merges. Nonconforming urls must keep a
    stable distinct identity."""
    pg = P.pages_view(corpus).withColumn(
        "url",
        F.concat(F.lit("https://weird.example/x/"), F.monotonically_increasing_id().cast("string")),
    )
    recs = preprocess.parse_records(extract.extract_text(pg, mode="main"))
    n = recs.count()
    assert recs.filter(F.col("record_id") == "").count() == 0
    assert recs.select("record_id").distinct().count() == n


def test_records_wide_has_vectors(spark, corpus):
    ext = extract.extract_text(P.pages_view(corpus), mode="main")
    recs = preprocess.parse_records(ext)
    uniq = preprocess.unique_strings(preprocess.long_form(recs))
    emb = preprocess.embed_unique(uniq, dim=32)
    wide = preprocess.records_wide(recs, emb)
    row = wide.filter(F.col("person").isNotNull()).select("person_vec", "composite_vec").first()
    assert row["person_vec"] is not None and len(row["person_vec"]) == 32
    assert row["composite_vec"] is not None


def test_blocking_same_entity_collides(spark, corpus):
    """Every same-entity consecutive pair must share >= 1 block key —
    the blocking-recall contract at the engine's own keys."""
    ext = extract.extract_text(P.pages_view(corpus), mode="main")
    recs = preprocess.parse_records(ext)
    blocks = blocking.cap_blocks(blocking.build_blocks(recs))
    cand = pairs.candidate_pairs(blocks)
    lp = P.labeled_pairs(corpus).filter("match").select(
        F.col("left").alias("id1"), F.col("right").alias("id2")
    )
    recall = cand.join(lp, ["id1", "id2"], "left_semi").count() / lp.count()
    assert recall >= 0.85


def test_cap_blocks(spark):
    rows = [(f"r{i}", "hot") for i in range(50)] + [("a", "ok"), ("b", "ok"), ("c", "solo")]
    blocks = spark.createDataFrame(rows, "record_id string, block_key string")
    capped = blocking.cap_blocks(blocks, max_block_size=10)
    keys = {r["block_key"] for r in capped.select("block_key").distinct().collect()}
    assert keys == {"ok"}  # hot dropped, singleton dropped


def test_candidate_pairs_and_dedup(spark):
    blocks = spark.createDataFrame(
        [("a", "k1"), ("b", "k1"), ("c", "k1"), ("a", "k2"), ("b", "k2")],
        "record_id string, block_key string",
    )
    cand = pairs.candidate_pairs(blocks)
    got = {(r["id1"], r["id2"]) for r in cand.collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}

    scored = spark.createDataFrame(
        [("b", "a", 0.9), ("a", "b", 0.7)], "id1 string, id2 string, confidence double"
    )
    d = pairs.dedup_scored_pairs(scored).collect()
    assert len(d) == 1 and d[0]["id1"] == "a" and d[0]["confidence"] == 0.9


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame([(i, f"k{i%3}") for i in range(30)], "v long, key string")
    dim = spark.createDataFrame([(f"k{i}", f"d{i}") for i in range(3)], "key string, payload string")
    plain = {(r["v"], r["payload"]) for r in fact.join(dim, "key").collect()}
    salted = {(r["v"], r["payload"]) for r in
              __import__("entity_resolution_pipeline_v1_spark.operators.pairs", fromlist=["salted_join"]).salted_join(fact, dim, "key", num_salts=4).collect()}
    assert salted == plain
