"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: MinHash-LSH near-dup detection + transitive
                clustering over the documents table at sf0.001.
queries()     — one entry per implemented operator family from
                SURVEY.md §2, each (spark, sf_dir) -> DataFrame built
                from the engine's own operators/functions.
oracle_sql()  — matching ANSI SQL for DuckDB over the same parquet
                views. Column names/aliases match exactly; floats are
                rounded identically on both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from entity_resolution_pipeline_v1_spark.functions import text as TX
from entity_resolution_pipeline_v1_spark.functions.similarity import (
    harmonic_mean,
    harmonic_mean_smoothed,
    levenshtein_sim,
    safe_ratio,
    sigmoid,
    token_jaccard,
)
from entity_resolution_pipeline_v1_spark.functions.sketches import (
    simhash_udf,
    winnow_fingerprint_udf,
)
from entity_resolution_pipeline_v1_spark.operators import dedup, simsearch
from entity_resolution_pipeline_v1_spark.operators.util import ensure_parallelism


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Near-dup document clustering at sf0.001: MinHash-LSH candidates,
    shingle-Jaccard verify, connected components, cluster summary."""
    from entity_resolution_pipeline_v1_spark.operators.cluster import connected_components

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    pairs = dedup.minhash_lsh_dedup(docs, jaccard_threshold=0.5)
    edges = pairs.select(
        F.col("id1").cast("string").alias("src"), F.col("id2").cast("string").alias("dst")
    )
    labels = connected_components(edges)
    return (
        labels.groupBy("cluster_id")
        .agg(F.count("*").alias("size"), F.sort_array(F.collect_list("record_id")).alias("members"))
        .orderBy(F.desc("size"), "cluster_id")
    )


# --------------------------------------------------------------------------
# queries — engine side
# --------------------------------------------------------------------------

def _q_tpch_q1(spark, sf_dir):
    # A-family: grouped aggregation with partial map-side combine (A1/A4)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def _q_top_orders_per_cust(spark, sf_dir):
    # W1: top-k per group via window (reference querying.py:140-146)
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 4).alias("totalprice"), "rank")
    )


def _q_revenue_by_nation(spark, sf_dir):
    # J-family: broadcast dim joins (J3/J6 analogue)
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"), F.count("*").alias("n_orders"))
    )


def _q_customers_no_orders(spark, sf_dir):
    # anti-join (P8 semi/anti semantics)
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def _q_pair_dedup(spark, sf_dir):
    # J5: canonical (least,greatest) pair dedup keeping max weight
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.least("l_partkey", "l_suppkey").alias("id1"),
            F.greatest("l_partkey", "l_suppkey").alias("id2"),
            F.col("l_extendedprice").alias("w"),
        )
        .groupBy("id1", "id2")
        .agg(F.round(F.max("w"), 4).alias("confidence"))
    )


def _q_field_stats(spark, sf_dir):
    # A4: per-field length statistics (reference analysis.py:52-130)
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.stddev("n_chars"), 4).alias("std_chars"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("median_chars"),
    )


def _q_token_freq(spark, sf_dir):
    # A1 + P4: token frequency dictionary with min-frequency filter.
    # The regex tokenizer + explode + partial agg all run in the scan
    # stage, which is ONE task on the single-row-group documents file —
    # round-robin it first so tokenization uses every core.
    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return (
        d.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= 5)
    )


def _q_exact_dedup(spark, sf_dir):
    # exact dedup groups: md5 groupBy (P3 + A1)
    d = _t(spark, sf_dir, "documents")
    return dedup.exact_duplicates(d).select(
        "text_hash", "canonical_id", "dup_count"
    )


def _q_doc_stats(spark, sf_dir):
    # text-analysis layer: token counts + noise ratios per document
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.whitespace_token_count("text").alias("n_tokens"),
        TX.bpe_ish_token_count("text").alias("n_subtokens"),
        F.round(TX.punct_ratio("text"), 4).alias("punct_ratio"),
        F.round(TX.digit_ratio("text"), 4).alias("digit_ratio"),
        F.round(TX.stopword_ratio("text"), 4).alias("stopword_ratio"),
    )


def _q_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.lang_id("text").alias("pred_lang"))


def _q_levenshtein_pairs(spark, sf_dir):
    # F2 over adjacent same-source docs
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("head")
    )
    a = d.alias("a")
    b = d.alias("b")
    return (
        a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id"))
        .filter(F.col("a.doc_id") % 5 == 0)
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            F.round(levenshtein_sim(F.col("a.head"), F.col("b.head")), 4).alias("lev_sim"),
        )
    )


def _q_shingle_jaccard(spark, sf_dir):
    # n-gram Jaccard near-dup metric over adjacent docs
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", TX.char_shingles(F.substring("text", 1, 60), 3).alias("sh")
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id"))
        .filter(F.col("a.doc_id") % 5 == 0)
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            F.round(token_jaccard(F.col("a.sh"), F.col("b.sh")), 4).alias("jaccard"),
        )
    )


def _q_minmax_normalize(spark, sf_dir):
    # A10: min-max normalization with group stats (classification.py:340-359)
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    rng = F.max("o_totalprice").over(w) - F.min("o_totalprice").over(w)
    norm = (F.col("o_totalprice") - F.min("o_totalprice").over(w)) / F.when(rng == 0, 1.0).otherwise(rng)
    return o.select("o_orderkey", "o_orderpriority", F.round(norm, 4).alias("norm_price"))


def _q_lr_score(spark, sf_dir):
    # C2: fixed-weight sigmoid scoring + threshold as column exprs
    li = _t(spark, sf_dir, "lineitem")
    z = (
        F.lit(-1.5)
        + 2.0 * F.col("l_discount")
        + 0.5 * F.col("l_tax")
        + 0.0001 * F.col("l_extendedprice")
        - 0.01 * F.col("l_quantity")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(sigmoid(z), 4).alias("score"),
        (sigmoid(z) >= 0.5).alias("is_match"),
    )


def _q_confidence_histogram(spark, sf_dir):
    # A5: 20 fixed bins over a confidence score (reporting.py:350-414)
    li = _t(spark, sf_dir, "lineitem")
    conf = sigmoid(F.lit(-1.5) + 2.0 * F.col("l_discount") + 0.0001 * F.col("l_extendedprice"))
    return (
        li.select(F.least(F.floor(conf * 20), F.lit(19)).cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
    )


def _q_harmonic_features(spark, sf_dir):
    # F3/F4/F5 interaction features as column exprs
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(harmonic_mean(F.col("l_discount"), F.col("l_tax")), 4).alias("disc_tax_harmonic"),
        # F3b: the reference's smoothed variant (parallel_features.py:402-417)
        F.round(
            harmonic_mean_smoothed(F.col("l_discount"), F.col("l_tax")), 4
        ).alias("disc_tax_harmonic_sm"),
        F.round(F.col("l_discount") * F.col("l_tax"), 4).alias("disc_tax_product"),
        F.round(safe_ratio(F.col("l_discount"), F.col("l_tax")), 4).alias("disc_tax_ratio"),
    )


def _q_cluster_sizes(spark, sf_dir):
    # P8/G5: group-size filter (min size semantics)
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 12)
    )


def _q_sessionize(spark, sf_dir):
    # sessionization: lag + gap>30min cumsum (streaming-adjacent batch op)
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"), F.count("*").alias("n_events"))
    )


def _q_running_revenue(spark, sf_dir):
    # window frame: cumulative revenue per customer
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_revenue"),
    )


def _q_embedding_norms(spark, sf_dir):
    # vector column aggregation via higher-order functions
    e = _t(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return (
        e.select("label", norm.alias("nrm"))
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.round(F.avg("nrm"), 4).alias("avg_norm"))
    )


def _q_cosine_topk(spark, sf_dir):
    # ANN baseline: brute-force cosine top-3 for 5 query vectors
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = simsearch.brute_force_topk(e, queries, k=3, id_col="vec_id")
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank"
    )


def _q_year_extract(spark, sf_dir):
    # F6-style regex extraction over events props (first 4-digit run)
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.regexp_extract("text", r"\d{4}", 0).alias("first_year")
    )


def _q_simhash_docs(spark, sf_dir):
    # full oracle row (round 5): DuckDB recomputes the md5-bit SimHash
    # from first principles (oracle_sql()["simhash_docs"])
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", simhash_udf(TX.tokens(F.col("text"))).alias("simhash"))


def _q_ivf_topk_exact(spark, sf_dir):
    # ANN scale path under the exact configuration: IVF-Flat probing
    # ALL cells — identical results to brute force (same oracle SQL as
    # cosine_topk), through the salted grouped-GEMM shards that survive
    # an unbounded query side at cluster scale (simsearch.ivf_topk
    # drops the cell machinery when every cell would be probed — the
    # assignment cannot change an all-cells result, so no centroids
    # are trained; the approximate cell path keeps pytest coverage).
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = simsearch.ivf_topk(
        e.select("vec_id", "embedding"), queries, None,
        k=3, nprobe=0, id_col="vec_id",
    )
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank"
    )


def _q_lsh_topk(spark, sf_dir):
    # the LSH-bucketed ANN family (random hyperplanes, multi-probe
    # radius 1) with the bucket assignment ITSELF oracle-recomputable:
    # integer closed-form plane coefficients over floor(v*1000)
    # quantized components, so the candidate set — not just the
    # cosines — is pinned cross-engine (operators/simsearch.lsh_topk)
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = simsearch.lsh_topk(
        e.select("vec_id", "embedding"), queries,
        k=3, n_planes=8, hamming_radius=1, id_col="vec_id",
    )
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank"
    )


def _q_winnow_docs(spark, sf_dir):
    # full oracle row (round 5): DuckDB recomputes the FNV rolling-hash
    # winnowing fingerprints (Schleimer et al., SIGMOD'03) from first
    # principles; also golden-hash pinned in tests/test_entry_oracle.py.
    # Emitted as SCALAR rows (doc_id, fingerprint) — the round-4 form
    # returned the array<long> column itself, which the driver's
    # pandas-based row canonicalizer cannot hash (CORRECTNESS_r04's one
    # red row: "unhashable type: 'list'")
    # round-robin the single-file scan first: the winnowing UDF costs
    # ~200µs/doc and would otherwise run in ONE task (documents.parquet
    # is one row group — measured 9.8s serial vs ~1s spread at sf1.0)
    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id", winnow_fingerprint_udf(F.col("text")).alias("fingerprints")
    ).select("doc_id", F.explode("fingerprints").alias("fingerprint"))


def _q_winnow_dedup(spark, sf_dir):
    # full oracle row (round 5): the winnowing near-dup PAIR operator —
    # fingerprints as inverted-index block keys, exact fingerprint-
    # Jaccard verify (operators/dedup.winnow_dedup). Oracle = brute
    # force, which IS the contract (inverted-index recall is perfect).
    d = _t(spark, sf_dir, "documents")
    return dedup.winnow_dedup(d, jaccard_threshold=0.35).select(
        "id1", "id2", F.round("jaccard", 4).alias("jaccard")
    )


def _q_embedding_near_dup(spark, sf_dir):
    # LLM-pipeline dedup: embedding-cosine near-dup through the exact
    # O(n²) verification baseline (the scale path passes group_col for
    # a per-bucket join — dedup.embedding_near_dup docstring). The
    # synthetic embeddings carry no true near-dups (max pairwise cosine
    # ≈0.5), so the threshold sits below that to yield a non-empty
    # result that pins the join + cosine + filter semantics. Both sides
    # filter on the ROUNDED cosine so a float-vs-double ulp at the
    # threshold boundary cannot flip membership between engines.
    e = _t(spark, sf_dir, "embeddings")
    out = dedup.embedding_near_dup(e, cosine_threshold=0.39)
    return out.filter(F.round("cosine", 4) >= 0.40).select(
        "id1", "id2", F.round("cosine", 4).alias("cosine")
    )


def _q_minhash_near_dup(spark, sf_dir):
    # full oracle row (round 5): LSH near-dup pairs over documents,
    # checked against the brute-force shingle-Jaccard oracle (which
    # doubles as a standing LSH recall-regression gate)
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_dedup(d, jaccard_threshold=0.6).select(
        "id1", "id2", F.round("jaccard", 4).alias("jaccard")
    )


# -- deterministic edges fixture shared by the CC query + oracle -----------

def _cc_edges(spark, sf_dir):
    """Chains + chords over doc_ids: (d, d+1) for d%3==0 and (d, d+5)
    for d%10==0, endpoints restricted to existing docs via self-join."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    a, b = d.alias("a"), d.alias("b")
    e1 = (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .filter(F.col("a.doc_id") % 3 == 0)
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    e2 = (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 5)
        .filter(F.col("a.doc_id") % 10 == 0)
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    return e1.unionByName(e2)


def _q_connected_components(spark, sf_dir):
    # G2: large-star/small-star CC (reference src/clustering.py:95-105)
    # over a deterministic edges fixture; oracle = DuckDB recursive
    # min-label propagation
    from entity_resolution_pipeline_v1_spark.operators.cluster import connected_components

    return connected_components(_cc_edges(spark, sf_dir)).select(
        "record_id", "cluster_id"
    )


def _year_strings(spark, sf_dir):
    """Deterministic person strings covering all ten reference
    birth/death formats (reference tests/birth_death_year_regexes.py),
    built identically in Spark and in the DuckDB oracle from doc_id."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    y1 = (F.lit(1500) + F.col("doc_id") % 400).cast("string")
    y1n = F.lit(1500) + F.col("doc_id") % 400
    y2 = (y1n + 60).cast("string")
    ys1 = (
        F.when(F.col("doc_id") % 5 == 0, F.concat(y1, F.lit("?")))
        .when(F.col("doc_id") % 7 == 0, F.concat(y1, F.lit(" or "), (y1n + 1).cast("string")))
        .otherwise(y1)
    )
    ys2 = F.when(F.col("doc_id") % 11 == 0, F.concat(y2, F.lit("?"))).otherwise(y2)
    k = F.col("doc_id") % 12
    person = (
        F.when(k == 0, F.concat(F.lit("Smith, John, "), ys1, F.lit(" - approximately "), ys2))
        .when(k == 1, F.concat(F.lit("approximately "), ys1, F.lit("-approximately "), ys2))
        .when(k == 2, F.concat(F.lit("circa "), ys1, F.lit(" - "), ys2))
        .when(k == 3, F.concat(F.lit("Doe, Jane, "), ys1, F.lit("-"), ys2))
        .when(k == 4, F.concat(F.lit("Roe, R., - approximately "), ys2))
        .when(k == 5, F.concat(F.lit("Roe, R., -"), ys2))
        .when(k == 6, F.concat(F.lit("approximately "), ys1, F.lit("-")))
        .when(k == 7, F.concat(F.lit("Lee, Ann, "), ys1, F.lit("-")))
        .when(k == 8, F.concat(F.lit("b. "), ys1))
        .when(k == 9, F.concat(F.lit("died "), ys2))
        .when(k == 10, F.concat(F.lit("approximately "), ys1))
        .otherwise(F.lit("Nodates, Person"))
    )
    return d.select("doc_id", person.alias("person"))


def _q_year_cascade(spark, sf_dir):
    # F6: the full 10-pattern first-match-wins cascade through the
    # Arrow-batched UDF (reference src/features.py:56-90, 378-402),
    # including the ' or '/'?' cleanup and the single-group death-only
    # dispatch quirk
    from entity_resolution_pipeline_v1_spark.functions.years import extract_years_udf

    s = _year_strings(spark, sf_dir)
    return s.withColumn("_y", extract_years_udf("person")).select(
        "doc_id", "person", F.col("_y.birth").alias("birth"), F.col("_y.death").alias("death")
    )


def _q_jaro_winkler_pairs(spark, sf_dir):
    # F11 via the Arrow-batched pandas UDF; oracle is DuckDB's native
    # jaro_winkler_similarity (same 0.7 boost threshold, verified)
    from entity_resolution_pipeline_v1_spark.functions.similarity import jaro_winkler_udf

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 20).alias("head")
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id"))
        .filter(F.col("a.doc_id") % 5 == 0)
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            F.round(jaro_winkler_udf(F.col("a.head"), F.col("b.head")), 4).alias("jw"),
        )
    )


def _q_cosine_topk_udf(spark, sf_dir):
    # the pandas-UDF cosine path (features hot path) against the same
    # oracle as the expression variant
    from entity_resolution_pipeline_v1_spark.functions.similarity import cosine_udf

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv")
    )
    scored = (
        e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_cv"))
        .crossJoin(F.broadcast(q))
        .withColumn("cosine", cosine_udf(F.col("_qv"), F.col("_cv")))
        .filter(F.col("query_id").cast("string") != F.col("neighbor_id").cast("string"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


def _q_knn_impute(spark, sf_dir):
    # §2.11 vector hot-deck imputation (reference src/imputation.py:
    # 200-265) through the shuffled IVF cell join with nprobe=ALL
    # (exact): donors = vec_id%10!=0, queries = vec_id%10==0
    from entity_resolution_pipeline_v1_spark.operators.impute import impute_field

    e = _t(spark, sf_dir, "embeddings")
    rw = e.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("record_id"),
        F.lit(None).cast("string").alias("provision"),
        F.col("embedding").alias("composite_vec"),
    )
    ue = e.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").cast("string").alias("hash"),
        F.lit("provision").alias("field"),
        F.col("label").cast("string").alias("value"),
        F.col("embedding").alias("vector"),
    )
    out = impute_field(rw, ue, "provision", k=10, min_similarity=0.3, n_centroids=8)
    norm = F.sqrt(
        F.aggregate(
            F.col("imputed_vector"), F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return out.select("record_id", "imputed_value", F.round(norm, 4).alias("imputed_norm"))


def _q_media_meta(spark, sf_dir):
    # multimodal plumbing that is REAL today: binary payload column,
    # native metadata (byte length + md5 content id), content-id exact
    # dedup groups
    from entity_resolution_pipeline_v1_spark.operators.multimodal import attach_media_meta

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"), F.encode("text", "utf-8").alias("payload")
    )
    m = attach_media_meta(media)
    return m.groupBy("content_id").agg(
        F.min("media_id").alias("canonical_id"),
        F.count("*").alias("dup_count"),
        F.min("payload_bytes").alias("payload_bytes"),
    )


def _q_media_header(spark, sf_dir):
    # REAL multimodal decode step: synthesize a structurally-valid PNG
    # payload per document (dims derived from doc_id), then parse the
    # mime/width/height back OUT OF THE BYTES with the pure-Python
    # container-header parser (multimodal.image_header_udf). The
    # oracle predicts the dims arithmetically — any parser/builder
    # disagreement breaks the hash match.
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        image_header_udf,
        make_png_udf,
    )

    d = _t(spark, sf_dir, "documents")
    w = (F.col("doc_id") % 640 + 1).cast("int")
    h = (F.col("doc_id") % 480 + 1).cast("int")
    media = d.select("doc_id", make_png_udf(w, h).alias("payload"))
    parsed = media.select("doc_id", image_header_udf("payload").alias("hdr"))
    return parsed.select(
        "doc_id",
        F.col("hdr.mime").alias("mime"),
        F.col("hdr.width").alias("width"),
        F.col("hdr.height").alias("height"),
    )


def _q_media_pixel_stats(spark, sf_dir):
    # REAL pixel decode (not a header parse): encode a closed-form
    # gradient pattern into REAL PNG bytes (zlib + filters + CRCs),
    # decode the pixels back OUT OF THE BYTES (stdlib zlib + numpy
    # unfiltering, multimodal.decode_png_pixels), and emit integer-
    # exact pixel statistics. The oracle recomputes the same sums
    # arithmetically from the gradient formula — the hash matches only
    # if the full encode -> compress -> decompress -> unfilter -> stats
    # round trip is bit-correct. Integer columns only: zero float
    # drift between engines.
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        gradient_png_udf,
        image_pixel_stats_udf,
    )

    d = _t(spark, sf_dir, "documents")
    w = (F.col("doc_id") % 9 + 8).cast("int")
    h = (F.col("doc_id") % 7 + 6).cast("int")
    media = d.select(
        "doc_id", gradient_png_udf(w, h, F.col("doc_id").cast("long")).alias("payload")
    )
    st = media.select("doc_id", image_pixel_stats_udf("payload").alias("s"))
    return st.select(
        "doc_id",
        F.col("s.width").alias("width"),
        F.col("s.height").alias("height"),
        F.col("s.channels").alias("channels"),
        F.col("s.pix_sum").alias("pix_sum"),
        F.col("s.pix_sq_sum").alias("pix_sq_sum"),
    )


def _q_media_gif_stats(spark, sf_dir):
    # REAL GIF pixel decode: a closed-form index pattern LZW-compressed
    # into real GIF bytes (multimodal.encode_gif), pixels decoded back
    # out of the bytes via the pure-Python LZW + palette path
    # (decode_gif_pixels, shared image_pixel_stats_udf). Grayscale
    # palette (i,i,i) makes the decoded RGB sums exactly 3x the index
    # sums, which the oracle recomputes arithmetically — a bit-correct-
    # ness proof of the whole LZW encode -> decode -> palette lookup.
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        gradient_gif_udf,
        image_pixel_stats_udf,
    )

    d = _t(spark, sf_dir, "documents")
    w = (F.col("doc_id") % 11 + 6).cast("int")
    h = (F.col("doc_id") % 5 + 4).cast("int")
    media = d.select(
        "doc_id", gradient_gif_udf(w, h, F.col("doc_id").cast("long")).alias("payload")
    )
    st = media.select("doc_id", image_pixel_stats_udf("payload").alias("s"))
    return st.select(
        "doc_id",
        F.col("s.width").alias("width"),
        F.col("s.height").alias("height"),
        F.col("s.channels").alias("channels"),
        F.col("s.pix_sum").alias("pix_sum"),
        F.col("s.pix_sq_sum").alias("pix_sq_sum"),
    )


def _q_media_frame_sampling(spark, sf_dir):
    # REAL frame sampling: 3-frame animated GIFs whose GCE delays are a
    # closed form of doc_id, frame timeline parsed back out of the
    # actual extension bytes (multimodal.gif_frame_timeline), one
    # sample every 50ms mapped to the frame on screen. The oracle
    # recomputes timeline + mapping arithmetically.
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        anim_gif_udf,
        sample_frames,
    )

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        anim_gif_udf(F.col("doc_id").cast("long")).alias("payload"),
    )
    return sample_frames(media, every_ms=50, fake=False)


def _q_media_mp4_frames(spark, sf_dir):
    # REAL MP4 frame indexing WITHOUT a codec: sample-table MP4s
    # (run-length stts, uniform/per-sample stsz, 2-chunk stsc,
    # stco/co64 by seed) are synthesized from a closed form of doc_id,
    # then every frame's (time, duration, byte range) is parsed back
    # OUT OF THE BYTES (multimodal.mp4_sample_table — ISO 14496-12
    # §8.6-8.7 box walk, mdhd timescale 600 so a real unit conversion
    # happens). The oracle recomputes the schedule arithmetically; any
    # writer/parser drift — RLE expansion, chunk mapping, offset
    # accumulation, 32/64-bit stco — breaks the hash.
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        make_mp4_frames_udf,
        mp4_frames_udf,
    )

    # spread the synth+parse UDF chain (~65µs/doc) beyond the one-task
    # single-row-group scan — same guard every per-row-expensive
    # document query uses
    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    media = d.select(
        F.col("doc_id").alias("media_id"),
        make_mp4_frames_udf(F.col("doc_id").cast("long")).alias("payload"),
    )
    fr = media.select("media_id", F.explode(mp4_frames_udf("payload")).alias("s"))
    return fr.select(
        "media_id",
        F.col("s.frame_index").alias("frame_index"),
        F.col("s.start_ms").alias("start_ms"),
        F.col("s.dur_ms").alias("dur_ms"),
        F.col("s.byte_off").alias("byte_off"),
        F.col("s.byte_len").alias("byte_len"),
    )


def _q_media_audio_stats(spark, sf_dir):
    # REAL sample decode for audio: a closed-form int16 ramp encoded
    # into REAL PCM WAV bytes, samples decoded back out of the bytes
    # (multimodal.decode_wav_samples), integer-exact stats vs an
    # arithmetic oracle — same full-circle proof as media_pixel_stats.
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        audio_sample_stats_udf,
        ramp_wav_udf,
    )

    d = _t(spark, sf_dir, "documents")
    n = (F.col("doc_id") % 400 + 80).cast("long")
    media = d.select(
        "doc_id", ramp_wav_udf(n, F.col("doc_id").cast("long")).alias("payload")
    )
    st = media.select("doc_id", audio_sample_stats_udf("payload").alias("s"))
    return st.select(
        "doc_id",
        F.col("s.sample_rate").alias("sample_rate"),
        F.col("s.n_samples").alias("n_samples"),
        F.col("s.sample_sum").alias("sample_sum"),
        F.col("s.sample_sq_sum").alias("sample_sq_sum"),
        F.col("s.peak").alias("peak"),
    )


def _q_media_av_header(spark, sf_dir):
    # REAL audio/video metadata decode: synthesize structurally-valid
    # WAV (even doc_id) / MP4 (odd doc_id; mvhd v0/v1 alternating by
    # duration parity) payloads, then parse mime + duration_ms back
    # OUT OF THE BYTES (multimodal.av_header_udf). The oracle predicts
    # both arithmetically — any builder/parser drift breaks the hash.
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        av_header_udf,
        make_av_udf,
    )

    d = _t(spark, sf_dir, "documents")
    kind = F.when(F.col("doc_id") % 2 == 0, "audio").otherwise("video")
    dur = (F.col("doc_id") % 9000 + 100).cast("long")
    media = d.select("doc_id", make_av_udf(kind, dur).alias("payload"))
    parsed = media.select("doc_id", av_header_udf("payload").alias("hdr"))
    return parsed.select(
        "doc_id",
        F.col("hdr.mime").alias("mime"),
        F.col("hdr.duration_ms").alias("duration_ms"),
    )


def _q_prefilter_cascade(spark, sf_dir):
    # C4/C5/C6 prefilter cascade + low-info corroboration cap
    # (reference src/classification.py:543-619) end-to-end through
    # classify_pairs with the reference_parity thresholds
    # (config.yml:96-99) and the golden model, over a closed-form
    # feature matrix derived from doc_id — the DuckDB oracle recomputes
    # the full CASE cascade + sigmoid arithmetically (the same trick
    # year_cascade uses). Until round 5 these branches had pytest-only
    # evidence.
    from entity_resolution_pipeline_v1_spark.config import FEATURE_NAMES, PipelineConfig
    from entity_resolution_pipeline_v1_spark.operators.classify import Model, classify_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id")
    cols = [F.col("doc_id").alias("id1"), (F.col("doc_id") + 1).alias("id2")]
    for i, name in enumerate(FEATURE_NAMES):
        cols.append((((F.col("doc_id") + F.lit(i * 7)) % 101) / F.lit(100.0)).alias(name))
    cols.append(F.when(F.col("doc_id") % 7 == 0, 1.0).otherwise(0.0).alias("year_match"))
    cols.append(F.when(F.col("doc_id") % 5 == 0, 1.0).otherwise(0.0).alias("low_info_name"))
    cols.append(((F.col("doc_id") % 4) / F.lit(10.0)).alias("title_jaccard"))
    cols.append(((F.col("doc_id") % 9) / F.lit(10.0)).alias("subjects_jaccard"))
    featured = d.select(*cols)
    cfg = PipelineConfig.reference_parity()
    out = classify_pairs(featured, Model.golden(), cfg, year_match_col=F.col("year_match"))
    return out.select(
        "id1", "id2", F.round("confidence", 4).alias("confidence"), "is_match"
    )


def _q_media_jpeg_stats(spark, sf_dir):
    # REAL baseline-JPEG decode (T.81: Huffman -> dequant -> IDCT ->
    # YCbCr->RGB, pure numpy, multimodal.decode_jpeg_pixels): encode
    # solid even-gray RGB at alternating 4:4:4 / 4:2:0 sampling — the
    # lossless subdomain of the lossy codec (only the Y DC coefficient
    # is nonzero and it quantizes without rounding), so the oracle is
    # the closed form w*h*3*v. The hash matches only if the whole
    # entropy-decode -> dequant -> IDCT -> upsample -> color-convert
    # chain is exact for every row.
    from entity_resolution_pipeline_v1_spark.operators.multimodal import (
        image_pixel_stats_udf,
        solid_jpeg_udf,
    )

    d = _t(spark, sf_dir, "documents")
    w = (F.col("doc_id") % 9 + 8).cast("int")
    h = (F.col("doc_id") % 7 + 6).cast("int")
    v = ((F.col("doc_id") * 2) % 256).cast("int")
    sub = (F.col("doc_id") % 2).cast("int")
    media = d.select("doc_id", solid_jpeg_udf(w, h, v, sub).alias("payload"))
    st = media.select("doc_id", image_pixel_stats_udf("payload").alias("s"))
    return st.select(
        "doc_id",
        F.col("s.width").alias("width"),
        F.col("s.height").alias("height"),
        F.col("s.channels").alias("channels"),
        F.col("s.pix_sum").alias("pix_sum"),
        F.col("s.pix_sq_sum").alias("pix_sq_sum"),
    )


def _q_matches_per_entity(spark, sf_dir):
    # A7: match edges touching each entity (reference analysis.py
    # 'most connected entities')
    from entity_resolution_pipeline_v1_spark import reports

    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.least("l_partkey", "l_suppkey").alias("id1"),
        F.greatest("l_partkey", "l_suppkey").alias("id2"),
    ).distinct()
    return reports.matches_per_entity(pairs)


def _q_feature_corr(spark, sf_dir):
    # A12: pairwise Pearson correlation matrix in one agg pass
    # (reference src/classification.py:148-155 np.corrcoef)
    from entity_resolution_pipeline_v1_spark import reports

    li = _t(spark, sf_dir, "lineitem")
    out = reports.feature_correlation(
        li, ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    )
    return out.select("f1", "f2", F.round("corr", 4).alias("pearson"))


def _q_cluster_stats(spark, sf_dir):
    # A6 extended: cluster-size statistics row (reference
    # reporting.py:471-486) over orders-per-customer as the cluster set
    from entity_resolution_pipeline_v1_spark import reports

    o = _t(spark, sf_dir, "orders")
    labels = o.select(F.col("o_custkey").alias("cluster_id"), F.col("o_orderkey").alias("record_id"))
    s = reports.cluster_statistics_df(labels)
    return s.select(
        "n_clusters", "n_records", "min_size", "max_size",
        F.round("mean_size", 4).alias("mean_size"),
        F.round("median_size", 4).alias("median_size"),
        F.round("std_size", 4).alias("std_size"),
    )


def _q_position_in_cluster(spark, sf_dir):
    # W4: deterministic 1-based member position within each cluster
    # (reference src/clustering.py cluster member ordering) — pytest-only
    # evidence until round 5; orders-per-customer as the cluster set
    from entity_resolution_pipeline_v1_spark.operators import cluster

    o = _t(spark, sf_dir, "orders")
    labels = o.select(
        F.col("o_custkey").alias("cluster_id"), F.col("o_orderkey").alias("record_id")
    )
    return cluster.position_in_cluster(labels)


def _q_field_hash_counts(spark, sf_dir):
    # A2/A8: the unpivoted (record, field, value, md5) long table ->
    # field×hash counts (reference src/preprocessing.py:156-180), over
    # part fields; DuckDB's md5() is the same lowercase hex
    from entity_resolution_pipeline_v1_spark.operators import preprocess

    c = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("record_id"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("ptype"),
    )
    long = preprocess.long_form(c, fields=("name", "brand", "ptype"))
    return preprocess.field_hash_counts(long).select(
        "hash", "field", F.col("count").alias("n")
    )


def _q_confusion_matrix(spark, sf_dir):
    # error-analysis reports (reference src/reporting.py:85-160): the
    # zero-filled four-cell confusion matrix over labeled scored pairs,
    # incl. the NULL-confidence (never-a-candidate -> predicted False)
    # coalesce rule — new in round 5 alongside reports.error_analysis
    from entity_resolution_pipeline_v1_spark import reports

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        F.col("doc_id").alias("id1"),
        (F.col("doc_id") + 1).alias("id2"),
        (F.col("doc_id") % 3 == 0).alias("match"),
        F.when(F.col("doc_id") % 11 == 0, F.lit(None).cast("double"))
        .otherwise((F.col("doc_id") % 101) / F.lit(100.0))
        .alias("confidence"),
    )
    return reports.confusion_matrix_df(scored, threshold=0.5).select(
        "actual", "predicted", F.col("count").alias("n")
    )


def _q_feature_means(spark, sf_dir):
    # A11: per-feature means split by match label in ONE distributed agg
    # (reference src/analysis.py feature statistics of true matches)
    from entity_resolution_pipeline_v1_spark import reports

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "is_match", F.col("l_orderkey") % 2 == 0
    )
    out = reports.feature_means(
        li, ("l_quantity", "l_discount", "l_tax"), label_col="is_match"
    )
    return out.select(
        "feature",
        F.round("mean_match", 4).alias("mean_match"),
        F.round("mean_non_match", 4).alias("mean_non_match"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tpch_q1_agg": _q_tpch_q1,
        "top_orders_per_cust": _q_top_orders_per_cust,
        "revenue_by_nation": _q_revenue_by_nation,
        "customers_no_orders": _q_customers_no_orders,
        "pair_dedup": _q_pair_dedup,
        "field_stats": _q_field_stats,
        "token_freq": _q_token_freq,
        "exact_dedup": _q_exact_dedup,
        "doc_stats": _q_doc_stats,
        "lang_id": _q_lang_id,
        "levenshtein_pairs": _q_levenshtein_pairs,
        "shingle_jaccard": _q_shingle_jaccard,
        "minmax_normalize": _q_minmax_normalize,
        "lr_score": _q_lr_score,
        "confidence_histogram": _q_confidence_histogram,
        "harmonic_features": _q_harmonic_features,
        "cluster_sizes": _q_cluster_sizes,
        "sessionize": _q_sessionize,
        "running_revenue": _q_running_revenue,
        "embedding_norms": _q_embedding_norms,
        "cosine_topk": _q_cosine_topk,
        "year_extract": _q_year_extract,
        "simhash_docs": _q_simhash_docs,
        "minhash_near_dup": _q_minhash_near_dup,
        "embedding_near_dup": _q_embedding_near_dup,
        "winnow_docs": _q_winnow_docs,
        "winnow_dedup": _q_winnow_dedup,
        "prefilter_cascade": _q_prefilter_cascade,
        "ivf_topk_exact": _q_ivf_topk_exact,
        "lsh_topk": _q_lsh_topk,
        "connected_components": _q_connected_components,
        "year_cascade": _q_year_cascade,
        "jaro_winkler_pairs": _q_jaro_winkler_pairs,
        "cosine_topk_udf": _q_cosine_topk_udf,
        "knn_impute": _q_knn_impute,
        "media_meta": _q_media_meta,
        "media_header": _q_media_header,
        "media_av_header": _q_media_av_header,
        "media_pixel_stats": _q_media_pixel_stats,
        "media_gif_stats": _q_media_gif_stats,
        "media_audio_stats": _q_media_audio_stats,
        "media_frame_sampling": _q_media_frame_sampling,
        "media_mp4_frames": _q_media_mp4_frames,
        "media_jpeg_stats": _q_media_jpeg_stats,
        "matches_per_entity": _q_matches_per_entity,
        "feature_corr": _q_feature_corr,
        "cluster_stats": _q_cluster_stats,
        "position_in_cluster": _q_position_in_cluster,
        "field_hash_counts": _q_field_hash_counts,
        "confusion_matrix": _q_confusion_matrix,
        "feature_means": _q_feature_means,
    }


# --------------------------------------------------------------------------
# oracles — DuckDB side
# --------------------------------------------------------------------------

_EN_SW = "'the','of','and','to','in','a','is','that','it','for','on','with','as','was','at','by','an','be','this','are','from','or','which','you','not','have','has','had','but','his','her','they','we','their'"

# -- year-cascade oracle: the ten reference patterns in RE2/DuckDB form ----
_OY = r"(\d{2,4}(?:\?|\s+or\s+\d{1,4})?)"
_OAP = r"(?:approximately|ca\.|circa)"
_ODH = "[-–—]"
_OPATS = [
    (f"{_OY}\\s*{_ODH}\\s*{_OAP}\\s+{_OY}", "bd"),                      # 1
    (f"{_OAP}\\s+{_OY}\\s*{_ODH}\\s*{_OAP}\\s+{_OY}", "bd"),            # 2
    (f"{_OAP}\\s+{_OY}\\s*{_ODH}\\s*{_OY}", "bd"),                      # 3
    (f"{_OY}\\s*{_ODH}\\s*{_OY}", "bd"),                                # 4
    (f"{_ODH}\\s*{_OAP}\\s+{_OY}", "d"),                                # 5
    (f"{_ODH}\\s*{_OY}", "d"),                                          # 6
    (f"{_OAP}\\s+{_OY}\\s*{_ODH}", "d"),                                # 7 (ref quirk)
    (f"{_OY}\\s*{_ODH}", "d"),                                          # 8 (ref quirk)
    (
        f"(?:b\\.|born)\\s+(?:{_OAP}\\s+)?{_OY}|(?:d\\.|died)\\s+(?:{_OAP}\\s+)?{_OY}",
        "b_or_d",
    ),                                                                   # 9
    (f"{_OAP}\\s+{_OY}", "d"),                                          # 10 (ref quirk)
]


def _oclean(expr: str) -> str:
    """clean_year in SQL: take before ' or ', strip trailing '?',
    NULL out empties."""
    return f"NULLIF(rtrim(split_part({expr}, ' or ', 1), '?'), '')"


def _year_cascade_oracle() -> str:
    birth_whens, death_whens = [], []
    for pat, kind in _OPATS:
        m = f"regexp_matches(person, '{pat}')"
        g1 = f"regexp_extract(person, '{pat}', 1)"
        g2 = f"regexp_extract(person, '{pat}', 2)"
        if kind == "bd":
            birth_whens.append(f"WHEN {m} THEN {_oclean(g1)}")
            death_whens.append(f"WHEN {m} THEN {_oclean(g2)}")
        elif kind == "d":
            birth_whens.append(f"WHEN {m} THEN NULL")
            death_whens.append(f"WHEN {m} THEN {_oclean(g1)}")
        else:  # b_or_d: group 1 birth, group 2 death, one of them empty
            birth_whens.append(f"WHEN {m} THEN {_oclean(g1)}")
            death_whens.append(f"WHEN {m} THEN {_oclean(g2)}")
    birth_case = "CASE " + " ".join(birth_whens) + " ELSE NULL END"
    death_case = "CASE " + " ".join(death_whens) + " ELSE NULL END"
    return f"""
        WITH y AS (
            SELECT doc_id, 1500 + doc_id % 400 AS y1i, 1560 + doc_id % 400 AS y2i
            FROM documents
        ), ys AS (
            SELECT doc_id,
                CASE WHEN doc_id % 5 = 0 THEN CAST(y1i AS VARCHAR) || '?'
                     WHEN doc_id % 7 = 0 THEN CAST(y1i AS VARCHAR) || ' or ' || CAST(y1i + 1 AS VARCHAR)
                     ELSE CAST(y1i AS VARCHAR) END AS ys1,
                CASE WHEN doc_id % 11 = 0 THEN CAST(y2i AS VARCHAR) || '?'
                     ELSE CAST(y2i AS VARCHAR) END AS ys2
            FROM y
        ), s AS (
            SELECT doc_id,
                CASE doc_id % 12
                    WHEN 0 THEN 'Smith, John, ' || ys1 || ' - approximately ' || ys2
                    WHEN 1 THEN 'approximately ' || ys1 || '-approximately ' || ys2
                    WHEN 2 THEN 'circa ' || ys1 || ' - ' || ys2
                    WHEN 3 THEN 'Doe, Jane, ' || ys1 || '-' || ys2
                    WHEN 4 THEN 'Roe, R., - approximately ' || ys2
                    WHEN 5 THEN 'Roe, R., -' || ys2
                    WHEN 6 THEN 'approximately ' || ys1 || '-'
                    WHEN 7 THEN 'Lee, Ann, ' || ys1 || '-'
                    WHEN 8 THEN 'b. ' || ys1
                    WHEN 9 THEN 'died ' || ys2
                    WHEN 10 THEN 'approximately ' || ys1
                    ELSE 'Nodates, Person'
                END AS person
            FROM ys
        )
        SELECT doc_id, person, {birth_case} AS birth, {death_case} AS death FROM s
    """


def _prefilter_cascade_oracle() -> str:
    """The full C4/C5/C6 + corroboration-cap cascade as one closed-form
    SQL CASE over the same doc_id-derived feature matrix. Model weights
    enter via CAST('…' AS DOUBLE) — a string→double parse is correctly
    rounded once, whereas a bare 17-digit literal would be parsed as
    DECIMAL(18,17) and converted int64→double/10^17 with TWO roundings
    (both operands exceed 2^53), a 1-ulp landmine the Spark side never
    takes."""
    from entity_resolution_pipeline_v1_spark.config import (
        FEATURE_NAMES,
        GOLDEN_BIAS,
        GOLDEN_WEIGHTS,
    )

    feats = ",\n                   ".join(
        f"((doc_id + {i * 7}) % 101) / 100.0 AS {name}"
        for i, name in enumerate(FEATURE_NAMES)
    )
    # score_expr folds left-to-right in model-weight order: bias first,
    # then one w*x term per feature — replicated verbatim (float
    # addition is order-sensitive)
    z = f"CAST('{GOLDEN_BIAS!r}' AS DOUBLE)"
    for name in GOLDEN_WEIGHTS:
        z += f" + CAST('{GOLDEN_WEIGHTS[name]!r}' AS DOUBLE)*{name}"
    return f"""
        WITH f AS (
            SELECT doc_id,
                   {feats},
                   CASE WHEN doc_id % 7 = 0 THEN 1.0 ELSE 0.0 END AS year_match,
                   CASE WHEN doc_id % 5 = 0 THEN 1.0 ELSE 0.0 END AS low_info_name,
                   (doc_id % 4) / 10.0 AS title_jaccard,
                   (doc_id % 9) / 10.0 AS subjects_jaccard
            FROM documents
        ), s AS (
            SELECT *, 1.0 / (1.0 + exp(-({z}))) AS base FROM f
        ), c AS (
            SELECT doc_id, year_match, low_info_name, title_jaccard, subjects_jaccard,
                   CASE WHEN composite_cosine >= 0.65 THEN 0.90
                        WHEN year_match >= 1.0 AND person_cosine >= 0.5 THEN 0.95
                        WHEN person_cosine < 0.70 THEN 0.25
                        ELSE base END AS conf
            FROM s
        ), capped AS (
            SELECT doc_id,
                   CASE WHEN low_info_name >= 1.0
                             AND NOT (title_jaccard >= 0.3 OR subjects_jaccard >= 0.8
                                      OR year_match >= 1.0)
                        THEN least(conf, 0.5) ELSE conf END AS confidence
            FROM c
        )
        SELECT doc_id AS id1, doc_id + 1 AS id2,
               round(confidence, 4) AS confidence,
               confidence >= 0.75 AS is_match
        FROM capped
    """


def oracle_sql() -> dict[str, str]:
    o = {
        "tpch_q1_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders_per_cust": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS totalprice, rank
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
                FROM orders
            ) WHERE rank <= 3
        """,
        "revenue_by_nation": """
            SELECT n_name, round(sum(o_totalprice), 4) AS revenue, count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "customers_no_orders": """
            SELECT c_mktsegment, count(*) AS n_customers
            FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
            GROUP BY c_mktsegment
        """,
        "pair_dedup": """
            SELECT least(l_partkey, l_suppkey) AS id1,
                   greatest(l_partkey, l_suppkey) AS id2,
                   round(max(l_extendedprice), 4) AS confidence
            FROM lineitem GROUP BY 1, 2
        """,
        "field_stats": """
            SELECT lang, count(*) AS n_docs,
                   min(n_chars) AS min_chars, max(n_chars) AS max_chars,
                   round(avg(n_chars), 4) AS avg_chars,
                   round(stddev(n_chars), 4) AS std_chars,
                   round(quantile_cont(n_chars, 0.5), 4) AS median_chars
            FROM documents GROUP BY lang
        """,
        "token_freq": """
            SELECT token, count(*) AS freq
            FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\\W+'),
                                            x -> len(x) > 0)) AS token
                  FROM documents)
            GROUP BY token HAVING count(*) >= 5
        """,
        "exact_dedup": """
            SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id,
                   count(*) AS dup_count
            FROM documents GROUP BY md5(text)
        """,
        "doc_stats": f"""
            SELECT doc_id,
                   len(list_filter(string_split_regex(lower(text), '\\W+'), x -> len(x) > 0)) AS n_tokens,
                   len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_subtokens,
                   round(CASE WHEN length(text) > 0
                         THEN len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0 / length(text)
                         ELSE 0.0 END, 4) AS punct_ratio,
                   round(CASE WHEN length(text) > 0
                         THEN len(regexp_extract_all(text, '\\d')) * 1.0 / length(text)
                         ELSE 0.0 END, 4) AS digit_ratio,
                   round(CASE WHEN len(list_filter(string_split_regex(lower(text), '\\W+'), x -> len(x) > 0)) > 0
                         THEN len(list_filter(string_split_regex(lower(text), '\\W+'), x -> x in ({_EN_SW}))) * 1.0
                              / len(list_filter(string_split_regex(lower(text), '\\W+'), x -> len(x) > 0))
                         ELSE 0.0 END, 4) AS stopword_ratio
            FROM documents
        """,
        "lang_id": """
            WITH toks AS (
                SELECT doc_id, text,
                       list_filter(string_split_regex(lower(text), '\\W+'), x -> len(x) > 0) AS t
                FROM documents
            ), scores AS (
                SELECT doc_id, text,
                       len(list_filter(t, x -> x in ('the','and','of','is','was','with'))) AS s_en,
                       len(list_filter(t, x -> x in ('der','die','das','und','ist','von'))) AS s_de,
                       len(list_filter(t, x -> x in ('le','la','les','et','est','une'))) AS s_fr,
                       len(list_filter(t, x -> x in ('el','los','las','es','una','y'))) AS s_es
                FROM toks
            )
            SELECT doc_id,
                   CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                        WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                        WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                        WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                        WHEN s_fr >= s_es THEN 'fr'
                        ELSE 'es' END AS pred_lang
            FROM scores
        """,
        "levenshtein_pairs": """
            SELECT a.doc_id AS id1, b.doc_id AS id2,
                   round(CASE
                       WHEN length(substr(a.text,1,40)) = 0 AND length(substr(b.text,1,40)) = 0 THEN 1.0
                       WHEN length(substr(a.text,1,40)) = 0 OR length(substr(b.text,1,40)) = 0 THEN 0.0
                       ELSE 1.0 - levenshtein(substr(a.text,1,40), substr(b.text,1,40)) * 1.0
                            / greatest(length(substr(a.text,1,40)), length(substr(b.text,1,40)))
                   END, 4) AS lev_sim
            FROM documents a JOIN documents b ON a.doc_id + 1 = b.doc_id
            WHERE a.doc_id % 5 = 0
        """,
        "shingle_jaccard": """
            WITH sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, greatest(length(substr(text,1,60)) - 2, 1) + 1),
                           i -> substring(substr(text,1,60), i::int, 3))) AS s
                FROM documents
            )
            SELECT a.doc_id AS id1, b.doc_id AS id2,
                   round(CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                         ELSE len(list_intersect(a.s, b.s)) * 1.0
                              / len(list_distinct(list_concat(a.s, b.s))) END, 4) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id + 1 = b.doc_id
            WHERE a.doc_id % 5 = 0
        """,
        "minmax_normalize": """
            SELECT o_orderkey, o_orderpriority,
                   round((o_totalprice - min_p) / (CASE WHEN max_p = min_p THEN 1.0 ELSE max_p - min_p END), 4) AS norm_price
            FROM (
                SELECT o_orderkey, o_orderpriority, o_totalprice,
                       min(o_totalprice) OVER (PARTITION BY o_orderpriority) AS min_p,
                       max(o_totalprice) OVER (PARTITION BY o_orderpriority) AS max_p
                FROM orders
            )
        """,
        "lr_score": """
            SELECT l_orderkey, l_linenumber,
                   round(1.0 / (1.0 + exp(-(-1.5 + 2.0*l_discount + 0.5*l_tax
                                            + 0.0001*l_extendedprice - 0.01*l_quantity))), 4) AS score,
                   (1.0 / (1.0 + exp(-(-1.5 + 2.0*l_discount + 0.5*l_tax
                                       + 0.0001*l_extendedprice - 0.01*l_quantity))) >= 0.5) AS is_match
            FROM lineitem
        """,
        "confidence_histogram": """
            SELECT CAST(least(floor((1.0 / (1.0 + exp(-(-1.5 + 2.0*l_discount
                          + 0.0001*l_extendedprice)))) * 20), 19) AS INT) AS bin,
                   count(*) AS n
            FROM lineitem GROUP BY 1
        """,
        "harmonic_features": """
            SELECT l_orderkey, l_linenumber,
                   round(CASE WHEN l_discount > 0 AND l_tax > 0
                         THEN 2.0 * l_discount * l_tax / (l_discount + l_tax)
                         ELSE 0.0 END, 4) AS disc_tax_harmonic,
                   round(CASE WHEN l_discount <= 0.001 AND l_tax <= 0.001 THEN 0.0
                         WHEN l_discount <= 0.001 THEN l_tax * 0.1
                         WHEN l_tax <= 0.001 THEN l_discount * 0.1
                         ELSE 2.0 * l_discount * l_tax / (l_discount + l_tax)
                         END, 4) AS disc_tax_harmonic_sm,
                   round(l_discount * l_tax, 4) AS disc_tax_product,
                   round(CASE WHEN l_tax > 0 THEN l_discount / l_tax ELSE 0.0 END, 4) AS disc_tax_ratio
            FROM lineitem
        """,
        "cluster_sizes": """
            SELECT o_custkey, count(*) AS n_orders
            FROM orders GROUP BY o_custkey HAVING count(*) >= 12
        """,
        "sessionize": """
            WITH gaps AS (
                SELECT user_id, event_id, ts,
                       epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
                FROM events
            ), sess AS (
                SELECT user_id,
                       sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                FROM gaps
            )
            SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions, count(*) AS n_events
            FROM sess GROUP BY user_id
        """,
        "running_revenue": """
            SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_revenue
            FROM orders
        """,
        "embedding_norms": """
            SELECT label, count(*) AS n,
                   round(avg(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)))), 4) AS avg_norm
            FROM embeddings GROUP BY label
        """,
        "cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]) AS cos
                FROM q, embeddings e
                WHERE CAST(q.query_id AS VARCHAR) <> CAST(e.vec_id AS VARCHAR)
            ), ranked AS (
                SELECT query_id, neighbor_id, cos,
                       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
                FROM scored
            )
            SELECT query_id, neighbor_id, round(cos, 4) AS cosine, rank
            FROM ranked WHERE rank <= 3
        """,
        "year_extract": """
            SELECT doc_id, regexp_extract(text, '\\d{4}', 0) AS first_year
            FROM documents
        """,
        # simhash_docs / minhash_near_dup: deliberately no oracle —
        # xxhash64/md5-bit sketches aren't expressible in DuckDB SQL;
        # driver records rows-only checks (golden-hash pytest fixtures
        # in tests/test_entry_oracle.py pin their exact outputs).
        "media_header": """
            SELECT doc_id,
                   'image/png' AS mime,
                   CAST(doc_id % 640 + 1 AS INTEGER) AS width,
                   CAST(doc_id % 480 + 1 AS INTEGER) AS height
            FROM documents
        """,
        "media_av_header": """
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'audio/wav'
                        ELSE 'video/mp4' END AS mime,
                   CAST(doc_id % 9000 + 100 AS BIGINT) AS duration_ms
            FROM documents
        """,
        "media_pixel_stats": """
            WITH dims AS (
                SELECT doc_id,
                       CAST(doc_id % 9 + 8 AS INT) AS w,
                       CAST(doc_id % 7 + 6 AS INT) AS h
                FROM documents
            )
            SELECT d.doc_id,
                   d.w AS width, d.h AS height, 3 AS channels,
                   CAST(sum((x.x + 7*y.y + 13*c.c + d.doc_id) % 256) AS BIGINT) AS pix_sum,
                   CAST(sum(((x.x + 7*y.y + 13*c.c + d.doc_id) % 256)
                          * ((x.x + 7*y.y + 13*c.c + d.doc_id) % 256)) AS BIGINT) AS pix_sq_sum
            FROM dims d,
                 generate_series(0, 15) AS x(x),
                 generate_series(0, 11) AS y(y),
                 generate_series(0, 2) AS c(c)
            WHERE x.x < d.w AND y.y < d.h
            GROUP BY d.doc_id, d.w, d.h
        """,
        "media_gif_stats": """
            WITH dims AS (
                SELECT doc_id,
                       CAST(doc_id % 11 + 6 AS INT) AS w,
                       CAST(doc_id % 5 + 4 AS INT) AS h
                FROM documents
            )
            SELECT d.doc_id,
                   d.w AS width, d.h AS height, 3 AS channels,
                   CAST(3 * sum((x.x + 7*y.y + d.doc_id) % 256) AS BIGINT) AS pix_sum,
                   CAST(3 * sum(((x.x + 7*y.y + d.doc_id) % 256)
                              * ((x.x + 7*y.y + d.doc_id) % 256)) AS BIGINT) AS pix_sq_sum
            FROM dims d,
                 generate_series(0, 16) AS x(x),
                 generate_series(0, 8) AS y(y)
            WHERE x.x < d.w AND y.y < d.h
            GROUP BY d.doc_id, d.w, d.h
        """,
        "media_frame_sampling": """
            WITH t AS (
                SELECT doc_id,
                       ((doc_id + 0) % 8 + 2) * 10 AS d0,
                       ((doc_id + 1) % 8 + 2) * 10 AS d1,
                       ((doc_id + 2) % 8 + 2) * 10 AS d2
                FROM documents
            )
            SELECT t.doc_id AS media_id,
                   CAST(g.ts AS BIGINT) AS frame_ts_ms,
                   CAST(CASE WHEN g.ts >= t.d0 + t.d1 THEN 2
                             WHEN g.ts >= t.d0 THEN 1
                             ELSE 0 END AS INT) AS frame_index,
                   CAST(CASE WHEN g.ts >= t.d0 + t.d1 THEN t.d0 + t.d1
                             WHEN g.ts >= t.d0 THEN t.d0
                             ELSE 0 END AS BIGINT) AS frame_start_ms
            FROM t, generate_series(0, 300, 50) AS g(ts)
            WHERE g.ts < t.d0 + t.d1 + t.d2
        """,
        "media_audio_stats": """
            WITH dims AS (
                SELECT doc_id, CAST(doc_id % 400 + 80 AS BIGINT) AS n
                FROM documents
            )
            SELECT d.doc_id,
                   8000 AS sample_rate,
                   d.n AS n_samples,
                   CAST(sum((i.i * 37 + d.doc_id) % 4096 - 2048) AS BIGINT) AS sample_sum,
                   CAST(sum(((i.i * 37 + d.doc_id) % 4096 - 2048)
                          * ((i.i * 37 + d.doc_id) % 4096 - 2048)) AS BIGINT) AS sample_sq_sum,
                   CAST(max(abs((i.i * 37 + d.doc_id) % 4096 - 2048)) AS INT) AS peak
            FROM dims d, generate_series(0, 479) AS i(i)
            WHERE i.i < d.n
            GROUP BY d.doc_id, d.n
        """,
        "embedding_near_dup": """
            SELECT a.vec_id AS id1, b.vec_id AS id2,
                   round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.40
        """,
        "connected_components": """
            WITH RECURSIVE e AS (
                SELECT a.doc_id AS src, b.doc_id AS dst
                FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
                WHERE a.doc_id % 3 = 0
                UNION ALL
                SELECT a.doc_id, b.doc_id
                FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 5
                WHERE a.doc_id % 10 = 0
            ),
            bi AS (SELECT src AS u, dst AS v FROM e UNION SELECT dst, src FROM e),
            walk(u, lbl) AS (
                SELECT u, u FROM (SELECT DISTINCT u FROM bi)
                UNION
                SELECT bi.v, walk.lbl FROM walk JOIN bi ON walk.u = bi.u
            )
            SELECT u AS record_id, min(lbl) AS cluster_id FROM walk GROUP BY u
        """,
        "year_cascade": _year_cascade_oracle(),
        "prefilter_cascade": _prefilter_cascade_oracle(),
        "jaro_winkler_pairs": """
            SELECT a.doc_id AS id1, b.doc_id AS id2,
                   round(CASE
                       WHEN a.text IS NULL OR b.text IS NULL THEN 0.0
                       WHEN substr(a.text,1,20) = substr(b.text,1,20) THEN 1.0
                       ELSE jaro_winkler_similarity(substr(a.text,1,20), substr(b.text,1,20))
                   END, 4) AS jw
            FROM documents a JOIN documents b ON a.doc_id + 1 = b.doc_id
            WHERE a.doc_id % 5 = 0
        """,
        "cosine_topk_udf": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]) AS cos
                FROM q, embeddings e
                WHERE CAST(q.query_id AS VARCHAR) <> CAST(e.vec_id AS VARCHAR)
            ), ranked AS (
                SELECT query_id, neighbor_id, cos,
                       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
                FROM scored
            )
            SELECT query_id, neighbor_id, round(cos, 4) AS cosine, rank
            FROM ranked WHERE rank <= 3
        """,
        "knn_impute": """
            WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id % 10 = 0),
            d AS (SELECT vec_id AS did, CAST(label AS VARCHAR) AS val,
                         embedding::DOUBLE[] AS dv
                  FROM embeddings WHERE vec_id % 10 <> 0),
            scored AS (
                SELECT q.qid, d.did, d.val, d.dv,
                       list_cosine_similarity(q.qv, d.dv) AS cos
                FROM q, d
            ),
            ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY qid ORDER BY cos DESC, CAST(did AS VARCHAR)) AS rnk
                FROM scored
            ),
            weighted AS (
                SELECT qid, did, val, dv, rnk, cos * power(0.9, rnk - 1) AS w
                FROM ranked WHERE rnk <= 10 AND cos >= 0.3
            ),
            nearest AS (
                SELECT qid, val FROM (
                    SELECT qid, val,
                           row_number() OVER (PARTITION BY qid ORDER BY rnk) AS rr
                    FROM weighted
                ) WHERE rr = 1
            ),
            per_dim AS (
                SELECT qid, pos, sum(dv[pos] * w) / sum(w) AS mean_val
                FROM weighted CROSS JOIN range(1, 65) t(pos)
                WHERE pos <= len(dv)
                GROUP BY qid, pos
            ),
            vecs AS (
                SELECT qid,
                       sqrt(sum((mean_val::REAL)::DOUBLE * (mean_val::REAL)::DOUBLE)) AS nrm
                FROM per_dim GROUP BY qid
            )
            SELECT n.qid AS record_id, n.val AS imputed_value,
                   round(v.nrm, 4) AS imputed_norm
            FROM nearest n LEFT JOIN vecs v ON n.qid = v.qid
        """,
        "media_meta": """
            SELECT md5(text) AS content_id, min(doc_id) AS canonical_id,
                   count(*) AS dup_count,
                   CAST(min(octet_length(encode(text))) AS BIGINT) AS payload_bytes
            FROM documents GROUP BY md5(text)
        """,
        "matches_per_entity": """
            WITH p AS (SELECT DISTINCT least(l_partkey, l_suppkey) AS id1,
                              greatest(l_partkey, l_suppkey) AS id2
                       FROM lineitem),
            b AS (SELECT id1 AS record_id FROM p UNION ALL SELECT id2 FROM p)
            SELECT record_id, count(*) AS n_matches FROM b GROUP BY record_id
        """,
        "feature_corr": """
            SELECT 'l_quantity' AS f1, 'l_extendedprice' AS f2, round(corr(l_quantity, l_extendedprice), 4) AS pearson FROM lineitem
            UNION ALL SELECT 'l_quantity', 'l_discount', round(corr(l_quantity, l_discount), 4) FROM lineitem
            UNION ALL SELECT 'l_quantity', 'l_tax', round(corr(l_quantity, l_tax), 4) FROM lineitem
            UNION ALL SELECT 'l_extendedprice', 'l_discount', round(corr(l_extendedprice, l_discount), 4) FROM lineitem
            UNION ALL SELECT 'l_extendedprice', 'l_tax', round(corr(l_extendedprice, l_tax), 4) FROM lineitem
            UNION ALL SELECT 'l_discount', 'l_tax', round(corr(l_discount, l_tax), 4) FROM lineitem
        """,
        "cluster_stats": """
            SELECT count(*) AS n_clusters, CAST(sum(sz) AS BIGINT) AS n_records,
                   min(sz) AS min_size, max(sz) AS max_size,
                   round(avg(sz), 4) AS mean_size,
                   round(quantile_cont(sz, 0.5), 4) AS median_size,
                   round(stddev(sz), 4) AS std_size
            FROM (SELECT o_custkey, count(*) AS sz FROM orders GROUP BY o_custkey)
        """,
        "media_jpeg_stats": """
            SELECT doc_id,
                   CAST(doc_id % 9 + 8 AS INT) AS width,
                   CAST(doc_id % 7 + 6 AS INT) AS height,
                   CAST(3 AS INT) AS channels,
                   (doc_id % 9 + 8) * (doc_id % 7 + 6) * 3
                       * ((doc_id * 2) % 256) AS pix_sum,
                   (doc_id % 9 + 8) * (doc_id % 7 + 6) * 3
                       * ((doc_id * 2) % 256) * ((doc_id * 2) % 256) AS pix_sq_sum
            FROM documents
        """,
        "position_in_cluster": """
            SELECT o_custkey AS cluster_id, o_orderkey AS record_id,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderkey) AS position
            FROM orders
        """,
        "field_hash_counts": """
            WITH long AS (
                SELECT md5(p_name) AS hash, 'name' AS field
                FROM part WHERE p_name IS NOT NULL
                UNION ALL SELECT md5(p_brand), 'brand'
                FROM part WHERE p_brand IS NOT NULL
                UNION ALL SELECT md5(p_type), 'ptype'
                FROM part WHERE p_type IS NOT NULL
            )
            SELECT hash, field, count(*) AS n FROM long GROUP BY hash, field
        """,
        "confusion_matrix": """
            WITH scored AS (
                SELECT doc_id % 3 = 0 AS actual,
                       coalesce(
                           CASE WHEN doc_id % 11 = 0 THEN NULL
                                ELSE (doc_id % 101) / 100.0 END >= 0.5,
                           FALSE) AS predicted
                FROM documents
            ),
            cells AS (
                SELECT a.x AS actual, p.x AS predicted
                FROM (VALUES (TRUE), (FALSE)) a(x)
                CROSS JOIN (VALUES (TRUE), (FALSE)) p(x)
            )
            SELECT c.actual, c.predicted,
                   CAST(coalesce(s.cnt, 0) AS BIGINT) AS n
            FROM cells c
            LEFT JOIN (SELECT actual, predicted, count(*) AS cnt
                       FROM scored GROUP BY actual, predicted) s
            ON c.actual = s.actual AND c.predicted = s.predicted
        """,
        "feature_means": """
            SELECT 'l_quantity' AS feature,
                   round(avg(l_quantity) FILTER (l_orderkey % 2 = 0), 4) AS mean_match,
                   round(avg(l_quantity) FILTER (l_orderkey % 2 <> 0), 4) AS mean_non_match
            FROM lineitem
            UNION ALL
            SELECT 'l_discount',
                   round(avg(l_discount) FILTER (l_orderkey % 2 = 0), 4),
                   round(avg(l_discount) FILTER (l_orderkey % 2 <> 0), 4)
            FROM lineitem
            UNION ALL
            SELECT 'l_tax',
                   round(avg(l_tax) FILTER (l_orderkey % 2 = 0), 4),
                   round(avg(l_tax) FILTER (l_orderkey % 2 <> 0), 4)
            FROM lineitem
        """,
    }
    # IVF at nprobe=ALL is exact: same results as brute force, so the
    # same brute-force SQL is its oracle
    o["ivf_topk_exact"] = o["cosine_topk"]

    # ---- sketch-family oracles (upgraded from rows-only in round 5) ----
    # The sketches are deterministic arithmetic (md5 / FNV polynomial
    # rolling hash), so DuckDB can recompute them from first principles.

    # simhash: md5(token)[:8] little-endian, bit b of byte b//8 is
    # (byte >> (b%8)) & 1 — exactly simhash_udf's np.unpackbits
    # (bitorder='little') expansion. Tokens = split(lower, \W+) minus
    # empties, DISTINCT per doc (the UDF's drop_duplicates). The final
    # uint64 -> int64 reinterpret is the HUGEINT wrap at 2^63.
    o["simhash_docs"] = r"""
        WITH toks AS (
          SELECT DISTINCT d.doc_id, t.tok
          FROM documents d,
               LATERAL unnest(regexp_split_to_array(lower(d.text), '\W+')) AS t(tok)
          WHERE t.tok <> ''
        ),
        tb AS (
          SELECT doc_id, b.b,
            ((strpos('0123456789abcdef', substr(md5(tok), (b.b // 8) * 2 + 1, 1)) - 1) * 16
             + strpos('0123456789abcdef', substr(md5(tok), (b.b // 8) * 2 + 2, 1)) - 1
            ) >> (b.b % 8) & 1 AS bit
          FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) b
        ),
        bits AS (
          SELECT doc_id, b, CASE WHEN sum(2 * bit - 1) > 0 THEN 1 ELSE 0 END AS bb
          FROM tb GROUP BY doc_id, b
        ),
        raw AS (
          SELECT doc_id, sum(bb * (1::HUGEINT << b)) AS v
          FROM bits GROUP BY doc_id
        )
        SELECT doc_id,
               CAST(CASE WHEN v >= 9223372036854775808::HUGEINT
                         THEN v - 18446744073709551616::HUGEINT ELSE v END AS BIGINT)
               AS simhash
        FROM raw
    """

    # winnowing (Schleimer et al. SIGMOD'03): FNV-prime polynomial hash
    # of 5-byte grams mod 2^62, min per window of 4, DISTINCT minima.
    # The power literals are FNV^j mod 2^64; byte*(FNV^j mod 2^64) is
    # congruent to byte*FNV^j mod 2^62 (2^62 | 2^64), so HUGEINT
    # arithmetic + one final % reproduces numpy's uint64 wraparound
    # exactly. ascii() == utf-8 byte because the corpus is ASCII (the
    # UDF hashes bytes; a non-ASCII corpus would need a BLOB oracle).
    _winnow_fp_cte = r"""
        hashes AS (
          SELECT d.doc_id, p.i AS pos,
            CAST((
                CAST(ascii(substr(d.text, p.i,     1)) AS HUGEINT) * 1::HUGEINT
              + CAST(ascii(substr(d.text, p.i + 1, 1)) AS HUGEINT) * 1099511628211::HUGEINT
              + CAST(ascii(substr(d.text, p.i + 2, 1)) AS HUGEINT) * 956575116354345::HUGEINT
              + CAST(ascii(substr(d.text, p.i + 3, 1)) AS HUGEINT) * 624165263380053675::HUGEINT
              + CAST(ascii(substr(d.text, p.i + 4, 1)) AS HUGEINT) * 11527715348014283921::HUGEINT
            ) % 4611686018427387904::HUGEINT AS BIGINT) AS h,
            length(d.text) - 4 AS nh
          FROM documents d,
               LATERAL (SELECT unnest(generate_series(1, length(d.text) - 4)) AS i) p
          WHERE length(d.text) >= 5
        ),
        winmins AS (
          SELECT doc_id,
            CASE WHEN nh <= 4 THEN min(h) OVER (PARTITION BY doc_id)
                 ELSE min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
            END AS m,
            pos, nh
          FROM hashes
        ),
        fp AS (
          SELECT doc_id, m FROM winmins
          WHERE nh <= 4 AND pos = 1 OR (nh > 4 AND pos <= nh - 3)
          GROUP BY doc_id, m
        )
    """
    o["winnow_docs"] = (
        "WITH " + _winnow_fp_cte + "\n        SELECT doc_id, m AS fingerprint FROM fp"
    )

    # winnow_dedup: brute-force fingerprint-set Jaccard >= 0.35. The
    # engine's inverted-index blocking has PERFECT recall (J > 0 means
    # a shared fingerprint, which puts the pair in that fingerprint's
    # bucket), so brute force IS the operator's semantic contract, not
    # an approximation of it.
    o["winnow_dedup"] = (
        "WITH " + _winnow_fp_cte + r""",
        sizes AS (SELECT doc_id, count(*) AS n FROM fp GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
          FROM fp a JOIN fp b ON a.m = b.m AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT inter.id1, inter.id2,
               round(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 4) AS jaccard
        FROM inter
        JOIN sizes s1 ON s1.doc_id = inter.id1
        JOIN sizes s2 ON s2.doc_id = inter.id2
        WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.35
    """
    )

    # minhash_near_dup: brute-force char-5-shingle Jaccard >= 0.6 (the
    # verify tier's exact definition; xxhash64 only compresses shingles
    # to longs and is injective on this corpus). LSH banding is an
    # approximation with near-1 recall at J >= 0.6; on this fixed
    # deterministic corpus recall is exactly 100% (verified offline:
    # banded output == brute force, 25 pairs), so the brute-force SQL
    # doubles as a standing recall regression gate — a banding change
    # that loses a true pair flips this row red.
    o["minhash_near_dup"] = r"""
        WITH sh AS (
          SELECT DISTINCT d.doc_id, substr(d.text, p.i, 5) AS s
          FROM documents d,
               LATERAL (SELECT unnest(generate_series(1, greatest(length(d.text) - 4, 1))) AS i) p
          WHERE d.text IS NOT NULL AND length(d.text) > 0
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT inter.id1, inter.id2,
               round(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 4) AS jaccard
        FROM inter
        JOIN sizes s1 ON s1.doc_id = inter.id1
        JOIN sizes s2 ON s2.doc_id = inter.id2
        WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.6
    """

    # LSH-bucketed ANN: the oracle recomputes the ENTIRE pipeline from
    # first principles — integer hyperplane dots over floor(v*1000)
    # quantized components (sign = bucket bit; integer arithmetic means
    # the candidate set is bit-identical cross-engine), multi-probe
    # radius 1 as bit_count(xor) <= 1, exact cosine + top-3 on the
    # candidates. A recall/banding drift in lsh_topk flips this row.
    o["lsh_topk"] = """
        WITH dots AS (
          SELECT e.vec_id, p.p,
                 sum(CAST(floor(CAST(e.embedding[d.d + 1] AS DOUBLE) * 1000) AS BIGINT)
                     * (((p.p * 31 + d.d * 17) % 7) - 3)) AS dot
          FROM embeddings e
          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS p) p
          CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS d) d
          GROUP BY e.vec_id, p.p
        ),
        buckets AS (
          SELECT vec_id,
                 CAST(sum(CASE WHEN dot >= 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY vec_id
        ),
        q AS (
          SELECT e.vec_id AS query_id, e.embedding AS qv, b.bucket AS qb
          FROM embeddings e JOIN buckets b USING (vec_id) WHERE e.vec_id < 5
        ),
        c AS (
          SELECT e.vec_id AS neighbor_id, e.embedding AS cv, b.bucket AS cb
          FROM embeddings e JOIN buckets b USING (vec_id)
        ),
        cand AS (
          SELECT q.query_id, c.neighbor_id,
                 list_cosine_similarity(q.qv::DOUBLE[], c.cv::DOUBLE[]) AS cos
          FROM q JOIN c ON bit_count(xor(q.qb, c.cb)) <= 1
          WHERE CAST(q.query_id AS VARCHAR) <> CAST(c.neighbor_id AS VARCHAR)
        ),
        ranked AS (
          SELECT query_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rank
          FROM cand
        )
        SELECT query_id, neighbor_id, round(cos, 4) AS cosine, rank
        FROM ranked WHERE rank <= 3
    """

    # MP4 frame index: the Spark side parses stts/stsz/stsc/stco back
    # out of real container bytes; the oracle recomputes the closed-form
    # schedule make_mp4_frames encodes (multimodal.mp4_frame_schedule).
    # First frame byte offset = ftyp(16) + mdat header(8) = 24.
    o["media_mp4_frames"] = """
        WITH sched AS (
          SELECT d.doc_id AS media_id, i.i AS frame_index,
                 80 + 20 * ((d.doc_id + i.i // 2) % 3) AS dur_ms,
                 CASE WHEN d.doc_id % 5 = 0 THEN 24
                      ELSE 16 + (d.doc_id * 7 + i.i * 13) % 32 END AS byte_len
          FROM documents d,
               LATERAL (SELECT unnest(generate_series(0, 2 + d.doc_id % 4)) AS i) i
        )
        SELECT media_id, frame_index,
               CAST(coalesce(sum(dur_ms) OVER w, 0) AS BIGINT) AS start_ms,
               CAST(dur_ms AS BIGINT) AS dur_ms,
               CAST(24 + coalesce(sum(byte_len) OVER w, 0) AS BIGINT) AS byte_off,
               CAST(byte_len AS BIGINT) AS byte_len
        FROM sched
        WINDOW w AS (PARTITION BY media_id ORDER BY frame_index
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """
    return o
