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
    cosine_expr,
    harmonic_mean,
    levenshtein_sim,
    safe_ratio,
    sigmoid,
    token_jaccard,
)
from entity_resolution_pipeline_v1_spark.functions.sketches import simhash_udf
from entity_resolution_pipeline_v1_spark.operators import dedup, simsearch


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
    # A1 + P4: token frequency dictionary with min-frequency filter
    d = _t(spark, sf_dir, "documents")
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
    # rows-only check (no SQL oracle): 64-bit SimHash per document
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", simhash_udf(TX.tokens(F.col("text"))).alias("simhash"))


def _q_minhash_near_dup(spark, sf_dir):
    # rows-only check: LSH near-dup pairs over documents
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_dedup(d, jaccard_threshold=0.6).select(
        "id1", "id2", F.round("jaccard", 4).alias("jaccard")
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
    }


# --------------------------------------------------------------------------
# oracles — DuckDB side
# --------------------------------------------------------------------------

_EN_SW = "'the','of','and','to','in','a','is','that','it','for','on','with','as','was','at','by','an','be','this','are','from','or','which','you','not','have','has','had','but','his','her','they','we','their'"


def oracle_sql() -> dict[str, str]:
    return {
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
        # driver records rows-only checks.
    }
