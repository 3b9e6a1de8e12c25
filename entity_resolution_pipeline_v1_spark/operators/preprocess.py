"""Preprocessing: field projection, string dedup dictionary, embeddings.

The reference walks every record in Python, md5-hashes each field
string and maintains dict-of-dict state (reference
src/preprocessing.py:119-162). Here it is four declarative steps:

  1. parse_records   — extracted text -> typed field columns (real
                       NULLs, never the reference's "NULL" sentinel)
  2. long_form       — records unpivoted to (record_id, field, value, hash)
  3. unique_strings  — distinct (hash, field, value) + frequency counts
                       (A1-A3; groupBy gives map-side partial agg free)
  4. embed_unique    — deterministic trigram embedder over the DISTINCT
                       dictionary only (the reference's embed-once
                       optimization, src/embedding.py:62-67)

records_wide re-assembles one row per record with its five field
strings and five vectors — the scoring join's build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EMBED_FIELDS
from ..functions.embedder import make_embed_udf
from ..functions.hashing import md5_hash

RECORD_FIELDS = ("person", "title", "provision", "subjects")


def parse_records(pages_extracted: DataFrame, text_col: str = "extracted_text") -> DataFrame:
    """Extracted composite text -> field columns.

    Fixture composite layout: 'person | title | provision | subjects'
    (FIXTURES.md §1). Empty segments become real NULLs. record_id is
    recovered from the url tail; composite = the full text.
    """
    parts = F.split(F.col(text_col), r" \| ")
    # regexp_extract returns '' (not NULL) on no-match: without the
    # fallback every nonconforming url in a web-scale corpus would
    # silently collapse into ONE empty-string record identity — a
    # catastrophic skew + correctness hazard. Unrecognized urls keep a
    # stable per-url identity instead.
    rid = F.nullif(F.regexp_extract("url", r"/p/([^/]+)$", 1), F.lit(""))
    df = pages_extracted.select(
        F.coalesce(rid, F.md5("url")).alias("record_id"),
        F.col("url"),
        F.col(text_col).alias("composite"),
        F.nullif(F.trim(parts.getItem(0)), F.lit("")).alias("person"),
        F.nullif(F.trim(parts.getItem(1)), F.lit("")).alias("title"),
        F.nullif(F.trim(parts.getItem(2)), F.lit("")).alias("provision"),
        F.nullif(F.trim(parts.getItem(3)), F.lit("")).alias("subjects"),
    )
    return df


def long_form(records: DataFrame, fields: tuple[str, ...] = EMBED_FIELDS) -> DataFrame:
    """(record_id, field, value, hash) — the unpivoted field table.
    stack() is the Spark-native unpivot; hash = md5 hex, the
    reference's string identity (src/preprocessing.py:164-180)."""
    stack_expr = "stack({n}, {args}) as (field, value)".format(
        n=len(fields), args=", ".join(f"'{f}', {f}" for f in fields)
    )
    return (
        records.select("record_id", F.expr(stack_expr))
        .filter(F.col("value").isNotNull())
        .withColumn("hash", md5_hash("value"))
    )


def unique_strings(long: DataFrame, min_frequency: int = 1) -> DataFrame:
    """Distinct string dictionary with frequencies (A1/A3 + P4 filter).
    One hash-aggregate: partial map-side combine then final — the
    distributed form of the reference's dict counters
    (src/preprocessing.py:146-151)."""
    dict_df = (
        long.groupBy("hash", "field")
        .agg(F.first("value").alias("value"), F.count("*").alias("frequency"))
    )
    if min_frequency > 1:
        dict_df = dict_df.filter(F.col("frequency") >= min_frequency)
    return dict_df


def field_hash_counts(long: DataFrame) -> DataFrame:
    """A2: (hash, field) -> count (reference src/preprocessing.py:156-159)."""
    return long.groupBy("hash", "field").count()


def embed_unique(
    unique: DataFrame,
    dim: int = 64,
    normalize_fields: tuple[str, ...] = ("person",),
) -> DataFrame:
    """(hash, field, vector) for every distinct string. The only Python
    in preprocessing, Arrow-batched, over uniques only.

    For `normalize_fields` the embedder sees the normalized form
    (years/punct stripped): the reference's semantic embeddings are
    robust to 'Smith, J., 1900-1980' vs 'J. Smith'; a char-trigram
    embedder needs the normalization to get the same robustness. The
    string's hash identity stays the RAW value.
    """
    from ..functions.text import normalize_name

    embed = make_embed_udf(dim)
    to_embed = F.col("value")
    for fld in normalize_fields:
        to_embed = F.when(F.col("field") == fld, normalize_name("value")).otherwise(to_embed)
    return unique.select("hash", "field", embed(to_embed).alias("vector"))


def records_wide(
    records: DataFrame,
    embeddings: DataFrame,
    fields: tuple[str, ...] = EMBED_FIELDS,
    broadcast_embeddings: bool = False,
) -> DataFrame:
    """One row per record: field strings + per-field vectors.

    Implemented as unpivot -> single join against the embeddings dim
    table -> pivot back via groupBy+first, so the embeddings table is
    scanned ONCE regardless of field count (vs five separate joins).
    The embeddings side is the small distinct dictionary — Catalyst
    broadcasts it under the configured threshold; at 100 TB scale the
    same plan degrades gracefully to a shuffled hash join on `hash`.
    """
    from ..functions import text as TX
    from ..functions.years import extract_years_udf

    long = long_form(records, fields)
    emb = F.broadcast(embeddings) if broadcast_embeddings else embeddings
    joined = long.join(emb, on=["hash", "field"], how="left")
    vecs = (
        joined.groupBy("record_id")
        .pivot("field", list(fields))
        .agg(F.first("vector"))
    )
    renames = [F.col("record_id")] + [F.col(f).alias(f"{f}_vec") for f in fields]
    vecs = vecs.select(*renames)
    out = records.join(vecs, on="record_id", how="left")
    # per-field string-hash identity: lets downstream scoring join
    # per-field cosines from a DISTINCT-pair dictionary instead of
    # carrying vectors per pair. xxhash64 longs (8B through every pair
    # join, vs 48B md5 hex); guarded so NULL values stay NULL (bare
    # xxhash64(NULL) returns the seed constant, which would alias all
    # missing values to one key)
    for f in fields:
        out = out.withColumn(
            f"{f}_hash", F.when(F.col(f).isNotNull(), F.xxhash64(F.col(f)))
        )
    if "person" in records.columns:
        # pair-feature inputs precomputed ONCE PER RECORD instead of
        # once per candidate-pair side: birth/death years (the regex
        # UDF), the normalized name, the token arrays behind the three
        # Jaccards, and the informative-token count behind the low-info
        # flag. Candidates outnumber records ~30:1 on the fixtures (far
        # more at web scale), and without this Catalyst re-evaluates
        # each regexp/split chain per pair side — measured at ~2/3 of
        # the whole scoring stage.
        out = (
            out.withColumn("person_years", extract_years_udf(F.col("person")))
            .withColumn("person_norm", TX.normalize_name("person"))
            .withColumn("person_tokens", TX.tokens(F.col("person_norm")))
            .withColumn("title_tokens", TX.tokens(F.lower(F.col("title"))))
            .withColumn("subjects_tokens", TX.tokens(F.lower(F.col("subjects"))))
            .withColumn(
                "person_informative",
                F.coalesce(
                    F.regexp_count(F.col("person_norm"), F.lit(r"[\p{L}]{3,}")), F.lit(0)
                ),
            )
        )
    return out
