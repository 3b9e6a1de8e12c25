"""Document deduplication suite for web-scale training-data pipelines.

Six dedup families over a documents(doc_id, text, ...) table:

  exact          — md5 hash-groupBy (one shuffle, keep min id)
  minhash_lsh    — shingle -> MinHash -> band keys -> bucket join,
                   verified by true Jaccard on candidates
  simhash        — 64-bit SimHash, banded Hamming blocking
  winnow         — winnowing fingerprints (Schleimer et al. SIGMOD'03)
                   as inverted-index block keys, exact fingerprint-
                   Jaccard verify
  ngram_jaccard  — direct n-gram Jaccard over candidate pairs
  embedding      — cosine near-dup over an embedding column

Everything shuffles on compact keys (hashes / band keys), never on the
document text itself, and the expensive verification similarity only
runs on LSH-candidate pairs — the usual 100-TB-safe shape.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.similarity import norm_expr, pair_cosine_expr, token_jaccard
from ..functions.sketches import (
    hamming64,
    lsh_band_keys,
    make_minhash_text_udf,
    minhash_est_jaccard_expr,
    simhash_band_keys,
    simhash_udf,
    winnow_fingerprint_udf,
)


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(text_hash, canonical_id, dup_count) for every distinct text;
    dup groups = rows with dup_count > 1."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("dup_count"))
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row per distinct text (min id wins) — the standard
    exact-dedup pass before anything fuzzy."""
    w_hash = docs.withColumn("_h", F.md5(F.col(text_col)))
    keep = w_hash.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return w_hash.join(keep, on=["_h", id_col], how="left_semi").drop("_h")


def minhash_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    max_block: int = 5000,
) -> DataFrame:
    """LSH candidate pairs (id1 < id2) from banded MinHash over
    character shingles. Arrow-vectorized sketching (numpy MinHash);
    signature materialized before the band explode."""
    mh = make_minhash_text_udf(num_hashes, shingle_size)
    staged = docs.select(
        F.col(id_col).alias("doc"),
        mh(F.col(text_col)).alias("_sig"),
    )
    keys = staged.select(
        "doc",
        F.explode(lsh_band_keys(F.col("_sig"), num_hashes, bands)).alias("block_key"),
    )
    hot = keys.groupBy("block_key").count().filter(F.col("count") > max_block).select("block_key")
    keys = keys.join(F.broadcast(hot), on="block_key", how="left_anti")
    a, b = keys.alias("a"), keys.alias("b")
    return (
        a.join(b, on="block_key")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("id1"), F.col("b.doc").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    persist_signatures: bool = True,
    max_block: int = 5000,
    persisted: list | None = None,
) -> DataFrame:
    """Near-dup pairs with true shingle-Jaccard verification:
    (id1, id2, jaccard >= threshold) — `jaccard` is always the EXACT
    shingle Jaccard, never the signature estimate.

    Two-tier verification keeps the expensive part off the flood path:
      1. cheap signature-estimate PRUNE evaluated INSIDE the band
         join's output stage (the signatures ride the band-key rows)
         drops candidate pairs whose estimated Jaccard is hopeless
         BEFORE any per-pair shuffle — LSH banding over-generates
         badly when the corpus is self-similar, and the flood must die
         in the stage that produces it; the estimate is filter-only
         and never emitted;
      2. exact Jaccard over xxhash64-hashed shingles (longs, not
         strings) on every survivor.

    No driver actions and no broadcast hints in the plan: the
    per-document sides (signatures, shingle arrays) join shuffled, and
    AQE promotes them to broadcast at runtime when they fit under
    spark.sql.autoBroadcastJoinThreshold. Signatures are persisted
    MEMORY_AND_DISK (spill-safe) because the plan reads them three
    times (hot-key count + both band-join sides); pass
    ``persist_signatures=False`` to recompute instead — the right
    trade when executor memory is the constraint. A caller that owns
    the session should either pass ``persisted`` (a list the persisted
    signature frame is appended to, to ``.unpersist()`` once the
    returned plan is materialized) or use
    :func:`minhash_lsh_dedup_scoped`, which unpersists
    deterministically on scope exit — repeated unmanaged calls
    accumulate cached blocks for the session lifetime.

    ``max_block`` caps degenerate band keys the same way
    minhash_candidates does: a boilerplate-heavy shard (identical
    headers/footers) can put 10^5 docs in ONE band bucket -> 10^10
    candidate rows before the estimate prune could run. Such keys are
    anti-joined out; recall for their members is carried by their
    other (num_bands - 1) band keys.
    """
    from pyspark.storagelevel import StorageLevel

    from .util import ensure_parallelism

    # spread the per-document Arrow sketching and shingle passes: the
    # documents table often arrives as ONE parquet file (a few MB even
    # at 50k docs), so without this every sketch UDF below runs in a
    # single task while the other cores idle (measured at sf1.0: the
    # signature pass alone 8.0s serial vs ~1s spread; the tier-2
    # shingle sides 37s serial)
    docs = ensure_parallelism(docs)
    mh = make_minhash_text_udf(num_hashes, shingle_size)
    staged = docs.select(
        F.col(id_col).alias("doc"),
        mh(F.col(text_col)).alias("_sig"),
    )
    if persist_signatures:
        staged = staged.persist(StorageLevel.MEMORY_AND_DISK)
    # band keys CARRY the signature: the tier-1 estimate prune runs
    # inside the band join itself, BEFORE any per-pair shuffle. The
    # round-5 shape materialized the distinct candidate set first and
    # joined the signatures back on — on a self-similar corpus banding
    # over-generates catastrophically (measured at sf1.0: 30.3M distinct
    # candidate pairs, of which tier 1 keeps 5,006), so the candidate
    # dropDuplicates shuffled 30M pair rows and the two signature
    # hydration joins ran over all of them: 61s of the 86s total. With
    # the signatures riding the band keys (num_hashes longs per exploded
    # key row — a per-DOC cost, not per-pair), the estimate evaluates in
    # the join's output stage and the 30M flood collapses to ~5k rows
    # before anything else shuffles. The estimate is a deterministic
    # function of the pair, so filtering before dropDuplicates keeps
    # exactly the pairs the old order kept.
    keys = staged.select(
        "doc",
        "_sig",
        F.explode(lsh_band_keys(F.col("_sig"), num_hashes, bands)).alias("block_key"),
    )
    hot = keys.groupBy("block_key").count().filter(F.col("count") > max_block).select("block_key")
    keys = keys.join(F.broadcast(hot), on="block_key", how="left_anti")
    a, b = keys.alias("a"), keys.alias("b")
    # JVM-side estimator (zip_with agreement count) as a prune-only
    # filter; keep everything within ~2 sigma of the threshold
    est_col = minhash_est_jaccard_expr(F.col("a._sig"), F.col("b._sig"), num_hashes)
    t = jaccard_threshold
    slack = 2.0 * (t * (1 - t) / num_hashes) ** 0.5
    survivors = (
        a.join(b, on="block_key")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .filter(est_col >= t - slack)
        .select(F.col("a.doc").alias("id1"), F.col("b.doc").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    # tier 2: exact jaccard over hashed shingles for every survivor
    sh = docs.select(
        F.col(id_col),
        F.transform(
            TX.char_shingles(F.col(text_col), shingle_size),
            lambda s: F.xxhash64(s),
        ).alias("sh"),
    )
    l = sh.select(F.col(id_col).alias("id1"), F.col("sh").alias("sh1"))
    r = sh.select(F.col(id_col).alias("id2"), F.col("sh").alias("sh2"))
    out = (
        survivors.join(l, on="id1")
        .join(r, on="id2")
        .withColumn("jaccard", token_jaccard("sh1", "sh2"))
        .filter(F.col("jaccard") >= t)
        .select("id1", "id2", "jaccard")
    )
    if persist_signatures and persisted is not None:
        # explicit handle transfer (a dynamic attribute on the returned
        # DataFrame would vanish on the first .filter/.select)
        persisted.append(staged)
    return out


@contextmanager
def minhash_lsh_dedup_scoped(docs: DataFrame, **kwargs) -> Iterator[DataFrame]:
    """minhash_lsh_dedup with deterministic cache cleanup: materialize
    the yielded frame INSIDE the block; the persisted signature blocks
    are unpersisted on exit (even on error), so repeated calls cannot
    accumulate cached blocks for the session lifetime."""
    handles: list[DataFrame] = []
    try:
        yield minhash_lsh_dedup(docs, persisted=handles, **kwargs)
    finally:
        for h in handles:
            h.unpersist()


def simhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: banded bit-slice blocking (pigeonhole
    guarantees recall for distance < bands), Hamming verify."""
    sims = docs.select(
        F.col(id_col).alias("doc"),
        simhash_udf(TX.tokens(F.col(text_col))).alias("sim"),
    )
    keyed = sims.select(
        "doc", "sim", F.explode(simhash_band_keys("sim", bands)).alias("block_key")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(b, on="block_key")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("id1"),
            F.col("b.doc").alias("id2"),
            hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"),
        )
        .dropDuplicates(["id1", "id2"])
        .filter(F.col("hamming") <= max_hamming)
    )


def winnow_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    max_block: int = 5000,
    key_sample_mod: int = 1,
    persist_fingerprints: bool = True,
    persisted: list | None = None,
) -> DataFrame:
    """Winnowing near-dup pairs — the third sketch-based dedup family
    beside minhash/simhash (wires the fingerprints from
    functions/sketches.winnow_fingerprint_udf into an actual pair
    operator).

    Blocking: every winnowing fingerprint IS a block key (the MOSS
    inverted-index scheme, Schleimer et al. SIGMOD'03 §4) — documents
    sharing any fingerprint meet in one equi-join bucket, so recall is
    PERFECT for every pair with fingerprint-Jaccard > 0 (any shared
    fingerprint puts the pair in that fingerprint's bucket), before
    hot-key capping. Verify: exact Jaccard over the full fingerprint
    arrays on candidates only.

    100-TB shape, same machinery as minhash_lsh_dedup: compact long
    keys shuffle (never text), ``max_block`` anti-joins out degenerate
    fingerprints (boilerplate shared by 10^5 docs would emit 10^10
    candidate rows from one bucket), the expensive verify runs on
    candidates only, no driver actions, no forced broadcasts (the hot
    list is a bounded aggregate, broadcast explicitly).

    ``key_sample_mod`` > 1 keeps only fingerprints ≡ 0 (mod m) as
    block keys (the standard "0 mod p" super-fingerprint selection) —
    an m× candidate-volume reduction for corpus-scale runs; recall
    then holds for pairs sharing ≥ 1 SELECTED fingerprint. The verify
    always uses ALL fingerprints.

    The fingerprint frame is read three times (block keys + both
    verify sides); ``persist_fingerprints`` caches it MEMORY_AND_DISK
    so the per-document Arrow sketching pass — the dominant cost —
    runs once, not three times (the same three-read shape
    minhash_lsh_dedup persists its signatures for). Pass ``persisted``
    to receive the handle for deterministic unpersist after the
    returned plan materializes.
    """
    from pyspark.storagelevel import StorageLevel

    fps = docs.select(
        F.col(id_col).alias("doc"),
        winnow_fingerprint_udf(F.col(text_col)).alias("fp"),
    ).filter(F.size("fp") > 0)
    if persist_fingerprints:
        fps = fps.persist(StorageLevel.MEMORY_AND_DISK)
        if persisted is not None:
            persisted.append(fps)
    keys = fps.select("doc", F.explode("fp").alias("block_key"))
    if key_sample_mod > 1:
        keys = keys.filter(F.pmod(F.col("block_key"), F.lit(key_sample_mod)) == 0)
    hot = keys.groupBy("block_key").count().filter(F.col("count") > max_block).select("block_key")
    keys = keys.join(F.broadcast(hot), on="block_key", how="left_anti")
    a, b = keys.alias("a"), keys.alias("b")
    cands = (
        a.join(b, on="block_key")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("id1"), F.col("b.doc").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    l = fps.select(F.col("doc").alias("id1"), F.col("fp").alias("fp1"))
    r = fps.select(F.col("doc").alias("id2"), F.col("fp").alias("fp2"))
    return (
        cands.join(l, on="id1")
        .join(r, on="id2")
        .withColumn("jaccard", token_jaccard("fp1", "fp2"))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id1", "id2", "jaccard")
    )


@contextmanager
def winnow_dedup_scoped(docs: DataFrame, **kwargs) -> Iterator[DataFrame]:
    """winnow_dedup with deterministic cache cleanup (the analogue of
    :func:`minhash_lsh_dedup_scoped`): materialize the yielded frame
    INSIDE the block; the persisted fingerprint blocks are unpersisted
    on exit (even on error), so repeated calls cannot accumulate cached
    blocks for the session lifetime."""
    handles: list[DataFrame] = []
    try:
        yield winnow_dedup(docs, persisted=handles, **kwargs)
    finally:
        for h in handles:
            h.unpersist()


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidate_pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Word n-gram Jaccard for given candidate pairs (id1, id2)."""
    grams = docs.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size(TX.tokens(F.col(text_col))) - n, F.lit(0)),
                ),
                lambda i: F.concat_ws(" ", F.slice(TX.tokens(F.col(text_col)), i + 1, n)),
            )
        ).alias("grams"),
    )
    l = grams.select(F.col(id_col).alias("id1"), F.col("grams").alias("g1"))
    r = grams.select(F.col(id_col).alias("id2"), F.col("grams").alias("g2"))
    return (
        candidate_pairs.join(l, on="id1")
        .join(r, on="id2")
        .select("id1", "id2", token_jaccard("g1", "g2").alias("ngram_jaccard"))
    )


def embedding_near_dup(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str | None = None,
    cosine_threshold: float = 0.95,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs. With a group/bucket column the
    join is per-bucket (LSH-style); without it this is the O(n²)
    verification baseline — only for modest n or post-LSH candidates.
    Norms precompute per ROW before the self-join; the per-pair cosine
    is the codegen'd unrolled dot (see pair_cosine_expr)."""
    from .simsearch import _fused_dim, _probe_dim

    if dim is None:
        dim = _probe_dim(embeddings, vec_col)
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if group_col:
        cols.append(F.col(group_col).alias("g"))
    base = embeddings.select(*cols).withColumn("vn", norm_expr("v"))
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    joined = a.join(b, on="g") if group_col else a.crossJoin(b)
    return (
        joined.filter(cond)
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            pair_cosine_expr(
                F.col("a.v"), F.col("b.v"), F.col("a.vn"), F.col("b.vn"), _fused_dim(dim)
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= cosine_threshold)
    )
