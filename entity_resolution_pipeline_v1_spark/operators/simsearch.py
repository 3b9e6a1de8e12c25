"""Approximate nearest-neighbor search over an embedding column.

Two tiers:

  brute_force_topk — exact cosine top-k via a (queries × corpus) join;
    the correctness baseline. Queries are broadcast (they're the small
    side); the corpus streams; a Window row_number takes k. Exact and
    scale-safe in the corpus dimension (scan-shaped), not in |queries|.

  ivf_topk — the scale path: k-means-style coarse quantizer built from
    a deterministic sample, every corpus vector assigned to its nearest
    centroid (one pandas-UDF pass), queries probe only `nprobe` nearest
    cells. Classic IVF-Flat, expressed as DataFrame ops; recall is
    tunable via nprobe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.similarity import norm_expr, pair_cosine_expr
from .util import ensure_parallelism


def _probe_dim(df: DataFrame, vec_col: str) -> int | None:
    """Vector width from one non-null row (arrays don't carry their
    length in the schema). One tiny job; callers that know the dim
    pass it explicitly and skip the probe."""
    row = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    return len(row[0]) if row and row[0] is not None else None


def _fused_dim(dim: int | None) -> int | None:
    """The unrolled codegen dot only wins below the 64KB-codegen cap
    (features.FUSED_COSINE_MAX_DIM); above it pair_cosine_expr falls
    back to a single zip_with aggregate."""
    from .features import FUSED_COSINE_MAX_DIM

    return dim if dim is not None and dim <= FUSED_COSINE_MAX_DIM else None


_ensure_parallelism = ensure_parallelism  # moved to util.py (shared with features)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    broadcast_queries: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank<=k), exact.

    ``broadcast_queries=True`` is only correct when the query set is
    genuinely small (a handful of probe vectors); an unbounded query
    side must NOT be broadcast — callers with large query populations
    (imputation over every null-field record) route through
    :func:`ivf_topk`, whose cell join shuffles both sides.

    Norms are precomputed per SIDE and the per-pair cosine is a
    codegen'd unrolled dot (pair_cosine_expr) — the per-pair
    interpreted-HOF cosine was the dominant cost of the join. ``dim``
    is probed from the corpus when not given.
    """
    if dim is None:
        dim = _probe_dim(corpus, vec_col)
    corpus = _ensure_parallelism(corpus)
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv")
    ).withColumn("_qn", norm_expr("_qv"))
    if broadcast_queries:
        q = F.broadcast(q)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")).withColumn(
        "_cn", norm_expr("_cv")
    )
    scored = (
        c.crossJoin(q)
        .withColumn("cosine", pair_cosine_expr("_qv", "_cv", "_qn", "_cn", _fused_dim(dim)))
        .filter(F.col(query_id_col).cast("string") != F.col("neighbor_id").cast("string"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def train_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    iters: int = 10,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Driver-side spherical k-means on an UNBIASED deterministic
    sample (the coarse quantizer is tiny; training it centrally is the
    standard IVF recipe). ``df.sample`` draws from every partition —
    a bare ``limit()`` would train centroids on whatever partitions
    happen to come first. The limit after the sample only trims the
    driver pull. Pass ``sample_fraction`` explicitly when the caller
    knows the corpus cardinality; the default 10% suits the fixture
    scales while staying a constant-size pull at any corpus size."""
    frac = 0.1 if sample_fraction is None else sample_fraction
    sample = (
        corpus.select(vec_col)
        .sample(fraction=min(frac, 1.0), seed=seed)
        .limit(sample_rows)
        .toPandas()[vec_col]
        .tolist()
    )
    if not sample:  # tiny corpus: the sample can come back empty
        sample = corpus.select(vec_col).limit(sample_rows).toPandas()[vec_col].tolist()
    X = _normalize(np.array([np.asarray(v, dtype=np.float64) for v in sample]))
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ cents.T, axis=1)
        for c in range(len(cents)):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def assign_cells(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding", out_col: str = "cell",
    nprobe: int = 1,
) -> DataFrame:
    """Nearest-centroid cell ids (array of nprobe cells, Arrow-batched)."""
    cents = centroids  # captured; shipped once per executor via task closure

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cells(v: pd.Series) -> pd.Series:
        out = []
        for vec in v:
            if vec is None:
                out.append(None)
                continue
            x = np.asarray(vec, dtype=np.float64)
            n = np.linalg.norm(x)
            if n > 0:
                x = x / n
            sims = cents @ x
            top = np.argsort(-sims)[:nprobe]
            out.append([int(t) for t in top])
        return pd.Series(out)

    return df.withColumn(out_col, cells(F.col(vec_col)))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """IVF-Flat ANN: corpus partitioned into cells once (nprobe=1),
    queries probe their nprobe nearest cells; cosine + top-k inside
    matching cells only.

    The cell join carries NO broadcast hint: the query side is
    unbounded (imputation feeds every null-field record through here),
    so both sides shuffle on `cell` and AQE promotes a small side to
    broadcast at runtime if it fits. With nprobe == len(centroids) the
    search is exact (every cell probed) while keeping the shuffled
    join shape — the oracle-comparable configuration.

    Norms are computed per side BEFORE the explode/join (once per
    vector, not per pair or per probed cell) and the per-pair cosine
    is a codegen'd unrolled dot — see pair_cosine_expr."""
    if dim is None:
        dim = _probe_dim(corpus, vec_col)
    corpus = _ensure_parallelism(corpus)
    c_cells = (
        assign_cells(corpus, centroids, vec_col, "cell", nprobe=1)
        .withColumn("_cn", norm_expr(F.col(vec_col)))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cv"),
            F.col("_cn"),
            F.explode("cell").alias("cell"),
        )
    )
    q_cells = (
        assign_cells(queries, centroids, vec_col, "cell", nprobe=nprobe)
        .withColumn("_qn", norm_expr(F.col(vec_col)))
        .select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qv"),
            F.col("_qn"),
            F.explode("cell").alias("cell"),
        )
    )
    scored = (
        c_cells.join(q_cells, on="cell")
        .withColumn("cosine", pair_cosine_expr("_qv", "_cv", "_qn", "_cn", _fused_dim(dim)))
        .filter(F.col(query_id_col).cast("string") != F.col("neighbor_id").cast("string"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


# ---- random-hyperplane LSH (the bucketed ANN family beside IVF) ----------

def _plane_coeff(p: int, d: int) -> int:
    """Deterministic integer hyperplane coefficients in [-3, 3]. A
    closed form instead of an RNG so the bucket assignment itself is
    recomputable from first principles by the SQL oracle (the same
    philosophy as the md5/FNV sketch oracles)."""
    return ((p * 31 + d * 17) % 7) - 3


def hyperplane_bucket_expr(vec_col, n_planes: int, dim: int):
    """int64 LSH bucket: bit p = sign of the p-th hyperplane dot.

    The dot runs over floor(v_d * 1000) QUANTIZED components — integer
    arithmetic end to end, so the sign (hence the bucket, hence the
    candidate set) is bit-identical across engines; a float dot's sign
    near 0 could legitimately differ between two correct summation
    orders.

    Physical shape: zip_with against a LITERAL coefficient array per
    plane, folded by aggregate — a constant-size expression tree at any
    dim. NOT the fused-cosine unroll: multi-probe references the bucket
    n_planes+1 times, and collapse-project inlines the expression into
    every probe key, so an unrolled n_planes×dim tree (440 nodes at dim
    64, ~10k at the reference's 1536) multiplies into the plan —
    measured 7.3s vs 1.05s of driver-side planning at dim 64 before a
    single row moves, and past 64KB codegen at large dims."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        coeffs = F.lit([_plane_coeff(p, d) for d in range(dim)]).cast("array<long>")
        dot = F.aggregate(
            F.zip_with(
                v,
                coeffs,
                lambda x, c: F.floor(x.cast("double") * 1000).cast("long") * c,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    hamming_radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank<=k) via random-hyperplane
    LSH — the bucketed ANN family beside :func:`ivf_topk`:

    - both sides get an int64 sign-bit bucket (hyperplane_bucket_expr);
    - multi-probe: each query probes its own bucket plus every bucket
      at Hamming distance <= ``hamming_radius`` (radius 0 or 1; radius
      1 explodes n_planes+1 probe keys — the standard multi-probe
      trade of query fan-out for recall);
    - candidates come from a plain equi-join on the bucket key — both
      sides SHUFFLE on a compact long, no broadcast requirement, so an
      unbounded query side scales exactly like ivf_topk's cell join;
    - exact cosine + per-query top-k window on candidates only.

    ``n_planes=0`` degenerates to one bucket = brute force (the exact
    oracle mode, like ivf_topk at nprobe=ALL). Probe buckets at radius
    1 are pairwise distinct, so a (query, vector) pair joins at most
    once — no candidate dedup pass needed."""
    if hamming_radius not in (0, 1):
        raise ValueError("hamming_radius supports 0 or 1")
    if dim is None:
        dim = _probe_dim(corpus, vec_col)
    corpus = _ensure_parallelism(corpus)
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
        .withColumn("_cn", norm_expr("_cv"))
        .withColumn("bucket", hyperplane_bucket_expr("_cv", n_planes, dim))
    )
    q = (
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
        .withColumn("_qn", norm_expr("_qv"))
        .withColumn("_qb", hyperplane_bucket_expr("_qv", n_planes, dim))
    )
    probes = [F.col("_qb")]
    if hamming_radius >= 1:
        probes += [F.col("_qb").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
    qp = q.withColumn("bucket", F.explode(F.array(*probes)))
    scored = (
        qp.join(c, on="bucket")
        .withColumn("cosine", pair_cosine_expr("_qv", "_cv", "_qn", "_cn", _fused_dim(dim)))
        .filter(F.col(query_id_col).cast("string") != F.col("neighbor_id").cast("string"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )
