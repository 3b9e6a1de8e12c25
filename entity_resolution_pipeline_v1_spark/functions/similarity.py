"""Pair-similarity functions.

Everything that CAN be a native Column expression IS one (whole-stage
codegen, no Python in the hot path). Only embedding cosine and
Jaro-Winkler drop to Arrow-batched pandas UDFs.

Semantics are pinned to the reference:
  - levenshtein_sim:   1 - lev(s1,s2)/max(len); empty/null -> 0.0,
                       both empty -> 1.0   (reference src/utils.py:212-229)
  - harmonic_mean:     2ab/(a+b), 0.0 if either <= 0
                       (reference src/features.py:371-376 — the canonical
                       variant used by the default feature matrix)
  - harmonic_mean_smoothed: the parallel_features.py:402-417 variant
                       (<=0.001 floor -> 0.1x the other side); available
                       as an opt-in expression, NOT wired into the
                       default 14-feature contract (the reference's
                       default path uses the canonical variant)
  - product/ratio:     src/features.py:226-238
  - cosine:            dot/(|a||b|); 0.0 on null or zero norm
                       (reference src/utils.py:146-177)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def levenshtein_sim(left: ColumnOrName, right: ColumnOrName) -> Column:
    """Normalized Levenshtein similarity as a pure column expression."""
    l, r = _c(left), _c(right)
    max_len = F.greatest(F.length(l), F.length(r))
    sim = 1.0 - F.levenshtein(l, r) / max_len
    return (
        F.when(l.isNull() | r.isNull(), F.lit(0.0))
        .when((F.length(l) == 0) & (F.length(r) == 0), F.lit(1.0))
        .when((F.length(l) == 0) | (F.length(r) == 0), F.lit(0.0))
        .otherwise(sim)
    )


def harmonic_mean(a: ColumnOrName, b: ColumnOrName) -> Column:
    a, b = _c(a), _c(b)
    return F.when((a > 0) & (b > 0), 2.0 * a * b / (a + b)).otherwise(F.lit(0.0))


def harmonic_mean_smoothed(
    a: ColumnOrName, b: ColumnOrName, min_threshold: float = 0.001
) -> Column:
    """Smoothed harmonic mean (reference parallel_features.py:402-417):
    values at or below ``min_threshold`` are treated as zero; when only
    one side is above it, return 0.1x that side instead of collapsing
    to 0. Pure column expression (whole-stage codegen)."""
    a, b = _c(a), _c(b)
    thr = F.lit(float(min_threshold))
    return (
        F.when((a <= thr) & (b <= thr), F.lit(0.0))
        .when(a <= thr, b * 0.1)
        .when(b <= thr, a * 0.1)
        .otherwise(2.0 * a * b / (a + b))
    )


def product(a: ColumnOrName, b: ColumnOrName) -> Column:
    return _c(a) * _c(b)


def safe_ratio(num: ColumnOrName, denom: ColumnOrName) -> Column:
    num, denom = _c(num), _c(denom)
    return F.when(denom > 0, num / denom).otherwise(F.lit(0.0))


def sigmoid(z: ColumnOrName) -> Column:
    """1/(1+e^-z). Spark's exp saturates gracefully; no clip needed."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-_c(z)))


def token_jaccard(a_tokens: ColumnOrName, b_tokens: ColumnOrName) -> Column:
    """Token-set Jaccard similarity over two array<string> columns."""
    a, b = _c(a_tokens), _c(b_tokens)
    a_set, b_set = F.array_distinct(a), F.array_distinct(b)
    union_size = F.size(F.array_union(a_set, b_set))
    inter_size = F.size(F.array_intersect(a_set, b_set))
    return (
        F.when(a.isNull() | b.isNull(), F.lit(0.0))
        .when(union_size == 0, F.lit(0.0))
        .otherwise(inter_size.cast("double") / union_size)
    )


def cosine_expr(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity over two array<float/double> columns, fully
    JVM-side via higher-order functions (zip_with + aggregate)."""
    a, b = _c(a), _c(b)
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_a = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    norm_b = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return (
        F.when(a.isNull() | b.isNull(), F.lit(0.0))
        .when((norm_a == 0) | (norm_b == 0), F.lit(0.0))
        .otherwise(dot / (norm_a * norm_b))
    )


def norm_expr(a: ColumnOrName) -> Column:
    """L2 norm of an array column — ONE interpreted higher-order
    aggregate per ROW. Meant to run per SIDE of a pairwise join
    (n + m rows), never per pair: pairing it with a codegen'd dot
    (pair_cosine_expr) removes all per-pair interpreted lambdas."""
    a = _c(a)
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def unrolled_dot_expr(a: ColumnOrName, b: ColumnOrName, dim: int) -> Column:
    """Fixed-dim dot product written out as `dim` getItem terms —
    fully whole-stage-codegen'd, no interpreted higher-order-function
    lambdas. NULL if either side is NULL (callers guard). Left-to-right
    summation order matches the zip_with/aggregate form bit-for-bit.
    Only use for dim <= features.FUSED_COSINE_MAX_DIM (the 64KB
    codegen-method budget; see that constant's docstring)."""
    a, b = _c(a), _c(b)
    terms = [a.getItem(i).cast("double") * b.getItem(i).cast("double") for i in range(dim)]
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    return s


def pair_cosine_expr(
    qv: ColumnOrName, cv: ColumnOrName, qn: ColumnOrName, cn: ColumnOrName,
    dim: int | None = None,
) -> Column:
    """Per-pair cosine for pairwise joins, with norms precomputed per
    SIDE (norm_expr) instead of per pair. cosine_expr's three
    interpreted HOF aggregates per pair dominated the ANN joins
    (measured: ivf_topk over 1.8k x 200 vectors at dim 64 took 7-8s
    warm — ~70M interpreted lambda calls); with side norms + a
    codegen'd unrolled dot the per-pair work is one WholeStageCodegen
    span. With dim=None (unknown width / above the codegen cap) the
    dot falls back to a single zip_with aggregate — still 3x fewer
    interpreted passes than cosine_expr. Null/zero-norm semantics
    match cosine_expr: 0.0."""
    qv, cv, qn, cn = _c(qv), _c(cv), _c(qn), _c(cn)
    if dim is not None:
        dot = unrolled_dot_expr(qv, cv, dim)
    else:
        dot = F.aggregate(
            F.zip_with(qv, cv, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    return (
        F.when(qv.isNull() | cv.isNull(), F.lit(0.0))
        .when((qn == 0) | (cn == 0), F.lit(0.0))
        .otherwise(dot / (qn * cn))
    )


@F.pandas_udf(T.DoubleType())
def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched embedding cosine (the reference's F1 hot path,
    src/utils.py:146-177). Stacks each Arrow batch into a 2-D numpy
    matrix — one BLAS pass per batch, zero per-row Python."""
    out = np.zeros(len(a), dtype=np.float64)
    mask = a.notna() & b.notna()
    if mask.any():
        # accumulate in float64 so the UDF and the expression variant
        # (which casts to double element-wise) agree to ~1e-12
        av = np.stack(a[mask].to_numpy()).astype(np.float64)
        bv = np.stack(b[mask].to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", av, bv)
        na = np.linalg.norm(av, axis=1)
        nb = np.linalg.norm(bv, axis=1)
        denom = na * nb
        ok = denom > 0
        vals = np.zeros(len(av))
        vals[ok] = dots[ok] / denom[ok]
        out[mask.to_numpy()] = vals
    return pd.Series(out)


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, ch in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == ch:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    m = matches
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def _jaro_winkler(
    s1: str, s2: str, p: float = 0.1, max_prefix: int = 4, boost_threshold: float = 0.7
) -> float:
    """Canonical Winkler variant: the prefix boost applies only when the
    Jaro score exceeds 0.7 (same semantics as DuckDB's
    jaro_winkler_similarity and rapidfuzz — verified pairwise)."""
    j = _jaro(s1, s2)
    if j <= boost_threshold:
        return j
    prefix = 0
    for a, b in zip(s1, s2):
        if a == b and prefix < max_prefix:
            prefix += 1
        else:
            break
    return j + prefix * p * (1.0 - j)


def _jaro_winkler_batch(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
    """Numpy-vectorized Jaro-Winkler over two object arrays of (non-null)
    Python strings. Semantics identical to ``_jaro_winkler`` per pair
    (tested element-for-element against it and against DuckDB's
    jaro_winkler_similarity): greedy first-unmatched window matching,
    transposition count over the matched subsequences, prefix boost
    (p=0.1, max 4) only when jaro > 0.7.

    The loops run over CHARACTER POSITIONS (bounded by the longest
    string in the batch, ~tens for names), each step a whole-batch
    numpy op — no per-row Python. ~20-40x faster than the per-row
    interpreted DP on name-length strings.
    """
    n = len(sa)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    out = np.zeros(n, dtype=np.float64)
    # TRUE lengths from the Python strings: codepoint 0 doubles as the
    # U-array padding, so any count-the-nonzero-codes shortcut (or
    # np.char.str_len, which drops trailing NULs) silently equates
    # 'x\x00' with 'x' — and dirty web text DOES carry NULs
    len_a = np.fromiter((len(s) for s in sa), dtype=np.int64, count=n)
    len_b = np.fromiter((len(s) for s in sb), dtype=np.int64, count=n)
    maxlen = np.maximum(len_a, len_b)
    # bucket by pair max-length so one long outlier string does not
    # inflate the char-matrix width (and the i-loop) of the whole batch
    edges = [0, 8, 16, 32, 64, 128, 1 << 30]
    for lo, hi in zip(edges, edges[1:]):
        sel = (maxlen > lo) & (maxlen <= hi)
        if sel.any():
            out[sel] = _jw_group(sa[sel], sb[sel], len_a[sel], len_b[sel])
    out[maxlen == 0] = 1.0  # both empty -> equal -> 1.0
    return out


def _jw_group(
    sa: np.ndarray, sb: np.ndarray, len1: np.ndarray, len2: np.ndarray
) -> np.ndarray:
    """One length-bucket of the vectorized JW (see _jaro_winkler_batch).
    ``len1``/``len2`` are the TRUE string lengths; column masks below use
    them explicitly because the packed buffer cannot distinguish a real
    NUL character (codepoint 0) from padding."""
    n = len(sa)
    both = np.concatenate([sa, sb]).astype(np.str_)
    width = both.dtype.itemsize // 4
    codes = both.view(np.uint32).reshape(2 * n, width)
    c1, c2 = codes[:n], codes[n:]
    # clamp the negative window (maxlen <= 1) to 0: the scalar's empty
    # range(i+1, i) loop finds no matches there, and with d=0 the only
    # admissible column is j==i, where single-char pairs either differ
    # (no candidate) or are equal (overridden to 1.0 by the sa==sb
    # short-circuit) — identical results, and argmax never sees a
    # zero-width slice (was a ValueError on all-short-string batches)
    d = np.maximum(np.maximum(len1, len2) // 2 - 1, 0)
    dmax = int(d.max())
    j_idx = np.arange(width)
    m1 = np.zeros((n, width), dtype=bool)
    m2 = np.zeros((n, width), dtype=bool)
    rows = np.arange(n)
    active0 = np.empty(n, dtype=bool)
    maxl1 = int(len1.max()) if n else 0
    for i in range(maxl1):
        # only columns [i-dmax, i+dmax] can ever match at this i
        jlo, jhi = max(0, i - dmax), min(width, i + dmax + 1)
        jcols = j_idx[jlo:jhi]
        np.less(i, len1, out=active0)
        # rows past their len1 are masked by `active0`; columns past
        # len2 are masked EXPLICITLY — padding shares codepoint 0 with
        # a real NUL character, so "padding never equals text" does not
        # hold for strings that contain NULs
        cand = c2[:, jlo:jhi] == c1[:, i][:, None]
        cand &= jcols[None, :] < len2[:, None]
        cand &= ~m2[:, jlo:jhi]
        cand &= np.abs(jcols[None, :] - i) <= d[:, None]
        cand &= active0[:, None]
        j = cand.argmax(axis=1)  # argmax of bool = FIRST True: greedy j
        hit = cand[rows, j]  # argmax==0 could mean "no True"; gather checks
        m2[rows[hit], j[hit] + jlo] = True
        m1[hit, i] = True
    m = m1.sum(axis=1)
    # transpositions: np.nonzero is row-major, so within each row the
    # hits come out in match order, and m1/m2 have identical per-row
    # counts — the two flat char sequences align position-for-position
    r1, i1 = np.nonzero(m1)
    r2, i2 = np.nonzero(m2)
    mismatch = c1[r1, i1] != c2[r2, i2]
    t = np.bincount(r1[mismatch], minlength=n) // 2
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (m / len1 + m / len2 + (m - t) / np.maximum(m, 1)) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    jaro = np.where((len1 == 0) | (len2 == 0), 0.0, jaro)
    # winkler prefix boost (consecutive equal chars, capped at 4)
    pw = min(4, width)
    pre_eq = (c1[:, :pw] == c2[:, :pw]) & (j_idx[None, :pw] < np.minimum(len1, len2)[:, None])
    prefix = np.cumprod(pre_eq, axis=1).sum(axis=1)
    out = np.where(jaro > 0.7, jaro + prefix * 0.1 * (1.0 - jaro), jaro)
    # exact equality (incl. both-empty) is 1.0 by definition
    return np.where(sa == sb, 1.0, out)


# JW is a NAME similarity; its match-window arithmetic is O(len·d) per
# pair and the batch char matrix is O(batch × longest-string). One
# pathological multi-KB "name" from dirty web text would both distort
# the measure and blow the matrix, so inputs are capped here — at the
# UDF boundary, identically for every backend, far above any real name.
JW_MAX_LEN = 512


def _jw_score_unique(ua: np.ndarray, ub: np.ndarray) -> np.ndarray:
    """Score DISTINCT non-null (a, b) pairs: rapidfuzz's C kernel when
    available (one bounded C call per unique pair), else the numpy
    batch-vectorized implementation. The distinct-pair dedup lives in
    the CALLER (_jw_batch_impl) so every backend benefits — round 4's
    rapidfuzz branch scored each repeated pair per row (candidate pairs
    repeat name pairs 10-30×, the dict-cosine measurement)."""
    try:
        from rapidfuzz.distance import JaroWinkler
    except ImportError:
        return _jaro_winkler_batch(ua, ub)
    return np.fromiter(
        (JaroWinkler.similarity(x, y) for x, y in zip(ua, ub)),
        dtype=np.float64,
        count=len(ua),
    )


def _jw_batch_impl(a: pd.Series, b: pd.Series) -> pd.Series:
    """One Arrow batch of Jaro-Winkler: cap lengths, factorize distinct
    (a,b) pairs ONCE, score each distinct pair once with whichever
    backend is available, broadcast back via the factorize inverse."""
    a = a.str.slice(0, JW_MAX_LEN)
    b = b.str.slice(0, JW_MAX_LEN)
    av, bv = a.to_numpy(dtype=object), b.to_numpy(dtype=object)
    null = pd.isnull(av) | pd.isnull(bv)
    out = np.zeros(len(av), dtype=np.float64)
    if (~null).any():
        ai, bi = av[~null], bv[~null]
        codes, uniq = pd.factorize(pd.Series(list(zip(ai, bi))), sort=False)
        ua = np.array([u[0] for u in uniq], dtype=object)
        ub = np.array([u[1] for u in uniq], dtype=object)
        out[~null] = _jw_score_unique(ua, ub)[codes]
    return pd.Series(out, dtype="float64")


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Jaro-Winkler similarity (north_rule extra; not in the reference).
    Arrow-batched with no per-row Python in the hot path; distinct
    (a,b) pairs are scored once per batch regardless of backend.
    Inputs are capped at JW_MAX_LEN chars (defensive; see note above)."""
    return _jw_batch_impl(a, b)
