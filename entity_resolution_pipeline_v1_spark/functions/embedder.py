"""Deterministic local text embedder.

The reference embeds unique field strings through the OpenAI API
(reference src/embedding.py:53-135). No external API exists in this
environment, so the engine ships a deterministic, fully local stand-in
with the property that actually matters for ER: *similar strings get
similar vectors*. It is classic character-trigram feature hashing —
each trigram is md5-hashed to a (bucket, sign) pair, counts are
accumulated, and the vector is L2-normalized. Name variants of one
entity share most trigrams, so their cosine is high; unrelated names
are near-orthogonal.

Runs as one Arrow-batched pandas UDF over the DISTINCT string
dictionary only (the reference's embed-unique-strings-once
optimization, src/embedding.py:62-67), so cost scales with unique
strings, not rows.

The UDF is batch-vectorized (round-5; the prior version ran a Python
for-loop per string — the per-row interpreted pattern the north rule
bans, and at web scale the distinct dictionary is billions of rows):
all strings in an Arrow batch are packed into one codepoint array,
trigram windows come from numpy slicing, each DISTINCT trigram is
md5-hashed once (memoized across batches — trigram vocabularies are
tiny and Zipfian), and the ±1 contributions scatter-add into the
(batch × dim) count matrix in one np.add.at. Outputs are BIT-IDENTICAL
to ``embed_string`` (pytest parity on mixed-unicode corpora): counts
are exact integers, so accumulation order cannot change the float64
result, and the norm's sum-of-squares is likewise an exact integer.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 64

# packed-trigram (c0 | c1<<21 | c2<<42, codepoints < 2^21) -> (md5 u32
# bucket base, ±1 sign). Shared across batches inside one Python UDF
# worker; trigram vocabularies are small (charset-bounded), the cap is
# a defensive bound for adversarial corpora.
_TRI_CACHE: dict[int, tuple[int, int]] = {}
_TRI_CACHE_MAX = 2_000_000


def embed_string(s: str | None, dim: int = DEFAULT_DIM) -> list[float] | None:
    """Deterministic trigram-hash embedding of one string. None/empty -> None
    (missing vectors score 0.0 downstream, reference src/features.py:158-159).

    Scalar REFERENCE implementation — the vectorized UDF below is pinned
    bit-identical to it; keep them in lockstep."""
    if not s:
        return None
    text = f"^{s.lower()}$"
    vec = np.zeros(dim, dtype=np.float64)
    for i in range(len(text) - 2):
        tri = text[i : i + 3]
        h = hashlib.md5(tri.encode("utf-8")).digest()
        bucket = int.from_bytes(h[:4], "little") % dim
        sign = 1.0 if h[4] & 1 else -1.0
        vec[bucket] += sign
    norm = np.linalg.norm(vec)
    if norm == 0:
        return None
    return (vec / norm).astype(np.float32).tolist()


def _tri_lookup(packed: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(u32 bucket base, ±1 sign) per DISTINCT packed trigram, memoized.
    md5 has no vectorized form, so each NEW trigram costs one hashlib
    call — but only once per process lifetime, and the universe of real
    trigrams is tiny relative to the strings that contain them."""
    if len(_TRI_CACHE) > _TRI_CACHE_MAX:
        _TRI_CACHE.clear()
    buckets = np.empty(len(packed), dtype=np.uint32)
    signs = np.empty(len(packed), dtype=np.int8)
    mask21 = (1 << 21) - 1
    for i, p in enumerate(map(int, packed)):
        hit = _TRI_CACHE.get(p)
        if hit is None:
            tri = chr(p & mask21) + chr((p >> 21) & mask21) + chr(p >> 42)
            h = hashlib.md5(tri.encode("utf-8")).digest()
            hit = (int.from_bytes(h[:4], "little"), 1 if h[4] & 1 else -1)
            _TRI_CACHE[p] = hit
        buckets[i] = hit[0]
        signs[i] = hit[1]
    return buckets, signs


def _embed_batch(texts: pd.Series, dim: int) -> pd.Series:
    """One Arrow batch -> list-of-float32 vectors (or None), vectorized."""
    n = len(texts)
    out: list[list[float] | None] = [None] * n
    notnull = texts.notna()
    if not notnull.any():
        return pd.Series(out, dtype=object)
    sub = texts[notnull]
    nonempty = sub.str.len() > 0
    sub = ("^" + sub[nonempty].str.lower() + "$").tolist()
    if not sub:
        return pd.Series(out, dtype=object)
    # positions of the surviving rows in the original batch
    orig_idx = np.flatnonzero(notnull.to_numpy())[nonempty.to_numpy()]
    k = len(sub)
    lens = np.fromiter((len(t) for t in sub), dtype=np.int64, count=k)
    codes = np.frombuffer("".join(sub).encode("utf-32-le"), dtype=np.uint32)
    rix = np.repeat(np.arange(k, dtype=np.int64), lens)
    if len(codes) < 3:
        return pd.Series(out, dtype=object)
    # pack each codepoint window into ONE uint64 (codepoints < 2^21) on
    # contiguous slices — no (n,3) gather materializes — then keep only
    # windows that stay inside one string (same row at both endpoints)
    c0 = codes[:-2].astype(np.uint64)
    c1 = codes[1:-1].astype(np.uint64)
    c2 = codes[2:].astype(np.uint64)
    packed_all = c0 | (c1 << np.uint64(21)) | (c2 << np.uint64(42))
    inrow = rix[:-2] == rix[2:]
    packed = packed_all[inrow]
    rows = rix[:-2][inrow]
    if len(packed):
        # hash-based factorize (O(n)) beats sort-based np.unique ~4x here
        inv, uniq = pd.factorize(packed, sort=False)
        ubuckets, usigns = _tri_lookup(np.asarray(uniq))
        flat = rows * dim + (ubuckets[inv] % np.uint32(dim)).astype(np.int64)
        # one C-side scatter; ±1.0 weights sum exactly (integer-valued
        # doubles), so accumulation order cannot change the result
        acc = np.bincount(
            flat, weights=usigns[inv].astype(np.float64), minlength=k * dim
        ).reshape(k, dim)
    else:
        acc = np.zeros((k, dim), dtype=np.float64)
    # counts are exact integers: the sum-of-squares is an exact integer
    # in float64, so sqrt sees the same double np.linalg.norm would —
    # bit-identical to the scalar reference
    ss = np.einsum("ij,ij->i", acc, acc)
    norms = np.sqrt(ss)
    ok = ss > 0
    vecs = (acc[ok] / norms[ok, None]).astype(np.float32)
    for oi, v in zip(orig_idx[ok], vecs.tolist()):
        out[oi] = v
    return pd.Series(out, dtype=object)


def make_embed_udf(dim: int = DEFAULT_DIM):
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed_udf(texts: pd.Series) -> pd.Series:
        return _embed_batch(texts, dim)

    return embed_udf
