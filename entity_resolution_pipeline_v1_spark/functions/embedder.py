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
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 64


def embed_string(s: str | None, dim: int = DEFAULT_DIM) -> list[float] | None:
    """Deterministic trigram-hash embedding of one string. None/empty -> None
    (missing vectors score 0.0 downstream, reference src/features.py:158-159)."""
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


def make_embed_udf(dim: int = DEFAULT_DIM):
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda s: embed_string(s, dim))

    return embed_udf
