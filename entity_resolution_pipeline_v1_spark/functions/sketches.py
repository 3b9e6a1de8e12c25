"""Similarity sketches: MinHash, SimHash, winnowing fingerprints.

MinHash is pure column expressions: per hash function i, the signature
element is array_min(transform(tokens, t -> xxhash64(t, i))) — k
codegen'd aggregations over an array column, no shuffle, no UDF. Band
keys for LSH are md5 over signature slices. This replaces the
reference's Weaviate HNSW blocking (reference src/indexing.py:116-181,
src/querying.py:100-169) with a shuffle-friendly equi-join key.

SimHash and winnowing drop to Arrow-batched pandas UDFs (bit-twiddling
over variable-length token lists is not expressible as clean column
ops) — still no per-row Python serde.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def minhash_signature(tokens_col: Column | str, num_hashes: int = 24) -> Column:
    """array<bigint> MinHash signature over an array<string> column.

    xxhash64(token, seed_i) simulates k independent hash functions.
    Empty/null token arrays get a NULL signature (no blocks emitted).
    """
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    t = F.array_distinct(t)
    sig = F.array(
        *[
            F.array_min(F.transform(t, lambda x, i=i: F.xxhash64(x, F.lit(i))))
            for i in range(num_hashes)
        ]
    )
    return F.when(t.isNull() | (F.size(t) == 0), F.lit(None)).otherwise(sig)


def lsh_band_keys(sig_col: Column | str, num_hashes: int, bands: int) -> Column:
    """array<string> of LSH band keys: md5(band_index || signature slice).

    Two sets colliding on any band become a candidate pair; banding
    theory gives the usual s-curve on Jaccard similarity.
    """
    sig = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    rows_per_band = num_hashes // bands
    keys = []
    for b in range(bands):
        piece = F.slice(sig, b * rows_per_band + 1, rows_per_band)
        keys.append(
            F.md5(
                F.concat_ws(
                    ":", F.lit(str(b)), F.concat_ws(",", F.transform(piece, lambda x: x.cast("string")))
                )
            )
        )
    return F.when(sig.isNull(), F.lit(None)).otherwise(F.array(*keys))


def _md5_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


@F.pandas_udf(T.LongType())
def simhash_udf(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash over token arrays. Deterministic (md5-based token
    hashes, not PYTHONHASHSEED-dependent). Returned as signed int64."""
    out = np.zeros(len(tokens), dtype=np.int64)
    for row_idx, toks in enumerate(tokens):
        if toks is None or len(toks) == 0:
            out[row_idx] = 0
            continue
        acc = np.zeros(64, dtype=np.int64)
        for tok in set(toks):
            h = _md5_u64(tok)
            bits = np.array([(h >> k) & 1 for k in range(64)], dtype=np.int64)
            acc += bits * 2 - 1
        sim = 0
        for bit_idx in range(64):
            if acc[bit_idx] > 0:
                sim |= 1 << bit_idx
        out[row_idx] = np.array([sim], dtype=np.uint64).view(np.int64)[0]
    return pd.Series(out)


def hamming64(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two int64 SimHash columns, native expr."""
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ac.bitwiseXOR(bc))


@F.pandas_udf(T.ArrayType(T.LongType()))
def winnow_fingerprint_udf(text: pd.Series) -> pd.Series:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03):
    rolling md5 of 5-gram character windows, minimum per window of 4,
    distinct minima kept. Used for robust near-dup document identity."""
    K, W = 5, 4

    def fp(s):
        if s is None or len(s) < K:
            return []
        hashes = [
            _md5_u64(s[i : i + K]) % (1 << 62) for i in range(len(s) - K + 1)
        ]
        if len(hashes) <= W:
            return [min(hashes)]
        mins = set()
        for i in range(len(hashes) - W + 1):
            mins.add(min(hashes[i : i + W]))
        return sorted(mins)

    return text.map(fp)


def simhash_band_keys(sim_col: Column | str, bands: int = 4) -> Column:
    """Split the 64-bit SimHash into `bands` bit-slices; near-dups
    (small Hamming distance) collide on at least one slice by
    pigeonhole. Returns array<string> block keys."""
    c = F.col(sim_col) if isinstance(sim_col, str) else sim_col
    width = 64 // bands
    keys = []
    for b in range(bands):
        piece = F.shiftrightunsigned(c, b * width).bitwiseAND(F.lit((1 << width) - 1))
        keys.append(F.concat_ws(":", F.lit(str(b)), piece.cast("string")))
    return F.array(*keys)
