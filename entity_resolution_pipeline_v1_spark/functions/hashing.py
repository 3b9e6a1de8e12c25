"""Deterministic hashing helpers.

The reference dedupes field strings by md5 hex (reference
src/preprocessing.py:164-180) and builds idempotent sink keys as
uuid5(hash + "_" + field) (src/indexing.py:157). Here both are native
column expressions; xxhash64 is the fast 64-bit family used for
MinHash signatures and salting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash(col: Column | str) -> Column:
    """md5 hex of a string column; NULL stays NULL (no sentinel strings —
    the reference's "NULL" sentinel is deliberately dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("string"))


def stable_key(hash_col: Column | str, field_col: Column | str) -> Column:
    """Deterministic idempotent sink key, analogue of the reference's
    uuid5(f"{hash}_{field}")."""
    h = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    f_ = F.col(field_col) if isinstance(field_col, str) else field_col
    return F.md5(F.concat_ws("_", h, f_))


def salt(col: Column | str, buckets: int) -> Column:
    """Uniform salt bucket in [0, buckets) from any column — used to
    split hot keys before a skewed join."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(buckets)).cast("int")
