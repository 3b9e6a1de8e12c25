"""Birth/death-year extraction from person name strings.

The reference documents ten ordered regex patterns
(reference tests/birth_death_year_regexes.py:4-38, applied at
src/features.py:56-90 with first-match-wins search and group-count
dispatch at src/features.py:378-402). The patterns themselves are a
behavioral spec (a data table, reproduced here to preserve parity);
the execution engine is new: one Arrow-batched pandas UDF returning a
struct, plus a native column expression for the match decision.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_YEAR = r"(\d{2,4}(?:\?|\s+or\s+\d{1,4})?)"
_APPROX = r"(?:approximately|ca\.|circa)"
_DASH = r"[-–—]"

# Ordered pattern table; tuple = (regex, how-to-read-groups)
#   "bd"  two groups birth,death;   "d" one group death-only;
#   "b_or_d" pattern 9: either group
#
# Group-count dispatch parity (reference src/features.py:385-402): the
# reference returns EVERY single-capture-group match as death-only —
# including patterns 7/8/10 whose comments say "birth year only". That
# is a reference quirk ('1840-' reads as died-1840), reproduced here
# deliberately: the north rule is per-row behavioral parity, and
# year_match/C5 outcomes must agree with the reference on mixed forms
# like '1840-' vs '-1840'.
_PATTERNS: list[tuple[re.Pattern, str]] = [
    (re.compile(rf"{_YEAR}\s*{_DASH}\s*{_APPROX}\s+{_YEAR}"), "bd"),      # 1
    (re.compile(rf"{_APPROX}\s+{_YEAR}\s*{_DASH}\s*{_APPROX}\s+{_YEAR}"), "bd"),  # 2
    (re.compile(rf"{_APPROX}\s+{_YEAR}\s*{_DASH}\s*{_YEAR}"), "bd"),      # 3
    (re.compile(rf"{_YEAR}\s*{_DASH}\s*{_YEAR}"), "bd"),                  # 4
    (re.compile(rf"{_DASH}\s*{_APPROX}\s+{_YEAR}"), "d"),                 # 5
    (re.compile(rf"{_DASH}\s*{_YEAR}"), "d"),                             # 6
    (re.compile(rf"{_APPROX}\s+{_YEAR}\s*{_DASH}"), "d"),                 # 7 (ref quirk)
    (re.compile(rf"{_YEAR}\s*{_DASH}"), "d"),                             # 8 (ref quirk)
    (
        re.compile(
            rf"(?:b\.|born)\s+(?:{_APPROX}\s+)?{_YEAR}|(?:d\.|died)\s+(?:{_APPROX}\s+)?{_YEAR}"
        ),
        "b_or_d",
    ),                                                                     # 9
    (re.compile(rf"{_APPROX}\s+{_YEAR}"), "d"),                           # 10 (ref quirk)
]


def extract_years(person: str | None) -> tuple[str | None, str | None]:
    """First-match-wins cascade -> (birth, death), either may be None."""
    if not person:
        return None, None
    for pattern, kind in _PATTERNS:
        m = pattern.search(person)
        if not m:
            continue
        if kind == "bd":
            return m.group(1), m.group(2)
        if kind == "d":
            return None, m.group(1)
        # b_or_d: group 1 = birth via b./born, group 2 = death via d./died
        return m.group(1), m.group(2)
    return None, None


def clean_year(y: str | None) -> str | None:
    """Normalize '1840 or 1841' -> '1840', '1864?' -> '1864'
    (reference src/features.py:425-431)."""
    if y is None:
        return None
    return y.split(" or ")[0].rstrip("?")


_STRUCT = T.StructType(
    [
        T.StructField("birth", T.StringType()),
        T.StructField("death", T.StringType()),
    ]
)


@F.pandas_udf(_STRUCT)
def extract_years_udf(person: pd.Series) -> pd.DataFrame:
    births, deaths = [], []
    for s in person:
        b, d = extract_years(s)
        births.append(clean_year(b))
        deaths.append(clean_year(d))
    return pd.DataFrame({"birth": births, "death": deaths})


def year_match(
    left_birth: Column, left_death: Column, right_birth: Column, right_death: Column
) -> Column:
    """1.0 iff (both births present and equal) or (both deaths present
    and equal); inputs are the cleaned years from extract_years_udf
    (reference src/features.py:404-433)."""
    birth_eq = left_birth.isNotNull() & right_birth.isNotNull() & (left_birth == right_birth)
    death_eq = left_death.isNotNull() & right_death.isNotNull() & (left_death == right_death)
    return F.when(birth_eq | death_eq, F.lit(1.0)).otherwise(F.lit(0.0))
