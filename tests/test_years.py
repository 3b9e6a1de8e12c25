"""The ten birth/death-year formats (reference
tests/birth_death_year_regexes.py:4-38) through the cascade."""

import pytest
from pyspark.sql import functions as F

from entity_resolution_pipeline_v1_spark.functions import years as Y


@pytest.mark.parametrize(
    "s,birth,death",
    [
        ("Smith, John, 565 - approximately 665", "565", "665"),      # 1
        ("approximately 1483-approximately 1541", "1483", "1541"),   # 2
        ("circa 1500 - 1550", "1500", "1550"),                       # 3
        ("Doe, Jane, 1864-1949", "1864", "1949"),                    # 4
        ("Smith, J., - approximately 1700", None, "1700"),           # 5
        ("Smith, J., -1790", None, "1790"),                          # 6
        # 7/8/10: the reference's group-count dispatch returns every
        # single-group match as DEATH-only (src/features.py:385-390),
        # despite the pattern comments saying "birth only" — parity quirk
        ("approximately 1620-", None, "1620"),                       # 7
        ("Lee, Ann, 1732-", None, "1732"),                           # 8
        ("b. 1840", "1840", None),                                   # 9 birth
        ("died 1901", None, "1901"),                                 # 9 death
        ("approximately 1510", None, "1510"),                        # 10
        ("no years here", None, None),
        ("", None, None),
    ],
)
def test_extract_years(s, birth, death):
    b, d = Y.extract_years(s)
    assert (b, d) == (birth, death)


def test_clean_year():
    assert Y.clean_year("1840 or 1841") == "1840"
    assert Y.clean_year("1864?") == "1864"
    assert Y.clean_year(None) is None


def test_year_udf_and_match(spark):
    df = spark.createDataFrame(
        [
            ("Doe, Jane, 1864-1949", "Doe, J., 1864-1950"),   # birth matches
            ("Doe, Jane, 1864-1949", "Doe, J., 1865-1949"),   # death matches
            ("Doe, Jane, 1864-1949", "Roe, R., 1700-1750"),   # neither
            ("Doe, Jane", "Doe, J., 1864-1949"),              # one side missing
        ],
        "l string, r string",
    )
    out = df.select(
        Y.extract_years_udf("l").alias("ly"), Y.extract_years_udf("r").alias("ry")
    ).select(
        Y.year_match(
            F.col("ly.birth"), F.col("ly.death"), F.col("ry.birth"), F.col("ry.death")
        ).alias("m")
    )
    assert [r["m"] for r in out.collect()] == [1.0, 1.0, 0.0, 0.0]
