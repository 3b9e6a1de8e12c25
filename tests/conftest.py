import shutil

import pytest

from entity_resolution_pipeline_v1_spark.session import get_spark
from entity_resolution_pipeline_v1_spark.sources import pages as P


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="erp-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus(spark):
    df = P.generate_corpus(spark, n_records=300, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def labeled(corpus):
    df = P.labeled_pairs(corpus).cache()
    df.count()
    return df


@pytest.fixture()
def work_dir(tmp_path):
    d = str(tmp_path / "work")
    yield d
    shutil.rmtree(d, ignore_errors=True)
