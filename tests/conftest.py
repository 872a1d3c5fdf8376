from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clp_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    cores = int(os.environ.get("CLP_SPARK_TEST_CORES", "8"))
    s = get_spark("clp_spark_tests", cores=cores, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_pdf():
    from clp_spark.fixtures.pages import generate_pages_pdf

    return generate_pages_pdf(0, 3000)


@pytest.fixture(scope="session")
def pages_df(spark, pages_pdf):
    df = spark.createDataFrame(pages_pdf)
    return df.repartition(8).cache()
