from __future__ import annotations

import pytest

from bugzilla_etl_spark.corpus import generate_corpus_pdf
from bugzilla_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def small_corpus_pdf():
    return generate_corpus_pdf(200)


@pytest.fixture(scope="session")
def small_corpus(spark, small_corpus_pdf):
    df = spark.createDataFrame(small_corpus_pdf)
    df.persist()
    df.count()
    return df
