from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cardinalhq_otel_collector_spark.session import build_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_spark(app_name="tests", cores=4, shuffle_partitions=8, driver_mem="4g")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_df(spark):
    from cardinalhq_otel_collector_spark.datagen import transcripts

    df = transcripts(spark, n_convs=120, hot_convs=2, partitions=8)
    df.persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture()
def warehouse(tmp_path, spark):
    from cardinalhq_otel_collector_spark.sources.catalog import Catalog

    return Catalog(spark, str(tmp_path / "warehouse"))
