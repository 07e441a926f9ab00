from __future__ import annotations

import pytest

from apache_flink_pratices_spark.session import tune

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("afp-tests").master("local[4]")
    builder = tune(builder, shuffle_partitions=4)
    s = builder.config("spark.driver.memory", "4g").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    yield s
    s.stop()
