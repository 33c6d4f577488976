from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from gps_stream_processing_spark.session import get_spark

    spark = get_spark(app_name="gps-spark-tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def nmea_df(spark):
    from gps_stream_processing_spark.sources.nmea import nmea_fixture_df

    return nmea_fixture_df(spark, n_tracks=2, n_seconds=60).cache()
