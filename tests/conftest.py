from __future__ import annotations

import duckdb
import pytest

from twitter_social_triangle_mapreduce_spark.session import get_spark
from twitter_social_triangle_mapreduce_spark.sources.io import TABLES

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tstm-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the testdata tables registered as views —
    the same setup the driver's correctness harness uses."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


def edges_df(spark, rows):
    """Inline golden-graph fixture → canonical edges(src,dst) DataFrame."""
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in rows], "src long, dst long"
    )


def scalar(df):
    return df.collect()[0][0]
