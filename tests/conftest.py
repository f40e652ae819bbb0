from __future__ import annotations

import os

import duckdb
import pytest

from twitter_social_triangle_mapreduce_spark.session import get_spark
from twitter_social_triangle_mapreduce_spark.sources.io import TABLES

SF_SMOKE = "/root/testdata/sf0.001"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow — the fresh-JVM subprocess"
        " probes and 100k+-row parity folds the default gate skips"
        " (the closing-battery path; RUN_SLOW=1 works too)",
    )


def pytest_collection_modifyitems(config, items):
    """Round-10 suite split (r9 verdict item 6): the default gate
    (``pytest tests/ -x -q``) skips ``slow``-marked probes-as-tests so
    it stays a fast pre-commit signal; the closing battery runs
    everything with ``--runslow``. Skipped-not-deselected so the
    default output still shows how many heavyweights were deferred."""
    run_slow = os.environ.get("RUN_SLOW", "").strip().lower()
    if config.getoption("--runslow") or run_slow not in ("", "0", "false"):
        return
    skip = pytest.mark.skip(
        reason="slow: run with --runslow (closing-battery path)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


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
