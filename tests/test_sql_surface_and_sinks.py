"""SQL-view surface and the extra sinks: plain-SQL queries over the
registered views must agree with the operator API; partitioned writes must
prune partitions on read."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from twitter_social_triangle_mapreduce_spark.operators import graph
from twitter_social_triangle_mapreduce_spark.sources import io

from conftest import SF_SMOKE, scalar


def test_sql_triangle_matches_operator(spark):
    io.register_views(spark, SF_SMOKE)
    got = spark.sql(
        """
        SELECT CAST(FLOOR(COUNT(*) / 3) AS BIGINT) AS triangles
        FROM (SELECT * FROM edges WHERE src < 150 AND dst < 150) e1
        JOIN (SELECT * FROM edges WHERE src < 150 AND dst < 150) e2
          ON e1.dst = e2.src AND e1.src <> e2.dst
        JOIN (SELECT * FROM edges WHERE src < 150 AND dst < 150) e3
          ON e3.src = e2.dst AND e3.dst = e1.src
        """
    ).collect()[0][0]
    want = scalar(
        graph.triangle_count_shuffle(
            io.edges_from_events(spark, SF_SMOKE), max_id=150
        )
    )
    assert got == want


def test_sql_views_cover_all_tables(spark):
    io.register_views(spark, SF_SMOKE)
    for t in io.TABLES:
        assert spark.sql(f"SELECT COUNT(*) FROM {t}").collect()[0][0] > 0


def test_write_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    out = str(tmp_path / "j")
    io.write_json(df, out)
    assert glob.glob(f"{out}/*.json.gz")
    back = spark.read.schema("id long, s string").json(out)
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]


def test_partitioned_parquet_prunes(spark, tmp_path):
    ev = io.load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "p")
    io.write_partitioned_parquet(
        ev.select("event_id", "event_type", "value"), out, ["event_type"]
    )
    assert glob.glob(f"{out}/event_type=click")
    back = spark.read.parquet(out).where(F.col("event_type") == "click")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    # partition filter handled by pruning, not a data filter
    assert "PartitionFilters" in plan
    want = ev.where(F.col("event_type") == "click").count()
    assert back.count() == want


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC sink/source roundtrip; a filter on the read side must reach
    the ORC scan as a pushed filter (same scan contract as parquet)."""
    ev = io.load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value"
    )
    out = str(tmp_path / "orc")
    io.write_orc(ev, out)
    back = io.read_orc_table(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, ev.collect())
    )
    filtered = back.where(F.col("user_id") == 3)
    plan = filtered._sc._jvm.PythonSQLUtils.explainString(
        filtered._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,3)]" in plan


def test_dynamic_partition_pruning_fires_on_dim_join(spark, tmp_path):
    """Dynamic partition pruning: when the partition key is only
    constrained THROUGH a join (the dim side carries the filter), Spark
    must inject a runtime subquery filter into the fact scan — at 100 TB
    this is the difference between scanning one partition and scanning
    the table. The partitioned-sink layout (`write_partitioned_parquet`)
    is what makes the optimization available."""
    ev = io.load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "dpp")
    io.write_partitioned_parquet(
        ev.select("event_id", "event_type", "value"), out, ["event_type"]
    )
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("click", 1), ("view", 0), ("error", 0)],
        "event_type string, wanted int",
    )
    joined = fact.join(dim.where(F.col("wanted") == 1), "event_type")
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan.lower(), plan
    want = ev.where(F.col("event_type") == "click").count()
    assert joined.count() == want
