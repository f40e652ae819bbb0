"""Time-series operators (operators/timeseries.py). Value correctness is
oracle-checked in the differential suite; here we pin the scale shapes —
the bucketed range join must never become a nested-loop theta join — and
boundary semantics the synthetic data cannot reach."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_social_triangle_mapreduce_spark.operators import timeseries
from twitter_social_triangle_mapreduce_spark.sources.io import load_table

from conftest import SF_SMOKE


def test_interval_join_is_equi_hash_not_nested_loop(spark):
    """The bucketing must turn the range predicate into an equi-join:
    no BroadcastNestedLoopJoin / CartesianProduct anywhere in the plan."""
    ev = load_table(spark, SF_SMOKE, "events")
    plan = (
        timeseries.incident_event_counts(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # it IS a join, hash or sort-merge


def test_interval_join_boundaries_and_multi_bucket_span(spark):
    """Inclusive on both endpoints; an interval spanning several buckets
    still catches points in every covered bucket (the explode step)."""
    pts = spark.createDataFrame(
        [(i, t) for i, t in enumerate([0, 50, 100, 3600, 7300, 7301])],
        "pid long, p long",
    )
    iv = spark.createDataFrame(
        [(1, 50, 7300)], "ivid long, s long, e long"
    )
    got = sorted(
        r["pid"]
        for r in timeseries.interval_join(
            pts, iv, "p", "s", "e", bucket_s=3600
        ).collect()
    )
    # 50 and 7300 inclusive; 0 and 7301 excluded; 100 and 3600 inside
    assert got == [1, 2, 3, 4]


def test_keyed_interval_join_is_half_open_and_key_scoped(spark):
    """The keyed spelling (intervals.point_in_interval_join, default
    closed_start=False): the anchor's own start instant must NOT match
    (strict >), the end must (<=), and matches never cross keys."""
    from twitter_social_triangle_mapreduce_spark.operators.intervals import (
        point_in_interval_join,
    )

    pts = spark.createDataFrame(
        [(1, 100, 1), (1, 101, 2), (1, 200, 3), (2, 150, 4)],
        "user_id long, us long, pid long",
    )
    iv = spark.createDataFrame(
        [(1, 100, 200, 10)], "user_id long, s long, e long, ivid long"
    )
    got = sorted(
        r["pid"]
        for r in point_in_interval_join(
            pts, iv, key="user_id", point_us="us",
            start_us="s", end_us="e", granule_us=100,
        ).collect()
    )
    # pid 1 excluded (== start, half-open), pid 4 excluded (other key)
    assert got == [2, 3]


def test_resample_windows_partition_by_user(spark):
    """Both windows (slot pick, forward fill) must partition by user —
    no single-partition global window may appear."""
    ev = load_table(spark, SF_SMOKE, "events")
    plan = (
        timeseries.resample_ffill(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_resample_fills_gaps_with_last_observation(spark):
    ev = spark.createDataFrame(
        [
            # user 1: events in slots 0 and 3 -> slots 1,2 carry value 10
            (1, 1_000_000_000, 10.0, 1),
            (1, 1_000_000_000 + 3 * 3600 * 1_000_000_000, 99.0, 2),
        ],
        "user_id long, ts long, value double, event_id long",
    ).withColumn(
        "ts",
        F.expr(
            "timestampadd(MICROSECOND, ts div 1000,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ),
    )
    got = {
        r["slot"]: r["value"]
        for r in timeseries.resample_ffill(ev).collect()
    }
    slots = sorted(got)
    assert len(slots) == 4
    assert got[slots[0]] == 10.0
    assert got[slots[1]] == 10.0  # gap: carried forward
    assert got[slots[2]] == 10.0
    assert got[slots[3]] == 99.0


def test_resample_slot_tie_breaks_deterministically(spark):
    """Two observations in one slot: latest ts wins; equal ts breaks by
    highest event_id."""
    base = 7_200 * 1_000_000_000
    ev = spark.createDataFrame(
        [
            (1, base, 1.0, 5),
            (1, base, 2.0, 9),        # same ts, higher event_id -> wins
            (1, base + 60 * 1_000_000_000, 3.0, 1),  # later ts -> wins all
        ],
        "user_id long, ts long, value double, event_id long",
    ).withColumn(
        "ts",
        F.expr(
            "timestampadd(MICROSECOND, ts div 1000,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ),
    )
    rows = timeseries.resample_ffill(ev).collect()
    assert len(rows) == 1 and rows[0]["value"] == 3.0
