"""CDC operator tests: merge/upsert semantics on golden fixtures, the
aggregate-argmax vs window-formulation equivalence on real data, and the
plan property that makes the operator scale (partial aggregation, no
window sort)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from twitter_social_triangle_mapreduce_spark.operators import cdc
from twitter_social_triangle_mapreduce_spark.plans.explain import plan_of
from twitter_social_triangle_mapreduce_spark.sources.io import load_table

from conftest import SF_SMOKE

_SCHEMA = "k long, seq long, v string"


def _kv(spark, rows):
    return spark.createDataFrame(
        [(int(k), int(s), str(v)) for k, s, v in rows], _SCHEMA
    )


def _as_map(df):
    return {r["k"]: (r["seq"], r["v"]) for r in df.collect()}


def test_merge_upsert_semantics(spark):
    base = _kv(spark, [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")])
    updates = _kv(
        spark,
        [
            (2, 20, "B"),  # newer seq -> replaces
            (3, 5, "stale"),  # older seq -> base survives
            (4, 15, "d"),  # new key -> inserts
        ],
    )
    out = _as_map(cdc.merge_upsert(base, updates, ["k"], ["seq"]))
    assert out == {
        1: (10, "a"),
        2: (20, "B"),
        3: (10, "c"),
        4: (15, "d"),
    }


def test_merge_upsert_update_wins_seq_tie(spark):
    base = _kv(spark, [(5, 7, "old")])
    updates = _kv(spark, [(5, 7, "new")])
    out = _as_map(cdc.merge_upsert(base, updates, ["k"], ["seq"]))
    assert out == {5: (7, "new")}


def test_merge_upsert_idempotent(spark):
    """Re-applying the same update batch changes nothing — the property
    that makes replayed CDC batches safe."""
    base = _kv(spark, [(1, 1, "a"), (2, 2, "b")])
    updates = _kv(spark, [(1, 3, "A"), (3, 1, "c")])
    once = cdc.merge_upsert(base, updates, ["k"], ["seq"])
    twice = cdc.merge_upsert(once, updates, ["k"], ["seq"])
    assert _as_map(once) == _as_map(twice)


def test_latest_matches_window_formulation(spark):
    """The aggregate-argmax result equals the row_number window plan on
    the real events table (independent in-Spark cross-check; the DuckDB
    window oracle covers the cross-engine side)."""
    events = load_table(spark, SF_SMOKE, "events")
    via_agg = cdc.user_latest_event(events)
    w = (
        events.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            F.expr("CAST(FLOOR(1000000 * value) AS BIGINT)").alias(
                "last_value_e6"
            ),
        )
    )
    assert sorted(map(tuple, via_agg.collect())) == sorted(
        map(tuple, w.collect())
    )


def test_latest_plan_is_partial_agg_not_window(spark):
    """The scale property itself: no Window operator (whose sort would
    shuffle every payload byte), and the max-struct aggregate runs with
    map-side partial aggregation so each task ships one candidate per
    key."""
    events = load_table(spark, SF_SMOKE, "events")
    plan = plan_of(cdc.user_latest_event(events))
    assert "Window" not in plan
    assert "partial_max" in plan or "partial, " in plan.lower() or (
        "HashAggregate" in plan and "partial" in plan.lower()
    )


def test_scd2_collapses_unchanged_and_chains_validity(spark):
    """Consecutive updates with identical attributes collapse into one
    version; valid_to of version k equals valid_from of version k+1;
    exactly one current row per key."""
    from twitter_social_triangle_mapreduce_spark.operators.cdc import (
        scd2_history,
    )

    up = spark.createDataFrame(
        [
            (1, 10, "bronze"),
            (1, 20, "bronze"),   # unchanged -> collapses into v1
            (1, 30, "silver"),
            (1, 40, "gold"),
            (2, 15, "bronze"),
        ],
        "user_id long, seq long, tier string",
    )
    hist = scd2_history(
        up, key_cols=["user_id"], seq_col="seq", attr_cols=["tier"]
    ).collect()
    u1 = sorted(
        [r for r in hist if r["user_id"] == 1],
        key=lambda r: r["valid_from"],
    )
    assert [(r["tier"], r["valid_from"], r["valid_to"]) for r in u1] == [
        ("bronze", 10, 30),
        ("silver", 30, 40),
        ("gold", 40, None),
    ]
    assert sum(r["is_current"] for r in hist) == 2  # one per key
