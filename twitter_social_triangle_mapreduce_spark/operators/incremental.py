"""Incremental-maintenance operators: mergeable additive aggregate
states — the snapshot+delta pattern that replaces full recomputes at
100 TB (a daily rollup folds one day of deltas into yesterday's
snapshot instead of rescanning the corpus; the HLL sketch tables in
``relational.user_sketches_daily`` are the distinct-count instance of
the same idea, this is the exact-additive instance).

Correctness contract: ``merge_agg_states(state(A), state(B)) ==
state(A ∪ B)`` for any disjoint split — the registry query feeds a
deterministic split through the merge path and the oracle recomputes
directly from the union, so the driver gate proves the algebra."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: money/value amounts are folded in DECIMAL so the state is exactly
#: mergeable (double addition is order-dependent; decimal is not)
VALUE_DEC = "decimal(28,6)"


def additive_agg_state(events: DataFrame) -> DataFrame:
    """(user_id, n_events, sum_value, min_value, max_value) — the
    per-key additive state: every component is mergeable (count/sum by
    +, min/max by min/max). One shuffle, full partial aggregation."""
    v = F.col("value").cast(VALUE_DEC)
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(v).alias("sum_value"),
        F.min(v).alias("min_value"),
        F.max(v).alias("max_value"),
    )


def merge_agg_states(snapshot: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a delta state into a snapshot state: full-outer join on the
    key, component-wise merge. The output is again a valid state, so
    merges chain (day after day) without ever touching raw history.
    Shuffles only the two compact state relations — never the events."""
    s = snapshot.select(
        "user_id",
        F.col("n_events").alias("__sn"),
        F.col("sum_value").alias("__ss"),
        F.col("min_value").alias("__smin"),
        F.col("max_value").alias("__smax"),
    )
    d = delta.select(
        "user_id",
        F.col("n_events").alias("__dn"),
        F.col("sum_value").alias("__ds"),
        F.col("min_value").alias("__dmin"),
        F.col("max_value").alias("__dmax"),
    )
    zero = F.lit(0).cast(VALUE_DEC)
    return s.join(d, "user_id", "full_outer").select(
        "user_id",
        (F.coalesce("__sn", F.lit(0)) + F.coalesce("__dn", F.lit(0))).alias(
            "n_events"
        ),
        (F.coalesce("__ss", zero) + F.coalesce("__ds", zero)).alias(
            "sum_value"
        ),
        F.least(
            F.coalesce("__smin", "__dmin"), F.coalesce("__dmin", "__smin")
        ).alias("min_value"),
        F.greatest(
            F.coalesce("__smax", "__dmax"), F.coalesce("__dmax", "__smax")
        ).alias("max_value"),
    )


def merged_user_state(events: DataFrame) -> DataFrame:
    """Registry composition: split events deterministically (even/odd
    event_id), build both states, MERGE them — the result must equal
    the direct state over all events (the oracle recomputes directly,
    so any merge bug hash-mismatches). Final decimals cast to double
    for a stable comparison surface."""
    snap = additive_agg_state(events.where(F.col("event_id") % 2 == 0))
    delta = additive_agg_state(events.where(F.col("event_id") % 2 != 0))
    m = merge_agg_states(snap, delta)
    return m.select(
        "user_id",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("min_value").cast("double").alias("min_value"),
        F.col("max_value").cast("double").alias("max_value"),
    )


MERGED_STATE_ORACLE = """
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
           CAST(MIN(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS min_value,
           CAST(MAX(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS max_value
    FROM events
    GROUP BY user_id
"""
