"""Time-series operators over ``events``: generic bucketed interval join
(the scalable range-join pattern) and regular-grid resampling with
forward fill — the temporal surface a metrics/feature pipeline needs
beyond the as-of join in ``relational``.

The reference is a batch graph engine with no temporal operators
(SURVEY.md §1.3); these follow the engine's portability contract
(integer epoch math via the TZ-free NTZ helpers, deterministic
tie-breaks) so every query is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.io import ntz_epoch_seconds

#: bucket width (seconds) for the interval join's equi-key
INTERVAL_BUCKET_S = 3600
#: incident window length for the demo composition
INCIDENT_WINDOW_S = 900
#: every Nth event (by id) opens an incident window in the demo
INCIDENT_MOD = 97

#: resample grid step (seconds)
RESAMPLE_STEP_S = 3600


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_s: int = INTERVAL_BUCKET_S,
) -> DataFrame:
    """Inner-join ``points`` to every interval containing them
    (``start <= point <= end``), all three columns integer (epoch
    seconds). Returns the joined relation with both sides' columns.

    Spark has no native range join, and the naive formulation is a
    broadcast-nested-loop theta join — quadratic work at scale. This is
    the standard BUCKETED range join: both sides key on coarse time
    buckets (intervals explode to one row per covered bucket — cheap
    while ``bucket_s`` is at least the typical interval length), the
    join becomes an equi-shuffle on the bucket id, and the exact range
    predicate filters after the hash match. A point lies in exactly one
    bucket, and an interval appears at most once per bucket, so no
    dedup step is needed. Shuffle volume is |points| + Σ interval
    spans — linear, never |points|·|intervals|. Hot buckets (a burst
    hour) are ordinary join skew: AQE skew-join or ``operators.skew``
    salting applies unchanged.

    This is the unkeyed, fully-closed spelling of
    ``intervals.point_in_interval_join`` (ONE bucketing core serves
    both: the keyed half-open self-join of ``events_follow_count`` and
    this global containment join)."""
    from .intervals import point_in_interval_join

    return point_in_interval_join(
        points,
        intervals,
        key=None,
        point_us=point_col,
        start_us=start_col,
        end_us=end_col,
        granule_us=bucket_s,
        closed_start=True,
    )


def incident_event_counts(
    events: DataFrame,
    window_s: int = INCIDENT_WINDOW_S,
    mod: int = INCIDENT_MOD,
    bucket_s: int = INTERVAL_BUCKET_S,
) -> DataFrame:
    """(incident_id, n_events) — demo composition of ``interval_join``:
    every ``mod``-th event opens a ``window_s``-second incident window
    ``[ts, ts+window_s]``; count the events falling inside each window
    (the trigger itself always matches, so every incident appears)."""
    pts = events.select(
        F.col("event_id").alias("p_event_id"),
        ntz_epoch_seconds("ts").alias("p_ep"),
    )
    iv = events.where(F.col("event_id") % mod == 0).select(
        F.col("event_id").alias("incident_id"),
        ntz_epoch_seconds("ts").alias("i_start"),
        (ntz_epoch_seconds("ts") + window_s).alias("i_end"),
    )
    return (
        interval_join(pts, iv, "p_ep", "i_start", "i_end", bucket_s)
        .groupBy("incident_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def incident_oracle_sql(
    window_s: int = INCIDENT_WINDOW_S, mod: int = INCIDENT_MOD
) -> str:
    """DuckDB twin of ``incident_event_counts`` — states the range join
    directly (the bucketing is an engine-side strategy, not semantics)."""
    return f"""
        WITH p AS (SELECT event_id,
                          CAST(floor(epoch(ts)) AS BIGINT) AS ep
                   FROM events),
        iv AS (SELECT event_id AS incident_id, ep AS i_start,
                      ep + {window_s} AS i_end
               FROM p WHERE event_id % {mod} = 0)
        SELECT incident_id, COUNT(*) AS n_events
        FROM p JOIN iv ON p.ep >= iv.i_start AND p.ep <= iv.i_end
        GROUP BY incident_id
    """


def resample_ffill(
    events: DataFrame, step_s: int = RESAMPLE_STEP_S
) -> DataFrame:
    """(user_id, slot, value) — regular-grid resampling with forward
    fill: for each user, one row per ``step_s`` slot between their first
    and last event; ``value`` is the last observation in or before the
    slot (ties within a slot break by latest ts, then highest event_id —
    fully deterministic). The gap-filling shape feature pipelines need
    before any fixed-step model input.

    Scale shape: the observation pick and the fill are windows
    PARTITIONED BY user (shuffle on user_id, the natural key); the grid
    explodes per user from an aggregate — no global ordering, no
    driver-side time loop. Grid size is span/step per user, independent
    of event count."""
    ep = events.select(
        "user_id",
        ntz_epoch_seconds("ts").alias("ep"),
        "event_id",
        "value",
    ).withColumn("slot", F.expr(f"ep div {step_s}"))
    pick_w = Window.partitionBy("user_id", "slot").orderBy(
        F.col("ep").desc(), F.col("event_id").desc()
    )
    obs = (
        ep.withColumn("__rn", F.row_number().over(pick_w))
        .where(F.col("__rn") == 1)
        .select("user_id", "slot", "value")
    )
    grid = (
        ep.groupBy("user_id")
        .agg(
            F.min("slot").alias("__lo"), F.max("slot").alias("__hi")
        )
        .select(
            "user_id",
            F.explode(F.expr("sequence(__lo, __hi)")).alias("slot"),
        )
    )
    fill_w = (
        Window.partitionBy("user_id")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, ["user_id", "slot"], "left")
        .withColumn(
            "value", F.last("value", ignorenulls=True).over(fill_w)
        )
        .select("user_id", "slot", "value")
    )


def resample_oracle_sql(step_s: int = RESAMPLE_STEP_S) -> str:
    """DuckDB twin of ``resample_ffill``."""
    return f"""
        WITH e AS (SELECT user_id,
                          CAST(floor(epoch(ts)) AS BIGINT) // {step_s}
                              AS slot,
                          CAST(floor(epoch(ts)) AS BIGINT) AS ep,
                          event_id, value
                   FROM events),
        obs AS (SELECT user_id, slot, value FROM (
                    SELECT user_id, slot, value,
                           ROW_NUMBER() OVER (
                               PARTITION BY user_id, slot
                               ORDER BY ep DESC, event_id DESC) AS rn
                    FROM e) WHERE rn = 1),
        bounds AS (SELECT user_id, MIN(slot) AS lo, MAX(slot) AS hi
                   FROM e GROUP BY user_id),
        grid AS (SELECT user_id, unnest(range(lo, hi + 1)) AS slot
                 FROM bounds)
        SELECT g.user_id, g.slot,
               LAST_VALUE(o.value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.slot
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS value
        FROM grid g LEFT JOIN obs o
          ON o.user_id = g.user_id AND o.slot = g.slot
    """
