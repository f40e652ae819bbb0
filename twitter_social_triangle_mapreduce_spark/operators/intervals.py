"""Range/interval joins — the temporal join Spark has no native physical
strategy for (a raw ``l.ts BETWEEN r.start AND r.end`` predicate joins as
BroadcastNestedLoop or a per-key sort: quadratic on hot keys).

The scalable formulation is time bucketing: choose a granule no smaller
than the interval width, assign each POINT to the single granule
containing it, explode each INTERVAL to the granules it overlaps (at most
``ceil(width/granule) + 1`` — 2 for width == granule), then equi-join on
(key, granule) and refine with the exact range predicate. The join is a
plain shuffled hash join on a composite key; fan-out is bounded by the
granule arithmetic, never by data volume; and skew is bounded by events
per (user, hour) rather than events per user. This is the standard
interval-join decomposition streaming engines (Flink) use for bounded
time-range joins, expressed here purely as DataFrame ops.

Used by ``events_follow_count``: for every event, how many same-user
events land in the hour after it — the self-join shape of funnel /
retention / frequency-cap queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.io import ntz_epoch_micros

#: one hour in microseconds — horizon AND granule of the demo query
HOUR_US = 3_600_000_000


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str | None,
    point_us: str,
    start_us: str,
    end_us: str,
    granule_us: int,
    closed_start: bool = False,
) -> DataFrame:
    """Inner-join ``points`` to every containing interval — by default
    ``start_us < point_us <= end_us`` (half-open on the left: an
    interval does not match its own start instant — the convention that
    makes self-joins exclude the anchoring row); ``closed_start=True``
    switches to the fully-closed ``[start_us, end_us]``. With ``key``
    the match additionally requires equality on that column; ``key=None``
    buckets on time alone (the global range-join shape —
    ``timeseries.interval_join`` is that spelling).

    Columns of both inputs are preserved; callers project/aggregate on
    top. ``granule_us`` must be >= the widest interval for the 2-granule
    explosion bound to hold; the generic ``sequence`` explosion stays
    correct (just wider) if it is not.
    """
    # integer div, not float-divide-and-cast: at epoch-microsecond
    # magnitudes a double quotient can land a hair under an exact
    # boundary and truncate into the wrong granule
    p = points.withColumn(
        "__g", F.expr(f"{point_us} div {granule_us}")
    )
    lo = start_us if closed_start else f"({start_us} + 1)"
    i = intervals.withColumn(
        "__g",
        F.explode(
            F.sequence(
                F.expr(f"{lo} div {granule_us}"),
                F.expr(f"{end_us} div {granule_us}"),
            )
        ),
    )
    start_pred = (
        F.col(point_us) >= F.col(start_us)
        if closed_start
        else F.col(point_us) > F.col(start_us)
    )
    return (
        p.join(i, ([key] if key else []) + ["__g"])
        .where(start_pred & (F.col(point_us) <= F.col(end_us)))
        .drop("__g")
    )


def events_follow_count(
    events: DataFrame, horizon_us: int = HOUR_US
) -> DataFrame:
    """(event_id, n_follow) — per event, the number of same-user events
    in the half-open window (ts, ts + horizon]. Zero-count events are
    kept (left join back), so the output is exactly one row per event.

    Epoch math is the TZ-free microsecond helper shared with the as-of
    join, so results are session-timezone independent."""
    base = events.select(
        "event_id", "user_id", ntz_epoch_micros("ts").alias("us")
    )
    anchors = base.select(
        F.col("event_id").alias("anchor_id"),
        F.col("user_id"),
        F.col("us").alias("start_us"),
        (F.col("us") + horizon_us).alias("end_us"),
    )
    followers = base.select(
        F.col("event_id").alias("follow_id"), "user_id", "us"
    )
    matched = point_in_interval_join(
        followers,
        anchors,
        key="user_id",
        point_us="us",
        start_us="start_us",
        end_us="end_us",
        granule_us=horizon_us,
    )
    counts = matched.groupBy("anchor_id").agg(
        F.count(F.lit(1)).alias("n_follow")
    )
    return (
        events.select("event_id")
        .join(counts, events.event_id == counts.anchor_id, "left")
        .select(
            "event_id",
            F.coalesce("n_follow", F.lit(0)).alias("n_follow"),
        )
    )


def temporal_path2_counts(
    events: DataFrame, horizon_us: int = HOUR_US
) -> DataFrame:
    """(x, n_paths) — TIME-RESPECTING length-2 paths in the event-derived
    edge stream: X→Y at t₁ then Y→Z at t₂ with ``t₁ < t₂ <= t₁+horizon``
    and X≠Z (the reference's path-2 exploration made temporal — a path
    only counts if the second hop happens after the first, within the
    horizon; reference ``ExactCardinality.java`` counts the static
    version). Counts per source X.

    Shape: the hop condition is the keyed half-open interval join on the
    mid node — shuffle keyed on (mid, time-granule), never a per-key
    sort of full adjacency; the same core as ``events_follow_count``."""
    from ..sources.io import derive_edges

    e = derive_edges(events, keep=["ts"]).select(
        "src", "dst", ntz_epoch_micros("ts").alias("us")
    )
    hop1 = e.select(
        F.col("src").alias("x"),
        F.col("dst").alias("mid"),
        F.col("us").alias("t1"),
        (F.col("us") + horizon_us).alias("t1_end"),
    )
    hop2 = e.select(
        F.col("src").alias("mid"),
        F.col("dst").alias("z"),
        F.col("us").alias("t2"),
    )
    paths = point_in_interval_join(
        hop2,
        hop1,
        key="mid",
        point_us="t2",
        start_us="t1",
        end_us="t1_end",
        granule_us=horizon_us,
    ).where(F.col("x") != F.col("z"))
    return paths.groupBy("x").agg(F.count(F.lit(1)).alias("n_paths"))


def temporal_path2_oracle_sql(horizon_us: int = HOUR_US) -> str:
    """DuckDB twin of ``temporal_path2_counts``."""
    return f"""
        WITH e AS (SELECT user_id AS src,
                          (user_id * 37 + event_id * 11 + 7) % 200 AS dst,
                          epoch_us(ts) AS us
                   FROM events)
        SELECT a.src AS x, COUNT(*) AS n_paths
        FROM e a JOIN e b
          ON a.dst = b.src
         AND b.us > a.us AND b.us <= a.us + {horizon_us}
         AND a.src <> b.dst
        GROUP BY a.src
    """


def events_follow_count_oracle_sql(horizon_us: int = HOUR_US) -> str:
    """DuckDB twin of ``events_follow_count`` — the direct inequality
    join (the oracle can afford the naive plan)."""
    return f"""
        SELECT a.event_id,
               COUNT(b.event_id) AS n_follow
        FROM events a
        LEFT JOIN events b
          ON b.user_id = a.user_id
         AND epoch_us(b.ts) > epoch_us(a.ts)
         AND epoch_us(b.ts) <= epoch_us(a.ts) + {horizon_us}
        GROUP BY a.event_id
    """
