"""Change-data-capture primitives: latest-wins snapshots and batch
merge/upsert — how a 100 TB pipeline folds an update stream into a keyed
table without a transactional table format.

The core is ``latest_by_key``: per key, the row with the greatest
sequence tuple. Deliberately NOT the window-function formulation
(``row_number() OVER (PARTITION BY key ORDER BY seq DESC) = 1`` needs a
full shuffle-and-sort of every payload byte): instead ``max`` over a
struct whose leading fields are the sequence columns. Struct comparison
is lexicographic, so the max struct IS the argmax row — and a plain
``max`` aggregate gets Tungsten partial aggregation, meaning each map
task ships at most one candidate row per key to the reducer. On a
billion-row update log with a million keys that is a ~1000× shuffle
reduction vs the window sort. The DuckDB oracle uses the window
formulation precisely because the two must agree: same semantics, two
independent plans.

``merge_upsert`` is SQL MERGE's insert-or-replace subset expressed as
union + latest-wins: stamp each side with a source rank (updates
outrank base on sequence ties), take ``latest_by_key`` over the union.
Deterministic for any inputs: ties beyond the sequence fall through to
payload comparison, so two runs always elect the same row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SRC = "__tstm_src_rank"


def latest_by_key(
    df: DataFrame, keys: list[str], seq_cols: list[str]
) -> DataFrame:
    """Per ``keys`` group, the row with the greatest ``seq_cols`` tuple
    (remaining columns break exact sequence ties deterministically).
    Output columns = input columns, original order."""
    payload = [c for c in df.columns if c not in keys]
    ordered = list(seq_cols) + [c for c in payload if c not in seq_cols]
    top = df.groupBy(*keys).agg(F.max(F.struct(*ordered)).alias("__top"))
    return top.select(
        *keys, *[F.col(f"__top.{c}").alias(c) for c in ordered]
    ).select(*df.columns)


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    seq_cols: list[str],
) -> DataFrame:
    """Insert-or-replace merge: rows from ``updates`` supersede rows in
    ``base`` with the same key and a lower-or-equal sequence; base rows
    with a strictly newer sequence survive (late-arriving update
    protection). New keys insert. Schema of both inputs must match."""
    b = base.withColumn(_SRC, F.lit(0))
    u = updates.withColumn(_SRC, F.lit(1))
    merged = b.unionByName(u)
    return latest_by_key(merged, keys, list(seq_cols) + [_SRC]).drop(_SRC)


def user_latest_event(events: DataFrame) -> DataFrame:
    """(user_id, last_event_id, last_type, last_value_e6) — the keyed
    latest-wins snapshot of the event log, sequence = (ts, event_id).
    ``value`` is floor-scaled to BIGINT for engine-exact hashing."""
    latest = latest_by_key(
        events.select("user_id", "ts", "event_id", "event_type", "value"),
        keys=["user_id"],
        seq_cols=["ts", "event_id"],
    )
    return latest.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.expr("CAST(FLOOR(1000000 * value) AS BIGINT)").alias(
            "last_value_e6"
        ),
    )


def user_latest_event_oracle_sql() -> str:
    """DuckDB twin of ``user_latest_event`` — the WINDOW formulation, so
    the aggregate-argmax plan is checked against an independent one."""
    return """
        WITH r AS (
            SELECT user_id, event_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC)
                       AS rn
            FROM events
        )
        SELECT user_id,
               event_id AS last_event_id,
               event_type AS last_type,
               CAST(FLOOR(1000000 * value) AS BIGINT) AS last_value_e6
        FROM r WHERE rn = 1
    """


def scd2_history(
    updates: DataFrame,
    key_cols: list[str],
    seq_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Type-2 slowly-changing-dimension history: one validity interval
    per CHANGE of the tracked attributes — consecutive updates with
    identical attributes collapse into one row. Columns: the keys, the
    attributes, ``valid_from`` (this version's sequence value),
    ``valid_to`` (the next version's, NULL while current), and
    ``is_current``.

    Shape: everything is windowed PARTITION BY key ORDER BY seq —
    change detection (``lag`` over the attribute struct), then
    ``lead`` for the closing bound over the surviving version rows.
    Two window passes over the same key partitioning (one exchange,
    Spark reuses it); no self-join of the update log. The warehouse
    history-table primitive, expressed shuffle-minimally."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(seq_col)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = F.lag(attrs).over(w).isNull() | (
        F.lag(attrs).over(w) != attrs
    )
    versions = (
        updates.select(*key_cols, seq_col, *attr_cols)
        .withColumn("__chg", changed)
        .where(F.col("__chg"))
        .drop("__chg")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(seq_col)
    return (
        versions.withColumn(
            "valid_from", F.col(seq_col)
        )
        .withColumn("valid_to", F.lead(seq_col).over(w2))
        .withColumn(
            "is_current", F.col("valid_to").isNull().cast("long")
        )
        .drop(seq_col)
    )


def user_type_scd2(events: DataFrame) -> DataFrame:
    """Registry demo: the SCD2 history of each user's ``event_type``
    attribute over the event log (sequence = epoch µs of ts, unique per
    user in the testdata at µs resolution — verified by the oracle's
    identical windows)."""
    from ..sources.io import ntz_epoch_micros

    up = events.select(
        "user_id",
        ntz_epoch_micros("ts").alias("seq_us"),
        "event_type",
    )
    return scd2_history(
        up, key_cols=["user_id"], seq_col="seq_us",
        attr_cols=["event_type"],
    )


def user_type_scd2_oracle_sql() -> str:
    """DuckDB twin of ``user_type_scd2``."""
    return """
        WITH up AS (SELECT user_id, epoch_us(ts) AS seq_us, event_type
                    FROM events),
        flagged AS (
            SELECT user_id, seq_us, event_type,
                   (lag(event_type) OVER (PARTITION BY user_id
                                          ORDER BY seq_us) IS DISTINCT
                    FROM event_type) AS chg
            FROM up
        ),
        versions AS (SELECT user_id, seq_us, event_type
                     FROM flagged WHERE chg)
        SELECT user_id, event_type,
               seq_us AS valid_from,
               lead(seq_us) OVER (PARTITION BY user_id ORDER BY seq_us)
                   AS valid_to,
               CAST(CASE WHEN lead(seq_us) OVER (PARTITION BY user_id
                                                 ORDER BY seq_us)
                          IS NULL THEN 1 ELSE 0 END AS BIGINT)
                   AS is_current
        FROM versions
    """
