"""Table profiling — the data-quality audit primitive a training-data
pipeline runs before anything else (dataset cards, ingestion gates):
per-column row/null/distinct counts in ONE aggregation pass over the
table, however many columns are profiled.

Scale shape: a single global aggregate with map-side partials — the scan
is the cost, not the column count; no per-column jobs, no collect-based
introspection. Output is long-form (one row per column) so downstream
checks (``n_nulls = 0``, ``n_distinct = n_rows`` for keys) are plain
filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct) for each profiled column,
    computed in one aggregation pass (exact distincts — swap in
    ``approx_count_distinct`` for ultra-high-cardinality columns when the
    exact shuffle is not worth it)."""
    cols = df.columns if cols is None else cols
    if not cols:
        raise ValueError("column_profile: no columns to profile")
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nnull_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__nnull_{c}`, `__nd_{c}`" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " AS (col_name, n_nulls, n_distinct)"
        ),
        F.col("__n_rows").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct")


def key_skew_profile(df: DataFrame, key: str) -> DataFrame:
    """One-row skew audit of a prospective shuffle/join key: row and key
    counts, the largest and smallest group, the heaviest key's share of
    all rows (e6-scaled), and the mean group size. This is the
    measurement that decides salting / skew-join handling BEFORE a 100 TB
    shuffle is launched — the engine's answer to "is user_id safe to
    join on?".

    Two aggregations over compact intermediates: sizes-per-key (partial
    agg map-side), then a global fold of the size relation. Nothing is
    collected; the output is one row."""
    sizes = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    return sizes.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.min("cnt").alias("min_cnt"),
        F.expr(
            "CAST(FLOOR(1000000.0 * MAX(cnt) / SUM(cnt)) AS BIGINT)"
        ).alias("top_share_e6"),
        F.expr(
            "CAST(FLOOR(1000000.0 * SUM(cnt) / COUNT(*)) AS BIGINT)"
        ).alias("mean_cnt_e6"),
    )


def key_skew_oracle_sql(table: str, key: str) -> str:
    """DuckDB twin of ``key_skew_profile``."""
    return f"""
        WITH sizes AS (SELECT {key}, COUNT(*) AS cnt
                       FROM {table} GROUP BY {key})
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
               COUNT(*) AS n_keys,
               MAX(cnt) AS max_cnt,
               MIN(cnt) AS min_cnt,
               CAST(FLOOR(1000000.0 * MAX(cnt) / SUM(cnt)) AS BIGINT)
                   AS top_share_e6,
               CAST(FLOOR(1000000.0 * SUM(cnt) / COUNT(*)) AS BIGINT)
                   AS mean_cnt_e6
        FROM sizes
    """


def profile_oracle_sql(table: str, cols: list[str]) -> str:
    """DuckDB twin: one SELECT per column, unioned (COUNT(DISTINCT x)
    ignores NULLs in both engines)."""
    parts = [
        f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows,"
        f" SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_nulls,"
        f" COUNT(DISTINCT {c}) AS n_distinct"
        f" FROM {table}"
        for c in cols
    ]
    return " UNION ALL ".join(parts)
