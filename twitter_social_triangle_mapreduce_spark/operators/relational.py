"""Relational / events-pipeline operators: JSON extraction, windowed
sessionization, TPC-H-style aggregation and top-k joins — the operator
classes the reference lacks entirely (SURVEY.md §2.5: windows, sorts,
limits, set ops) exercised as first-class queries.

Float-sum portability: monetary sums are computed in DECIMAL (exact,
order-insensitive) and cast to DOUBLE only at output; epoch arithmetic is
integer seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.io import ntz_epoch_div, ntz_epoch_micros, ntz_epoch_seconds

#: session gap threshold (seconds) for sessionization
SESSION_GAP_S = 1800


def events_json_kpi(events: DataFrame) -> DataFrame:
    """Per event_type KPIs with a JSON-extracted metric: count, exact
    DECIMAL sum of ``value``, and the sum of the JSON ``props.k`` field.
    ``get_json_object`` stays JVM-side (S2-style late schema projection)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
        F.sum(k).alias("sum_k"),
    )


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """(user_id, session_id, n_events, sess_start_s) — gap-based
    sessionization: a new session starts when the inter-event gap exceeds
    ``gap_s`` seconds. Classic two-window formulation (lag → boundary flag
    → running sum), partitioned by user — one shuffle on user_id, then
    both windows reuse that partitioning. Ordering is (ts, event_id) so
    ties are deterministic. Epoch math is TZ-free (``ntz_epoch_seconds``),
    so the result is identical whatever ``spark.sql.session.timeZone``
    happens to be."""
    ep = ntz_epoch_seconds("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_flag = events.select(
        "user_id", "ts", "event_id", ep.alias("ep")
    ).withColumn(
        "new_sess",
        F.when(
            F.col("ep") - F.lag("ep").over(w) > gap_s, 1
        ).otherwise(F.when(F.lag("ep").over(w).isNull(), 1).otherwise(0)),
    )
    with_sess = with_flag.withColumn(
        "session_id", F.sum("new_sess").over(w)
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ep").alias("sess_start_s"),
    )


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: grouped exact-decimal sums over the
    fact table with a pushed-down date predicate. The scan should show the
    filter in PushedFilters and read only the 6 referenced columns."""
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        # l_shipdate is naive parquet ms → TimestampNTZ; compare against
        # an NTZ literal so no session-timezone interpretation is involved
        lineitem.where(
            F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp_ntz")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_customers(
    customer: DataFrame, orders: DataFrame, k: int = 10
) -> DataFrame:
    """Top-k customers by exact order-total spend. The customer dimension
    broadcasts; orders aggregate per custkey first (shuffle on the fact
    key), then join — aggregate-before-join keeps the join input small."""
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spent"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        spend.join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            spend.o_custkey == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            F.col("spent").cast("double").alias("total_spent"),
            "n_orders",
        )
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def user_value_trend(events: DataFrame) -> DataFrame:
    """(user_id, n, slope_e9) — per-user least-squares slope of ``value``
    over event time, fully built-in (no Python in the plan) and
    engine-exact:

    - x = whole epoch seconds (BIGINT, exact), y = value in cents
      (``round(value*100)`` — the synthetic values are 2-decimal, and
      round-on-double is deterministic in Spark AND DuckDB);
    - the five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are summed as
      DECIMAL(38,0) — exact and order-insensitive, so the shuffle
      reduction order can't perturb the result;
    - numerator n·Σxy − Σx·Σy and denominator n·Σx² − (Σx)² are formed
      still in DECIMAL (no catastrophic cancellation in doubles), then a
      single double division + ``floor(1e9·slope)`` at the end — the same
      two IEEE operations in both engines → hash-exact oracle.

    Scale shape: one partial-agg groupBy; 5 numbers of state per user.
    The grouped-``applyInPandas`` formulation of the same query is kept
    as ``user_value_trend_pandas`` (pytest tier) as the batch
    split-apply-combine UDF taxonomy demo."""
    dec = "decimal(38,0)"
    x = ntz_epoch_seconds("ts").cast(dec)
    y = F.round(F.col("value") * 100).cast("long").cast(dec)
    agg = (
        events.select("user_id", x.alias("x"), y.alias("y"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    nn = F.col("n").cast(dec)
    num = nn * F.col("sxy") - F.col("sx") * F.col("sy")
    den = nn * F.col("sxx") - F.col("sx") * F.col("sx")
    # y is in cents (100·value), so slope_of_value = ratio/100 and
    # 1e9·slope_of_value = 1e7·ratio — the SAME two IEEE double ops
    # (divide, multiply) in the oracle text below.
    slope_e9 = (
        F.when(den == F.lit(0).cast(dec), F.lit(0).cast("long"))
        .otherwise(
            F.floor(F.lit(1e7) * (num.cast("double") / den.cast("double")))
        )
        .alias("slope_e9")
    )
    return agg.select("user_id", "n", slope_e9)


USER_VALUE_TREND_SQL = """
    WITH prep AS (
        SELECT user_id,
               CAST(CAST(floor(epoch(ts)) AS BIGINT) AS HUGEINT) AS x,
               CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS y
        FROM events
    ), agg AS (
        SELECT user_id, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM prep GROUP BY user_id
    )
    SELECT user_id, n,
           CASE WHEN n * sxx - sx * sx = 0 THEN 0
                ELSE CAST(floor(1e7 * (CAST(n * sxy - sx * sy AS DOUBLE)
                                       / CAST(n * sxx - sx * sx AS DOUBLE)))
                          AS BIGINT)
           END AS slope_e9
    FROM agg
"""


def user_value_trend_pandas(events: DataFrame) -> DataFrame:
    """(user_id, n, slope_e9) — per-user least-squares slope of ``value``
    over event time via grouped ``applyInPandas`` — the batch
    split-apply-combine UDF shape (Arrow batch per group, closed-form
    numpy math inside). Pytest tier (rows-only): the float slope is
    formulation-sensitive; the test asserts agreement with Spark's own
    ``regr_slope`` within tolerance. Self-contained closure (workers need
    no package import)."""
    out_schema = "user_id long, n long, slope_e9 long"

    def fit(pdf):
        import numpy as np
        import pandas as _pd

        t = pdf["ep"].to_numpy(dtype="float64")
        v = pdf["value"].to_numpy(dtype="float64")
        n = len(t)
        if n < 2 or np.all(t == t[0]):
            slope = 0.0
        else:
            tm, vm = t.mean(), v.mean()
            slope = float(((t - tm) * (v - vm)).sum() / ((t - tm) ** 2).sum())
        return _pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n": [n],
                "slope_e9": [int(np.floor(1e9 * slope))],
            }
        )

    prepared = events.select(
        "user_id",
        ntz_epoch_seconds("ts").alias("ep"),
        "value",
    )
    return prepared.groupBy("user_id").applyInPandas(fit, out_schema)


def value_percentiles(events: DataFrame) -> DataFrame:
    """Per event_type exact p50/p95 of ``value`` (sort-based percentile
    with linear interpolation — same definition as SQL PERCENTILE_CONT).
    Emitted as floor(1e4·p) for engine-exact comparison."""
    return events.groupBy("event_type").agg(
        F.floor(10000 * F.expr("percentile(value, 0.5)"))
        .cast("long")
        .alias("p50_e4"),
        F.floor(10000 * F.expr("percentile(value, 0.95)"))
        .cast("long")
        .alias("p95_e4"),
    )


def value_percentiles_approx(
    events: DataFrame, accuracy: int = 10000
) -> DataFrame:
    """(event_type, p50_e4, p95_e4) — the 100 TB twin of
    ``value_percentiles``: ``percentile_approx`` (Greenwald-Khanna
    sketch) aggregates with bounded memory and mergeable partial state,
    where the exact percentile must buffer and sort every group's values.
    Error ≤ 1/accuracy of the rank. Sketch results are
    implementation-specific (no SQL oracle — rows-only); the test bounds
    the deviation from the exact percentiles."""
    return events.groupBy("event_type").agg(
        F.floor(10000 * F.expr(f"percentile_approx(value, 0.5, {accuracy})"))
        .cast("long")
        .alias("p50_e4"),
        F.floor(10000 * F.expr(f"percentile_approx(value, 0.95, {accuracy})"))
        .cast("long")
        .alias("p95_e4"),
    )


def value_histogram(events: DataFrame, bucket_width: float = 50.0) -> DataFrame:
    """Fixed-width histogram of ``value``: integer bucket = floor(v/width).
    One aggregation, fully portable arithmetic."""
    return (
        events.groupBy(
            F.floor(F.col("value") / bucket_width).cast("long").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def order_status_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP over (status, priority): subtotal rows with NULL group keys —
    the grouping-sets surface (absent from the reference, free in Spark)."""
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-semi join: customers having ≥1 order (existence, no fanout)."""
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def customers_without_orders(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """Left-anti join: customers with no OPEN ('P') orders — the filter on
    the right side keeps the anti-join discriminating on the testdata
    (every customer has some order, ~1/3 have no open one)."""
    return customer.join(
        orders.where(F.col("o_orderstatus") == "P"),
        customer.c_custkey == orders.o_custkey,
        "left_anti",
    ).select("c_custkey", "c_name")


def user_event_setops(events: DataFrame) -> DataFrame:
    """Set-operation surface at (user, day) granularity: days on which a
    user clicked AND purchased but did not error — INTERSECT then EXCEPT
    (distinct semantics in both engines)."""
    ud = lambda t: (  # noqa: E731
        events.where(F.col("event_type") == t).select(
            # to_date directly on the NTZ column — TZ-free (a cast to
            # TIMESTAMP first would shift the date at session offsets)
            "user_id", F.to_date(F.col("ts")).alias("d")
        )
    )
    return ud("click").intersect(ud("purchase")).exceptAll(
        ud("error").distinct()
    )


def user_counts_by_type(events: DataFrame) -> DataFrame:
    """(event_type, n_users, n_events) — exact distinct-user and event
    counts per event type. The driver-tier exact twin of ``user_counts``:
    ``count_distinct`` plans as a two-stage partial aggregation
    (expand→partial distinct→final), fully oracle-able; the HLL variant
    (engine-specific values) lives in the pytest tier."""
    return events.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def user_counts(events: DataFrame) -> DataFrame:
    """Exact + approximate (HLL) distinct-user counts. The HLL value is
    engine-specific, so this query's oracle covers the exact column only if
    compared — registered as rows-only; the exact twin is asserted in
    tests."""
    return events.agg(
        F.count_distinct(F.col("user_id")).alias("n_users_exact"),
        F.approx_count_distinct(F.col("user_id")).alias("n_users_approx"),
    )


def user_sketches_daily(events: DataFrame) -> DataFrame:
    """(d, event_type, sk) — per-(day, type) HyperLogLog sketches of
    distinct users (DataSketches ``hll_sketch_agg``). THE distinct-count
    pattern at 100 TB: sketches are built once at ingest granularity and
    stored as a tiny binary column; any coarser rollup (weekly, per-type,
    global) is then a cheap ``hll_union_agg`` over stored sketches — no
    rescan of raw events, and unions are associative so they parallelize
    and incrementally update."""
    return events.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))


def user_sketch_rollup(events: DataFrame) -> DataFrame:
    """(event_type, est_users) — distinct users per event type via union
    of the daily sketches. Estimates are engine/sketch-specific (no SQL
    oracle — rows-only); the test asserts the merged estimate equals the
    direct single-pass estimate EXACTLY (sketch union is lossless at
    equal lgK) and tracks the exact distinct count within HLL error."""
    return (
        user_sketches_daily(events)
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_val: str,
) -> DataFrame:
    """Generic as-of join (an operator Spark lacks natively): for each left
    row, the ``right_val`` of the latest right row with
    ``right_time <= left_time`` for the same key; ties on right_time break
    by larger ``right_val``.

    Union-and-window formulation: tag both sides, sort within key by
    (time, tag, val), carry the last non-null right value forward. ONE
    shuffle on the key — no per-row range probe, no skew-prone range join;
    this is the scalable shape for billions of rows per side.
    """
    # collision-safe internal names: user frames may carry any column
    lt = left.select(
        F.col(key).alias("_asof_k"),
        F.col(left_time).alias("_asof_t"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast("long").alias("_asof_rv"),
        "*",
    )
    rt = right.select(
        F.col(key).alias("_asof_k"),
        F.col(right_time).alias("_asof_t"),
        F.lit(0).alias("_asof_side"),
        F.col(right_val).cast("long").alias("_asof_rv"),
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy("_asof_k")
        .orderBy("_asof_t", "_asof_side", "_asof_rv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn(
            "asof_val", F.last("_asof_rv", ignorenulls=True).over(w)
        )
        .where(F.col("_asof_side") == 1)
        .drop("_asof_k", "_asof_t", "_asof_side", "_asof_rv")
    )


def events_last_order_asof(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Per event: the customer's latest order key as of the event time
    (user_id plays the custkey role). Exercises ``asof_join`` end-to-end;
    events with no prior order yield NULL."""
    ev = events.select(
        "event_id",
        "user_id",
        ntz_epoch_seconds("ts").alias("ev_s"),
    )
    od = orders.select(
        F.col("o_custkey").alias("user_id"),
        # o_orderdate is parquet naive µs → TimestampNTZ; same TZ-free rule
        ntz_epoch_seconds("o_orderdate").alias("od_s"),
        "o_orderkey",
    )
    out = asof_join(
        ev, od, key="user_id", left_time="ev_s", right_time="od_s",
        right_val="o_orderkey",
    )
    return out.select(
        "event_id", "user_id", F.col("asof_val").alias("asof_orderkey")
    )


def cogrouped_user_activity(
    events: DataFrame, orders: DataFrame
) -> DataFrame:
    """(user_id, n_events, n_orders, events_per_order_e6) — per-user
    activity joined across TWO grouped relations via
    ``cogroup().applyInPandas`` — the cogrouped member of the
    Pandas-UDF taxonomy (both sides of a key arrive as pandas frames in
    one function call; the escape hatch for per-key merge logic no join
    can express, e.g. custom as-of/interleaving rules). The logic here
    is deliberately simple so the DuckDB oracle can state it exactly —
    the point under test is the cogrouped Arrow plumbing: keys present
    on either side must appear (empty frame on the absent side), and
    both inputs arrive keyed consistently.

    user_id plays the custkey role (FIXTURES.md §1 convention, as in
    the as-of join demo)."""
    ev = events.select("user_id", "event_id")
    od = orders.select(
        F.col("o_custkey").alias("user_id"), "o_orderkey"
    )

    def merge(key, ev_pdf, od_pdf):
        import pandas as pd

        n_ev, n_od = len(ev_pdf), len(od_pdf)
        ratio = (1_000_000 * n_ev) // n_od if n_od else -1
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_ev],
                "n_orders": [n_od],
                "events_per_order_e6": [ratio],
            }
        )

    return (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("user_id"))
        .applyInPandas(
            merge,
            "user_id long, n_events long, n_orders long,"
            " events_per_order_e6 long",
        )
    )


COGROUP_ACTIVITY_ORACLE = """
    WITH ev AS (SELECT user_id, COUNT(*) AS n_events FROM events
                GROUP BY user_id),
    od AS (SELECT o_custkey AS user_id, COUNT(*) AS n_orders FROM orders
           GROUP BY o_custkey)
    SELECT COALESCE(ev.user_id, od.user_id) AS user_id,
           COALESCE(ev.n_events, 0) AS n_events,
           COALESCE(od.n_orders, 0) AS n_orders,
           CASE WHEN COALESCE(od.n_orders, 0) = 0 THEN -1
                ELSE (1000000 * COALESCE(ev.n_events, 0))
                     // od.n_orders END AS events_per_order_e6
    FROM ev FULL OUTER JOIN od ON ev.user_id = od.user_id
"""


def promo_revenue_share(
    lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    """(ship_month, promo_rev, total_rev, promo_share_e6) — TPC-H
    Q14's shape: per ship month, the share of revenue from PROMO parts.
    The part dimension broadcasts (projected to key + a boolean flag,
    so the hash table carries 9 bytes/row, not the part payload);
    months are integer (year·12 + month) from TZ-free NTZ fields;
    conditional aggregation replaces the second scan Q14's CASE already
    implies. DECIMAL money, double only at the output boundary."""
    flag = part.select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("__promo")
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (
            F.lit(1).cast("decimal(18,2)")
            - F.col("l_discount").cast("decimal(18,2)")
        )
    )
    return (
        lineitem.join(
            F.broadcast(flag),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .groupBy(
            (
                F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1
            ).alias("ship_month")
        )
        .agg(
            F.sum(F.when(F.col("__promo"), rev).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )).alias("__promo_rev"),
            F.sum(rev).alias("__total_rev"),
        )
        .select(
            "ship_month",
            F.col("__promo_rev").cast("double").alias("promo_rev"),
            F.col("__total_rev").cast("double").alias("total_rev"),
            F.floor(
                1_000_000
                * F.col("__promo_rev").cast("double")
                / F.col("__total_rev").cast("double")
            )
            .cast("long")
            .alias("promo_share_e6"),
        )
    )


PROMO_SHARE_ORACLE = """
    SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)
               AS ship_month,
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                              * (CAST(1 AS DECIMAL(18,2))
                                 - CAST(l_discount AS DECIMAL(18,2)))
                         ELSE CAST(0 AS DECIMAL(18,2)) END)
                AS DOUBLE) AS promo_rev,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2))
                       - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS total_rev,
           CAST(FLOOR(1000000
                * CAST(SUM(CASE WHEN p_type = 'PROMO'
                               THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                    * (CAST(1 AS DECIMAL(18,2))
                                       - CAST(l_discount AS DECIMAL(18,2)))
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (CAST(1 AS DECIMAL(18,2))
                              - CAST(l_discount AS DECIMAL(18,2))))
                       AS DOUBLE)) AS BIGINT) AS promo_share_e6
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY ship_month
"""


def local_supplier_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """(n_name, revenue) — TPC-H Q5's shape: revenue from lineitems
    whose supplier and ordering customer sit in the SAME nation, rolled
    up by nation. The 5-way star: lineitem is the only wide relation —
    orders pre-projects to (orderkey, custkey) for the one wide join;
    customer, supplier, nation all broadcast; the same-nation predicate
    applies after the dimension hops. DECIMAL revenue, deterministic."""
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (
            F.lit(1).cast("decimal(18,2)")
            - F.col("l_discount").cast("decimal(18,2)")
        )
    )
    return (
        lineitem.select("l_orderkey", "l_suppkey", rev.alias("__rev"))
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                supplier.select("s_suppkey", "s_nationkey")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.sum("__rev").cast("double").alias("revenue"))
    )


LOCAL_SUPPLIER_ORACLE = """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2))
                       - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE c_nationkey = s_nationkey
    GROUP BY n_name
"""


def event_transitions(events: DataFrame) -> DataFrame:
    """(from_type, to_type, n, p_e6) — the per-user next-event
    transition matrix: for each consecutive event pair in a user's
    ts-ordered stream (ties broken by event_id), count transitions and
    the row-normalized probability — the first-order-Markov view of
    behavior (what users do after an error, what precedes a purchase).

    One window pass (lead over the user_id partition — shuffle keyed on
    the natural key), one compact aggregate on the 5×5 type pairs, and
    the normalizing row totals join back on the tiny from_type
    relation."""
    w = Window.partitionBy("user_id").orderBy(
        ntz_epoch_micros("ts").asc(), F.col("event_id").asc()
    )
    pairs = (
        events.withColumn("__next", F.lead("event_type").over(w))
        .where(F.col("__next").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("__next").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("__tot"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.floor(1_000_000 * F.col("n") / F.col("__tot"))
            .cast("long")
            .alias("p_e6"),
        )
    )


EVENT_TRANSITIONS_ORACLE = """
    WITH ordered AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts) ASC,
                                               event_id ASC) AS next_type
        FROM events
    ),
    pairs AS (SELECT event_type AS from_type, next_type AS to_type,
                     COUNT(*) AS n
              FROM ordered WHERE next_type IS NOT NULL
              GROUP BY event_type, next_type),
    totals AS (SELECT from_type, SUM(n) AS tot FROM pairs
               GROUP BY from_type)
    SELECT p.from_type, p.to_type, p.n,
           CAST(FLOOR(1000000 * p.n / t.tot) AS BIGINT) AS p_e6
    FROM pairs p JOIN totals t USING (from_type)
"""


def customer_spend_percentiles(
    customer: DataFrame, orders: DataFrame, n_tiles: int = 10
) -> DataFrame:
    """(c_custkey, spent, pct_rank_e6, decile) — each customer's total
    spend with their percentile rank and decile bucket over the whole
    population (customers without orders rank with zero spend).

    Scale shape — a naive ``percent_rank() OVER (ORDER BY spent)`` is a
    SINGLE-PARTITION window over every customer; instead the global
    rank comes from the same two-pass decomposition as
    ``corpus.pack_sequences``: ``repartitionByRange`` on the sort key
    gives ordered disjoint partitions, an intra-partition ``row_number``
    plus broadcast per-partition offsets (a #partitions-row relation)
    yields the exact global rank, and ``percent_rank``/``ntile`` are
    then pure integer arithmetic on (rank, N): pct = (r-1)/(N-1),
    tile = floor((r-1)·n/N)+1 — both identical to the SQL window
    definitions, which the DuckDB oracle uses verbatim."""
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__spent")
    )
    pop = (
        customer.select("c_custkey")
        .join(spend, customer.c_custkey == spend.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce(
                F.col("__spent"), F.lit(0).cast("decimal(18,2)")
            ).alias("__spent"),
        )
    )
    # Both the intra-partition ranks and the per-partition offsets key on
    # spark_partition_id() of THIS exchange, so both branches must observe
    # the identical physical partitioning. repartitionByRange boundaries
    # come from sampling — if the two branches ever re-planned separately
    # (AQE replan, lost exchange reuse) they could disagree silently.
    # persist() pins one materialization: RDD cache blocks are computed
    # once under a per-partition lock and every downstream branch reads
    # the same bytes (tiny relation: one row per customer, two columns).
    ranged = (
        pop.repartitionByRange(
            16, F.col("__spent").asc(), F.col("c_custkey").asc()
        )
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    intra_w = Window.partitionBy("__pid").orderBy(
        F.col("__spent").asc(), F.col("c_custkey").asc()
    )
    with_intra = ranged.withColumn(
        "__intra", F.row_number().over(intra_w)
    )
    off_w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__pn"))
        .withColumn(
            "__off", F.coalesce(F.sum("__pn").over(off_w), F.lit(0))
        )
        .select("__pid", "__off")
    )
    total = pop.agg(F.count(F.lit(1)).alias("__N"))
    return (
        with_intra.join(F.broadcast(offsets), "__pid")
        .crossJoin(F.broadcast(total))
        .select(
            "c_custkey",
            F.col("__spent").cast("double").alias("spent"),
            F.floor(
                1_000_000
                * (F.col("__off") + F.col("__intra") - 1)
                / (F.col("__N") - 1)
            )
            .cast("long")
            .alias("pct_rank_e6"),
            (
                F.floor(
                    (F.col("__off") + F.col("__intra") - 1)
                    * n_tiles
                    / F.col("__N")
                )
                + 1
            )
            .cast("long")
            .alias("decile"),
        )
    )


def spend_percentiles_oracle_sql(n_tiles: int = 10) -> str:
    """DuckDB twin of ``customer_spend_percentiles``."""
    return f"""
        WITH spend AS (SELECT o_custkey,
                              SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                                  AS spent
                       FROM orders GROUP BY o_custkey),
        pop AS (SELECT c.c_custkey,
                       COALESCE(s.spent, CAST(0 AS DECIMAL(18,2)))
                           AS spent
                FROM customer c LEFT JOIN spend s
                  ON s.o_custkey = c.c_custkey)
        SELECT c_custkey, CAST(spent AS DOUBLE) AS spent,
               CAST(FLOOR(1000000 * percent_rank() OVER
                    (ORDER BY spent ASC, c_custkey ASC)) AS BIGINT)
                   AS pct_rank_e6,
               CAST(ntile({n_tiles}) OVER
                    (ORDER BY spent ASC, c_custkey ASC) AS BIGINT)
                   AS decile
        FROM pop
    """


def referential_integrity_audit(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
) -> DataFrame:
    """1-row (orphan_orders, orphan_lineitems, orphan_part_refs,
    childless_customers) — the referential-integrity audit a pipeline
    runs after every load: anti-join counts of dangling foreign keys in
    each direction. Anti-joins build a hash of the (smaller) key side —
    at 100 TB each check is one broadcast-or-shuffled hash probe, no
    sort. All four checks share scans where possible and reduce to one
    row."""
    def cnt(df: DataFrame, alias: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias(alias))

    checks = [
        cnt(
            orders.join(
                customer.select("c_custkey"),
                orders.o_custkey == F.col("c_custkey"),
                "left_anti",
            ),
            "orphan_orders",
        ),
        cnt(
            lineitem.join(
                orders.select("o_orderkey"),
                lineitem.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            ),
            "orphan_lineitems",
        ),
        cnt(
            lineitem.join(
                part.select("p_partkey"),
                lineitem.l_partkey == F.col("p_partkey"),
                "left_anti",
            ),
            "orphan_part_refs",
        ),
        cnt(
            customer.join(
                orders.select("o_custkey"),
                customer.c_custkey == F.col("o_custkey"),
                "left_anti",
            ),
            "childless_customers",
        ),
    ]
    out = checks[0]
    for c in checks[1:]:  # 1-row × 1-row cross joins — fully lazy
        out = out.crossJoin(c)
    return out


INTEGRITY_ORACLE = """
    SELECT
        (SELECT COUNT(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_custkey = o.o_custkey))
            AS orphan_orders,
        (SELECT COUNT(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = l.l_orderkey))
            AS orphan_lineitems,
        (SELECT COUNT(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM part p
                           WHERE p.p_partkey = l.l_partkey))
            AS orphan_part_refs,
        (SELECT COUNT(*) FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey))
            AS childless_customers
"""


#: Q3-style parameters: market segment and the order/ship date cut
SHIP_SEGMENT = "BUILDING"
SHIP_CUT = "1998-06-30"


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = SHIP_SEGMENT,
    cut: str = SHIP_CUT,
    k: int = 10,
) -> DataFrame:
    """(l_orderkey, revenue, o_orderdate_s, o_orderpriority) — the
    TPC-H Q3 shape: unshipped-revenue per order for one market segment
    (orders placed before the cut whose items ship after it), top ``k``
    by (revenue desc, orderdate asc, orderkey asc — fully
    deterministic). Classic 3-way join + agg + sort/limit:

    - the segment filter prunes ``customer`` BEFORE the join and the
      date predicates push into both scans (PushedFilters);
    - customer (post-filter) broadcasts; the orders↔lineitem join is
      the only wide shuffle, keyed on the orderkey;
    - revenue folds in DECIMAL (exact) and the top-k is a
      TakeOrderedAndProject, never a global sort.

    Dates surface as epoch seconds (TZ-free) for engine-exact compare."""
    cut_ntz = F.lit(cut).cast("timestamp_ntz")
    c = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.where(F.col("o_orderdate") < cut_ntz).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.where(F.col("l_shipdate") > cut_ntz).select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("rev"),
    )
    return (
        li.join(
            F.broadcast(
                o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev").cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            ntz_epoch_seconds("o_orderdate").alias("o_orderdate_s"),
            "o_orderpriority",
        )
        .orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate_s").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(k)
    )


def shipping_priority_oracle_sql(
    segment: str = SHIP_SEGMENT, cut: str = SHIP_CUT, k: int = 10
) -> str:
    """DuckDB twin of ``shipping_priority``."""
    return f"""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue,
               CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_s,
               o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = '{segment}'
          AND o_orderdate < TIMESTAMP '{cut} 00:00:00'
          AND l_shipdate > TIMESTAMP '{cut} 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate_s ASC, l_orderkey ASC
        LIMIT {k}
    """


#: trailing window length for the rolling per-user sum
ROLLING_RANGE_S = 7 * 86_400


def user_value_rolling(
    events: DataFrame, range_s: int = ROLLING_RANGE_S
) -> DataFrame:
    """(user_id, event_id, roll_sum_e6) — per event, the sum of the
    user's ``value`` over the trailing ``range_s`` seconds INCLUDING
    the current event: a RANGE-framed window (frame bounds in event-time
    units, not row counts — the frame no ordinary groupBy can express).
    DECIMAL accumulation keeps the sum exact under any within-frame
    order; output scaled to BIGINT."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(ntz_epoch_seconds("ts"))
        .rangeBetween(-range_s, 0)
    )
    return (
        events.withColumn(
            "__roll",
            F.sum(F.col("value").cast("decimal(28,6)")).over(w),
        )
        .select(
            "user_id",
            "event_id",
            F.floor(1_000_000 * F.col("__roll").cast("double"))
            .cast("long")
            .alias("roll_sum_e6"),
        )
    )


def rolling_oracle_sql(range_s: int = ROLLING_RANGE_S) -> str:
    """DuckDB twin of ``user_value_rolling``."""
    return f"""
        WITH e AS (SELECT user_id, event_id,
                          CAST(floor(epoch(ts)) AS BIGINT) AS ep,
                          CAST(value AS DECIMAL(28,6)) AS v
                   FROM events)
        SELECT user_id, event_id,
               CAST(FLOOR(1000000 * CAST(SUM(v) OVER (
                   PARTITION BY user_id ORDER BY ep
                   RANGE BETWEEN {range_s} PRECEDING AND CURRENT ROW)
                   AS DOUBLE)) AS BIGINT) AS roll_sum_e6
        FROM e
    """


#: seconds per cohort bucket (weekly)
COHORT_WEEK_S = 7 * 86_400


def retention_cohorts(
    events: DataFrame, bucket_s: int = COHORT_WEEK_S
) -> DataFrame:
    """(cohort, week_offset, n_active, n_cohort, retention_e6) — cohort
    retention: users grouped by the week of their FIRST event; for each
    later week offset, the fraction of the cohort active that week.
    Offset 0 is 1.0 by construction (the anchoring event). All time
    math is integer epoch-week buckets (``epoch_s div bucket_s``) — no
    date functions, so the DuckDB twin is bit-exact.

    Shape: first-event week via one min-aggregate on user_id; activity
    de-duplicated to (user, week) before joining the (tiny, broadcast)
    cohort sizes; every shuffle keys on user_id or the compact
    (cohort, offset) pair. The standard product-analytics matrix,
    linear in events."""
    weeks = events.select(
        "user_id",
        # all-integer `div`, identical to the oracle's `//` (both
        # truncate toward zero) — the old true-division-then-cast
        # routed integers through doubles, inviting precision drift
        ntz_epoch_div("ts", bucket_s).alias("wk"),
    )
    first = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    active = (
        weeks.distinct()
        .join(first, "user_id")
        .select(
            "cohort", (F.col("wk") - F.col("cohort")).alias("week_offset")
        )
    )
    cohort_sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return (
        active.groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(cohort_sizes), "cohort")
        .withColumn(
            "retention_e6",
            F.floor(1_000_000 * F.col("n_active") / F.col("n_cohort"))
            .cast("long"),
        )
    )


def retention_oracle_sql(bucket_s: int = COHORT_WEEK_S) -> str:
    """DuckDB twin of ``retention_cohorts``."""
    return f"""
        WITH weeks AS (SELECT user_id,
                              CAST(floor(epoch(ts)) AS BIGINT)
                                  // {bucket_s} AS wk
                       FROM events),
        first AS (SELECT user_id, MIN(wk) AS cohort
                  FROM weeks GROUP BY user_id),
        active AS (SELECT DISTINCT w.user_id, f.cohort,
                          w.wk - f.cohort AS week_offset
                   FROM weeks w JOIN first f USING (user_id)),
        sizes AS (SELECT cohort, COUNT(*) AS n_cohort
                  FROM first GROUP BY cohort)
        SELECT a.cohort, a.week_offset, COUNT(*) AS n_active,
               s.n_cohort,
               CAST(FLOOR(1000000 * COUNT(*) / s.n_cohort) AS BIGINT)
                   AS retention_e6
        FROM active a JOIN sizes s ON s.cohort = a.cohort
        GROUP BY a.cohort, a.week_offset, s.n_cohort
    """


#: fixed pivot column set — explicit values keep the pivot a single
#: pass (no distinct-discovery job) and the output schema stable
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_event_type_pivot(events: DataFrame) -> DataFrame:
    """(user_id, n_click, n_error, n_purchase, n_signup, n_view) —
    long→wide reshape: per-user event counts, one column per type.
    Passing the value list to ``pivot`` matters at scale: without it
    Spark runs an extra distinct-discovery job over the corpus and the
    output schema depends on the data. One shuffle, partial-agg."""
    p = (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    return p.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


def user_event_type_unpivot(events: DataFrame) -> DataFrame:
    """(user_id, event_type, n) — the inverse wide→long reshape via
    ``unpivot`` (SQL ``stack``), dropping zero rows so the roundtrip
    reproduces exactly the (user, type) pairs that occur. Pivot and
    unpivot compose to the plain groupBy — asserted by the oracle,
    which states the long form directly."""
    wide = user_event_type_pivot(events)
    return (
        wide.unpivot(
            "user_id",
            [f"n_{t}" for t in EVENT_TYPES],
            "event_type",
            "n",
        )
        .where(F.col("n") > 0)
        .withColumn("event_type", F.expr("substring(event_type, 3)"))
    )


PIVOT_ORACLE = """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view
    FROM events GROUP BY user_id
"""

UNPIVOT_ORACLE = """
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY user_id, event_type
"""


#: ordered funnel steps for the conversion analysis
FUNNEL_STEPS = ("signup", "click", "purchase")


def funnel_stages(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """(stage, n_users) — ordered funnel conversion: a user reaches
    stage k when they performed step k STRICTLY AFTER first completing
    stage k-1 (first-touch semantics: each stage anchors at its earliest
    qualifying time). Stage 0 = users with events but no step-1 event.

    Shape: one conditional min-aggregate per step, each keyed on
    user_id — the chain of tiny state relations joins on the SAME key,
    so every shuffle reuses the user_id partitioning; the raw events
    relation is scanned once per step but never joined to itself at
    event granularity."""
    e = events.select(
        "user_id",
        ntz_epoch_micros("ts").alias("__us"),
        "event_type",
    )
    reached = e.select("user_id").distinct()
    prev: DataFrame | None = None
    anchors: list[DataFrame] = []
    for i, step in enumerate(steps):
        src = e.where(F.col("event_type") == step)
        if prev is not None:
            src = src.join(prev, "user_id").where(
                F.col("__us") > F.col(f"__t{i - 1}")
            )
        cur = src.groupBy("user_id").agg(F.min("__us").alias(f"__t{i}"))
        anchors.append(cur)
        prev = cur
    out = reached
    for i, a in enumerate(anchors):
        out = out.join(
            a.select("user_id", F.lit(1).alias(f"__s{i}")), "user_id", "left"
        )
    stage = sum(
        (F.coalesce(F.col(f"__s{i}"), F.lit(0)) for i in range(len(steps))),
        F.lit(0),
    )
    return (
        out.select("user_id", stage.cast("long").alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def funnel_oracle_sql(steps: tuple[str, ...] = FUNNEL_STEPS) -> str:
    """DuckDB twin of ``funnel_stages``."""
    ctes = [
        "e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events)"
    ]
    for i, step in enumerate(steps):
        if i == 0:
            ctes.append(
                f"t0 AS (SELECT user_id, MIN(us) AS u0 FROM e"
                f" WHERE event_type = '{step}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"t{i} AS (SELECT e.user_id, MIN(us) AS u{i}"
                f" FROM e JOIN t{i - 1} USING (user_id)"
                f" WHERE event_type = '{step}' AND us > u{i - 1}"
                f" GROUP BY e.user_id)"
            )
    flags = " + ".join(
        f"(CASE WHEN t{i}.user_id IS NOT NULL THEN 1 ELSE 0 END)"
        for i in range(len(steps))
    )
    joins = " ".join(
        f"LEFT JOIN t{i} ON t{i}.user_id = u.user_id"
        for i in range(len(steps))
    )
    return f"""
        WITH {', '.join(ctes)},
        u AS (SELECT DISTINCT user_id FROM e),
        staged AS (SELECT u.user_id, CAST({flags} AS BIGINT) AS stage
                   FROM u {joins})
        SELECT stage, COUNT(*) AS n_users FROM staged GROUP BY stage
    """


def top_spenders_per_region(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    k: int = 3,
) -> DataFrame:
    """(r_name, c_custkey, spent, rk) — top-``k`` customers by total
    spend within each region: the per-group top-k pattern (window rank
    over a pre-aggregated relation, then filter) — never a global sort.
    The fact table aggregates FIRST (shuffle on o_custkey), so the
    window input is one row per customer; dimensions broadcast. Spend
    ties break by customer key for a deterministic ranking.

    Scale shape: there are only |regions| groups — a CONSTANT of the
    problem — so a window partitioned by ``r_name`` alone would sort
    one region's ENTIRE customer roster in one task (the
    constant-partition-window rule, SCALING.md). Decomposition: a
    bucketed PRE-REDUCTION ranks within (region, hash-bucket of the
    customer key) — |regions|·B splittable partitions — and keeps each
    bucket's local top-k; the true per-region top-k is necessarily
    inside the union of per-bucket top-ks (any row it contains beats
    ≥ itself within its own bucket), so the final per-region window
    ranks at most B·k candidate rows per region — thousands, not the
    roster. Exact and deterministic; the DuckDB oracle keeps the
    single-window spec."""
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__spent")
    )
    dimmed = (
        spend.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            spend.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    n_buckets = 64
    local_w = Window.partitionBy("r_name", "__b").orderBy(
        F.col("__spent").desc(), F.col("c_custkey").asc()
    )
    cand = (
        dimmed.withColumn(
            "__b", F.pmod(F.xxhash64("c_custkey"), F.lit(n_buckets))
        )
        .withColumn("__lrk", F.row_number().over(local_w))
        .where(F.col("__lrk") <= k)
    )
    w = Window.partitionBy("r_name").orderBy(
        F.col("__spent").desc(), F.col("c_custkey").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "r_name",
            "c_custkey",
            F.col("__spent").cast("double").alias("spent"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


def top_spenders_oracle_sql(k: int = 3) -> str:
    """DuckDB twin of ``top_spenders_per_region``."""
    return f"""
        WITH spend AS (SELECT o_custkey,
                              SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                                  AS spent
                       FROM orders GROUP BY o_custkey),
        dimmed AS (SELECT r.r_name, c.c_custkey, s.spent
                   FROM spend s
                   JOIN customer c ON c.c_custkey = s.o_custkey
                   JOIN nation n ON n.n_nationkey = c.c_nationkey
                   JOIN region r ON r.r_regionkey = n.n_regionkey),
        ranked AS (SELECT r_name, c_custkey, spent,
                          ROW_NUMBER() OVER (
                              PARTITION BY r_name
                              ORDER BY spent DESC, c_custkey ASC) AS rk
                   FROM dimmed)
        SELECT r_name, c_custkey, CAST(spent AS DOUBLE) AS spent,
               CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= {k}
    """


def order_cube(orders: DataFrame) -> DataFrame:
    """(o_orderstatus, o_orderpriority, g_status, g_priority, n_orders,
    revenue) — CUBE over the two order dimensions: every combination of
    subtotals plus the grand total in ONE pass (Spark expands the
    grouping sets and keeps partial aggregation — 4 logical groupings,
    one shuffle). ``grouping()`` flags distinguish rollup NULLs from
    data NULLs. Money sums in DECIMAL (exact, engine-portable), cast to
    double only for the final column."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "g_status",
            "g_priority",
            "n_orders",
            "revenue",
        )
    )


ORDER_CUBE_ORACLE = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def revenue_by_region(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Revenue rolled up the customer→nation→region dimension chain —
    a star-join: the fact side shuffles once (agg on o_custkey), every
    dimension broadcasts."""
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spent")
    )
    return (
        spend.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            spend.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name")
        .agg(
            F.sum("spent").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )
