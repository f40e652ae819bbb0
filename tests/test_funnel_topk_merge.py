"""Funnel / per-group top-k / additive-state merge: edge semantics the
synthetic tables cannot reach (oracle parity is covered in the
differential suite)."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_social_triangle_mapreduce_spark.operators import incremental
from twitter_social_triangle_mapreduce_spark.operators.relational import (
    funnel_stages,
)


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_type string, event_id long"
    )
    return df.withColumn(
        "ts",
        F.expr(
            "timestampadd(MICROSECOND, ts div 1000,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ),
    )


def test_funnel_requires_strict_order(spark):
    """A click BEFORE the first signup must not advance the funnel; a
    click at the exact same instant must not either (strict >)."""
    ns = 1_000_000_000
    rows = [
        # u1: click then signup -> stage 1 only
        (1, 1 * ns, "click", 1),
        (1, 2 * ns, "signup", 2),
        # u2: signup then simultaneous click -> stage 1 (strict >)
        (2, 5 * ns, "signup", 3),
        (2, 5 * ns, "click", 4),
        # u3: full ordered funnel -> stage 3
        (3, 1 * ns, "signup", 5),
        (3, 2 * ns, "click", 6),
        (3, 3 * ns, "purchase", 7),
        # u4: purchase before click -> stage 2
        (4, 1 * ns, "signup", 8),
        (4, 2 * ns, "purchase", 9),
        (4, 3 * ns, "click", 10),
        # u5: no signup at all -> stage 0
        (5, 1 * ns, "view", 11),
    ]
    got = {
        r["stage"]: r["n_users"]
        for r in funnel_stages(_events(spark, rows)).collect()
    }
    assert got == {0: 1, 1: 2, 2: 1, 3: 1}


def test_merge_handles_one_sided_keys(spark):
    """Keys present only in the snapshot or only in the delta must
    survive the merge with their own state."""
    mk = lambda rows: incremental.additive_agg_state(  # noqa: E731
        spark.createDataFrame(
            rows, "user_id long, value double, event_id long"
        )
    )
    snap = mk([(1, 10.0, 1), (2, 5.0, 2)])
    delta = mk([(2, 7.0, 3), (3, 1.0, 4)])
    got = {
        r["user_id"]: (
            r["n_events"],
            float(r["sum_value"]),
            float(r["min_value"]),
            float(r["max_value"]),
        )
        for r in incremental.merge_agg_states(snap, delta).collect()
    }
    assert got[1] == (1, 10.0, 10.0, 10.0)
    assert got[2] == (2, 12.0, 5.0, 7.0)
    assert got[3] == (1, 1.0, 1.0, 1.0)


def test_merge_is_associative_across_three_splits(spark):
    """((A+B)+C) must equal state(A∪B∪C) — merges chain."""
    import random

    rnd = random.Random(7)
    rows = [
        (rnd.randrange(5), round(rnd.uniform(-50, 50), 3), i)
        for i in range(300)
    ]
    full = spark.createDataFrame(
        rows, "user_id long, value double, event_id long"
    )
    parts = [
        full.where(F.col("event_id") % 3 == i) for i in range(3)
    ]
    merged = incremental.merge_agg_states(
        incremental.merge_agg_states(
            incremental.additive_agg_state(parts[0]),
            incremental.additive_agg_state(parts[1]),
        ),
        incremental.additive_agg_state(parts[2]),
    )
    direct = incremental.additive_agg_state(full)
    as_map = lambda df: {  # noqa: E731
        r["user_id"]: (
            r["n_events"],
            r["sum_value"],
            r["min_value"],
            r["max_value"],
        )
        for r in df.collect()
    }
    assert as_map(merged) == as_map(direct)


def test_spend_percentiles_two_pass_rank_uneven_ntile(spark):
    """7 customers, 3 tiles -> NTILE sizes 3,2,2; percent_rank bounds
    0 and 1e6; the two-pass global rank must reproduce the SQL window
    definitions exactly (the sf tables are evenly divisible, so only
    this fixture exercises the uneven split)."""
    from twitter_social_triangle_mapreduce_spark.operators.relational import (
        customer_spend_percentiles,
    )

    customer = spark.createDataFrame(
        [(i, "s") for i in range(1, 8)], "c_custkey long, c_mktsegment string"
    )
    orders = spark.createDataFrame(
        [(100 + i, i, float(i * 10)) for i in range(1, 7)],  # cust 7: none
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    rows = sorted(
        customer_spend_percentiles(customer, orders, n_tiles=3).collect(),
        key=lambda r: (r["spent"], r["c_custkey"]),
    )
    # cust 7 spends 0 -> lowest rank
    assert rows[0]["c_custkey"] == 7 and rows[0]["pct_rank_e6"] == 0
    assert rows[-1]["pct_rank_e6"] == 1_000_000
    tiles = [r["decile"] for r in rows]
    assert tiles == [1, 1, 1, 2, 2, 3, 3]


def test_top_spenders_bucket_prereduction_is_exact_under_ties(spark):
    """The bucketed top-k pre-reduction must be invisible in the
    result: on a fixture dense with spend TIES (the adversarial case
    for any pre-reduction — ties straddle bucket boundaries), the
    operator equals the naive single-window spec computed directly."""
    import random

    from pyspark.sql.window import Window
    from twitter_social_triangle_mapreduce_spark.operators.relational import (
        top_spenders_per_region,
    )

    rng = random.Random(11)
    n_cust = 400
    # few distinct totals -> massive tie groups across all buckets
    orders = spark.createDataFrame(
        [
            (c, float(rng.choice([10, 20, 30])))
            for c in range(n_cust)
            for _ in range(rng.randint(1, 2))
        ],
        "o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(c, c % 7) for c in range(n_cust)],
        "c_custkey long, c_nationkey long",
    )
    nation = spark.createDataFrame(
        [(nk, nk % 3) for nk in range(7)],
        "n_nationkey long, n_regionkey long",
    )
    region = spark.createDataFrame(
        [(r, f"R{r}") for r in range(3)], "r_regionkey long, r_name string"
    )
    got = sorted(
        map(
            tuple,
            top_spenders_per_region(
                orders, customer, nation, region, k=5
            ).collect(),
        )
    )
    # naive spec: one window over the joined per-customer relation
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s")
    )
    joined = (
        spend.join(customer, spend.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    w = Window.partitionBy("r_name").orderBy(
        F.col("s").desc(), F.col("c_custkey").asc()
    )
    want = sorted(
        map(
            tuple,
            joined.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 5)
            .select(
                "r_name",
                "c_custkey",
                F.col("s").cast("double").alias("spent"),
                F.col("rk").cast("long").alias("rk"),
            )
            .collect(),
        )
    )
    assert got == want and len(got) == 15
