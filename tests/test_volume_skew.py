"""Volume/skew validation: on a deterministically-generated skewed
multigraph (hundreds of thousands of edges, power-law-ish hubs, duplicate
edges), the pre-aggregated triangle algebra must equal the naive
enumerate-then-count formulation, and the degree-based cardinality must
equal the enumeration row count. This is the empirical backing for the
100 TB design claim: the aggregated forms are what run at scale, the
enumerating forms are the ground truth they must match."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitter_social_triangle_mapreduce_spark.operators import graph

from conftest import scalar

N_EDGES = 100_000
N_NODES = 2_000


@pytest.fixture(scope="module")
def skewed_edges(spark):
    """Deterministic skewed multigraph: node ids drawn via a cubed uniform
    hash (mass concentrated near 0 → hubs), duplicates occur naturally."""
    base = spark.range(N_EDGES)
    u = lambda salt: (  # noqa: E731
        (F.pmod(F.hash(F.col("id") + salt), 100000) + 100000) % 100000
    ) / 100000.0
    e = base.select(
        F.floor(F.pow(u(0), 3) * N_NODES).cast("long").alias("src"),
        F.floor(F.pow(u(7919), 3) * N_NODES).cast("long").alias("dst"),
    )
    e.persist()
    e.count()
    yield e
    e.unpersist()


def test_skew_stats_sanity(skewed_edges):
    """The fixture really is skewed: the hottest node carries far more
    edge endpoints than the median."""
    deg = (
        skewed_edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.max("d").alias("mx"), F.expr("percentile(d, 0.5)").alias("md"))
        .collect()[0]
    )
    assert deg["mx"] > 50 * deg["md"]


def test_preagg_triangle_equals_enumeration_at_volume(spark, skewed_edges):
    got = scalar(graph.triangle_count_shuffle(skewed_edges, max_id=None))
    e = skewed_edges
    naive = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
        .where(F.col("e1.src") != F.col("e2.dst"))
        .join(
            e.alias("e3"),
            (F.col("e3.src") == F.col("e2.dst"))
            & (F.col("e3.dst") == F.col("e1.src")),
        )
        .count()
        // 3
    )
    assert got == naive
    assert got > 0


def test_ordered_equals_shuffle_at_volume(spark, skewed_edges):
    """The hub-safe degree-ordered strategy equals the shuffle algebra on
    the skewed volume graph (its raison d'être)."""
    assert scalar(graph.triangle_count_ordered(skewed_edges)) == scalar(
        graph.triangle_count_shuffle(skewed_edges)
    )


def test_cardinality_equals_enumeration_at_volume(spark, skewed_edges):
    total = scalar(graph.path2_cardinality_total(skewed_edges))
    enumerated = graph.path2(skewed_edges, exclude_closed=False).count()
    assert total == enumerated
    assert total > N_EDGES  # hubs amplify path counts


def test_aqe_skew_join_engages_on_hub_partitions(spark, skewed_edges):
    """The 100 TB design claim for the shuffle strategies leans on AQE
    skew-join splitting to absorb residual hub skew (graph.py module
    docstring). This pins the claim: with thresholds scaled to the
    fixture, the final adaptive plan of the path-2 self-join must carry
    a skew-split join (``skew=true``). If the operator shape ever stops
    being skew-splittable (e.g. a manual repartition or a non-SMJ hint
    sneaks in), this fails."""
    conf = spark.conf
    keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in keys.items():
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
        conf.set(k, v)
    try:
        # execute THIS DataFrame's own queryExecution (df.count() would
        # build a separate one and leave this plan unexecuted)
        cnt = graph.path2(skewed_edges).groupBy().count()
        assert cnt.collect()[0][0] > 0
        final_plan = cnt._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, (
            "AQE skew-join did not engage on the hub-skewed self-join:\n"
            + final_plan[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
