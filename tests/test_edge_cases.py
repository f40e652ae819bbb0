"""Edge-case robustness: empty inputs must produce well-formed zero
results (the reference's counters print 0), and the vectorized-UDF
taxonomy is complete (scalar @pandas_udf alongside mapInPandas and
applyInPandasWithState)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from twitter_social_triangle_mapreduce_spark.operators import graph

from conftest import SF_SMOKE, edges_df, scalar


def empty_edges(spark):
    return spark.createDataFrame([], "src long, dst long")


def test_triangle_counts_on_empty_graph(spark):
    e = empty_edges(spark)
    assert scalar(graph.triangle_count_shuffle(e)) == 0
    assert scalar(graph.triangle_count_broadcast(e)) == 0
    assert scalar(graph.triangle_count_ordered(e)) == 0
    assert scalar(graph.path2_cardinality_total(e)) == 0
    assert graph.path2(e).count() == 0
    assert graph.path2_cardinality_per_node(e).count() == 0


def test_iterative_and_lsh_on_empty_inputs(spark):
    from twitter_social_triangle_mapreduce_spark.operators import (
        components,
        similarity,
    )

    e = empty_edges(spark)
    assert components.pagerank(e).count() == 0
    assert components.connected_components(e).count() == 0
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert similarity.lsh_signature(emb).count() == 0


def test_filter_excluding_everything(spark):
    e = edges_df(spark, [(100, 200), (200, 300)])
    assert scalar(graph.triangle_count_shuffle(e, max_id=5)) == 0
    assert scalar(graph.path2_cardinality_total(e, max_id=5)) == 0


def test_apply_in_pandas_trend_matches_regr_slope(spark):
    """Grouped applyInPandas (batch split-apply-combine) — the per-user
    least-squares slope must agree with Spark's built-in regr_slope within
    float tolerance."""
    from twitter_social_triangle_mapreduce_spark.operators.relational import (
        user_value_trend_pandas,
    )
    from twitter_social_triangle_mapreduce_spark.sources.io import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    got = {
        r["user_id"]: r["slope_e9"]
        for r in user_value_trend_pandas(ev).collect()
    }
    want = {
        r["user_id"]: r["s"]
        for r in ev.select(
            "user_id",
            F.unix_timestamp(F.col("ts").cast("timestamp")).alias("ep"),
            "value",
        )
        .groupBy("user_id")
        .agg(F.expr("regr_slope(value, ep)").alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    for u, s in want.items():
        assert abs(got[u] - 1e9 * s) <= 10, (u, got[u], s)


def test_builtin_trend_matches_pandas_trend(spark):
    """The driver-tier exact-decimal ``user_value_trend`` and the
    pytest-tier ``applyInPandas`` twin compute the same per-user slope
    (cent quantization + float formulation can move floor(1e9·slope) by
    at most a few units)."""
    from twitter_social_triangle_mapreduce_spark.operators.relational import (
        user_value_trend,
        user_value_trend_pandas,
    )
    from twitter_social_triangle_mapreduce_spark.sources.io import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    builtin = {
        r["user_id"]: (r["n"], r["slope_e9"])
        for r in user_value_trend(ev).collect()
    }
    pandas_ = {
        r["user_id"]: (r["n"], r["slope_e9"])
        for r in user_value_trend_pandas(ev).collect()
    }
    assert set(builtin) == set(pandas_)
    for u, (n, s) in builtin.items():
        pn, ps = pandas_[u]
        assert n == pn
        assert abs(s - ps) <= 10, (u, s, ps)


def test_scalar_pandas_udf_matches_jvm_expression(spark):
    """Arrow-vectorized scalar @pandas_udf — the remaining UDF shape
    (mapInPandas and applyInPandasWithState are exercised elsewhere).
    The JVM expression is the production path; the pandas UDF must agree."""

    @pandas_udf("long")
    def py_token_count(text: pd.Series) -> pd.Series:
        return text.str.split(" ").map(len).astype("int64")

    df = spark.createDataFrame(
        [("a b c",), ("x",), ("one two three four",)], "text string"
    )
    got = df.select(
        py_token_count("text").alias("py"),
        F.size(F.split("text", " ")).alias("jvm"),
    ).collect()
    assert all(r["py"] == r["jvm"] for r in got)
