"""Motif-finder tests: the declarative patterns must reproduce the
hand-written join formulations (operators.graph) on the golden graphs —
including the multigraph multiplicity and X≠Z trap semantics — and the
compiled plans must stay equi-joins (no cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitter_social_triangle_mapreduce_spark.operators import graph
from twitter_social_triangle_mapreduce_spark.plans import assert_no_cartesian
from twitter_social_triangle_mapreduce_spark.plans.motif import find

from conftest import edges_df, scalar

TRI_BOTH_DIRS = [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3)]
DUP_EDGES = [(1, 2), (1, 2), (2, 3), (3, 1)]
MIXED = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 4)]


@pytest.mark.parametrize("rows", [TRI_BOTH_DIRS, DUP_EDGES])
def test_triangle_motif_equals_join_formulation(spark, rows):
    e = edges_df(spark, rows)
    motif = (
        find(e, "(x)-[]->(y); (y)-[]->(z); (z)-[]->(x)")
        .where(F.col("x") != F.col("z"))
    )
    assert motif.count() == graph.triangle_enum(e).count()
    # the counter relationship the reference floor-divides by (A5)
    assert motif.count() == 3 * scalar(graph.triangle_count_shuffle(e))


def test_path2_motif_equals_enumeration(spark):
    e = edges_df(spark, DUP_EDGES)
    motif = find(e, "(x)-[]->(y); (y)-[]->(z)").where(
        F.col("x") != F.col("z")
    )
    # the dup edge 1->2 doubles every wedge through it in BOTH positions
    # (multigraph semantics): 2x(1,2,3) + (2,3,1) + 2x(3,1,2) = 5, exactly
    # the hand-written path2 join formulation
    assert motif.count() == graph.path2(e, max_id=None).count() == 5


def test_negation_one_way_edges(spark):
    e = edges_df(spark, MIXED)
    got = {
        (r["a"], r["b"])
        for r in find(e, "(a)-[]->(b); !(b)-[]->(a)").collect()
    }
    assert got == {(2, 3), (3, 4)}


def test_self_loop_term(spark):
    e = edges_df(spark, MIXED)
    assert [r["a"] for r in find(e, "(a)-[]->(a)").collect()] == [4]


def test_named_edge_exposes_payload(spark):
    e = spark.createDataFrame(
        [(1, 2, 9.5), (2, 3, 1.0)], "src long, dst long, w double"
    )
    got = {
        (r["a"], r["b"]): r["e_w"]
        for r in find(e, "(a)-[e]->(b)").collect()
    }
    assert got == {(1, 2): 9.5, (2, 3): 1.0}


def test_motif_rejects_disconnected_and_bad_terms(spark):
    e = edges_df(spark, MIXED)
    with pytest.raises(ValueError, match="connected"):
        find(e, "(a)-[]->(b); (c)-[]->(d)")
    with pytest.raises(ValueError, match="unbound"):
        find(e, "(a)-[]->(b); !(b)-[]->(zz)")
    with pytest.raises(ValueError, match="cannot parse"):
        find(e, "(a)->(b)")


def test_motif_plan_is_equi_join(spark):
    e = edges_df(spark, TRI_BOTH_DIRS)
    assert_no_cartesian(
        find(e, "(x)-[]->(y); (y)-[]->(z); (z)-[]->(x)")
    )
