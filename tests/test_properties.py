"""Property-based tests (SURVEY.md §5.5) on random digraphs: invariance
under id relabeling, monotonicity under edge addition, and cross-operator
identities. Few examples per property (each runs Spark jobs), but each
random graph includes duplicates and self-loops by construction."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from twitter_social_triangle_mapreduce_spark.operators import graph

from conftest import edges_df, scalar

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

graphs = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=60,
)


@given(edges=graphs, seed=st.integers(0, 10**6))
@SET
def test_triangle_count_invariant_under_relabeling(spark, edges, seed):
    e = edges_df(spark, edges)
    base = scalar(graph.triangle_count_shuffle(e))
    ids = sorted({v for t in edges for v in t})
    rng = random.Random(seed)
    perm = dict(zip(ids, rng.sample(range(100, 100 + len(ids)), len(ids))))
    relabeled = edges_df(spark, [(perm[a], perm[b]) for a, b in edges])
    assert scalar(graph.triangle_count_shuffle(relabeled)) == base


@given(edges=graphs, extra=st.tuples(st.integers(0, 12), st.integers(0, 12)))
@SET
def test_triangle_count_monotone_under_edge_addition(spark, edges, extra):
    e = edges_df(spark, edges)
    e2 = edges_df(spark, edges + [extra])
    assert scalar(graph.triangle_count_shuffle(e2)) >= scalar(
        graph.triangle_count_shuffle(e)
    )


@given(edges=graphs)
@SET
def test_cardinality_equals_unfiltered_path2_row_count(spark, edges):
    """Cross-operator identity (SURVEY.md §5.2): the path-2 cardinality
    total equals the number of enumerated paths when X=Z round-trips are
    included."""
    e = edges_df(spark, edges)
    total = scalar(graph.path2_cardinality_total(e))
    enumerated = graph.path2(e, exclude_closed=False).count()
    assert total == enumerated


@given(edges=graphs)
@SET
def test_strategies_agree_without_selfloops_and_dups(spark, edges):
    clean = list({(a, b) for a, b in edges if a != b})
    e = edges_df(spark, clean)
    assert scalar(graph.triangle_count_shuffle(e)) == scalar(
        graph.triangle_count_broadcast(e)
    )
