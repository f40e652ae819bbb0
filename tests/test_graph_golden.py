"""Golden micro-graph tests (FIXTURES.md §2) — one per semantic trap in
SURVEY.md §2.7: duplicate edges, self-loops, 2-cycles, hubs, strict vs
non-strict cutoffs, and the X≠Z rule difference between the triangle
pipeline and the path-2 cardinality."""

from __future__ import annotations

from twitter_social_triangle_mapreduce_spark.operators import graph

from conftest import edges_df, scalar

TRI_BASIC = [(1, 2), (2, 3), (3, 1)]
TRI_BOTH_DIRS = [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3)]
TWO_CYCLE = [(1, 2), (2, 1)]
SELF_LOOP = [(1, 1)]
DUP_EDGES = [(1, 2), (1, 2), (2, 3), (3, 1)]
HUB = [(1, 10), (2, 10), (10, 3), (10, 4)]


def test_tri_basic(spark):
    e = edges_df(spark, TRI_BASIC)
    assert scalar(graph.triangle_count_shuffle(e)) == 1
    assert scalar(graph.triangle_count_broadcast(e)) == 1
    assert scalar(graph.path2_cardinality_total(e)) == 3


def test_tri_both_dirs(spark):
    e = edges_df(spark, TRI_BOTH_DIRS)
    assert scalar(graph.triangle_count_shuffle(e)) == 2
    assert scalar(graph.triangle_count_broadcast(e)) == 2
    assert scalar(graph.path2_cardinality_total(e)) == 12


def test_two_cycle(spark):
    """X≠Z kills the round-trip in the triangle pipeline, but
    ExactCardinality counts X→Y→X (SURVEY.md §2.7.2)."""
    e = edges_df(spark, TWO_CYCLE)
    assert scalar(graph.triangle_count_shuffle(e)) == 0
    assert scalar(graph.triangle_count_broadcast(e)) == 0
    assert scalar(graph.path2_cardinality_total(e)) == 2


def test_self_loop(spark):
    e = edges_df(spark, SELF_LOOP)
    assert scalar(graph.triangle_count_shuffle(e)) == 0
    assert scalar(graph.path2_cardinality_total(e)) == 1


def test_dup_edges_multiplicity(spark):
    """Duplicate edges multiply counts in the shuffle pipeline (§2.7.3):
    doubling edge 1→2 doubles the triangle. The broadcast variant differs
    BY DESIGN: its closing-edge test is a boolean `contains`
    (ReplicatedJoinDriver.java:103), so rotations closing through the
    duplicated edge count once → counter 5 → 5//3 = 1."""
    e = edges_df(spark, DUP_EDGES)
    assert scalar(graph.triangle_count_shuffle(e)) == 2
    assert scalar(graph.triangle_count_broadcast(e)) == 1


def test_hub(spark):
    e = edges_df(spark, HUB)
    assert scalar(graph.path2_cardinality_total(e)) == 4
    assert scalar(graph.triangle_count_shuffle(e)) == 0


def test_path2_enum_excludes_closed(spark):
    e = edges_df(spark, TRI_BASIC + TWO_CYCLE)
    rows = {tuple(r) for r in graph.path2(e).collect()}
    assert (1, 2, 1) not in rows  # X=Z excluded
    assert (1, 2, 3) in rows


def test_cutoff_strictness(spark):
    edges = [(1, 2), (2, 3), (3, 1), (40000, 1), (1, 40000), (40001, 1)]
    e = edges_df(spark, edges)
    strict = graph.filter_edges(e, 40000, strict=True)
    nonstrict = graph.filter_edges(e, 40000, strict=False)
    assert strict.count() == 3  # id 40000 excluded by <
    assert nonstrict.count() == 5  # 40001 still excluded by <=
    assert scalar(graph.triangle_count_shuffle(e, max_id=40000)) == 1


def test_self_loop_divergence(spark):
    """The replicated join lacks the X≠Z exclusion
    (ReplicatedJoinDriver.java:97-111 has no such check), so with a
    self-loop s→s and a 2-cycle a↔s it closes the degenerate path a→s→a
    via the loop — the shuffle pipeline (SocialTriangle_RS.java:97) does
    not. Both behaviors are reference-faithful."""
    e = edges_df(spark, [(1, 2), (2, 1), (2, 2)])
    assert scalar(graph.triangle_count_shuffle(e)) == 0
    # rotations counted by the probe loop: probe (1,2): t=2 via loop?
    # adj[2]={1,2}: t=1 → adj[1]={2} contains 1? no; t=2 → adj[2] contains 1 → yes.
    # probe (2,1): adj[1]={2}: t=2 → adj[2] contains 2 → yes.
    # probe (2,2): adj[2]={1,2}: t=1 → adj[1] contains 2 → yes; t=2 → adj[2]∋2 → yes.
    # counter = 4 → 4//3 = 1
    assert scalar(graph.triangle_count_broadcast(e)) == 1


def test_broadcast_probe_side_unfiltered(spark):
    """The replicated join filters ONLY the cache side
    (ReplicatedJoinDriver.java:63); with a triangle whose closing hops fit
    under MAX, a probe edge above MAX still cannot complete a triangle
    because hops 2-3 must be in the filtered map — matching the reference's
    indirect filtering."""
    edges = [(100, 2), (2, 3), (3, 100), (1, 2), (3, 1)]
    e = edges_df(spark, edges)
    # triangle 1→2→3→1 fully under MAX=50: counter counts its 3 rotations
    assert scalar(graph.triangle_count_broadcast(e, max_id=50)) == 1
    # unfiltered: both triangles (1,2,3) and (100,2,3)
    assert scalar(graph.triangle_count_broadcast(e)) == 2


def test_ordered_strategy_matches_shuffle_on_multigraphs(spark):
    """The degree-ordered wedge strategy must equal the shuffle algebra on
    EVERY semantics trap — duplicates, self-loops, 2-cycles, and random
    multigraphs — because it is the 100 TB hub-safe path for the same
    query."""
    import random

    cases = [
        TRI_BASIC,
        TRI_BOTH_DIRS,
        TWO_CYCLE,
        SELF_LOOP,
        DUP_EDGES,
        HUB,
        [(1, 2), (2, 1), (2, 2)],  # 2-cycle closed by self-loop (counter%3!=0)
        [(1, 2), (2, 3), (3, 1), (2, 2), (1, 1)],
    ]
    rng = random.Random(99)
    cases.append([(rng.randrange(12), rng.randrange(12)) for _ in range(250)])
    for rows in cases:
        e = edges_df(spark, rows)
        assert scalar(graph.triangle_count_ordered(e)) == scalar(
            graph.triangle_count_shuffle(e)
        ), rows


def test_strategies_agree_on_simple_graphs(spark):
    """Cross-implementation invariant (SURVEY.md §5.2): on duplicate-free,
    self-loop-free graphs with aligned filters, the two join strategies
    agree. (Self-loops excluded: the replicated join has no X≠Z rule, so a
    self-loop closes degenerate X→Y→X "triangles" that the shuffle
    pipeline's X≠Z filter drops — faithful divergence, see
    test_self_loop_divergence.)"""
    import random

    rng = random.Random(42)
    edges = list(
        {
            (a, b)
            for _ in range(150)
            for a, b in [(rng.randrange(30), rng.randrange(30))]
            if a != b
        }
    )
    e = edges_df(spark, edges)
    a = scalar(graph.triangle_count_shuffle(e, max_id=25, strict=True))
    b = scalar(
        graph.triangle_count_broadcast(
            graph.filter_edges(e, 25, strict=True)
        )
    )
    assert a == b


def test_wedge_closure_golden_semantics(spark):
    """Directed triangle closes its wedges; duplicate middle edges
    multiply path-2 counts; 2-cycle round-trips (X==Z) never count; the
    closing probe is existence (a duplicated closing edge must not
    double n_closed)."""
    from twitter_social_triangle_mapreduce_spark.operators.graph import (
        wedge_closure_per_node,
    )

    e = edges_df(
        spark,
        [
            (1, 2), (2, 3), (2, 3), (3, 1), (3, 1),  # dup hop + dup closer
            (2, 1),  # 2-cycle with 1->2
        ],
    )
    got = {r["x"]: r for r in wedge_closure_per_node(e).collect()}
    # x=1: paths 1->2->3 (x2 via dup edge); both closed by existing 3->1
    assert got[1]["n_path2"] == 2 and got[1]["n_closed"] == 2
    assert got[1]["closure_e6"] == 1_000_000
    # x=2: 2->3->1 (x4: dup hop x dup closer), all closed by 1->2;
    # the 2->1->2 round-trip is excluded (X==Z)
    assert got[2]["n_path2"] == 4 and got[2]["n_closed"] == 4
    # x=3: 3->1->2 (x2 via dup 3->1), closed iff 2->3 exists (it does)
    assert got[3]["n_path2"] == 2 and got[3]["n_closed"] == 2


def test_degree_distribution_golden(spark):
    from twitter_social_triangle_mapreduce_spark.operators.graph import (
        degree_distribution,
    )

    e = edges_df(spark, [(1, 2), (1, 3), (1, 2), (2, 3), (4, 1)])
    got = {
        r["out_degree"]: r["n_nodes"]
        for r in degree_distribution(e).collect()
    }
    assert got == {3: 1, 1: 2}


def test_reciprocity_golden(spark):
    """2-cycles are reciprocal, self-loops count as their own reverse,
    duplicates collapse (distinct-edge semantics)."""
    from twitter_social_triangle_mapreduce_spark.operators.graph import (
        reciprocity,
    )

    e = edges_df(
        spark,
        [(1, 2), (2, 1), (1, 2), (3, 3), (4, 5)],
    )
    r = reciprocity(e).collect()[0]
    # distinct edges: (1,2),(2,1),(3,3),(4,5) -> 4; reciprocal: first 3
    assert r["n_edges"] == 4 and r["n_reciprocal"] == 3
    assert r["reciprocity_e6"] == 750_000
