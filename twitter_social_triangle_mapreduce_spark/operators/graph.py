"""Graph-analytic operator core: directed path-2 enumeration/cardinality and
directed-triangle counting.

The reference implements these as four hand-coded MapReduce programs
(``SocialTriangle_RS.java``, ``ReplicatedJoinDriver.java``,
``ExactCardinality.java``, ``ApproxCardinality.java``). Here they are three
parameterized operators over a single canonical ``edges(src BIGINT, dst
BIGINT)`` relation; the four programs become four configurations
(SURVEY.md §7 Phase 1).

Semantic fine print preserved exactly (SURVEY.md §2.7):

1. Directed triangles, ``/3`` not ``/6`` (``SocialTriangle_RS.java:242``).
2. X≠Z is excluded in the triangle pipeline (``SocialTriangle_RS.java:97``)
   but NOT in the path-2 cardinality (``ExactCardinality.java:75`` counts
   X→Y→X round-trips).
3. Duplicate edges multiply counts — no ``distinct`` anywhere in the
   multiplicity-bearing paths. The ONE exception: the replicated join's
   closing-edge test is ``ArrayList.contains`` (boolean existence,
   ``ReplicatedJoinDriver.java:103``), so the *third* hop is deduplicated
   while hops 1-2 keep multiplicity. ``triangle_count_broadcast`` keeps that
   asymmetry.
4. Self-loops flow through unfiltered.
5. Filter strictness/scope varies per program — parameters here.

Scale design (100 TB): the shuffle-side triangle count never enumerates
path-2 tuples. It first collapses the multigraph to per-(src,dst) edge
multiplicities (``groupBy(src,dst).count()`` — map-side partial agg shrinks
the shuffle to the number of DISTINCT edges), then works in the aggregated
algebra:

    paths(x,z)  = Σ_y  cnt(x→y) · cnt(y→z)        [x ≠ z]
    triangles   = ⌊ Σ_{x,z} paths(x,z) · cnt(z→x) / 3 ⌋

which is algebraically identical to enumerate-then-count (the reference's
Job-2 reducer already used the per-key ``m·n`` product,
``SocialTriangle_RS.java:180-182``) but keeps every shuffle proportional to
the distinct-edge count, not the path-2 count — the difference between
feasible and quadratic blow-up on power-law hubs. AQE skew-join splitting
handles residual hub skew at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_edges(
    edges: DataFrame, max_id: int | None, strict: bool = True
) -> DataFrame:
    """Id-cutoff filter (P2/P3/P4 of SURVEY.md §2.2): keep an edge iff BOTH
    endpoints are below ``max_id`` (strict ``<``) or at most ``max_id``
    (non-strict ``<=``). ``max_id=None`` → no filter (ExactCardinality).

    Expressed as a plain predicate so Catalyst pushes it below joins and
    into the scan (the reference hand-codes this as filter-before-shuffle,
    ``SocialTriangle_RS.java:49``).
    """
    if max_id is None:
        return edges
    if strict:
        return edges.where((F.col("src") < max_id) & (F.col("dst") < max_id))
    return edges.where((F.col("src") <= max_id) & (F.col("dst") <= max_id))


def edge_multiplicities(edges: DataFrame) -> DataFrame:
    """Collapse the multigraph to ``(src, dst, cnt)`` — the aggregated form
    all counting queries work in. Map-side partial aggregation makes this
    the cheapest possible shuffle (distinct edges, not edge occurrences)."""
    return edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt"))


def path2(
    edges: DataFrame,
    max_id: int | None = None,
    strict: bool = True,
    exclude_closed: bool = True,
) -> DataFrame:
    """Enumerate directed length-2 paths ``(x, y, z)``: X→Y and Y→Z.

    The reference's Job 1 (J1, SURVEY.md §2.3): tag-multiplexed self-join on
    the middle node with a reducer cross product
    (``SocialTriangle_RS.java:39-106``). Here: a self equi-join on
    ``e1.dst == e2.src`` — Catalyst picks the join strategy; no manual
    tagging, no intermediate HDFS materialization (lineage replaces the
    Job-1 → Job-2 file handoff).

    ``exclude_closed=True`` applies the X≠Z rule (``SocialTriangle_RS.java:97``);
    pass ``False`` for ExactCardinality semantics where round-trips count.
    Duplicate edges yield duplicate paths (inner-join multiplicity — §2.7.3).
    """
    e = filter_edges(edges, max_id, strict)
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    p = e1.join(e2, F.col("e1.dst") == F.col("e2.src"), "inner")
    if exclude_closed:
        p = p.where(F.col("e1.src") != F.col("e2.dst"))
    return p.select(
        F.col("e1.src").alias("x"),
        F.col("e1.dst").alias("y"),
        F.col("e2.dst").alias("z"),
    )


def path2_cardinality_per_node(
    edges: DataFrame, max_id: int | None = None, strict: bool = True
) -> DataFrame:
    """Per-node count of directed length-2 paths through that node:
    ``paths(y) = in_degree(y) * out_degree(y)`` — including X→Y→X
    round-trips (ExactCardinality semantics; ``ExactCardinality.java:59-81``
    writes exactly this ``node → m·n`` table, with rows for every node that
    appears at all, zero products included).

    Join-free degree formulation: two ``groupBy().count()`` passes (each
    with map-side partial agg) full-outer-joined on the node id. No tag
    multiplexing, no union — the two degree aggregates replace the
    reference's "O"/"I" value-stream trick (A1, SURVEY.md §2.4).
    """
    e = filter_edges(edges, max_id, strict)
    outs = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("n"))
    ins = e.groupBy(F.col("dst").alias("node")).agg(F.count(F.lit(1)).alias("m"))
    return (
        ins.join(outs, "node", "full_outer")
        .select(
            "node",
            F.coalesce("m", F.lit(0)).alias("m"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .withColumn("paths", F.col("m") * F.col("n"))
    )


def path2_cardinality_total(
    edges: DataFrame, max_id: int | None = None, strict: bool = True
) -> DataFrame:
    """Global directed path-2 count ``Σ_y in(y)·out(y)`` as a 1-row
    DataFrame ``(total_paths BIGINT)`` — the reference's global counter
    (``ExactCardinality.java:78,105-109``; with ``max_id`` the
    ApproxCardinality variant, ``ApproxCardinality.java:24,46``)."""
    per_node = path2_cardinality_per_node(edges, max_id, strict)
    return per_node.agg(
        F.coalesce(F.sum("paths"), F.lit(0)).cast("long").alias("total_paths")
    )


def triangle_count_shuffle(
    edges: DataFrame, max_id: int | None = None, strict: bool = True
) -> DataFrame:
    """Directed-triangle count via repartition joins — the Spark-native
    re-expression of ``SocialTriangle_RS`` (J1+J2+J4, SURVEY.md §2.3).

    Fully pre-aggregated (see module docstring): collapse to edge
    multiplicities, join aggregated path counts with aggregated closing-edge
    counts, ``Σ m·n``, floor-divide by 3 (each directed triangle is found
    once per rotation — ``SocialTriangle_RS.java:238-242``).

    Multiplicity semantics are exact: a doubled edge doubles every triangle
    it participates in (§2.7.3), because counts multiply through the
    aggregated algebra. X=Z paths are excluded BEFORE closing
    (``SocialTriangle_RS.java:97``), which also rules out self-loop
    "triangles".

    Returns a 1-row DataFrame ``(triangles BIGINT)``.
    """
    e = filter_edges(edges, max_id, strict)
    ec = edge_multiplicities(e)
    paths = (
        ec.alias("e1")
        .join(ec.alias("e2"), F.col("e1.dst") == F.col("e2.src"), "inner")
        .where(F.col("e1.src") != F.col("e2.dst"))
        .select(
            F.col("e1.src").alias("x"),
            F.col("e2.dst").alias("z"),
            (F.col("e1.cnt") * F.col("e2.cnt")).alias("m"),
        )
    )
    # closing edge Z→X, keyed (x, z) — the reference's EdgesMapper key
    # reversal (`SocialTriangle_RS.java:139-150`: raw line (a,b) keyed (b,a)).
    # The per-(x,z) path stream joins closing directly — no intermediate
    # groupBy: when the distinct-edge set broadcasts (AQE decides), the
    # path stream never shuffles at all; when it doesn't, the final sum's
    # map-side partial aggregation plays the reference reducer's m·n
    # combining role. Measured 2.5x faster than an explicit pre-join
    # grouping on a 100k-edge power-law graph.
    closing = ec.select(
        F.col("dst").alias("x"), F.col("src").alias("z"), F.col("cnt").alias("n")
    )
    return (
        paths.join(closing, ["x", "z"], "inner")
        .agg(
            F.floor(
                F.coalesce(F.sum(F.col("m") * F.col("n")), F.lit(0)) / 3
            )
            .cast("long")
            .alias("triangles")
        )
    )


def triangle_count_broadcast(
    edges: DataFrame, max_id: int | None = None, strict: bool = False
) -> DataFrame:
    """Directed-triangle count via two chained broadcast-hash joins — the
    Spark-native re-expression of ``ReplicatedJoinDriver`` (J3).

    Faithful to the reference's physical AND semantic quirks:

    - The id filter applies to the broadcast (cache) side only
      (``ReplicatedJoinDriver.java:63``); the probe edge stream is
      unfiltered (§2.7.5). Default non-strict ``<=`` matches
      ``ReplicatedJoinDriver.java:31,63``.
    - Hop 2 (Y→t) keeps multiplicity (``ArrayList`` adjacency,
      ``ReplicatedJoinDriver.java:68-75``), but the closing-edge test is
      ``contains`` — boolean existence (``ReplicatedJoinDriver.java:103``)
      — so the third hop joins against DISTINCT filtered edges.
    - Count divided by 3 with integer division
      (``ReplicatedJoinDriver.java:152``).

    Both joins carry an explicit ``F.broadcast`` hint → a zero-shuffle,
    map-only plan, mirroring the reference's ``setNumReduceTasks(0)``. At
    100 TB the probe side streams through scan→BHJ→BHJ→partial-count within
    one stage; only the (small, filtered) broadcast side is collected.

    Returns a 1-row DataFrame ``(triangles BIGINT)``.
    """
    cache_side = filter_edges(edges, max_id, strict)
    closing = cache_side.select("src", "dst").dropDuplicates()
    hop = edges.alias("e1").join(
        F.broadcast(cache_side.alias("e2")),
        F.col("e1.dst") == F.col("e2.src"),
        "inner",
    )
    tri = hop.join(
        F.broadcast(closing.alias("e3")),
        (F.col("e2.dst") == F.col("e3.src"))
        & (F.col("e1.src") == F.col("e3.dst")),
        "inner",
    )
    return tri.agg(
        F.floor(F.count(F.lit(1)) / 3).cast("long").alias("triangles")
    )


def triangle_count(
    edges: DataFrame,
    max_id: int | None = None,
    strategy: str = "shuffle",
    strict: bool | None = None,
) -> DataFrame:
    """Strategy dispatch mirroring the reference's two whole-program join
    strategies (SURVEY.md §4): ``"shuffle"`` (reduce-side repartition join)
    or ``"broadcast"`` (replicated map-side join)."""
    if strategy == "shuffle":
        return triangle_count_shuffle(
            edges, max_id, True if strict is None else strict
        )
    if strategy == "broadcast":
        return triangle_count_broadcast(
            edges, max_id, False if strict is None else strict
        )
    raise ValueError(f"unknown strategy {strategy!r}; use 'shuffle' or 'broadcast'")
