"""Query registry: every engine capability as a named query.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL oracle string (DuckDB dialect-compatible) over the same
parquet tables. Column names/aliases are kept IDENTICAL between the two —
the correctness harness sorts columns by name and hash-compares values.

Graph queries derive the canonical ``edges`` relation from ``events`` with
the same SQL text in both engines (``sources.io.EDGES_FROM_EVENTS_SQL``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import graph
from .plans.parity import APPROX_MAX, REPLICATED_MAX, TRIANGLE_RS_MAX
from .sources.io import EDGES_FROM_EVENTS_SQL, edges_from_events

QueryFn = Callable[[SparkSession, str], DataFrame]

_EDGES_CTE = f"WITH edges AS ({EDGES_FROM_EVENTS_SQL})"


# ---------------------------------------------------------------------------
# Graph core — the four reference programs + the Job-1 intermediate
# ---------------------------------------------------------------------------

def q_exact_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactCardinality's global counter (``ExactCardinality.java:78,105-109``)."""
    return graph.path2_cardinality_total(edges_from_events(spark, sf_dir))


def q_exact_cardinality_per_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactCardinality's per-node output table (``ExactCardinality.java:79-81``)."""
    return graph.path2_cardinality_per_node(edges_from_events(spark, sf_dir))


def q_approx_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ApproxCardinality = exact on the id-filtered subgraph
    (``ApproxCardinality.java:24,46`` — strict <, both endpoints)."""
    return graph.path2_cardinality_total(
        edges_from_events(spark, sf_dir), max_id=APPROX_MAX, strict=True
    )


def q_approx_cardinality_per_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.path2_cardinality_per_node(
        edges_from_events(spark, sf_dir), max_id=APPROX_MAX, strict=True
    )


def q_social_triangle_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SocialTriangle_RS: repartition-join triangle count, strict < cutoff
    both sides (``SocialTriangle_RS.java:32,49,143,242``)."""
    return graph.triangle_count(
        edges_from_events(spark, sf_dir), max_id=TRIANGLE_RS_MAX, strategy="shuffle"
    )


def q_social_triangle_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query as social_triangle_rs via the degree-ordered wedge
    strategy (hub-safe O(E^1.5) enumeration) — same oracle, same value."""
    return graph.triangle_count(
        edges_from_events(spark, sf_dir), max_id=TRIANGLE_RS_MAX, strategy="ordered"
    )


def q_triangle_replicated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplicatedJoinDriver: broadcast-join triangle count, <= cutoff on the
    cache side only, closing edge existence-checked
    (``ReplicatedJoinDriver.java:31,63,103,152``)."""
    return graph.triangle_count(
        edges_from_events(spark, sf_dir), max_id=REPLICATED_MAX, strategy="broadcast"
    )


def q_triangle_enum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized directed triangles (3 rows per counted triangle)."""
    return graph.triangle_enum(
        edges_from_events(spark, sf_dir), max_id=TRIANGLE_RS_MAX, strict=True
    )


def q_neighborhood_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similar users by out-neighborhood Jaccard."""
    return graph.neighborhood_jaccard_pairs(edges_from_events(spark, sf_dir))


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.components import kcore

    return kcore(edges_from_events(spark, sf_dir))


def q_path2_enum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SocialTriangle_RS Job 1's intermediate relation: directed length-2
    paths (x,y,z), X≠Z, strict < cutoff (``SocialTriangle_RS.java:92-103``)."""
    return graph.path2(
        edges_from_events(spark, sf_dir), max_id=TRIANGLE_RS_MAX, strict=True
    )


GRAPH_QUERIES: dict[str, QueryFn] = {
    "exact_cardinality": q_exact_cardinality,
    "exact_cardinality_per_node": q_exact_cardinality_per_node,
    "approx_cardinality": q_approx_cardinality,
    "approx_cardinality_per_node": q_approx_cardinality_per_node,
    "social_triangle_rs": q_social_triangle_rs,
    "social_triangle_ordered": q_social_triangle_ordered,
    "triangle_replicated": q_triangle_replicated,
    "path2_enum": q_path2_enum,
    "triangle_enum": q_triangle_enum,
    "neighborhood_jaccard": q_neighborhood_jaccard,
    "kcore": q_kcore,
}

GRAPH_ORACLES: dict[str, str] = {
    "exact_cardinality": f"""
        {_EDGES_CTE},
        outs AS (SELECT src AS node, COUNT(*) AS n FROM edges GROUP BY src),
        ins  AS (SELECT dst AS node, COUNT(*) AS m FROM edges GROUP BY dst)
        SELECT CAST(COALESCE(SUM(m * n), 0) AS BIGINT) AS total_paths
        FROM ins INNER JOIN outs USING (node)
    """,
    "exact_cardinality_per_node": f"""
        {_EDGES_CTE},
        outs AS (SELECT src AS node, COUNT(*) AS n FROM edges GROUP BY src),
        ins  AS (SELECT dst AS node, COUNT(*) AS m FROM edges GROUP BY dst)
        SELECT COALESCE(ins.node, outs.node) AS node,
               CAST(COALESCE(m, 0) AS BIGINT) AS m,
               CAST(COALESCE(n, 0) AS BIGINT) AS n,
               CAST(COALESCE(m, 0) * COALESCE(n, 0) AS BIGINT) AS paths
        FROM ins FULL OUTER JOIN outs ON ins.node = outs.node
    """,
    "approx_cardinality": f"""
        {_EDGES_CTE},
        f AS (SELECT * FROM edges
              WHERE src < {APPROX_MAX} AND dst < {APPROX_MAX}),
        outs AS (SELECT src AS node, COUNT(*) AS n FROM f GROUP BY src),
        ins  AS (SELECT dst AS node, COUNT(*) AS m FROM f GROUP BY dst)
        SELECT CAST(COALESCE(SUM(m * n), 0) AS BIGINT) AS total_paths
        FROM ins INNER JOIN outs USING (node)
    """,
    "approx_cardinality_per_node": f"""
        {_EDGES_CTE},
        f AS (SELECT * FROM edges
              WHERE src < {APPROX_MAX} AND dst < {APPROX_MAX}),
        outs AS (SELECT src AS node, COUNT(*) AS n FROM f GROUP BY src),
        ins  AS (SELECT dst AS node, COUNT(*) AS m FROM f GROUP BY dst)
        SELECT COALESCE(ins.node, outs.node) AS node,
               CAST(COALESCE(m, 0) AS BIGINT) AS m,
               CAST(COALESCE(n, 0) AS BIGINT) AS n,
               CAST(COALESCE(m, 0) * COALESCE(n, 0) AS BIGINT) AS paths
        FROM ins FULL OUTER JOIN outs ON ins.node = outs.node
    """,
    # COUNT over joins (never EXISTS) to replicate multiplicity semantics;
    # // is DuckDB integer floor-division, matching F.floor(count/3)
    "social_triangle_rs": f"""
        {_EDGES_CTE},
        f AS (SELECT * FROM edges
              WHERE src < {TRIANGLE_RS_MAX} AND dst < {TRIANGLE_RS_MAX})
        SELECT CAST(COUNT(*) // 3 AS BIGINT) AS triangles
        FROM f e1
        JOIN f e2 ON e1.dst = e2.src AND e1.src <> e2.dst
        JOIN f e3 ON e3.src = e2.dst AND e3.dst = e1.src
    """,
    # probe side unfiltered; hops 2-3 filtered <=; closing edge DISTINCT
    # (the reference's boolean `contains`, ReplicatedJoinDriver.java:103)
    "triangle_replicated": f"""
        {_EDGES_CTE},
        f AS (SELECT * FROM edges
              WHERE src <= {REPLICATED_MAX} AND dst <= {REPLICATED_MAX}),
        fd AS (SELECT DISTINCT src, dst FROM f)
        SELECT CAST(COUNT(*) // 3 AS BIGINT) AS triangles
        FROM edges e1
        JOIN f  e2 ON e1.dst = e2.src
        JOIN fd e3 ON e3.src = e2.dst AND e3.dst = e1.src
    """,
    "path2_enum": f"""
        {_EDGES_CTE},
        f AS (SELECT * FROM edges
              WHERE src < {TRIANGLE_RS_MAX} AND dst < {TRIANGLE_RS_MAX})
        SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
        FROM f e1
        JOIN f e2 ON e1.dst = e2.src AND e1.src <> e2.dst
    """,
}

# the degree-ordered strategy computes the identical quantity — same oracle
GRAPH_ORACLES["social_triangle_ordered"] = GRAPH_ORACLES["social_triangle_rs"]

GRAPH_ORACLES["triangle_enum"] = f"""
    {_EDGES_CTE},
    f AS (SELECT * FROM edges
          WHERE src < {TRIANGLE_RS_MAX} AND dst < {TRIANGLE_RS_MAX})
    SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
    FROM f e1
    JOIN f e2 ON e1.dst = e2.src AND e1.src <> e2.dst
    JOIN f e3 ON e3.src = e2.dst AND e3.dst = e1.src
"""

GRAPH_ORACLES["neighborhood_jaccard"] = f"""
    {_EDGES_CTE},
    nb AS (SELECT DISTINCT src, dst FROM edges),
    sizes AS (SELECT src, COUNT(*) AS sz FROM nb GROUP BY src),
    hot AS (SELECT dst FROM nb GROUP BY dst HAVING COUNT(*) > 1000),
    nbc AS (SELECT * FROM nb WHERE dst NOT IN (SELECT dst FROM hot)),
    pairs AS (
        SELECT a.src AS v_a, b.src AS v_b, COUNT(*) AS common
        FROM nbc a JOIN nbc b ON a.dst = b.dst AND a.src < b.src
        GROUP BY a.src, b.src HAVING COUNT(*) >= 3
    )
    SELECT v_a, v_b, common,
           CAST(FLOOR(1000000 * common / (sa.sz + sb.sz - common))
                AS BIGINT) AS jaccard_e6
    FROM pairs
    JOIN sizes sa ON sa.src = v_a
    JOIN sizes sb ON sb.src = v_b
"""


def _kcore_oracle() -> str:
    from .operators.components import kcore_oracle_sql

    return kcore_oracle_sql(EDGES_FROM_EVENTS_SQL)


GRAPH_ORACLES["kcore"] = _kcore_oracle()


def all_queries(include_extra: bool = False) -> dict[str, QueryFn]:
    """The driver-facing registry: EXACTLY 50 queries (the driver's
    correctness harness records at most 50 rows — see
    ``registry_ext.EXT_EXTRA_QUERIES``). ``include_extra=True`` adds the
    pytest-only entries for the in-repo differential suite."""
    from .registry_ext import EXT_EXTRA_QUERIES, EXT_QUERIES

    out: dict[str, QueryFn] = {}
    out.update(GRAPH_QUERIES)
    out.update(EXT_QUERIES)
    if include_extra:
        out.update(EXT_EXTRA_QUERIES)
    return out


def all_oracles(include_extra: bool = False) -> dict[str, str]:
    from .registry_ext import EXT_EXTRA_QUERIES, ext_oracles

    out: dict[str, str] = {}
    out.update(GRAPH_ORACLES)
    out.update(ext_oracles())
    if not include_extra:
        for k in EXT_EXTRA_QUERIES:
            out.pop(k, None)
    return out
