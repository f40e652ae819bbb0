"""GraphFrames-style motif finding over the canonical ``edges(src, dst)``
relation — declarative structural patterns compiled to DataFrame joins.

``find(edges, "(x)-[]->(y); (y)-[]->(z); (z)-[]->(x)")`` returns one row
per match with a column per vertex variable — the API sugar layer over the
join formulations in ``operators.graph`` (the reference expresses these
patterns imperatively as chained MapReduce jobs; SocialTriangle_RS.java
Jobs 1+2 are exactly the triangle motif).

Grammar (a GraphFrames subset):

- term:      ``(a)-[]->(b)``  — a directed edge from ``a`` to ``b``
- named:     ``(a)-[e]->(b)`` — additionally exposes every non-src/dst
             edge column as ``e_<col>`` (weights, timestamps, ...)
- negation:  ``!(a)-[]->(b)`` — no such edge exists (anti-join); both
             variables must already be bound by positive terms
- terms are ``;``-separated and must be CONNECTED in the order written
  (each positive term after the first shares at least one variable with
  the terms before it) — this keeps every compiled step an equi-join and
  makes an accidental cartesian product unrepresentable

Semantics match the join formulations exactly: duplicate edges multiply
matches (multigraph semantics, SURVEY §2.7), self-loop terms like
``(a)-[]->(a)`` are filters on ``src = dst``, and no implicit vertex
distinctness is applied — add ``.where("x != z")`` explicitly, same as
GraphFrames. Scale: the compiled plan IS the hand-written join plan —
Catalyst reorders/broadcasts it like any other; negations become
left-anti joins (no NOT EXISTS subquery materialization).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM = re.compile(r"^(!?)\((\w+)\)-\[(\w*)\]->\((\w+)\)$")


def _parse(pattern: str) -> list[tuple[bool, str, str, str]]:
    terms = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM.match(raw.replace(" ", ""))
        if not m:
            raise ValueError(f"motif: cannot parse term {raw!r}")
        neg, a, name, b = m.groups()
        if neg and name:
            raise ValueError(f"motif: negated term {raw!r} cannot be named")
        terms.append((bool(neg), a, name, b))
    if not terms:
        raise ValueError("motif: empty pattern")
    return terms


def _edge_view(edges: DataFrame, a: str, name: str, b: str) -> DataFrame:
    """One motif term as a relation: vertex vars as columns, plus the
    named edge's payload columns. A self-loop term collapses to a filter."""
    extra = [c for c in edges.columns if c not in ("src", "dst")]
    base = edges.where(F.col("src") == F.col("dst")) if a == b else edges
    cols = [F.col("src").alias(a)]
    if a != b:
        cols.append(F.col("dst").alias(b))
    if name:
        cols.extend(F.col(c).alias(f"{name}_{c}") for c in extra)
    return base.select(*cols)


def find(edges: DataFrame, pattern: str) -> DataFrame:
    """Match ``pattern`` against the edge relation; one output column per
    vertex variable (plus ``<name>_<col>`` for named edges), one row per
    match including edge-multiplicity combinations."""
    terms = _parse(pattern)
    positives = [t for t in terms if not t[0]]
    negatives = [t for t in terms if t[0]]
    if not positives:
        raise ValueError("motif: pattern needs at least one positive term")

    result: DataFrame | None = None
    bound: set[str] = set()
    for _, a, name, b in positives:
        view = _edge_view(edges, a, name, b)
        if result is None:
            result = view
        else:
            keys = sorted(bound & {a, b})
            if not keys:
                raise ValueError(
                    f"motif: term ({a})->({b}) shares no variable with "
                    "the preceding terms — reorder the pattern so it is "
                    "connected (cartesian products are not compiled)"
                )
            result = result.join(view, on=keys, how="inner")
        bound |= {a, b}

    for _, a, _name, b in negatives:
        missing = {a, b} - bound
        if missing:
            raise ValueError(
                f"motif: negated term !({a})->({b}) uses unbound "
                f"variable(s) {sorted(missing)}"
            )
        anti = edges.select(
            F.col("src").alias(a), *([F.col("dst").alias(b)] if a != b else [])
        )
        if a == b:
            anti = edges.where(F.col("src") == F.col("dst")).select(
                F.col("src").alias(a)
            )
        result = result.join(anti.distinct(), on=sorted({a, b}), how="left_anti")
    return result
