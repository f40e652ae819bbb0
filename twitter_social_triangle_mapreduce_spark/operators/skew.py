"""Skew mitigation: salted joins.

AQE's skew-join splitting (enabled in the session factory) handles most
runtime skew; salting is the explicit tool for pathological hot keys —
e.g. hub nodes in a power-law follower graph, where one join key carries
orders of magnitude more rows than the rest (the reference crudely tames
hubs with its MAX id cutoffs; SURVEY.md §4).

``salted_inner_join`` spreads each hot left key across ``num_salts``
shuffle partitions by appending a deterministic salt derived from the
row's full content, and replicates the right side once per salt value.
Semantics are identical to the plain inner join (verified by property
test); cost: right side inflated ×num_salts — use for small-to-medium
right sides or pre-filtered hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_inner_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    num_salts: int = 8,
) -> DataFrame:
    """Inner equi-join on ``on`` with left-side salting. Output columns:
    left columns then right's non-key columns (like a plain ``join(on=)``).

    The salt mixes ``monotonically_increasing_id()`` with the row content
    so EXACT duplicate rows of a hot key still spread across partitions
    (content-only hashing would send them all to one salt). The id makes
    the salt assignment non-deterministic across runs — irrelevant to
    correctness, since the right side is replicated over every salt value
    (semantics equal the plain inner join; property-tested). The internal
    column name is collision-resistant against user frames.
    """
    lcols = left.columns
    rcols = [c for c in right.columns if c not in on]
    salt_col = "__tstm_salt"
    salted_l = left.withColumn(
        salt_col,
        F.pmod(
            F.hash(F.monotonically_increasing_id(), *[F.col(c) for c in lcols]),
            F.lit(num_salts),
        ),
    )
    salted_r = right.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))),
    )
    return (
        salted_l.join(salted_r, on=[*on, salt_col], how="inner")
        .select(*lcols, *rcols)
    )
