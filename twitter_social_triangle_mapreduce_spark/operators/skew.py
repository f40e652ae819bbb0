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

    The salt is a DETERMINISTIC hash of the row's full content. That
    retry-determinism is load-bearing: a salt depending on task-local
    state (``monotonically_increasing_id``, ``rand``) changes when a map
    task is recomputed after a fetch failure, sending the recomputed
    row's output to a reduce partition that already consumed (duplicate)
    or will never consume (loss) it — the shuffle-key-nondeterminism bug
    class. Known limitation, accepted: EXACT duplicate rows of a hot key
    share a salt and land in one partition; duplicates are typically a
    small multiplicity, and AQE skew splitting still applies on top. The
    internal column name is collision-resistant against user frames.
    """
    lcols = left.columns
    rcols = [c for c in right.columns if c not in on]
    salt_col = "__tstm_salt"
    salted_l = left.withColumn(
        salt_col,
        F.pmod(F.hash(*[F.col(c) for c in lcols]), F.lit(num_salts)),
    )
    salted_r = right.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))),
    )
    return (
        salted_l.join(salted_r, on=[*on, salt_col], how="inner")
        .select(*lcols, *rcols)
    )
