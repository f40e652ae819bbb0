"""Bounded-memory frequency sketching: distributed heavy hitters via
per-partition Misra-Gries candidate generation + an exact recount.

The engine's third sketch family (HLL distinct counts and KLL-style
quantiles live in ``relational``): heavy hitters over a corpus whose
vocabulary does not fit anywhere. The two-pass shape gives an EXACT
final answer with bounded memory:

1. each partition streams its items through a Misra-Gries summary of
   capacity ``k`` (O(k) memory, Arrow-batched ``mapInPandas``) and emits
   only its surviving candidate items — at most ``k`` rows per
   partition, regardless of partition size;
2. the candidate union is exact-recounted with a broadcast semi-join and
   thresholded at ``count·k > N``.

Correctness: MG eliminates an item only by decrementing ``k`` counters
together, so a partition discards at most ``n_p/k`` occurrences of any
item; summed over partitions, a fully-discarded item has global
frequency ≤ Σ n_p/k = N/k. Contrapositive: every item with
``freq > N/k`` survives in at least one partition, so the candidate
union is a superset of the true heavy hitters and the recount makes the
output exact — the DuckDB oracle is the direct
``HAVING count·k > total`` query, no approximation in the comparison.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Misra-Gries capacity: items with frequency > N/k are guaranteed out
MG_CAPACITY = 50


def _mg_candidates(capacity: int):
    """Closure for mapInPandas: stream the partition's ``tok`` column
    through one Misra-Gries summary; emit the survivors once the
    partition is exhausted. Self-contained for worker pickling."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for tok in pdf["tok"]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < capacity:
                    counters[tok] = 1
                else:
                    # decrement all k counters; drop the zeroed ones
                    for key in [k for k, v in counters.items() if v == 1]:
                        del counters[key]
                    for key in counters:
                        counters[key] -= 1
        yield pd.DataFrame({"tok": list(counters.keys())})

    return gen


def heavy_hitter_tokens(
    documents: DataFrame, k: int = MG_CAPACITY
) -> DataFrame:
    """(tok, cnt) — every token with ``cnt·k > N`` (frequency strictly
    above ``N/k``), exact counts. Candidate generation is bounded at
    ``k`` rows per partition; only candidates are ever shuffled for the
    recount, so the full-vocabulary groupBy of ``token_topk`` is never
    materialized — the 100 TB spelling of "what dominates the corpus"."""
    from .dedup import tokens

    toks = tokens(documents)
    cands = (
        toks.select("tok")
        .mapInPandas(_mg_candidates(k), "tok string")
        .distinct()
    )
    total = toks.agg(F.count(F.lit(1)).alias("__n"))
    return (
        toks.join(F.broadcast(cands), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * k > F.col("__n"))
        .select("tok", "cnt")
    )


def heavy_hitter_oracle_sql(toks_sql: str, k: int = MG_CAPACITY) -> str:
    """DuckDB twin — the direct threshold query (the MG pass is an
    engine-side memory bound, not semantics)."""
    return f"""
        WITH toks AS ({toks_sql}),
        n AS (SELECT COUNT(*) AS total FROM toks)
        SELECT tok, COUNT(*) AS cnt
        FROM toks CROSS JOIN n
        GROUP BY tok, total
        HAVING COUNT(*) * {k} > total
    """
