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
    """Closure for mapInPandas: fold the partition's ``tok`` column
    through one WEIGHTED Misra-Gries summary; emit the survivors once
    the partition is exhausted. Self-contained for worker pickling.

    Vectorized (round 12, r11 verdict item 4): each Arrow batch is
    pre-reduced to its (token, count) pairs with ``value_counts()``
    (C-speed, one pass) and only the VOCABULARY-sized pair list walks
    Python — the previous row-at-a-time loop executed interpreted
    Python per token on a corpus-scan path. The weighted update is the
    standard MG extension: inserting weight ``w`` for an unknown token
    against a full table repeatedly subtracts ``d = min(w, min
    counter)`` from all counters AND from ``w`` (each subtraction
    retires ≥ 1 counter or exhausts ``w``, so the loop is bounded by
    ``capacity``). Every decrement event removes the same ``d`` units
    from ``capacity + 1`` distinct tokens — exactly ``d`` grouped
    unit-insertions of the classic algorithm — so the superset
    guarantee (any token with freq > n_p/capacity survives) is
    unchanged, and it is ORDER-INSENSITIVE: the survivor SET may
    differ from the unit-by-unit pass, but the exact recount
    downstream makes the final output identical (parity-tested)."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for tok, w in pdf["tok"].value_counts().items():
                w = int(w)
                if tok in counters:
                    counters[tok] += w
                    continue
                while w > 0 and len(counters) >= capacity:
                    d = min(w, min(counters.values()))
                    w -= d
                    for key in [
                        k for k, v in counters.items() if v == d
                    ]:
                        del counters[key]
                    for key in counters:
                        counters[key] -= d
                if w > 0:
                    counters[tok] = w
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


#: Count–Min geometry: depth independent hash rows × width counters.
#: Error bound: est(x) ≤ true(x) + 2N/width with prob ≥ 1 − 2^−depth
#: (Cormode & Muthukrishnan 2005); 4×256 bounds testdata-scale error
#: to ~0.8% of N per miss while the sketch stays ≤ 1024 rows.
CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_width_for(n_tokens: int, abs_err: int) -> int:
    """The CMS error bound solved for width (round 12): est ≤ true +
    2N/width w.h.p., so holding an ABSOLUTE error target ``abs_err``
    as the corpus grows needs ``width = ceil(2N/abs_err)`` — the
    sizing rule BASELINE.md's round-11 row documents, packaged so the
    re-width migration (``streams.rewidth_sketch_store``) and batch
    callers size identically."""
    if n_tokens < 0 or abs_err <= 0:
        raise ValueError(
            f"cms_width_for: need n_tokens >= 0 and abs_err > 0,"
            f" got {n_tokens}, {abs_err}"
        )
    return max(1, -(-2 * int(n_tokens) // int(abs_err)))


def _cms_placed(
    df: DataFrame,
    depth: int,
    width: int,
    tok_col: str = "tok",
    keep: tuple = (),
) -> DataFrame:
    """Fan each row out into its ``depth`` (row, col) counter
    placements in ONE pass: all depth digests projected side by side
    (md5 under the ``cms``-distinct key namespace — the exact
    arithmetic the DuckDB oracles spell out), then one explode. The
    SINGLE owner of the placement arithmetic: the sketch builder and
    the estimator both route through here, so sketch placement and
    probe placement can never desynchronize. A union of per-depth
    selects would re-scan the input depth times — 4× the read at
    100 TB."""
    from ..functions.hashing import hex_prefix_to_long_sql

    t = df
    for d in range(depth):
        t = t.withColumn(
            f"__tstm_cms_dg{d}",
            F.md5(F.concat(F.lit(f"cms{d}#"), F.col(tok_col))),
        )
    entries = F.array(
        *[
            F.struct(
                F.lit(d).cast("long").alias("row"),
                (
                    F.expr(hex_prefix_to_long_sql(f"__tstm_cms_dg{d}", 7))
                    % width
                ).alias("col"),
            )
            for d in range(depth)
        ]
    )
    return t.select(*keep, F.explode(entries).alias("__tstm_e")).select(
        *keep, "__tstm_e.row", "__tstm_e.col"
    )


def token_count_sketch(
    documents: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """(row, col, cnt) — the Count–Min sketch of the corpus token
    frequencies as a RELATION of at most ``depth × width`` counter
    rows. The fourth sketch family (HLL distincts, KLL quantiles,
    Misra-Gries heavy hitters), and the only one whose driver gate can
    HASH-CHECK: the hash placements are deterministic md5 arithmetic,
    so a DuckDB twin reproduces every counter exactly — sketches are
    normally gated rows-only.

    Scale shape: one corpus scan; each token emits ``depth`` (row, col)
    pairs via posexplode of a literal-array expression, and the groupBy
    partial-aggregates map-side down to ≤ depth×width rows per
    partition before the exchange — the shuffle is sketch-sized, never
    corpus-sized. MERGEABLE by construction: the sketch of a union is
    the elementwise counter sum (tested), so per-partition / per-day /
    per-source sketches roll up losslessly — the property that lets a
    100 TB corpus be sketched incrementally.
    """
    from .dedup import tokens

    return (
        _cms_placed(tokens(documents), depth, width)
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    tok_col: str = "tok",
) -> DataFrame:
    """(tok, est) — the Count–Min point estimate for every probe token:
    min over the ``depth`` rows of the counter at (row, col(row, tok)),
    0 when a counter is absent (an all-zero row proves the token never
    occurred). Guarantees: est ≥ true count always (counters only ever
    over-count via collisions), est ≤ true + 2N/width w.h.p.

    The probe relation is scanned ONCE (one distinct, then the shared
    ``_cms_placed`` explode — the same single-pass shape as the sketch
    builder); the sketch side is ≤ depth×width rows and is broadcast,
    so the probes never shuffle for the lookup."""
    placed = _cms_placed(
        probes.select(F.col(tok_col).alias("tok")).distinct(),
        depth,
        width,
        keep=("tok",),
    )
    return (
        placed.join(F.broadcast(sketch), ["row", "col"], "left")
        .select("tok", F.coalesce(F.col("cnt"), F.lit(0)).alias("c"))
        .groupBy("tok")
        .agg(F.min("c").alias("est"))
    )


def cms_sketch_oracle_sql(
    toks_sql: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> str:
    """DuckDB twin of ``token_count_sketch`` — same md5 placement."""
    from ..functions.hashing import hex_prefix_to_long_sql

    selects = []
    for d in range(depth):
        bucket = hex_prefix_to_long_sql("dg", 7)
        selects.append(
            f"SELECT CAST({d} AS BIGINT) AS row,"
            f" ({bucket} % {width}) AS col, COUNT(*) AS cnt"
            f" FROM (SELECT md5(concat('cms{d}#', tok)) AS dg"
            f"       FROM toks) GROUP BY col"
        )
        # DuckDB GROUP BY col groups on the alias (its documented
        # behavior); the Spark side groups on the same expression
    u = " UNION ALL ".join(selects)
    return f"WITH toks AS ({toks_sql}) {u}"


def cms_estimate_oracle_sql(
    toks_sql: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> str:
    """DuckDB twin of ``cms_estimate`` probed with the corpus's own
    distinct tokens: rebuild the counters, place each probe, take the
    per-token min."""
    from ..functions.hashing import hex_prefix_to_long_sql

    counters = []
    placements = []
    for d in range(depth):
        bucket = hex_prefix_to_long_sql("dg", 7)
        counters.append(
            f"SELECT CAST({d} AS BIGINT) AS row,"
            f" ({bucket} % {width}) AS col, COUNT(*) AS cnt"
            f" FROM (SELECT md5(concat('cms{d}#', tok)) AS dg"
            f"       FROM toks) GROUP BY col"
        )
        placements.append(
            f"SELECT tok, CAST({d} AS BIGINT) AS row,"
            f" ({bucket} % {width}) AS col"
            f" FROM (SELECT tok, md5(concat('cms{d}#', tok)) AS dg"
            f"       FROM probes)"
        )
    return f"""
        WITH toks AS ({toks_sql}),
        probes AS (SELECT DISTINCT tok FROM toks),
        sketch AS ({' UNION ALL '.join(counters)}),
        placed AS ({' UNION ALL '.join(placements)})
        SELECT p.tok, MIN(COALESCE(s.cnt, 0)) AS est
        FROM placed p LEFT JOIN sketch s
          ON p.row = s.row AND p.col = s.col
        GROUP BY p.tok
    """


def merge_cms_states(snapshot: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a delta CMS into a snapshot CMS: full-outer join on
    (row, col), counter sum — the ``merge_agg_states`` pattern
    instantiated for the sketch (``incremental.py``'s contract:
    merge(state(A), state(B)) == state(A ∪ B) for disjoint splits,
    here exactly true because counters are plain sums). Shuffles two
    ≤ depth×width relations, never a corpus."""
    s = snapshot.select("row", "col", F.col("cnt").alias("__s"))
    d = delta.select("row", "col", F.col("cnt").alias("__d"))
    return s.join(d, ["row", "col"], "full_outer").select(
        "row",
        "col",
        (F.coalesce("__s", F.lit(0)) + F.coalesce("__d", F.lit(0))).alias(
            "cnt"
        ),
    )


def merged_token_sketch(documents: DataFrame) -> DataFrame:
    """Registry composition proving the merge algebra through the hash
    gate (the ``merged_user_state`` pattern): split the corpus
    deterministically (even/odd doc_id), sketch both halves, MERGE —
    the oracle sketches the whole corpus directly, so any merge bug
    hash-mismatches. The split is an EXHAUSTIVE partition (a NULL
    doc_id lands in the even half instead of silently vanishing from
    both — a plain ``% 2 == 0`` / ``% 2 != 0`` pair drops NULL rows
    and the 'merge bug' the gate reported would really be a split
    bug)."""
    # NULL & FALSE = FALSE in SQL's three-valued logic, so is_odd is
    # never NULL and (is_odd, ~is_odd) is a true partition
    is_odd = (F.col("doc_id") % 2 != 0) & F.col("doc_id").isNotNull()
    even = token_count_sketch(documents.where(~is_odd))
    odd = token_count_sketch(documents.where(is_odd))
    return merge_cms_states(even, odd)
