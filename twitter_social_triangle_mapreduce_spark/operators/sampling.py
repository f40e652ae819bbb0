"""Deterministic sampling and splitting for training-data pipelines.

Reproducibility contract: a row's assignment depends ONLY on its key and
the salt — stable across runs, engines, partitionings, cluster sizes, and
corpus growth (adding documents never flips an existing document's
split). This is the property ``df.sample()`` / ``randomSplit()`` lack
(their draws depend on partitioning and seed plumbing), and it is what
makes train/test membership auditable months later: recompute the hash,
get the same answer. The bucket function is the engine-portable md5
arithmetic shared with the dedup pipeline (`functions.hashing`), so a
DuckDB oracle reproduces assignments bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hex_prefix_to_long_sql

#: bucket granularity: fractions are exact to 1e-6
SPLIT_BUCKETS = 1_000_000

_DIGEST = "__tstm_split_digest"


def _with_bucket(df: DataFrame, key: str, salt: str) -> DataFrame:
    """Attach the deterministic [0, SPLIT_BUCKETS) bucket of ``key``.
    Two-step (digest column, then nibble arithmetic) so md5 is computed
    once per row, not once per nibble."""
    digest = F.md5(F.concat(F.col(key).cast("string"), F.lit(f"#{salt}")))
    return df.withColumn(_DIGEST, digest).withColumn(
        "__tstm_bucket",
        F.expr(hex_prefix_to_long_sql(_DIGEST, 7)) % SPLIT_BUCKETS,
    )


def hash_sample(
    df: DataFrame, key: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by key hash. Unlike
    ``df.sample`` the decision is a pure function of (key, salt):
    rerunning, repartitioning, or growing the corpus never changes which
    keys are kept — the reproducible-downsampling primitive."""
    cut = round(fraction * SPLIT_BUCKETS)
    return (
        _with_bucket(df, key, salt)
        .where(F.col("__tstm_bucket") < cut)
        .drop(_DIGEST, "__tstm_bucket")
    )


def train_test_split(
    df: DataFrame, key: str, test_frac: float = 0.1, salt: str = "split"
) -> DataFrame:
    """All rows with a ``split`` column ∈ {'test','train'} assigned by
    key hash: deterministic, engine-portable, leak-free (a key appearing
    in many rows lands wholly on one side — group by the DOCUMENT or
    USER key, never a row id, to avoid near-duplicate leakage across the
    boundary)."""
    # round, not int(): 0.29 * 1e6 is 289999.99999999994 in binary
    # floating point and truncation would shave a bucket off the
    # documented 1e-6-exact granularity
    cut = round(test_frac * SPLIT_BUCKETS)
    return (
        _with_bucket(df, key, salt)
        .withColumn(
            "split",
            F.when(F.col("__tstm_bucket") < cut, F.lit("test")).otherwise(
                F.lit("train")
            ),
        )
        .drop(_DIGEST, "__tstm_bucket")
    )


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows — the corpus
    REBALANCING primitive (downsample the dominant language/source, keep
    the rare ones whole). Same reproducibility contract as
    ``hash_sample``: membership is a pure function of (key, salt), so
    growing one stratum never flips another stratum's members, and the
    per-stratum rates compose with later global samples (independent
    salts → independent hash buckets). Strata not in ``fractions`` get
    ``default_frac``. Pure expression-level: one CASE picks the cutoff,
    one hash decides — no per-stratum scans, no shuffle at all."""
    cut = F.lit(round(default_frac * SPLIT_BUCKETS))
    for value, frac in sorted(fractions.items()):
        cut = (
            F.when(F.col(strata_col) == value, round(frac * SPLIT_BUCKETS))
            .otherwise(cut)
        )
    return (
        _with_bucket(df, key, salt)
        .where(F.col("__tstm_bucket") < cut)
        .drop(_DIGEST, "__tstm_bucket")
    )


def stratified_oracle_sql(
    table: str,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
    salt: str = "strat",
    select: str = "*",
) -> str:
    """DuckDB twin of ``stratified_sample`` projected to ``select``."""
    cases = " ".join(
        f"WHEN {strata_col} = '{v}' THEN {round(f * SPLIT_BUCKETS)}"
        for v, f in sorted(fractions.items())
    )
    bucket = hex_prefix_to_long_sql("dg", 7)
    return f"""
        WITH d AS (SELECT *,
                          md5(concat(CAST({key} AS VARCHAR), '#{salt}')) AS dg
                   FROM {table})
        SELECT {select} FROM (
            SELECT * EXCLUDE (dg), ({bucket} % {SPLIT_BUCKETS}) AS b,
                   CASE {cases}
                        ELSE {round(default_frac * SPLIT_BUCKETS)} END AS cut
            FROM d
        ) WHERE b < cut
    """


def mixture_rates(
    df: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
    parts: dict[str, int] | None = None,
) -> DataFrame:
    """(strata, n_tokens, parts, rate_e6) — DATA-DRIVEN per-stratum
    sampling rates that realize a target token MIXTURE: the data-mixing
    step of an LLM training pipeline ("20 parts web, 3 parts code, 1
    part reference"), where ``stratified_sample`` takes rates as given,
    this derives them from what the corpus actually contains.

    ``parts`` gives each stratum's integer weight in the target mixture
    (default: every observed stratum weight 1, i.e. equalize token
    counts); strata absent from a non-None ``parts`` get rate 0. With
    K = min_s(n_tokens_s div parts_s) tokens per part, the realized
    corpus targets parts_s·K tokens from stratum s — the LARGEST corpus
    achieving the exact mixture with no upsampling — via
    rate_e6 = (1e6·parts_s·K) div n_tokens_s ≤ 1e6.

    All arithmetic is integer (products in DECIMAL(38,0), so a
    100 TB-scale 1e13-token stratum stays exact); the DuckDB twin
    (``mixture_oracle_sql``) reproduces every rate bit-for-bit. Scale
    shape: one partial-agg token count per stratum, then all planning on
    the #strata-row relation — the corpus is scanned once and never
    shuffled (token counts aggregate map-side)."""
    toks = F.sum(F.size(F.split(F.col(text_col), " ")).cast("long"))
    tc = df.groupBy(F.col(strata_col).alias("strata")).agg(
        toks.alias("n_tokens")
    )
    if parts is None:
        p = tc.withColumn("parts", F.lit(1).cast("long"))
    else:
        expr = F.lit(0).cast("long")
        for value, w in sorted(parts.items()):
            expr = F.when(F.col("strata") == value, w).otherwise(expr)
        p = tc.withColumn("parts", expr).where(F.col("parts") > 0)
    from pyspark.sql.window import Window

    # the min-over-strata comes from an unpartitioned window — over the
    # POST-AGGREGATION #strata-row relation only (a handful of rows), so
    # the corpus is scanned exactly once; a separate agg + join would
    # re-run the token census for the second branch
    per = p.withColumn("__kper", F.expr("n_tokens div parts")).withColumn(
        "__k", F.min("__kper").over(Window.partitionBy())
    )
    return per.select(
        "strata",
        "n_tokens",
        "parts",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * parts * __k)"
            " div n_tokens AS BIGINT)"
        ).alias("rate_e6"),
    )


def mixture_sample(
    df: DataFrame,
    key: str,
    strata_col: str = "source",
    text_col: str = "text",
    parts: dict[str, int] | None = None,
    salt: str = "mix",
) -> DataFrame:
    """(key, strata) — the rows kept by applying ``mixture_rates``:
    deterministic hash membership (same contract as ``hash_sample``)
    at the data-derived per-stratum rate. The rates relation is
    #strata rows and broadcast; the corpus side is scanned for the
    token census and once more for the membership filter — no shuffle
    of corpus rows anywhere."""
    rates = mixture_rates(df, strata_col, text_col, parts).select(
        "strata", "rate_e6"
    )
    return (
        _with_bucket(df, key, salt)
        .join(
            F.broadcast(rates),
            F.col(strata_col) == F.col("strata"),
        )
        .where(F.col("__tstm_bucket") < F.col("rate_e6"))
        .select(F.col(key), F.col(strata_col))
    )


def mixture_oracle_sql(
    table: str,
    key: str,
    strata_col: str = "source",
    text_col: str = "text",
    salt: str = "mix",
    rates_only: bool = False,
) -> str:
    """DuckDB twin of ``mixture_rates`` (``rates_only=True``) /
    ``mixture_sample`` — uniform parts (the registry configuration)."""
    bucket = hex_prefix_to_long_sql("dg", 7)
    rates = f"""
        tc AS (SELECT {strata_col} AS strata,
                      CAST(SUM(len(string_split({text_col}, ' ')))
                           AS BIGINT) AS n_tokens
               FROM {table} GROUP BY {strata_col}),
        p AS (SELECT strata, n_tokens, CAST(1 AS BIGINT) AS parts FROM tc),
        k AS (SELECT MIN(n_tokens // parts) AS kk FROM p),
        r AS (SELECT strata, n_tokens, parts,
                     CAST((1000000::HUGEINT * parts * kk) // n_tokens
                          AS BIGINT) AS rate_e6
              FROM p, k)
    """
    if rates_only:
        return f"WITH {rates} SELECT strata, n_tokens, parts, rate_e6 FROM r"
    return f"""
        WITH {rates}
        SELECT d.{key}, d.{strata_col}
        FROM (SELECT {key}, {strata_col},
                     md5(concat(CAST({key} AS VARCHAR), '#{salt}')) AS dg
              FROM {table}) d
        JOIN r ON r.strata = d.{strata_col}
        WHERE ({bucket} % {SPLIT_BUCKETS}) < r.rate_e6
    """


def hash_topk_sample(
    df: DataFrame,
    key: str,
    n: int,
    salt: str = "topk",
    tiebreak: str | None = None,
) -> DataFrame:
    """Fixed-SIZE deterministic sample: the ``n`` rows whose key digests
    sort lowest. The reservoir-sampling replacement for distributed
    engines: uniform over keys, a pure function of (key set, salt, n),
    and executed as TakeOrderedAndProject — each partition contributes
    its local top-n candidates (O(n) memory), the driver merges; no
    global sort is materialized. Complements ``hash_sample`` (fixed
    RATE).

    Determinism contract: ``key`` must be UNIQUE per row — duplicate key
    values share a digest, and rows tied at the limit boundary would
    then be selected nondeterministically. For non-unique keys pass
    ``tiebreak``, a column that makes (key, tiebreak) unique; it is
    appended to the sort to restore a total order."""
    order = [F.col(_DIGEST)]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    return (
        df.withColumn(
            _DIGEST,
            F.md5(F.concat(F.col(key).cast("string"), F.lit(f"#{salt}"))),
        )
        .orderBy(*order)
        .limit(n)
        .drop(_DIGEST)
    )


def topk_sample_oracle_sql(
    table: str,
    key: str,
    n: int,
    salt: str = "topk",
    select: str = "*",
    tiebreak: str | None = None,
) -> str:
    """DuckDB twin of ``hash_topk_sample``."""
    tb = f", {tiebreak}" if tiebreak is not None else ""
    return f"""
        SELECT {select} FROM {table}
        ORDER BY md5(concat(CAST({key} AS VARCHAR), '#{salt}')){tb}
        LIMIT {n}
    """


def split_oracle_sql(
    table: str, key: str, test_frac: float = 0.1, salt: str = "split"
) -> str:
    """DuckDB twin of ``train_test_split`` projected to (key, split)."""
    cut = round(test_frac * SPLIT_BUCKETS)  # keep in lockstep with the Spark side
    bucket = hex_prefix_to_long_sql("dg", 7)
    return f"""
        WITH d AS (SELECT {key},
                          md5(concat(CAST({key} AS VARCHAR), '#{salt}')) AS dg
                   FROM {table})
        SELECT {key},
               CASE WHEN ({bucket} % {SPLIT_BUCKETS}) < {cut}
                    THEN 'test' ELSE 'train' END AS split
        FROM d
    """


def weighted_sample(
    df: DataFrame,
    key: str,
    weight: str,
    n: int,
    salt: str = "wsample",
    by: str | None = None,
) -> DataFrame:
    """Fixed-size WEIGHTED sample without replacement — the
    quality-weighted corpus subsample (keep ``n`` documents per source,
    a document's chance proportional to its quality/length score), the
    op ``hash_topk_sample`` covers only for uniform weights.

    Mechanics: the Efraimidis–Spirakis exponential race. Each row draws
    the deterministic uniform u = (bucket(key, salt) + 0.5) / 1e6 from
    the shared md5 bucket arithmetic and races with priority
    -ln(u) / weight; the ``n`` smallest priorities (per ``by`` group
    when given, global otherwise) are the sample. This is provably
    equivalent to sequential weighted sampling without replacement
    (Efraimidis & Spirakis 2006), but embarrassingly parallel: the
    priority is a per-row expression; selection is a windowed top-n per
    group (map-side pre-reduced by Spark's WindowGroupLimit) or, for
    the global arm, sort-limit → TakeOrderedAndProject — never a
    single-partition window or a materialized global sort of the
    corpus.

    Same reproducibility contract as the rest of this module: the draw
    depends only on (key, salt), never on partitioning or cluster size,
    so sample membership is auditable months later. Rows with
    weight <= 0 or NULL are excluded (a zero-weight row must never be
    drawn; -ln(u)/0 would be ±inf and engine-dependent).

    Numeric portability note: the priority crosses ln(), so the last
    double ulp may differ between engines; two rows would have to race
    within ~1e-15 RELATIVE priority for the selected SET to differ,
    which md5-derived uniforms make astronomically unlikely (the same
    argument the cosine floors rely on). ``key`` must be unique per row
    (the window orders by (priority, key) for a total order)."""
    u = (F.col("__tstm_bucket").cast("double") + F.lit(0.5)) / F.lit(
        float(SPLIT_BUCKETS)
    )
    pri = -F.log(u) / F.col(weight).cast("double")
    raced = (
        _with_bucket(df, key, salt)
        .where(F.col(weight).isNotNull() & (F.col(weight) > 0))
        .withColumn("__tstm_pri", pri)
    )
    if by is None:
        # global: sort-limit -> TakeOrderedAndProject (each partition
        # contributes its local top-n, the driver merges — never a
        # single-partition window over the corpus)
        out = raced.orderBy(F.col("__tstm_pri"), F.col(key)).limit(n)
        return out.drop(_DIGEST, "__tstm_bucket", "__tstm_pri")
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(F.col("__tstm_pri"), F.col(key))
    return (
        raced.withColumn("__tstm_rk", F.row_number().over(w))
        .where(F.col("__tstm_rk") <= n)
        .drop(_DIGEST, "__tstm_bucket", "__tstm_pri", "__tstm_rk")
    )


def weighted_sample_oracle_sql(
    table: str,
    key: str,
    weight: str,
    n: int,
    salt: str = "wsample",
    by: str | None = None,
    select: str = "*",
) -> str:
    """DuckDB twin of ``weighted_sample`` — same md5 bucket, same
    u = (bucket + 0.5)/1e6, same -ln(u)/weight race, same
    (priority, key) total order."""
    bucket = hex_prefix_to_long_sql("dg", 7)
    part = f"PARTITION BY {by} " if by is not None else ""
    return f"""
        WITH d AS (SELECT *,
                          md5(concat(CAST({key} AS VARCHAR), '#{salt}')) AS dg
                   FROM {table}
                   WHERE {weight} IS NOT NULL AND {weight} > 0),
        p AS (SELECT *,
                     -ln((CAST(({bucket} % {SPLIT_BUCKETS}) AS DOUBLE) + 0.5)
                         / {float(SPLIT_BUCKETS)})
                     / CAST({weight} AS DOUBLE) AS pri
              FROM d),
        r AS (SELECT *,
                     row_number() OVER ({part}ORDER BY pri, {key}) AS rk
              FROM p)
        SELECT {select} FROM r WHERE rk <= {n}
    """
