"""Deterministic sampling/splitting guarantees: pure function of
(key, salt) — stable across reruns and corpus growth, correct fractions,
and sample ⊂ corpus by construction. The engine-exact DuckDB parity of
the split is covered by the oracle differential (doc_train_test_split)."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_social_triangle_mapreduce_spark.operators.sampling import (
    SPLIT_BUCKETS,
    hash_sample,
    train_test_split,
)
from twitter_social_triangle_mapreduce_spark.sources.io import load_table

from conftest import SF_SMOKE


def _splits(df):
    return {r["doc_id"]: r["split"] for r in df.select("doc_id", "split").collect()}


def test_split_deterministic_across_runs(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    a = _splits(train_test_split(docs, "doc_id"))
    b = _splits(train_test_split(docs, "doc_id"))
    assert a == b and set(a.values()) == {"test", "train"}


def test_split_stable_under_corpus_growth(spark):
    """Adding documents must never flip an existing document's split —
    the auditability property random sampling lacks."""
    docs = load_table(spark, SF_SMOKE, "documents")
    full = _splits(train_test_split(docs, "doc_id"))
    subset = _splits(train_test_split(docs.where("doc_id < 100"), "doc_id"))
    assert subset == {k: v for k, v in full.items() if k < 100}


def test_split_fraction_within_tolerance(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    split = train_test_split(docs, "doc_id", test_frac=0.2)
    n = docs.count()
    n_test = split.where("split = 'test'").count()
    # md5 buckets are uniform; 500 docs at p=0.2 → σ≈8.9, allow 4σ
    assert abs(n_test - 0.2 * n) <= 4 * (0.2 * 0.8 * n) ** 0.5


def test_hash_sample_is_split_consistent(spark):
    """hash_sample(frac) with the split salt keeps exactly the 'test'
    side of train_test_split(frac) — one bucket function, two views."""
    docs = load_table(spark, SF_SMOKE, "documents")
    sampled = {
        r["doc_id"]
        for r in hash_sample(docs, "doc_id", 0.1, salt="split").collect()
    }
    test_side = {
        k for k, v in _splits(train_test_split(docs, "doc_id", 0.1)).items()
        if v == "test"
    }
    assert sampled == test_side


def test_bucket_granularity_is_exact():
    assert SPLIT_BUCKETS == 10**6  # fractions exact to 1e-6


def test_column_profile_single_pass_and_nulls(spark):
    """Profile counts on a fixture with known nulls/duplicates; the plan
    must contain exactly one scan of the input (one-pass contract)."""
    from twitter_social_triangle_mapreduce_spark.operators.profile import (
        column_profile,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b"), (4, None)],
        "k long, v string",
    )
    got = {
        r["col_name"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
        for r in column_profile(df).collect()
    }
    assert got == {"k": (5, 0, 4), "v": (5, 2, 2)}

    plan = column_profile(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1  # one scan, however many columns


def test_stratified_rates_and_membership(spark):
    """Per-stratum keep rates bind independently; membership within a
    stratum is the same hash decision as hash_sample with the stratified
    salt (one bucket function, per-stratum cutoffs)."""
    from twitter_social_triangle_mapreduce_spark.operators.sampling import (
        stratified_sample,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    fr = {"en": 0.25, "de": 1.0, "zh": 0.5}
    out = stratified_sample(
        docs, "doc_id", "lang", fr, default_frac=0.0
    )
    by_lang = {
        r["lang"]: r["cnt"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    totals = {
        r["lang"]: r["cnt"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    # de kept whole, default-0 strata dropped entirely
    assert by_lang.get("de") == totals["de"]
    assert "es" not in by_lang and "fr" not in by_lang
    # sampled strata within 4 sigma of their rate
    for lang, p in (("en", 0.25), ("zh", 0.5)):
        n = totals[lang]
        assert abs(by_lang.get(lang, 0) - p * n) <= 4 * (p * (1 - p) * n) ** 0.5


def test_stratified_stable_under_other_stratum_growth(spark):
    """Dropping one stratum entirely must not change another stratum's
    members (hash decisions are per-key, not rank-based)."""
    from twitter_social_triangle_mapreduce_spark.operators.sampling import (
        stratified_sample,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    fr = {"en": 0.25, "de": 1.0}
    full = {
        r["doc_id"]
        for r in stratified_sample(docs, "doc_id", "lang", fr)
        .where("lang = 'en'")
        .select("doc_id")
        .collect()
    }
    without_de = {
        r["doc_id"]
        for r in stratified_sample(
            docs.where("lang != 'de'"), "doc_id", "lang", fr
        )
        .where("lang = 'en'")
        .select("doc_id")
        .collect()
    }
    assert full == without_de


def test_hash_topk_tiebreak_total_order(spark):
    """Duplicate key values share a digest; without a tiebreaker the
    limit boundary is nondeterministic. With one, the selection is a
    pure function of the data: stable across reruns and equal to the
    explicitly-sorted head."""
    from twitter_social_triangle_mapreduce_spark.operators.sampling import (
        hash_topk_sample,
    )

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id"
    )
    # key on user_id (150 distinct over 10k rows — heavy duplication)
    a = sorted(
        (r["event_id"], r["user_id"])
        for r in hash_topk_sample(
            ev, "user_id", 37, tiebreak="event_id"
        ).collect()
    )
    b = sorted(
        (r["event_id"], r["user_id"])
        for r in hash_topk_sample(
            ev, "user_id", 37, tiebreak="event_id"
        ).collect()
    )
    assert a == b and len(a) == 37
    want = sorted(
        (r["event_id"], r["user_id"])
        for r in ev.withColumn(
            "__dg",
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit("#topk"))),
        )
        .orderBy("__dg", "event_id")
        .limit(37)
        .drop("__dg")
        .collect()
    )
    assert a == want


# --- weighted_sample (round 11): Efraimidis–Spirakis exponential race ---


def test_weighted_sample_deterministic_and_partitioning_invariant(spark):
    from twitter_social_triangle_mapreduce_spark.operators.sampling import (
        weighted_sample,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    pick = lambda df: {  # noqa: E731
        r["doc_id"]
        for r in weighted_sample(
            df, key="doc_id", weight="n_chars", n=5, by="source"
        ).collect()
    }
    a = pick(docs.repartition(1))
    b = pick(docs.repartition(13, "lang"))
    assert a == b and len(a) == 5 * 20  # 20 sources, 5 each


def test_weighted_sample_excludes_nonpositive_and_null_weights(spark):
    from twitter_social_triangle_mapreduce_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, 0.0), (3, -4.0), (4, None), (5, 2.0)],
        "k long, w double",
    )
    got = {r["k"] for r in weighted_sample(df, "k", "w", n=5).collect()}
    assert got == {1, 5}  # zero/negative/NULL can never be drawn


def test_weighted_sample_takes_whole_group_when_n_exceeds_it(spark):
    from twitter_social_triangle_mapreduce_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 1.0, "a"), (2, 1.0, "a"), (3, 1.0, "b")],
        "k long, w double, g string",
    )
    got = weighted_sample(df, "k", "w", n=10, by="g").collect()
    assert {r["k"] for r in got} == {1, 2, 3}


def test_weighted_sample_inclusion_tracks_weight(spark):
    """The Efraimidis–Spirakis guarantee, measured: with two weight
    classes 9:1, draws of 10-of-100 across 40 independent salts must
    include heavy rows far more often. Exact inclusion probabilities
    for sequential WSWOR here are ~0.66 (heavy) / ~0.042 (light); the
    asserted band is wide — the test catches an inverted or ignored
    weight, not the third decimal."""
    from twitter_social_triangle_mapreduce_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, 9.0 if i < 10 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, w double")
    heavy = light = 0
    for s in range(40):
        got = {
            r["k"]
            for r in weighted_sample(df, "k", "w", n=10, salt=f"s{s}").collect()
        }
        heavy += sum(1 for k in got if k < 10)
        light += sum(1 for k in got if k >= 10)
    h_rate = heavy / (40 * 10)  # inclusion per heavy row per draw
    l_rate = light / (40 * 90)
    assert h_rate > 0.45, (h_rate, l_rate)
    assert l_rate < 0.10, (h_rate, l_rate)
    assert h_rate > 5 * l_rate, (h_rate, l_rate)


def test_weighted_sample_plan_shapes(spark):
    """Global arm plans as TakeOrderedAndProject (local top-n + driver
    merge, no corpus sort); grouped arm's rank filter is pushed into
    WindowGroupLimit (map-side per-group top-n before the exchange)."""
    from twitter_social_triangle_mapreduce_spark.operators.sampling import (
        weighted_sample,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    g = weighted_sample(docs, "doc_id", "n_chars", n=5)
    plan_g = g._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan_g, plan_g[:800]
    p = weighted_sample(docs, "doc_id", "n_chars", n=5, by="source")
    plan_p = p._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan_p, plan_p[:800]
