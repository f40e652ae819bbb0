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
