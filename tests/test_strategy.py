"""Connect-safe strategy guards (plans/strategy.py): which arm runs when
the classic-only probes are unavailable is a stated, tested contract —
not an accident of a bare try/except (round-3 verdict item 1)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from twitter_social_triangle_mapreduce_spark.operators import graph, text
from twitter_social_triangle_mapreduce_spark.plans import strategy

from conftest import SF_SMOKE


def _analyzed(df):
    return df._jdf.queryExecution().analyzed().toString()


def _has_shuffle_hash_hint(df) -> bool:
    return "shuffle_hash" in _analyzed(df).lower()


def test_parse_byte_conf_fractional():
    """'1.5g' is 1.5 GiB, not 1 GiB (round-3 ADVICE low: truncation
    before the multiply underestimated fractional thresholds)."""
    assert strategy.parse_byte_conf("1.5g") == int(1.5 * 2**30)
    assert strategy.parse_byte_conf("1.5gb") == int(1.5 * 2**30)
    assert strategy.parse_byte_conf("10m") == 10 * 2**20
    assert strategy.parse_byte_conf("67108864") == 67108864
    assert strategy.parse_byte_conf("-1") == -1
    assert strategy.parse_byte_conf(" 512K ") == 512 * 2**10


def test_auto_arm_small_side_stays_unhinted(spark):
    small = spark.range(10).select(F.col("id").alias("k"))
    out = strategy.shuffle_hash_unless_broadcastable(small)
    assert not _has_shuffle_hash_hint(out)


def test_auto_arm_without_stats_degrades_to_shuffle_hash(spark, monkeypatch):
    """The documented Connect fallback: when the plan-size probe returns
    None (no ``_jdf``), auto picks SHUFFLE_HASH — the scale-safe arm —
    rather than silently broadcasting."""
    monkeypatch.setattr(strategy, "plan_size_estimate", lambda df: None)
    small = spark.range(10).select(F.col("id").alias("k"))
    out = strategy.shuffle_hash_unless_broadcastable(small)
    assert _has_shuffle_hash_hint(out)


def test_plan_size_estimate_none_for_nonclassic(spark, monkeypatch):
    monkeypatch.setattr(strategy, "is_classic", lambda df: False)
    df = spark.range(5)
    assert strategy.plan_size_estimate(df) is None
    assert strategy.scan_partition_count(df) is None


def test_conf_override_forces_each_arm(spark):
    small = spark.range(10).select(F.col("id").alias("k"))
    try:
        spark.conf.set(strategy.BUILD_SIDE_CONF, "shuffle_hash")
        assert _has_shuffle_hash_hint(
            strategy.shuffle_hash_unless_broadcastable(small)
        )
        spark.conf.set(strategy.BUILD_SIDE_CONF, "broadcast")
        out = strategy.shuffle_hash_unless_broadcastable(small)
        assert "broadcast" in _analyzed(out).lower()
    finally:
        spark.conf.unset(strategy.BUILD_SIDE_CONF)


def test_operator_specific_conf_wins_over_global(spark):
    small = spark.range(10).select(F.col("id").alias("k"))
    try:
        spark.conf.set(strategy.BUILD_SIDE_CONF, "broadcast")
        spark.conf.set(graph.ORDERED_CLOSING_CONF, "shuffle_hash")
        out = strategy.shuffle_hash_unless_broadcastable(
            small, conf_key=graph.ORDERED_CLOSING_CONF
        )
        assert _has_shuffle_hash_hint(out)
    finally:
        spark.conf.unset(strategy.BUILD_SIDE_CONF)
        spark.conf.unset(graph.ORDERED_CLOSING_CONF)


def test_spread_small_input_auto_and_off(spark):
    # big enough that est_bytes / minBytesPerTask saturates the
    # parallelism target on this machine: 200k longs ~ 1.6 MB estimate
    # (Catalyst sizes derived columns by DEFAULT widths, not content —
    # a padded-string Project would estimate ~20 B/row regardless). The
    # expected width is the size cap formula itself, NOT bare
    # defaultParallelism (round-13 ADVICE: a host with enough cores
    # makes the size cap bind below the parallelism term)
    wide = spark.range(200_000).coalesce(1)
    est = strategy.plan_size_estimate(wide)
    cap = int(
        est * float(strategy.SPREAD_COMPRESSION_FACTOR_DEFAULT)
    ) // strategy.parse_byte_conf(strategy.SPREAD_MIN_BYTES_DEFAULT)
    spread = strategy.spread_small_input(wide)
    assert spread.rdd.getNumPartitions() == min(
        spark.sparkContext.defaultParallelism, cap
    )
    # size-aware arm (optimization round 12): a few-splits input whose
    # ESTIMATED bytes are below minBytesPerTask per slot does not pay
    # one near-empty task per slot — it spreads to est//minBytes
    # partitions (here: not at all)
    few = spark.range(100).coalesce(1)
    assert strategy.spread_small_input(few) is few
    try:
        # floor disabled -> the pre-round-12 split-count-only behavior
        spark.conf.set(strategy.SPREAD_MIN_BYTES_CONF, "0")
        assert strategy.spread_small_input(
            few
        ).rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
        spark.conf.unset(strategy.SPREAD_MIN_BYTES_CONF)
        spark.conf.set(strategy.SPREAD_CONF, "off")
        assert strategy.spread_small_input(wide) is wide
    finally:
        spark.conf.unset(strategy.SPREAD_CONF)
        spark.conf.unset(strategy.SPREAD_MIN_BYTES_CONF)


def test_spread_small_input_noop_without_probe(spark, monkeypatch):
    """Connect arm: no split-count probe → documented no-op (never a
    blind corpus-wide repartition)."""
    monkeypatch.setattr(strategy, "scan_partition_count", lambda df: None)
    few = spark.range(100).coalesce(1)
    assert strategy.spread_small_input(few) is few


def test_ordered_closing_conf_reaches_operator(spark):
    """The escape hatch must change the ordered triangle's physical plan
    — and not its value."""
    from twitter_social_triangle_mapreduce_spark.sources.io import (
        edges_from_events,
    )

    e = edges_from_events(spark, SF_SMOKE)
    baseline = graph.triangle_count_ordered(e, 50000).collect()[0][0]
    try:
        spark.conf.set(graph.ORDERED_CLOSING_CONF, "shuffle_hash")
        forced = graph.triangle_count_ordered(e, 50000)
        plan = forced._jdf.queryExecution().executedPlan().toString()
        assert "ShuffledHashJoin" in plan
        assert forced.collect()[0][0] == baseline
    finally:
        spark.conf.unset(graph.ORDERED_CLOSING_CONF)


def test_quality_gate_survives_stopword_dense_long_doc(spark):
    """Round-3 ADVICE high: 1e6 · stopword-count overflowed int32 for
    docs with ≥2148 stopword occurrences (ANSI mode → job-killing
    ARITHMETIC_OVERFLOW). A 3000-stopword document must score exactly
    1e6·stops/words with BIGINT math — checked against the DuckDB twin
    on the same inline relation."""
    long_text = " ".join(["the", "xqz"] * 3000)  # 3000 stopword hits
    docs = spark.createDataFrame(
        [(1, "web", long_text), (2, "web", "xqz " * 10)],
        "doc_id long, source string, text string",
    ).select("doc_id", "source", F.trim("text").alias("text"))
    out = text.quality_threshold_gate(docs).orderBy("doc_id").collect()
    assert out[0].score_e6 == 500000  # 3000/6000 stopword density
    assert out[1].score_e6 == 0
    # top-25% quota over two docs keeps nothing from bucket walk unless
    # the best bucket fits floor(0.25·2)=0 → keep must be all-zero
    assert [r.keep for r in out] == [0, 0]


def test_quality_gate_verdict_side_is_one_row_per_source(spark):
    """The broadcast side of the gate's final join is the per-source
    threshold relation — |sources| rows, not |sources|·|score domain|
    (round-3 ADVICE low: the per-bucket verdict broadcast was unbounded
    in the score-domain width)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = text.quality_threshold_gate(docs)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the join key collapsed to source only — score_e6 no longer a key
    joins = [ln for ln in plan.splitlines() if "Join LeftOuter" in ln]
    assert joins and all("score_e6" not in ln for ln in joins), joins


def test_plan_of_falls_back_to_explain_capture(spark, monkeypatch):
    """plans.explain.plan_of must degrade to the public df.explain
    capture when the JVM internals are unavailable (Spark Connect)."""
    from twitter_social_triangle_mapreduce_spark.plans import explain

    df = spark.range(10).groupBy((F.col("id") % 3).alias("k")).count()
    direct = explain.plan_of(df)

    class NoJdf:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            if name in ("_sc", "_jdf"):
                raise AttributeError(name)
            return getattr(self._inner, name)

    fallback = explain.plan_of(NoJdf(df))
    assert "HashAggregate" in direct and "HashAggregate" in fallback


def test_spread_force_arm_survives_missing_spark_context(spark, monkeypatch):
    """Review finding: 'force' is the Connect remedy, so it must not
    silently no-op when sparkContext is unavailable — it falls back to
    spark.sql.shuffle.partitions for the repartition target."""

    class NoCtx:
        def __init__(self, inner):
            self._inner = inner

        @property
        def sparkSession(self):
            outer = self

            class S:
                @property
                def sparkContext(self):
                    raise AttributeError("no sparkContext over Connect")

                @property
                def conf(self):
                    return outer._inner.sparkSession.conf

            return S()

        def __getattr__(self, name):
            return getattr(self._inner, name)

    few = spark.range(100).coalesce(1)
    try:
        spark.conf.set(strategy.SPREAD_CONF, "force")
        out = strategy.spread_small_input(NoCtx(few))
        assert out.rdd.getNumPartitions() == int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
    finally:
        spark.conf.unset(strategy.SPREAD_CONF)


def test_ordered_semi_threshold_conf_disables_filter(spark):
    """Review finding: the closing-key broadcast cap must be a session
    conf, not a compile-time constant — setting it to -1 disables the
    reduction on the shuffle arm."""
    from twitter_social_triangle_mapreduce_spark.sources.io import (
        edges_from_events,
    )

    e = edges_from_events(spark, SF_SMOKE)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(graph.ORDERED_SEMI_THRESHOLD_CONF, "-1")
        plan = (
            graph.triangle_count_ordered(e, 50000)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "LeftSemi" not in plan
        spark.conf.set(graph.ORDERED_SEMI_THRESHOLD_CONF, "1g")
        plan = (
            graph.triangle_count_ordered(e, 50000)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "LeftSemi" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset(graph.ORDERED_SEMI_THRESHOLD_CONF)


def test_prepare_corpus_rejects_bad_eval_mod(spark, tmp_path):
    import pytest as _pytest

    from twitter_social_triangle_mapreduce_spark.cli import run_prepare_corpus

    with _pytest.raises(SystemExit, match="eval-mod"):
        run_prepare_corpus(spark, SF_SMOKE, str(tmp_path / "x"), eval_mod=0)


def test_stats_of_as_is_arm_applies_explicit_broadcast(spark):
    """Round-6 ADVICE: when the size decision runs on SUBSTITUTE
    statistics (``stats_of`` — the build side itself contains an
    explode whose Catalyst estimate is unbounded), the under-threshold
    arm must apply the broadcast hint explicitly; returning the side
    unhinted would leave the planner re-deriving the unbounded estimate
    and never broadcasting. Without stats_of, as_is stays unhinted
    (the planner re-derives the SAME bounded estimate)."""
    small = spark.range(10).select(F.col("id").alias("k"))
    derived = small.select(
        F.explode(F.array(F.col("k"), F.col("k") + 100)).alias("k")
    )
    out = strategy.shuffle_hash_unless_broadcastable(derived, stats_of=small)
    assert "broadcast" in _analyzed(out).lower()
    assert not _has_shuffle_hash_hint(out)
    # without substitute stats the as_is arm stays unhinted (the planner
    # re-derives the same estimate itself) — the explicit hint is tied
    # to stats_of, not applied globally
    sm = strategy.shuffle_hash_unless_broadcastable(small)
    assert "unresolvedhint" not in _analyzed(sm).lower()
