"""Structured Streaming tests: run each stream with Trigger.AvailableNow
into a memory sink and compare against the equivalent batch computation —
streaming results must converge to the batch answer on bounded input."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from twitter_social_triangle_mapreduce_spark import streaming as st
from twitter_social_triangle_mapreduce_spark.sources.io import (
    edges_from_events,
    load_table,
)

from conftest import SF_SMOKE


def run_to_completion(df, mode: str = "append"):
    name = "sink_" + uuid.uuid4().hex[:8]
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    return name


def test_streaming_window_counts_matches_batch(spark):
    ev = st.read_events_stream(spark, SF_SMOKE)
    sink = run_to_completion(
        st.streaming_event_window_counts(ev), mode="append"
    )
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.table(sink).collect()
    }
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    want = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in batch.collect()
    }
    # append mode emits exactly the windows the final watermark closed:
    # window_end (start+1h) <= max_ts - 2h watermark
    from datetime import timedelta

    max_ts = (
        load_table(spark, SF_SMOKE, "events")
        .agg(F.max(F.col("ts").cast("timestamp")))
        .collect()[0][0]
    )
    cutoff = max_ts - timedelta(hours=2)
    closed = {
        k: v
        for k, v in want.items()
        if k[0] + timedelta(hours=1) <= cutoff
    }
    assert got == closed


def test_streaming_session_windows_match_batch(spark):
    """Streaming session_window must converge to the batch
    sessionize_native result on bounded input (complete mode emits every
    session; the batch twin's NTZ micros equal the stream's instant
    micros by construction)."""
    from twitter_social_triangle_mapreduce_spark.streaming import (
        sessionize_native,
        streaming_sessionize,
    )

    ev = st.read_events_stream(spark, SF_SMOKE)
    sink = run_to_completion(streaming_sessionize(ev), mode="complete")
    got = sorted(map(tuple, spark.table(sink).collect()))
    want = sorted(
        map(
            tuple,
            sessionize_native(load_table(spark, SF_SMOKE, "events"))
            .select("user_id", "sess_start_us", "n_events")
            .collect(),
        )
    )
    assert got == want


def test_streaming_json_source_reader_swap(spark, tmp_path):
    """The reader-swap claim, proven: the same sessionization operator
    consuming a JSON-lines stream (interchange format, raw ns ts) must
    produce the identical result as over the parquet stream / batch."""
    from twitter_social_triangle_mapreduce_spark.streaming import (
        read_events_stream_json,
        sessionize_native,
        streaming_sessionize,
    )

    from twitter_social_triangle_mapreduce_spark.sources.io import ntz_epoch_micros

    # materialize the interchange format: ts as raw ns-since-epoch longs
    # (derived TZ-free from the batch reader's NTZ wall clock — Spark 4.1
    # reads parquet TIMESTAMP(NANOS) natively as NTZ, so the old
    # bigint-passthrough read no longer exists)
    raw = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", (ntz_epoch_micros("ts") * 1000).cast("long")
    )
    json_dir = str(tmp_path / "events_json_stream")
    raw.write.mode("overwrite").json(json_dir)

    ev = read_events_stream_json(spark, json_dir)
    sink = run_to_completion(streaming_sessionize(ev), mode="complete")
    got = sorted(map(tuple, spark.table(sink).collect()))
    want = sorted(
        map(
            tuple,
            sessionize_native(load_table(spark, SF_SMOKE, "events"))
            .select("user_id", "sess_start_us", "n_events")
            .collect(),
        )
    )
    assert got == want


def test_streaming_path2_matches_batch(spark):
    ev = st.read_events_stream(spark, SF_SMOKE)
    static_edges = edges_from_events(spark, SF_SMOKE)
    sink = run_to_completion(
        st.streaming_path2_against_static(ev, static_edges), mode="complete"
    )
    got = {
        (r["src"]): r["new_path2"] for r in spark.table(sink).collect()
    }
    e1 = edges_from_events(spark, SF_SMOKE)
    batch = (
        e1.alias("a")
        .join(static_edges.alias("b"), F.col("a.dst") == F.col("b.src"))
        .where(F.col("a.src") != F.col("b.dst"))
        .groupBy(F.col("a.src").alias("src"))
        .agg(F.count(F.lit(1)).alias("new_path2"))
    )
    want = {r["src"]: r["new_path2"] for r in batch.collect()}
    assert got == want


def test_streaming_triangle_closures_matches_batch(spark):
    ev = st.read_events_stream(spark, SF_SMOKE)
    static_edges = edges_from_events(spark, SF_SMOKE)
    sink = run_to_completion(
        st.streaming_triangle_closures(ev, static_edges), mode="append"
    )
    got = sum(r["closures"] for r in spark.table(sink).collect())
    e = static_edges
    batch_total = (
        edges_from_events(spark, SF_SMOKE)
        .alias("n")
        .join(e.alias("h"), F.col("n.dst") == F.col("h.src"))
        .join(
            e.alias("c"),
            (F.col("h.dst") == F.col("c.src"))
            & (F.col("c.dst") == F.col("n.src")),
        )
        .where(F.col("n.src") != F.col("h.dst"))
        .count()
    )
    # append emits watermark-closed windows; all but the tail ~3h close
    assert 0 < got <= batch_total
    assert got >= batch_total * 0.8


def test_observed_quality_metrics_surface_in_progress(spark):
    """observe() metrics must appear in the streaming progress events
    and account for every input row (no second scan needed)."""
    ev = st.with_quality_metrics(st.read_events_stream(spark, SF_SMOKE))
    counted = ev.groupBy("event_type").count()
    name = "obs_" + __import__("uuid").uuid4().hex[:8]
    q = (
        counted.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    metrics = [
        p["observedMetrics"]["quality"]
        for p in q.recentProgress
        if "quality" in p.get("observedMetrics", {})
    ]
    assert metrics, "no observed metrics reported"
    total_rows = sum(m["n_rows"] for m in metrics)
    want = load_table(spark, SF_SMOKE, "events").count()
    assert total_rows == want
    assert all(m["n_null_value"] == 0 for m in metrics)


@pytest.mark.slow  # round-13 gate diet: probe-as-test
def test_streaming_stateful_running_counts(spark):
    ev = st.read_events_stream(spark, SF_SMOKE)
    sink = run_to_completion(
        st.streaming_user_running_counts(ev), mode="update"
    )
    rows = spark.table(sink).collect()
    assert rows, "stateful stream emitted nothing"
    # the final state per user must equal the batch count
    final = {}
    for r in rows:  # memory sink appends each update; last wins
        final[r["user_id"]] = max(
            final.get(r["user_id"], 0), r["n_events"]
        )
    want = {
        r["user_id"]: r["cnt"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert final == want


def test_streaming_incremental_rollup_equals_direct_state(spark, tmp_path):
    """The foreachBatch-maintained snapshot must equal the direct
    additive state over all events after the stream drains, with
    multiple micro-batches forcing at least one real merge."""
    from twitter_social_triangle_mapreduce_spark.operators.incremental import (
        additive_agg_state,
    )
    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        streaming_incremental_rollup,
    )

    from twitter_social_triangle_mapreduce_spark.sources.io import (
        ntz_epoch_micros,
    )

    # split the events over 4 JSON files and feed them one per trigger,
    # so the snapshot goes through several REAL merge rounds (a single
    # parquet file would collapse to one batch and never merge)
    raw = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", (ntz_epoch_micros("ts") * 1000).cast("long")
    )
    json_dir = str(tmp_path / "ev_json")
    raw.repartition(4).write.mode("overwrite").json(json_dir)
    ev_stream = st.read_events_stream_json(spark, json_dir)

    snap = str(tmp_path / "snapshot")
    q = streaming_incremental_rollup(
        ev_stream, snap, str(tmp_path / "ckpt")
    )
    q.awaitTermination(timeout=180)

    got = {
        r["user_id"]: (
            r["n_events"],
            r["sum_value"],
            r["min_value"],
            r["max_value"],
        )
        for r in st.read_rollup_snapshot(spark, snap).collect()
    }
    want = {
        r["user_id"]: (
            r["n_events"],
            r["sum_value"],
            r["min_value"],
            r["max_value"],
        )
        for r in additive_agg_state(
            load_table(spark, SF_SMOKE, "events")
        ).collect()
    }
    assert got == want


def test_incremental_rollup_checkpoint_resume_no_double_count(
    spark, tmp_path
):
    """Exactly-once across restarts: drain the stream, then add NEW
    files and restart with the SAME checkpoint — the snapshot must
    equal the direct state over everything, never double-counting the
    already-processed files."""
    from twitter_social_triangle_mapreduce_spark.operators.incremental import (
        additive_agg_state,
    )
    from twitter_social_triangle_mapreduce_spark.sources.io import (
        ntz_epoch_micros,
    )
    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        streaming_incremental_rollup,
    )

    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", (ntz_epoch_micros("ts") * 1000).cast("long")
    )
    first = ev.where(F.col("event_id") % 2 == 0)
    second = ev.where(F.col("event_id") % 2 != 0)
    json_dir = str(tmp_path / "feed")
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")

    first.repartition(2).write.mode("append").json(json_dir)
    q = streaming_incremental_rollup(
        st.read_events_stream_json(spark, json_dir), snap, ckpt
    )
    q.awaitTermination(timeout=120)
    mid = {
        r["user_id"]: r["n_events"]
        for r in st.read_rollup_snapshot(spark, snap).collect()
    }
    assert sum(mid.values()) == first.count()

    # "restart": new files arrive, same checkpoint
    second.repartition(2).write.mode("append").json(json_dir)
    q2 = streaming_incremental_rollup(
        st.read_events_stream_json(spark, json_dir), snap, ckpt
    )
    q2.awaitTermination(timeout=120)

    got = {
        r["user_id"]: (
            r["n_events"], r["sum_value"], r["min_value"], r["max_value"]
        )
        for r in st.read_rollup_snapshot(spark, snap).collect()
    }
    want = {
        r["user_id"]: (
            r["n_events"], r["sum_value"], r["min_value"], r["max_value"]
        )
        for r in additive_agg_state(
            load_table(spark, SF_SMOKE, "events")
        ).collect()
    }
    assert got == want


def test_fold_rollup_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is only at-least-once: a batch whose fold committed
    but whose CHECKPOINT commit was lost gets replayed with the same
    batch_id on restart. The fold must skip it — never double-count."""
    from twitter_social_triangle_mapreduce_spark.operators.incremental import (
        additive_agg_state,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    b0 = ev.where(F.col("event_id") % 2 == 0)
    b1 = ev.where(F.col("event_id") % 2 != 0)
    snap = str(tmp_path / "snapshot")

    st.fold_rollup_batch(b0, 0, snap)
    st.fold_rollup_batch(b1, 1, snap)
    want = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in st.read_rollup_snapshot(spark, snap).collect()
    }
    # replay both batches (same ids) — state must not move
    st.fold_rollup_batch(b0, 0, snap)
    st.fold_rollup_batch(b1, 1, snap)
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in st.read_rollup_snapshot(spark, snap).collect()
    }
    assert got == want
    direct = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in additive_agg_state(ev).collect()
    }
    assert got == direct


def test_fold_rollup_batch_aborted_write_recovers(spark, tmp_path):
    """A crash mid-write leaves a version directory WITHOUT the commit
    marker: readers must keep serving the previous committed state, and
    the replayed batch must fold cleanly over the half-written junk."""
    import os

    from twitter_social_triangle_mapreduce_spark.operators.incremental import (
        additive_agg_state,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    b0 = ev.where(F.col("event_id") % 2 == 0)
    b1 = ev.where(F.col("event_id") % 2 != 0)
    snap = str(tmp_path / "snapshot")

    st.fold_rollup_batch(b0, 0, snap)
    committed = {
        r["user_id"]: r["n_events"]
        for r in st.read_rollup_snapshot(spark, snap).collect()
    }

    # simulate a crash DURING batch 1's write: parquet files exist but
    # the _APPLIED marker was never created
    aborted = str(tmp_path / "snapshot" / f"v_{1:020d}")
    b1.limit(3).write.mode("overwrite").parquet(aborted)
    marker = os.path.join(aborted, st.streams.ROLLUP_APPLIED_MARKER)
    assert not os.path.exists(marker)

    # reader still serves the batch-0 state
    assert st.rollup_committed_versions(spark, snap) == [0]
    still = {
        r["user_id"]: r["n_events"]
        for r in st.read_rollup_snapshot(spark, snap).collect()
    }
    assert still == committed

    # the replay of batch 1 overwrites the junk and commits
    st.fold_rollup_batch(b1, 1, snap)
    assert st.rollup_committed_versions(spark, snap) == [0, 1]
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in st.read_rollup_snapshot(spark, snap).collect()
    }
    direct = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in additive_agg_state(ev).collect()
    }
    assert got == direct


def test_fold_rollup_prunes_old_versions(spark, tmp_path):
    """Version GC keeps the newest keep_versions committed snapshots and
    never the one currently being served."""
    ev = load_table(spark, SF_SMOKE, "events")
    snap = str(tmp_path / "snapshot")
    for i in range(4):
        st.fold_rollup_batch(
            ev.where(F.col("event_id") % 4 == i), i, snap
        )
    assert st.rollup_committed_versions(spark, snap) == [2, 3]
