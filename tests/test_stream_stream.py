"""Stream-stream self-join: both path-2 edges arrive on the stream; the
bounded event-time condition lets Spark expire join state. Converged
availableNow output must equal the batch join with the same time
predicate."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from twitter_social_triangle_mapreduce_spark import streaming as st
from twitter_social_triangle_mapreduce_spark.sources.io import load_table

from conftest import SF_SMOKE


def test_stream_stream_path2_matches_batch(spark):
    left = st.read_events_stream(spark, SF_SMOKE)
    right = st.read_events_stream(spark, SF_SMOKE)
    joined = st.streaming_path2_stream_stream(left, right)
    name = "ss_" + uuid.uuid4().hex[:8]
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)
    got = spark.table(name).count()

    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    edge = lambda i: ev.select(  # noqa: E731
        F.col("user_id").alias(f"src{i}"),
        ((F.col("user_id") * 37 + F.col("event_id") * 11 + 7) % 200).alias(
            f"dst{i}"
        ),
        F.col("ts").alias(f"ts{i}"),
    )
    want = (
        edge(1)
        .join(
            edge(2),
            (F.col("dst1") == F.col("src2"))
            & (F.col("src1") != F.col("dst2"))
            & (
                F.col("ts2")
                >= F.col("ts1") - F.expr("INTERVAL 30 minutes")
            )
            & (
                F.col("ts2")
                <= F.col("ts1") + F.expr("INTERVAL 30 minutes")
            ),
        )
        .count()
    )
    assert got == want
    assert got > 0
