"""foreachBatch incremental dedup: a stream of documents joined per
micro-batch against static corpus MinHash bands, appended to parquet with
exactly-once checkpointing. The converged output must equal the batch
candidate-pair computation."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from twitter_social_triangle_mapreduce_spark.operators import dedup
from twitter_social_triangle_mapreduce_spark.sources.io import load_table
from twitter_social_triangle_mapreduce_spark.streaming import (
    streaming_dedup_against_corpus,
)

from conftest import SF_SMOKE

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)


def test_dedup_within_watermark_suppresses_stream_duplicates(spark, tmp_path):
    """Native dropDuplicatesWithinWatermark: a stream carrying each
    event twice must emit each event_id exactly once (duplicates arrive
    well inside the watermark horizon), converging to the batch
    distinct."""
    import uuid

    from pyspark.sql import functions as F

    from twitter_social_triangle_mapreduce_spark.sources.io import (
        ntz_epoch_micros,
    )
    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        EVENTS_STREAM_SCHEMA,
        streaming_dedup_within_watermark,
        ts_ltz_from_nanos,
    )

    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", (ntz_epoch_micros("ts") * 1000).cast("long")
    )
    doubled = ev.unionByName(ev)
    json_dir = str(tmp_path / "dup_stream")
    doubled.write.mode("overwrite").json(json_dir)

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .json(json_dir)
        .withColumn("ts", ts_ltz_from_nanos("ts"))
    )
    name = "dd_" + uuid.uuid4().hex[:8]
    q = (
        streaming_dedup_within_watermark(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    got = spark.table(name).groupBy("event_id").count()
    assert got.where(F.col("count") > 1).count() == 0, "duplicate emitted"
    assert got.count() == ev.count(), "an event_id was lost"


def test_streaming_dedup_matches_batch(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    corpus_bands = dedup.minhash_bands(docs)

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_SMOKE)
    )
    out = str(tmp_path / "matches")
    q = streaming_dedup_against_corpus(
        stream, corpus_bands, out, str(tmp_path / "ckpt")
    )
    q.awaitTermination(timeout=120)

    got = {
        (r["new_doc_id"], r["corpus_doc_id"])
        for r in spark.read.parquet(out).collect()
    }
    # batch ground truth: band-bucket collisions, both orientations,
    # self excluded (the stream re-reads the same corpus)
    pairs = dedup.minhash_candidate_pairs(docs)
    want = set()
    for r in pairs.collect():
        want.add((r["doc_a"], r["doc_b"]))
        want.add((r["doc_b"], r["doc_a"]))
    assert got == want
    assert got, "no candidate matches found"
