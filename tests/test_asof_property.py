"""Property test for the as-of join: the union+window formulation must
equal a naive per-row 'latest right at-or-before left time' computation on
random inputs with duplicate keys, tied timestamps, and keys missing on
either side."""

from __future__ import annotations

import random

import pytest

from twitter_social_triangle_mapreduce_spark.operators.relational import asof_join


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_asof_join_matches_naive(spark, seed):
    rng = random.Random(seed)
    left = [
        (i, rng.randrange(6), rng.randrange(50)) for i in range(120)
    ]  # (lid, key, lt)
    right = [
        (rng.randrange(6), rng.randrange(50), rng.randrange(1000))
        for _ in range(80)
    ]  # (key, rt, rv)

    ldf = spark.createDataFrame(left, "lid long, k long, lt long")
    rdf = spark.createDataFrame(right, "k long, rt long, rv long")
    got = {
        r["lid"]: r["asof_val"]
        for r in asof_join(
            ldf, rdf, key="k", left_time="lt", right_time="rt", right_val="rv"
        ).collect()
    }

    def naive(key, lt):
        cands = [(rt, rv) for (k, rt, rv) in right if k == key and rt <= lt]
        return max(cands)[1] if cands else None

    want = {lid: naive(k, lt) for (lid, k, lt) in left}
    assert got == want


def test_minhash_bucket_pairs_equal_join_formulation(spark):
    """The bucket-local combination generator must produce exactly the
    pairs the (band, signature) self-join would."""
    from pyspark.sql import functions as F

    from twitter_social_triangle_mapreduce_spark.operators import dedup
    from twitter_social_triangle_mapreduce_spark.sources.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_candidate_pairs(docs).collect()
    }
    b = dedup.minhash_bands(docs)
    joined = (
        b.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    want = {(r["doc_a"], r["doc_b"]) for r in joined.collect()}
    assert got == want
