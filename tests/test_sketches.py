"""Heavy-hitter sketch (operators/sketches.py): the MG-candidates +
exact-recount pipeline must equal the direct threshold query on
adversarial distributions, and candidate generation must stay bounded
per partition (the memory claim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_social_triangle_mapreduce_spark.operators import sketches
from twitter_social_triangle_mapreduce_spark.operators.dedup import tokens


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_heavy_hitters_exact_on_skewed_corpus(spark):
    """2 dominant tokens drowned in a sea of singletons, spread over
    many partitions: output must equal the direct HAVING query."""
    texts = []
    for i in range(200):
        row = [f"rare{i}_{j}" for j in range(20)]
        if i % 2 == 0:
            row += ["hot"] * 30
        if i % 5 == 0:
            row += ["warm"] * 40
        texts.append(" ".join(row))
    docs = _mk_docs(spark, texts).repartition(16)
    k = 50
    got = {
        r["tok"]: r["cnt"]
        for r in sketches.heavy_hitter_tokens(docs, k=k).collect()
    }
    toks = tokens(docs)
    n = toks.count()
    want = {
        r["tok"]: r["cnt"]
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * k > F.lit(n))
        .collect()
    }
    assert want, "fixture produced no heavy hitters"
    assert got == want


def test_mg_candidates_bounded_per_partition(spark):
    """Each partition emits at most k candidate rows no matter how many
    distinct tokens it holds."""
    texts = [" ".join(f"t{i}_{j}" for j in range(200)) for i in range(50)]
    docs = _mk_docs(spark, texts).repartition(4)
    k = 10
    cand_counts = (
        tokens(docs)
        .select("tok")
        .mapInPandas(sketches._mg_candidates(k), "tok string")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert cand_counts
    assert all(r["count"] <= k for r in cand_counts)


def test_heavy_hitters_empty_and_uniform_inputs(spark):
    """No token exceeds N/k on a uniform corpus -> empty result; empty
    corpus -> empty result (no division-by-zero / null total)."""
    uniform = _mk_docs(
        spark, [" ".join(f"u{i}_{j}" for j in range(30)) for i in range(20)]
    )
    assert sketches.heavy_hitter_tokens(uniform, k=50).count() == 0
    empty = _mk_docs(spark, []).where(F.lit(False))
    assert sketches.heavy_hitter_tokens(empty, k=50).count() == 0
