#!/usr/bin/env python
"""1M-document scale point for the FULL semantic capstone (round-7
verdict item 5): the semantic tier's stages each have measured 1M
numbers (embedding_scale_probe), but the end-to-end pipeline —
curate → near-dup → decontaminate → semantic-dup gate → pack → shards
— was benched only at sf0.1. This runs `prepare_training_corpus(...,
embeddings=...)` over a synthetic 1M-doc corpus and prints wall
seconds + shuffle bytes as ONE JSON line (recorded in BASELINE.md).

Corpus: deterministic, generated JVM-side and MATERIALIZED to parquet
before the run (honest scan stats — the range lineage's 8 B/row
estimate would let every join broadcast a corpus real deployments
shuffle; same rule as embedding_scale_probe):

- documents: distinct English-ish prose per doc (passes every curation
  gate by construction: >20 tokens, stopword-dense, unique hex token
  so exact-dup keeps all) — the pipeline's text tiers run at full
  width;
- embeddings: the clustered corpus from embedding_scale_probe
  (vec_id = doc_id, `members`-sized planted cosine-dup clusters), so
  the semantic gate drops ~half the corpus as semantic_dup — the gate
  does real work at 1M, not a pass-through.

Byte accounting: bench.ShuffleAccounting (monotone, eviction-proof).

Usage: python scripts/capstone_semantic_scale_probe.py [n] [cut]
(default n=1000000; `cut` also turns on the passage-cut arm)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import ShuffleAccounting  # noqa: E402
from scripts.embedding_scale_probe import clustered_embeddings  # noqa: E402
from twitter_social_triangle_mapreduce_spark.operators.corpus import (  # noqa: E402
    prepare_training_corpus,
)
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402


def synthetic_documents(spark, n: int, n_words: int = 24):
    """n distinct curation-passing documents, all JVM expressions.
    Every token is an independent hash-indexed draw from a hash-drawn
    vocabulary (~60 English stopwords + synthetic words), so documents
    are DIVERSE at the shingle level — a shared fixed template would
    make every band bucket corpus-sized and the near-dup join
    quadratic, which is a planted pathology, not a scale measurement.
    The trailing hex(hash) token guarantees uniqueness (exact-dup
    keeps all).

    Vocabulary size scales with the corpus as 200·(n/1e6)^(1/3)
    (round 8): the decontamination screen matches 3-gram windows, so a
    FIXED vocabulary saturates — at 10M docs the eval split's ~13M
    window draws cover the whole 200³ = 8M window space and every doc
    crosses the 20% threshold (kept = 0, measured), which is a
    GENERATOR artifact, not an engine property. The cube-root law
    holds eval coverage of the window space ~constant across scales;
    at n = 1M it is exactly the historical 200 words, so every prior
    recorded run is unchanged."""
    import math

    from twitter_social_triangle_mapreduce_spark.operators.text import (
        STOPWORDS,
    )

    v = max(200, math.ceil(200 * (n / 1_000_000) ** (1 / 3)))
    vocab = list(STOPWORDS)[:60] + [
        f"w{i:03d}" for i in range(v - 60)
    ]
    arr = "array(" + ",".join(f"'{w}'" for w in vocab) + ")"
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.expr(
                f"concat_ws(' ', transform(sequence(0, {n_words - 1}),"
                f" d -> element_at({arr},"
                f" CAST(pmod(hash(id * 37 + d), {len(vocab)}) + 1 AS INT))))"
            ),
            F.lower(F.hex(F.xxhash64(F.col("id") * 3 + 1))),
        ).alias("text"),
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if a.isdigit()]
    n = int(args[0]) if args else 1_000_000
    cut = "cut" in sys.argv[1:]
    spark = get_spark(
        app_name="capstone-semantic-scale-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    acct = ShuffleAccounting(spark)
    tmp = tempfile.mkdtemp(prefix="capsem_probe_")
    out = tempfile.mkdtemp(prefix="capsem_shards_")
    try:
        synthetic_documents(spark, n).write.mode("overwrite").parquet(
            f"{tmp}/documents"
        )
        clustered_embeddings(spark, n).write.mode("overwrite").parquet(
            f"{tmp}/embeddings"
        )
        docs = spark.read.parquet(f"{tmp}/documents")
        emb = spark.read.parquet(f"{tmp}/embeddings").select(
            F.col("vec_id").alias("vec_id"), "embedding"
        )
        ev = docs.where("doc_id % 17 = 0")
        w0, r0 = acct.snapshot()
        t0 = time.perf_counter()
        audit = prepare_training_corpus(
            docs, ev, out, cut_passages=cut, embeddings=emb
        )
        verdicts = {
            r["verdict"]: r["n"]
            for r in audit.groupBy("verdict")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        wall = time.perf_counter() - t0
        w1, r1 = acct.snapshot()
        n_shard_docs = spark.read.parquet(out).count()
        print(
            json.dumps(
                {
                    "n_docs": n,
                    "cut": cut,
                    "wall_sec": round(wall, 1),
                    "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
                    "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
                    "verdicts": verdicts,
                    "shard_docs": n_shard_docs,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
