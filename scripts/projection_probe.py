#!/usr/bin/env python
"""Price the JL projection at 1M vectors (round 11): the testdata corpus
is near-isotropic (sub-noise top-k margins — see test_projection), so
this probe measures the projection where its contract actually bites,
on the CLUSTERED 1M corpus with planted near-dup pairs (within-cluster
cosine ≈ 0.9997, cross-cluster isotropic — the same generator the
banded-LSH scale series uses).

Three questions, one JSON line each:
1. **Preservation**: the projected cosine of every planted pair —
   min/p1/mean at out_dims 8/16/32. The JL claim is that HIGH-cosine
   structure survives compression; a near-dup screen thresholding the
   projected cosine keeps its recall iff p1 stays above the threshold.
2. **Ranking**: recall@1 of projected brute-force top-1 vs the planted
   partner over 200 query vectors — does the nearest neighbor survive
   the projection when a real margin exists?
3. **Speedup**: median wall of exact cosine top-k (200 queries × 1M
   corpus) on raw 64-dim vs projected 16-dim vectors — the
   dims/out_dims arithmetic reduction realized end-to-end, including
   the projection's own scan cost.

Usage: python scripts/projection_probe.py [n] (default 1000000;
results recorded in BASELINE.md)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from twitter_social_triangle_mapreduce_spark.operators import (  # noqa: E402
    similarity,
)
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402

from embedding_scale_probe import clustered_embeddings  # noqa: E402


def planted_pair_cosines(spark, emb, out_dims: int) -> dict:
    """Projected cosine over every planted (2i, 2i+1) pair."""
    proj = similarity.project_embeddings(emb, out_dims=out_dims)
    a = proj.where(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") / 2).cast("long").alias("pair"),
        F.col("embedding").alias("qe"),
    )
    b = proj.where(F.col("vec_id") % 2 == 1).select(
        ((F.col("vec_id") - 1) / 2).cast("long").alias("pair"),
        F.col("embedding").alias("ce"),
    )
    dot = similarity._dot("qe", "ce")
    qn = similarity._norm("qe")
    cn = similarity._norm("ce")
    stats = (
        a.join(b, "pair")
        .select((dot / (qn * cn)).alias("cos"))
        .agg(
            F.min("cos").alias("min"),
            F.expr("percentile_approx(cos, 0.01)").alias("p1"),
            F.avg("cos").alias("mean"),
        )
        .collect()[0]
    )
    return {
        "out_dims": out_dims,
        "min": round(stats["min"], 4),
        "p1": round(stats["p1"], 4),
        "mean": round(stats["mean"], 4),
    }


def topk_wall(spark, emb, n_queries: int, runs: int = 3) -> float:
    walls = []
    for _ in range(runs):
        t0 = time.time()
        similarity.ann_topk_bruteforce(
            emb, n_queries=n_queries, k=3
        ).write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    return round(statistics.median(walls), 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_queries = 200
    spark = get_spark(app_name="projection-probe")
    spark.sparkContext.setLogLevel("ERROR")

    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="proj_probe_")
    try:
        # parquet round-trip for honest join planning (see
        # embedding_scale_probe.probe)
        clustered_embeddings(spark, n).write.mode("overwrite").parquet(tmp)
        emb = spark.read.parquet(tmp)

        for od in (8, 16, 32):
            rec = planted_pair_cosines(spark, emb, od)
            rec.update({"n": n, "metric": "planted_pair_projected_cosine"})
            print(json.dumps(rec), flush=True)

        # ranking: does the planted partner stay top-1 after projection?
        exact1 = {
            r["qid"]: r["nid"]
            for r in similarity.ann_topk_bruteforce(
                emb, n_queries=n_queries, k=1
            ).collect()
        }
        proj_emb = similarity.project_embeddings(emb, out_dims=16)
        # materialize the projection once so the ranking and timing
        # measure scoring, not repeated projection of the corpus
        ptmp = os.path.join(tmp, "_projected")
        proj_emb.write.mode("overwrite").parquet(ptmp)
        proj_at_rest = spark.read.parquet(ptmp)
        proj1 = {
            r["qid"]: r["nid"]
            for r in similarity.ann_topk_bruteforce(
                proj_at_rest, n_queries=n_queries, k=1
            ).collect()
        }
        partner = {q: q + 1 if q % 2 == 0 else q - 1 for q in exact1}
        exact_hits = sum(1 for q in exact1 if exact1[q] == partner[q])
        proj_hits = sum(1 for q in proj1 if proj1[q] == partner[q])
        print(
            json.dumps(
                {
                    "metric": "planted_partner_recall_at_1",
                    "n": n,
                    "queries": n_queries,
                    "exact": round(exact_hits / n_queries, 4),
                    "projected_16": round(proj_hits / n_queries, 4),
                }
            ),
            flush=True,
        )

        # speedup: raw 64-dim vs at-rest projected 16-dim scoring
        raw_wall = topk_wall(spark, emb, n_queries)
        proj_wall = topk_wall(spark, proj_at_rest, n_queries)
        # and the all-in arm: project inline (no materialization) —
        # what a one-shot pipeline pays
        t0 = time.time()
        similarity.ann_topk_projected(
            emb, n_queries=n_queries, k=3, out_dims=16
        ).write.format("noop").mode("overwrite").save()
        inline_wall = round(time.time() - t0, 2)
        print(
            json.dumps(
                {
                    "metric": "topk_wall_sec",
                    "n": n,
                    "queries": n_queries,
                    "raw_64d": raw_wall,
                    "projected_16d_at_rest": proj_wall,
                    "projected_16d_inline": inline_wall,
                    "speedup_at_rest": round(raw_wall / proj_wall, 2)
                    if proj_wall
                    else None,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
