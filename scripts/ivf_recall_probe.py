#!/usr/bin/env python
"""Recall@k probe for the IVF ANN path (round-5 verdict item 1): how
much of the EXACT top-k (``ann_topk_bruteforce``) does each bucketed
variant recover, and what does the trained codebook buy over the
first-k-vectors stand-in?

recall@k = |approx∩exact| / |exact| over the (qid, nid) pairs of the
5 standard query vectors, k=3. Deterministic (no RNG anywhere), so the
numbers recorded in BASELINE.md are reproducible bit-for-bit.

Usage: python scripts/ivf_recall_probe.py [sf_dir]   (default sf0.1)
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitter_social_triangle_mapreduce_spark.operators import similarity  # noqa: E402
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402
from twitter_social_triangle_mapreduce_spark.sources.io import load_table  # noqa: E402


def pairs(df) -> set[tuple[int, int]]:
    return {(r["qid"], r["nid"]) for r in df.collect()}


def scanned_fraction(emb, centroids, nprobe: int, n_queries: int = 5) -> float:
    """Mean fraction of the corpus each query's probed cells cover —
    the COST axis recall must be read against: a degenerate codebook
    (e.g. the first-k-vectors stand-in on unclustered data) can put
    most of the corpus in one cell, making its 'recall' near-brute-
    force at near-brute-force cost."""
    from pyspark.sql import functions as F

    ranked = similarity._centroid_ranked(emb, centroids=centroids)
    sizes = {
        r["cell"]: r["n"]
        for r in ranked.where(F.col("rn") == 1)
        .groupBy(F.col("cid").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(sizes.values())
    probes = ranked.where(
        (F.col("vec_id") < n_queries) & (F.col("rn") <= nprobe)
    ).collect()
    per_q: dict[int, int] = {}
    for r in probes:
        per_q[r["vec_id"]] = per_q.get(r["vec_id"], 0) + sizes.get(r["cid"], 0)
    return sum(per_q.values()) / (len(per_q) * total)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ivf-recall-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    exact = pairs(similarity.ann_topk_bruteforce(emb))
    trained = similarity.train_ivf_centroids(emb)
    variants = {
        "ivf_untrained_nprobe1": similarity.ann_topk_ivf(emb),
        "ivf_untrained_nprobe2": similarity.ann_topk_ivf(emb, nprobe=2),
        "ivf_trained_nprobe1": similarity.ann_topk_ivf(
            emb, centroids=trained
        ),
        "ivf_trained_nprobe2": similarity.ann_topk_ivf(
            emb, nprobe=2, centroids=trained
        ),
        "lsh_topk": similarity.ann_topk_lsh(emb),
    }
    recalls = {
        name: round(len(pairs(df) & exact) / len(exact), 4)
        for name, df in variants.items()
    }
    frac = {
        "ivf_untrained_nprobe1": scanned_fraction(emb, None, 1),
        "ivf_untrained_nprobe2": scanned_fraction(emb, None, 2),
        "ivf_trained_nprobe1": scanned_fraction(emb, trained, 1),
        "ivf_trained_nprobe2": scanned_fraction(emb, trained, 2),
    }
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "k": 3,
                "n_queries": 5,
                "n_exact_pairs": len(exact),
                "recall": recalls,
                "scanned_fraction": {
                    k2: round(v, 4) for k2, v in frac.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
