#!/usr/bin/env python
"""Price the full compression stack (round 11): JL projection (64→16,
4× fewer dims) COMPOSED with symmetric int8 quantization (4× fewer
bytes per element) — 16× smaller vectors end to end — on the 1M
clustered corpus with planted near-dup pairs. The question a 100 TB
deployment asks: how much exact-scoring quality survives when both
compressions stack, and what does scoring cost at each tier?

One JSON line per tier: partner-recall@1 over 200 queries (the planted
near-dup must stay rank-1) and the median scoring wall.

Usage: python scripts/compression_stack_probe.py [n]
(default 1000000; results recorded in BASELINE.md)
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


def recall_and_wall(spark, fn, n_queries: int, runs: int = 3):
    top1 = {
        r["qid"]: r["nid"] for r in fn(n_queries=n_queries, k=1).collect()
    }
    partner = {q: q + 1 if q % 2 == 0 else q - 1 for q in top1}
    rec = sum(1 for q in top1 if top1[q] == partner[q]) / len(top1)
    walls = []
    for _ in range(runs):
        t0 = time.time()
        fn(n_queries=n_queries, k=3).write.format("noop").mode(
            "overwrite"
        ).save()
        walls.append(time.time() - t0)
    return round(rec, 4), round(statistics.median(walls), 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_queries = 200
    spark = get_spark(app_name="compression-stack-probe")
    spark.sparkContext.setLogLevel("ERROR")

    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="stack_probe_")
    try:
        clustered_embeddings(spark, n).write.mode("overwrite").parquet(tmp)
        raw = spark.read.parquet(tmp)
        ptmp = os.path.join(tmp, "_proj")
        similarity.project_embeddings(raw, out_dims=16).write.mode(
            "overwrite"
        ).parquet(ptmp)
        proj = spark.read.parquet(ptmp)

        tiers = {
            "raw_float_64d": lambda **kw: similarity.ann_topk_bruteforce(
                raw, **kw
            ),
            "projected_16d": lambda **kw: similarity.ann_topk_bruteforce(
                proj, **kw
            ),
            "projected_16d_int8": lambda **kw: similarity.ann_topk_quantized(
                proj, **kw
            ),
        }
        for name, fn in tiers.items():
            rec, wall = recall_and_wall(spark, fn, n_queries)
            print(
                json.dumps(
                    {
                        "metric": "compression_stack",
                        "tier": name,
                        "n": n,
                        "queries": n_queries,
                        "partner_recall_at_1": rec,
                        "topk_wall_sec": wall,
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
