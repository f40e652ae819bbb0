#!/usr/bin/env python
"""1M-vector scale point for the STANDALONE semantic entry points
(round 8, r7 verdict item 1's done-criterion): round 7 measured the
fixed bits=8 default as the n²·bands/2^(bits+1) quadratic regime — one
stage of 44 tasks × ~1000 s, aborted past 35 minutes — and fixed it
only inside the capstone. Round 8 makes the corpus-derived width
(``lsh_bits_for``) the DEFAULT; this probe demonstrates the fix where
the failure was measured: calling ``semantic_dedup_clusters(emb)`` and
``semantic_decontaminate(train, eval)`` DIRECTLY, no explicit ``bits``,
at 1M vectors, and printing wall seconds + shuffle bytes + planted
verdict counts as one JSON line per entry (recorded in BASELINE.md).

Corpus: the clustered generator from embedding_scale_probe
(members-sized planted cosine-near-dup clusters), MATERIALIZED to
parquet first so scan stats are honest.

Usage: python scripts/semantic_standalone_scale_probe.py [n]
(default n=1000000)
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
from twitter_social_triangle_mapreduce_spark.operators import similarity  # noqa: E402
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(
        app_name="semantic-standalone-scale-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    acct = ShuffleAccounting(spark)
    tmp = tempfile.mkdtemp(prefix="semstandalone_probe_")
    try:
        clustered_embeddings(spark, n).write.mode("overwrite").parquet(
            f"{tmp}/embeddings"
        )
        emb = spark.read.parquet(f"{tmp}/embeddings")

        # 1. semantic_dedup_clusters(emb) — default knobs only
        w0, r0 = acct.snapshot()
        t0 = time.perf_counter()
        clusters = similarity.semantic_dedup_clusters(emb, min_sim_e4=9900)
        dropped = clusters.where("is_canonical = 0").count()
        wall = time.perf_counter() - t0
        w1, r1 = acct.snapshot()
        print(
            json.dumps(
                {
                    "entry": "semantic_dedup_clusters",
                    "n_vectors": n,
                    "bits": "default(derived)",
                    "wall_sec": round(wall, 1),
                    "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
                    "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
                    "semantic_dups_dropped": dropped,
                }
            ),
            flush=True,
        )

        # 2. semantic_decontaminate(train, eval) — every 1000th vector
        # plays the eval set (eval stays small relative to train, the
        # operator's documented shape)
        train = emb.where("vec_id % 1000 <> 0")
        ev = emb.where("vec_id % 1000 = 0").select(
            (F.col("vec_id")).alias("vec_id"), "embedding"
        )
        w0, r0 = acct.snapshot()
        t0 = time.perf_counter()
        res = similarity.semantic_decontaminate(train, ev, min_sim_e4=9900)
        contaminated = res.where("contaminated = 1").count()
        wall = time.perf_counter() - t0
        w1, r1 = acct.snapshot()
        print(
            json.dumps(
                {
                    "entry": "semantic_decontaminate",
                    "n_train": n - n // 1000,
                    "n_eval": n // 1000,
                    "bits": "default(derived)",
                    "wall_sec": round(wall, 1),
                    "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
                    "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
                    "contaminated": contaminated,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
