#!/usr/bin/env python
"""Price doc_unigram_logprob beyond testdata (round 11): the same
10M-token skewed corpus as the CMS probe. Unlike the sketch, this
operator's join is HONESTLY corpus-sized — the token stream shuffles
once for the vocabulary join and once for the per-document aggregate —
so the probe records that cost and the vocabulary-broadcast regime
boundary, rather than claiming a sketch-sized exchange it doesn't have.

Usage: python scripts/logprob_scale_probe.py [n_docs]
(default 1000000 — 10M tokens; results recorded in BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from twitter_social_triangle_mapreduce_spark.operators.text import (  # noqa: E402
    doc_unigram_logprob,
)
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402

from cms_scale_probe import skewed_docs  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(
        app_name="logprob-scale-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bench import ShuffleAccounting

    acct = ShuffleAccounting(spark)

    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="lp_probe_")
    try:
        skewed_docs(spark, n_docs).write.mode("overwrite").parquet(tmp)
        docs = spark.read.parquet(tmp)

        w0, r0 = acct.snapshot()
        t0 = time.time()
        scored = doc_unigram_logprob(docs)
        stats = scored.agg(
            F.count(F.lit(1)).alias("docs"),
            F.min("avg_lp_e6").alias("min_lp"),
            F.expr("percentile_approx(avg_lp_e6, 0.5)").alias("median_lp"),
            F.max("avg_lp_e6").alias("max_lp"),
        ).collect()[0]
        wall = time.time() - t0
        w1, r1 = acct.snapshot()
        print(
            json.dumps(
                {
                    "metric": "unigram_logprob",
                    "n_docs": n_docs,
                    "n_tokens": n_docs * 10,
                    "wall_sec": round(wall, 2),
                    "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
                    "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
                    "scored_docs": stats["docs"],
                    "avg_lp_e6_min": int(stats["min_lp"]),
                    "avg_lp_e6_median": int(stats["median_lp"]),
                    "avg_lp_e6_max": int(stats["max_lp"]),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
