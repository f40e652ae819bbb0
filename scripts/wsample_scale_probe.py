#!/usr/bin/env python
"""Price weighted_sample beyond testdata (round 11): 10M rows, 20
groups, keep 5 per group. The claim under test is the WindowGroupLimit
pre-reduction: the rank filter is pushed below the exchange, so each
map task forwards at most n rows per group and the shuffle carries
maps × groups × n sample candidates — never the corpus.

Usage: python scripts/wsample_scale_probe.py [n_rows]
(default 10000000; results recorded in BASELINE.md)
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

from twitter_social_triangle_mapreduce_spark.operators.sampling import (  # noqa: E402
    weighted_sample,
)
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(
        app_name="wsample-scale-probe",
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

    tmp = tempfile.mkdtemp(prefix="ws_probe_")
    try:
        # deterministic corpus: 20 sources, hash-derived weights 1..1000
        spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), F.pmod(F.hash("id"), F.lit(20))).alias(
                "source"
            ),
            (F.pmod(F.hash(F.col("id") * 31), F.lit(1000)) + 1).alias("w"),
        ).write.mode("overwrite").parquet(tmp)
        docs = spark.read.parquet(tmp)

        w0, r0 = acct.snapshot()
        t0 = time.time()
        got = weighted_sample(
            docs, key="doc_id", weight="w", n=5, by="source"
        ).collect()
        wall = time.time() - t0
        w1, r1 = acct.snapshot()
        plan = weighted_sample(
            docs, key="doc_id", weight="w", n=5, by="source"
        )._jdf.queryExecution().executedPlan().toString()
        print(
            json.dumps(
                {
                    "metric": "weighted_sample",
                    "n_rows": n,
                    "groups": 20,
                    "keep_per_group": 5,
                    "sampled": len(got),
                    "wall_sec": round(wall, 2),
                    "shuffle_write_mb": round((w1 - w0) / 1e6, 3),
                    "shuffle_read_mb": round((r1 - r0) / 1e6, 3),
                    "window_group_limit_in_plan": "WindowGroupLimit" in plan,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
