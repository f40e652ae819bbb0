#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query medians.

Protocol (BASELINE.md): per query, 1 discarded warm-up run (JVM/codegen
warm-up) then median of 3 timed runs; each run executes the full plan into
the noop sink (no driver-side collection cost)."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from twitter_social_triangle_mapreduce_spark import registry  # noqa: E402
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402

#: headline set: the four reference programs + the Job-1 intermediate +
#: one representative per extension family
HEADLINE = [
    "exact_cardinality",
    "approx_cardinality",
    "social_triangle_rs",
    "social_triangle_ordered",
    "triangle_replicated",
    "path2_enum",
    "dedup_minhash_pairs",
    "simhash",
    "ann_topk_bruteforce",
    "text_stats",
    "sessionize",
    "pricing_summary",
]

WARMUP_RUNS = 1
TIMED_RUNS = 3


def run_once(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(
        app_name="tstm-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = registry.all_queries()
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        for _ in range(WARMUP_RUNS):
            run_once(fn(spark, sf_dir))
        times = [run_once(fn(spark, sf_dir)) for _ in range(TIMED_RUNS)]
        per_query[name] = round(statistics.median(times), 4)

    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "median_wall_sec_total",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
