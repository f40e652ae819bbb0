#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query medians.

Protocol (BASELINE.md): per query, 1 discarded warm-up run (JVM/codegen
warm-up) then median of 3 timed runs; each run executes the full plan into
the noop sink (no driver-side collection cost)."""

from __future__ import annotations

import hashlib
import json
import os
import re
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


def plan_digest(df) -> str:
    """8-hex digest of the optimized plan with expression ids normalized —
    stable across sessions, changes iff the plan shape/expressions change.
    Lets a round-over-round timing delta be attributed: same digest →
    machine noise; new digest → a real plan change to inspect."""
    s = df._jdf.queryExecution().optimizedPlan().toString()
    return hashlib.md5(re.sub(r"#\d+", "#", s).encode()).hexdigest()[:8]


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
    plans: dict[str, str] = {}
    for name in HEADLINE:
        fn = queries[name]
        plans[name] = plan_digest(fn(spark, sf_dir))
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
                "plans": plans,
            }
        )
    )


if __name__ == "__main__":
    main()
