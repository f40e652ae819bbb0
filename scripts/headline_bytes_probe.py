#!/usr/bin/env python
"""Per-query shuffle-byte measurement for the 12 HEADLINE bench queries
(round-5 verdict item 7: bytes are the headline gate — wall-clock on a
contended machine swings ±50% at identical plans, bytes are run-to-run
byte-identical). Runs every headline query TWICE in a fresh UI-enabled
session and prints both runs' shuffle-write bytes per query, so the
guard test can assert (a) determinism across runs and (b) a per-query
budget.

Usage: python scripts/headline_bytes_probe.py [sf_dir] — ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, ShuffleAccounting, run_once  # noqa: E402
from twitter_social_triangle_mapreduce_spark import registry  # noqa: E402
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="headline-bytes-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    acct = ShuffleAccounting(spark)
    queries = registry.all_queries()
    per_query: dict[str, list[int]] = {}
    for name in HEADLINE:
        fn = queries[name]
        run_once(fn(spark, sf_dir))  # warm-up (codegen, file listing)
        runs = []
        for _ in range(2):
            w0, _ = acct.snapshot()
            run_once(fn(spark, sf_dir))
            w1, _ = acct.snapshot()
            runs.append(w1 - w0)
        per_query[name] = runs
    print(json.dumps({"sf_dir": sf_dir, "write_bytes": per_query}))


if __name__ == "__main__":
    main()
