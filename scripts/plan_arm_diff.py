#!/usr/bin/env python
"""Which queries change PHYSICAL PLAN ARM between two scale factors?

Round 10, r9 verdict item 5 companion: the point of the sf1 gate is
that plan arms genuinely switch when the inputs grow 100× (broadcast
thresholds cross, AQE re-plans), and THAT is where Spark-vs-DuckDB
parity could silently diverge. This probe makes the switch visible:
for every registered query it captures the initial physical plan at
both sf dirs (planning only — nothing executes) and reports the
queries whose join/aggregate strategy mix changed.

Usage: python scripts/plan_arm_diff.py [sf_small] [sf_big] [--extra]
(defaults /root/testdata/sf0.01 /tmp/testdata_sf1; prints one JSON
line per changed query and a summary line at the end)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the strategy-bearing operators worth diffing; file counts and
#: partition numbers change trivially with scale, the ARM is what can
#: break parity
_ARMS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "ObjectHashAggregate",
    "SortAggregate",
    "BroadcastExchange",
)


def arm_counts(plan: str) -> dict[str, int]:
    out = {}
    for a in _ARMS:
        n = len(re.findall(rf"\b{a}\b", plan))
        if n:
            out[a] = n
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    include_extra = "--extra" in sys.argv[1:]
    sf_small = args[0] if args else "/root/testdata/sf0.01"
    sf_big = args[1] if len(args) > 1 else "/tmp/testdata_sf1"

    from twitter_social_triangle_mapreduce_spark.session import get_spark
    import __spark_entry__ as entry_mod
    from twitter_social_triangle_mapreduce_spark.registry import all_queries

    spark = get_spark(
        app_name="plan-arm-diff",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = (
        all_queries(include_extra=True) if include_extra
        else entry_mod.queries()
    )
    changed, same, failed = [], [], []
    for name, fn in sorted(qs.items()):
        arms = {}
        try:
            for label, sf in (("small", sf_small), ("big", sf_big)):
                df = fn(spark, sf)
                plan = df._jdf.queryExecution().executedPlan().toString()
                arms[label] = arm_counts(plan)
        except Exception as exc:  # planning-only failures surface loudly
            failed.append(name)
            print(json.dumps({"query": name, "error": str(exc)[:200]}))
            continue
        if arms["small"] != arms["big"]:
            changed.append(name)
            print(
                json.dumps(
                    {"query": name, "small": arms["small"], "big": arms["big"]}
                )
            )
        else:
            same.append(name)
    print(
        json.dumps(
            {
                "sf_small": sf_small,
                "sf_big": sf_big,
                "n_queries": len(qs),
                "n_changed": len(changed),
                "changed": changed,
                "n_failed": len(failed),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
