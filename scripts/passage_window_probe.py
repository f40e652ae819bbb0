#!/usr/bin/env python
"""Passage-window width cost curve (round-5 verdict item 6): the
windows relation is the dominant shuffle of the substring-dedup family,
so measure — not assume — how its row count, wall time, and shuffle
bytes move with the width W on the testdata distribution.

On THIS corpus (sf0.1: 10–100 tokens/doc, mean 54) wider windows mean
FEWER rows (docs shorter than W emit nothing; longer docs emit
n_tokens−W+1), so cost falls with W. On a long-document corpus the row
count is ~corpus tokens for any W and the row WIDTH is constant (16-byte
digest regardless of W) — W then only moves the per-row md5 cost
linearly. Both regimes are visible from the numbers this prints.

Usage: python scripts/passage_window_probe.py [sf_dir] — ONE JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitter_social_triangle_mapreduce_spark.operators import passages  # noqa: E402
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402
from twitter_social_triangle_mapreduce_spark.sources.io import load_table  # noqa: E402


#: monotone accumulator (bench.ShuffleAccounting) — the raw
#: retained-stage sum can DECREASE under UI stage eviction
_ACCT = None


def shuffle_totals(spark) -> int:
    global _ACCT
    if _ACCT is None:
        from bench import ShuffleAccounting

        _ACCT = ShuffleAccounting(spark)
    return _ACCT.snapshot()[0]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="passage-window-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    out: dict[str, dict[str, float]] = {}
    for w in (8, 25, 50):
        n_windows = passages.passage_windows(docs, window=w).count()

        def run() -> float:
            t0 = time.perf_counter()
            passages.passage_cut_spans(docs, window=w).write.format(
                "noop"
            ).mode("overwrite").save()
            return time.perf_counter() - t0

        run()  # warm-up
        b0 = shuffle_totals(spark)
        times = [run() for _ in range(3)]
        b1 = shuffle_totals(spark)
        out[f"w{w}"] = {
            "n_windows": n_windows,
            "median_sec": round(statistics.median(times), 3),
            "shuffle_write_mb_per_run": round((b1 - b0) / 3 / 1e6, 2),
        }
    print(json.dumps({"sf_dir": sf_dir, "curve": out}))


if __name__ == "__main__":
    main()
