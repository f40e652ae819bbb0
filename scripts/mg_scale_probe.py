#!/usr/bin/env python
"""Price the vectorized Misra-Gries heavy-hitter pass at 10M tokens
(round 12, r11 verdict item 4): the candidate pass previously walked
every token through interpreted Python inside mapInPandas; it now
pre-reduces each Arrow batch with value_counts() and folds only the
vocabulary-sized (token, count) pairs. Same corpus generator as
cms_scale_probe (1M docs x 10 tokens, ~12% of mass on 10 heavy
tokens, ~1M-distinct uniform tail). One JSON line per run:
wall + shuffle bytes + output row count for heavy_hitter_tokens."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from twitter_social_triangle_mapreduce_spark.operators import (  # noqa: E402
    sketches,
)
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402

from cms_scale_probe import TOKENS_PER_DOC, skewed_docs  # noqa: E402


#: capacity for the probe: the planted heavies carry ~1.2% of the mass
#: each (12% over 10 tokens), so the N/k threshold must sit below that
#: — k=100 puts it at 1%, and the true-positive set is exactly h0..h9
PROBE_CAPACITY = 100


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(
        app_name="mg-scale-probe",
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

    tmp = tempfile.mkdtemp(prefix="mg_probe_")
    try:
        skewed_docs(spark, n_docs).write.mode("overwrite").parquet(tmp)
        docs = spark.read.parquet(tmp)

        w0, r0 = acct.snapshot()
        t0 = time.time()
        rows = sketches.heavy_hitter_tokens(docs, k=PROBE_CAPACITY).collect()
        wall = time.time() - t0
        w1, r1 = acct.snapshot()
        print(
            json.dumps(
                {
                    "metric": "mg_heavy_hitters",
                    "n_tokens": n_docs * TOKENS_PER_DOC,
                    "capacity": PROBE_CAPACITY,
                    "n_heavy": len(rows),
                    "wall_sec": round(wall, 2),
                    "shuffle_write_mb": round((w1 - w0) / 1e6, 3),
                    "shuffle_read_mb": round((r1 - r0) / 1e6, 3),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
