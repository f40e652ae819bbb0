#!/usr/bin/env python
"""Price the Count–Min sketch beyond testdata (round 11): a 10M-token
deterministic corpus (1M docs × 10 tokens — ~12% of mass on 10 heavy
tokens, the rest a ~1M-distinct uniform tail), generated JVM-side like
the other scale probes (no RNG, no driver data).

Reports one JSON line per question:
1. **Build cost**: sketch wall + shuffle write/read MB. The claim under
   test is that the exchange is sketch-sized (≤ depth×width counters
   per map partition), not corpus-sized — the shuffle row should be
   KB while the corpus is hundreds of MB.
2. **Estimate accuracy**: CMS estimates vs exact counts for the 10
   heavy tokens and 10 rare ones. The theoretical ceiling is
   est ≤ true + 2N/width w.h.p.; the interesting measured figure is
   how far UNDER the ceiling the min-over-depth estimator lands on a
   skewed corpus.

Usage: python scripts/cms_scale_probe.py [n_docs]
(default 1000000; results recorded in BASELINE.md)
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

from twitter_social_triangle_mapreduce_spark.operators import (  # noqa: E402
    sketches,
)
from twitter_social_triangle_mapreduce_spark.operators.dedup import (  # noqa: E402
    tokens,
)
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402

TOKENS_PER_DOC = 10


def skewed_docs(spark, n_docs: int):
    """doc_id, text — per token slot: hash-derived draw; ~12% of slots
    land on one of 10 heavy tokens (h0..h9), the rest on a ~n_docs-wide
    uniform tail (t<k>)."""
    slot = (
        "transform(sequence(0, {m}), s -> "
        " CASE WHEN pmod(hash(id * 31 + s), 100) < 12"
        "      THEN concat('h', pmod(hash(id * 7 + s), 10))"
        "      ELSE concat('t', pmod(hash(id * 13 + s), {tail}))"
        " END)"
    ).format(m=TOKENS_PER_DOC - 1, tail=max(n_docs, 1000))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(f"array_join({slot}, ' ')").alias("text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(
        app_name="cms-scale-probe",
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

    tmp = tempfile.mkdtemp(prefix="cms_probe_")
    try:
        # parquet round-trip: honest input stats, and the generation
        # cost stays out of the sketch timing
        skewed_docs(spark, n_docs).write.mode("overwrite").parquet(tmp)
        docs = spark.read.parquet(tmp)
        n_tokens = n_docs * TOKENS_PER_DOC

        w0, r0 = acct.snapshot()
        t0 = time.time()
        sketch = sketches.token_count_sketch(docs)
        counters = sketch.collect()  # <= depth x width rows, terminal
        wall = time.time() - t0
        w1, r1 = acct.snapshot()
        print(
            json.dumps(
                {
                    "metric": "cms_build",
                    "n_tokens": n_tokens,
                    "wall_sec": round(wall, 2),
                    "counter_rows": len(counters),
                    "shuffle_write_mb": round((w1 - w0) / 1e6, 3),
                    "shuffle_read_mb": round((r1 - r0) / 1e6, 3),
                    "corpus_parquet_mb": round(
                        sum(
                            f.stat().st_size
                            for f in os.scandir(tmp)
                            if f.is_file()
                        )
                        / 1e6,
                        1,
                    ),
                }
            ),
            flush=True,
        )

        probe_toks = [f"h{i}" for i in range(10)] + [
            f"t{i}" for i in range(10)
        ]
        probes = spark.createDataFrame(
            [(t,) for t in probe_toks], "tok string"
        )
        sketch_df = spark.createDataFrame(counters, sketch.schema)
        est = {
            r["tok"]: r["est"]
            for r in sketches.cms_estimate(sketch_df, probes).collect()
        }
        true = {
            r["tok"]: r["cnt"]
            for r in tokens(docs)
            .join(F.broadcast(probes), "tok")
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        ceiling = 2 * n_tokens / sketches.CMS_WIDTH
        overs = {t: est[t] - true.get(t, 0) for t in probe_toks}
        print(
            json.dumps(
                {
                    "metric": "cms_estimates",
                    "n_tokens": n_tokens,
                    "heavy_true_min": min(true[f"h{i}"] for i in range(10)),
                    "heavy_over_max": max(overs[f"h{i}"] for i in range(10)),
                    "rare_true_max": max(
                        true.get(f"t{i}", 0) for i in range(10)
                    ),
                    "rare_over_max": max(overs[f"t{i}"] for i in range(10)),
                    "ceiling_2n_over_width": int(ceiling),
                    "all_overestimates_nonneg": all(
                        v >= 0 for v in overs.values()
                    ),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
