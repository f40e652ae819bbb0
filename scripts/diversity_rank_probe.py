#!/usr/bin/env python
"""Straggler probe for the diversity-sample rank (round-6 self-review
fix): ``cluster_balanced_sample`` ranks per IVF cell, and a window
partitioned by ``cell`` ALONE concentrates each cell's whole
membership in ONE task — k unsplittable sorts for the corpus (Spark
cannot split a window partition, so no AQE knob helps). The shipped
form decomposes the rank across md5-prefix buckets (k x 256 window
partitions) plus a tiny prefix-summed offset relation.

This probe measures both arms on the SAME deterministic 1M-vector
clustered corpus (reusing embedding_scale_probe's JVM-side generator)
and reports the heaviest-shuffle-read stage's task spread: the
cell-only arm must show ~n/k max task records with most shuffle
partitions empty; the bucketed arm must spread the same bytes across
every partition. One arm per invocation (fresh JVM per measurement):

  python scripts/diversity_rank_probe.py [n] cellonly|bucketed|central

Prints ONE JSON line; results recorded in BASELINE.md. The ``central``
arm measures the proximity-ranked variant (bucketed top-k
pre-reduction over the full-cosine score) on the same corpus.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from embedding_scale_probe import clustered_embeddings  # noqa: E402
from twitter_social_triangle_mapreduce_spark.operators import (  # noqa: E402
    similarity,
)
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402

PER_CELL = 50


def cell_only_sample(emb, per_cell: int):
    """The REJECTED form: one window partitioned by cell alone —
    kept here only as the probe's comparison arm."""
    cells = similarity.ivf_cells(emb)
    w = Window.partitionBy("cell").orderBy(
        F.md5(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc()
    )
    return (
        cells.withColumn("__rn", F.row_number().over(w))
        .select(
            "vec_id",
            "cell",
            (F.col("__rn") <= per_cell).cast("long").alias("keep"),
        )
    )


def heaviest_stage(spark) -> dict:
    """Task spread of the stage with the largest shuffle read (the
    exchange feeding the rank window — where splittability shows)."""
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    s = max(stages, key=lambda x: x["shuffleReadBytes"])
    out = {
        "stage_read_mb": round(s["shuffleReadBytes"] / 1e6, 2),
        "n_tasks": s["numCompleteTasks"],
    }
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages/"
            f"{s['stageId']}/{s['attemptId']}/taskSummary"
            "?quantiles=0.0,0.5,1.0"
        ) as r:
            q = json.load(r)
        rt = q["executorRunTime"]
        rr = q["shuffleReadMetrics"]["readRecords"]
        out["task_runtime_ms_med_max"] = [rt[1], rt[2]]
        out["task_read_records_med_max"] = [int(rr[1]), int(rr[2])]
    except Exception as e:  # endpoint shape drift: report, don't die
        out["task_summary_err"] = str(e)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    arm = sys.argv[2] if len(sys.argv) > 2 else "bucketed"
    spark = get_spark(
        app_name=f"diversity-rank-{arm}",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            # keep partition counts comparable across arms
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = clustered_embeddings(spark, n)
    if arm == "cellonly":
        fn = cell_only_sample
    elif arm == "central":
        def fn(e, q):
            return similarity.cluster_balanced_sample(
                e, q, rank_by="central"
            )
    else:
        fn = similarity.cluster_balanced_sample
    t0 = time.time()
    kept = (
        fn(emb, PER_CELL)
        .agg(
            F.sum("keep").alias("kept"),
            F.count(F.lit(1)).alias("rows"),
        )
        .collect()[0]
    )
    wall = time.time() - t0
    rec = {
        "arm": arm,
        "n": n,
        "kept": kept["kept"],
        "rows": kept["rows"],
        "wall_s": round(wall, 2),
        **heaviest_stage(spark),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
