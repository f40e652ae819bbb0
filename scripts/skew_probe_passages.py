#!/usr/bin/env python
"""Adversarial skew probe for the window-hash join (round-5 verdict
item 3): passages.py claims AQE handles mega-duplicated boilerplate
keys — prove what actually happens with a fixture where ONE 8-token
window covers 50% of ALL corpus window occurrences (every doc = the
same boilerplate sentence + 1 unique token → 2 windows/doc, 1 hot).
A milder 10% share is measurably INVISIBLE at the byte level: the hot
partition's identical 40-byte rows lz4-compress to near nothing, so
both the stage metrics and AQE's byte-triggered split see an even
shuffle (measured: 4.5× row skew → even read bytes). 50% share is the
regime where the skew shows in records/bytes and the split can fire.

Regime note: at testdata scale the occurrences-back join broadcasts its
(small) dup_keys side, so the hot hash never skews a shuffle — the
exposure appears at corpus scale where collision survivors exceed the
broadcast threshold and the join becomes a shuffled SMJ whose hot
partition holds every occurrence of the boilerplate hash. The probe
forces that regime (autoBroadcastJoinThreshold=-1) and sizes the AQE
skew thresholds to the probe volume (the production defaults fire at
256 MB partitions; the mechanism is identical).

One arm per invocation (fresh JVM per measurement):
  python scripts/skew_probe_passages.py [n_docs] skew|noskew
Prints ONE JSON line: wall, the heaviest-shuffle-read stage's task
count (skew splits add tasks beyond shuffle.partitions) and its
max/median per-task shuffle read and runtime.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from twitter_social_triangle_mapreduce_spark.operators import passages  # noqa: E402
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402

BOILER = "please accept cookies to continue using this website"


def heaviest_stage(spark) -> dict:
    """Metrics of the stage with the largest shuffle read (the SMJ
    reading the raw wins exchange — where the hot key lands)."""
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
        rb = q["shuffleReadMetrics"]["readBytes"]
        rr = q["shuffleReadMetrics"]["readRecords"]
        out["task_runtime_ms_med_max"] = [rt[1], rt[2]]
        out["task_read_mb_med_max"] = [
            round(rb[1] / 1e6, 2),
            round(rb[2] / 1e6, 2),
        ]
        out["task_read_records_med_max"] = [rr[1], rr[2]]
    except Exception as e:  # endpoint shape drift: report, don't die
        out["task_summary_err"] = str(e)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    arm = sys.argv[2] if len(sys.argv) > 2 else "skew"
    conf = {
        "spark.ui.enabled": "true",
        "spark.ui.showConsoleProgress": "false",
        # corpus-scale regime: dup_keys no longer broadcastable
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # keep partition counts comparable across arms
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.skewJoin.enabled": (
            "true" if arm == "skew" else "false"
        ),
        # thresholds sized to probe volume (prod defaults: 256m/5x)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
    }
    spark = get_spark(app_name=f"skew-probe-{arm}", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="skewfix_")
    try:
        (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.expr(
                    f"concat('{BOILER} ', concat('u',"
                    " CAST(id AS STRING)))"
                ).alias("text"),
            )
            .write.mode("overwrite")
            .parquet(f"{tmp}/docs")
        )
        docs = spark.read.parquet(f"{tmp}/docs")
        df = passages.passage_cut_spans(docs)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        # correctness under skew: every non-canonical occurrence of the
        # hot window is cut exactly once (n_docs - 1 cut spans)
        n_cuts = df.count()
        print(
            json.dumps(
                {
                    "arm": arm,
                    "n_docs": n,
                    "n_cut_spans": n_cuts,
                    "wall_sec": round(wall, 2),
                    **heaviest_stage(spark),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
