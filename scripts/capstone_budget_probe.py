#!/usr/bin/env python
"""Capstone shuffle-budget probe: run prepare_training_corpus once in a
fresh UI-enabled session and print its total shuffle bytes + stage
count as ONE JSON line.

Wall-time is the weakest proxy for the capstone's 100 TB failure mode —
a reintroduced corpus-sized replan (round 3 measured the audit-persist
fix at 504→166 MB shuffle on the 10× probe). Bytes and stage counts
are machine-noise-free, so the scale-guard test
(tests/test_scale_guards.py::test_capstone_shuffle_budget) asserts a
budget against THIS probe: the no-persist replan regime measured ~1.7×
the bytes and +15 stages at sf0.001, comfortably outside the budget.

Usage: python scripts/capstone_budget_probe.py [sf_dir] [nopersist]
[cut] [semantic]
(`cut` runs the cut_passages arm — round 5 extends the budget guard to
the substring-dedup product path; `semantic` joins the sf_dir's
embeddings table in — round 7 extends the guard to the embedding tier;
flags compose.)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitter_social_triangle_mapreduce_spark.operators.corpus import (  # noqa: E402
    prepare_training_corpus,
)
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402
from twitter_social_triangle_mapreduce_spark.sources.io import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    persist = "nopersist" not in sys.argv[2:]
    cut = "cut" in sys.argv[2:]
    semantic = "semantic" in sys.argv[2:]
    spark = get_spark(
        app_name="capstone-budget-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            # eviction-proofing (round 7): the terminal stage sum below
            # must see every stage of the run
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where("doc_id % 17 = 0")
    emb = load_table(spark, sf_dir, "embeddings") if semantic else None
    out = tempfile.mkdtemp(prefix="capstone_probe_")
    try:
        audit = prepare_training_corpus(
            docs, ev, out, persist_audit=persist, cut_passages=cut,
            embeddings=emb,
        )
        audit.write.format("noop").mode("overwrite").save()
    finally:
        shutil.rmtree(out, ignore_errors=True)

    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    print(
        json.dumps(
            {
                "persist": persist,
                "cut": cut,
                "semantic": semantic,
                "sf_dir": sf_dir,
                "shuffle_write_mb": round(
                    sum(s["shuffleWriteBytes"] for s in stages) / 1e6, 2
                ),
                "shuffle_read_mb": round(
                    sum(s["shuffleReadBytes"] for s in stages) / 1e6, 2
                ),
                "n_stages": len(stages),
            }
        )
    )


if __name__ == "__main__":
    main()
