#!/usr/bin/env python
"""Serving probe for the at-rest IVF index: write the index for the
1M-vector deterministic clustered corpus, run ann_topk_indexed, and
report the vectors-scan input metrics (bytes/records read) against the
corpus total — dynamic partition pruning should hold the scan to the
probed cells' partitions (~nprobe/k of the corpus), which is the whole
point of the layout.

  python scripts/ivf_index_probe.py [n] [nprobe]

Prints ONE JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from embedding_scale_probe import clustered_embeddings  # noqa: E402
from twitter_social_triangle_mapreduce_spark.operators import (  # noqa: E402
    similarity,
)
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402


def vectors_scan_metrics(spark) -> dict:
    """Runtime metrics of the LAST SQL execution's parquet scan of the
    vectors tree (REST /sql endpoint, per-node metrics): files and
    bytes actually read — the direct evidence of partition pruning."""
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/sql?details=true&length=200"
    ) as r:
        execs = json.load(r)
    out = {}
    e = max(execs, key=lambda x: x["id"])  # the serving collect
    for node in e.get("nodes", []):
        if node.get("nodeName", "") == "Scan parquet":
            for m in node.get("metrics", []):
                out[m["name"]] = m["value"]
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nprobe = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark(
        app_name="ivf-index-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = clustered_embeddings(spark, n)
    idx = tempfile.mkdtemp(prefix="ivf_index_probe_")
    try:
        t0 = time.time()
        similarity.write_ivf_index(emb, idx)
        build_s = time.time() - t0
        # queries from ONE planted cluster so they probe one cell
        qs = emb.where("vec_id < 2")
        t1 = time.time()
        rows = similarity.ann_topk_indexed(
            spark, idx, qs, k=3, nprobe=nprobe
        ).collect()
        serve_s = time.time() - t1
        scan = vectors_scan_metrics(spark)
        total_mb = sum(
            os.path.getsize(os.path.join(dp, f)) / 1e6
            for dp, _, fs in os.walk(f"{idx}/vectors")
            for f in fs
        )
        print(
            json.dumps(
                {
                    "n": n,
                    "nprobe": nprobe,
                    "k_cells": similarity.IVF_CELLS,
                    "build_s": round(build_s, 2),
                    "serve_s": round(serve_s, 2),
                    "topk_rows": len(rows),
                    "index_mb_on_disk": round(total_mb, 1),
                    "vectors_scan": {
                        k: scan.get(k)
                        for k in (
                            "number of partitions read",
                            "number of files read",
                            "static number of files read",
                            "size of files read",
                            "static size of files read",
                            "number of output rows",
                        )
                    },
                }
            )
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()
