#!/usr/bin/env python
"""Price the round-11 operational surface at the 1M-vector store
(r10 verdict items 3 and 5):

* ``clone_snapshot`` wall, serial (driver-side FileUtil.copy per
  file) vs ``parallel=True`` (executor-side pyarrow.fs streams) — the
  serial arm was the round-10 limitation (hours vs weeks at 100 TB);
  the parallel arm should win as soon as there are enough files to
  amortize one Spark job, and the two must land identical stores
  (verified here by the destination fsck each clone already runs,
  plus a visible-file count+bytes cross-check).
* ``maintenance_check`` shallow vs ``--deep`` wall — deep reads each
  store's whole LIVE union for the duplicate-row scan, so its cost is
  a full corpus scan; this prints what that costs next to a
  compaction of the same store so BASELINE.md can carry concrete
  guidance (run deep after incidents / before promoting a clone, not
  per fold).

Store shape: a quantized streaming ANN store grown to --n vectors in
--folds micro-batches, then compacted once — the layout with the most
sub-stores (vectors + scale_stats + codebook + markers + ledgers).

Usage: python scripts/clone_maintenance_probe.py [--n 1000000]
       [--dims 16] [--folds 8]
(one JSON line per measurement; results recorded in BASELINE.md)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402
from twitter_social_triangle_mapreduce_spark.operators.similarity import (  # noqa: E402
    codebook_df,
)
from twitter_social_triangle_mapreduce_spark.streaming.streams import (  # noqa: E402
    clone_snapshot,
    compact_ann_index,
    fold_ann_index_batch,
    maintenance_check,
)


def synth_embeddings(spark, lo: int, hi: int, dims: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {dims}),"
            " j -> cast(pmod(hash(id, j), 1000) / 500.0 - 1.0 as float))"
        ).alias("embedding"),
    )


def tree_stats(root: str) -> tuple[int, int]:
    """(visible files, visible bytes) — dot-files are Hadoop local-fs
    checksum sidecars, not store content."""
    n, b = 0, 0
    for dp, _dns, fns in os.walk(root):
        for fn in fns:
            if fn.startswith("."):
                continue
            n += 1
            b += os.path.getsize(os.path.join(dp, fn))
    return n, b


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dims", type=int, default=16)
    ap.add_argument("--folds", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark(app_name="clone-maintenance-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="clone_probe_")
    snap = os.path.join(work, "store")

    cb = codebook_df(
        spark,
        [
            (c, [10.0 * (c == d % args.dims) for d in range(args.dims)])
            for c in range(8)
        ],
    )
    per = args.n // args.folds
    t0 = time.time()
    for b in range(args.folds):
        fold_ann_index_batch(
            synth_embeddings(spark, b * per, (b + 1) * per, args.dims),
            b,
            snap,
            centroids=cb,
            quantize=True,
            scale=2.0,
        )
    compact_ann_index(spark, snap)
    build_s = time.time() - t0
    n_files, n_bytes = tree_stats(snap)
    print(
        json.dumps(
            {
                "metric": "store_build",
                "n": args.n,
                "folds": args.folds,
                "files": n_files,
                "bytes": n_bytes,
                "value": round(build_s, 2),
                "unit": "sec",
            }
        ),
        flush=True,
    )

    for arm, parallel in (("serial", False), ("parallel", True)):
        dst = os.path.join(work, f"dst_{arm}")
        t0 = time.time()
        got = clone_snapshot(spark, snap, dst, parallel=parallel)
        wall = time.time() - t0
        dn, db = tree_stats(dst)
        print(
            json.dumps(
                {
                    "metric": f"clone_{arm}",
                    "files": got["files"],
                    "bytes": got["bytes"],
                    "dst_files": dn,
                    "dst_bytes": db,
                    "value": round(wall, 2),
                    "unit": "sec",
                }
            ),
            flush=True,
        )

    a = tree_stats(os.path.join(work, "dst_serial"))
    b = tree_stats(os.path.join(work, "dst_parallel"))
    print(
        json.dumps(
            {"metric": "clone_arms_match", "serial": a, "parallel": b,
             "match": a == b}
        ),
        flush=True,
    )

    for depth, deep in (("shallow", False), ("deep", True)):
        t0 = time.time()
        rows = maintenance_check(spark, snap, deep=deep).collect()
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "metric": f"check_{depth}",
                    "findings": sorted(
                        {r["severity"] for r in rows}
                    ),
                    "rows": len(rows),
                    "value": round(wall, 2),
                    "unit": "sec",
                }
            ),
            flush=True,
        )

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
