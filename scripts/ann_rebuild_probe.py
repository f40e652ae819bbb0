#!/usr/bin/env python
"""Recall-recovery pin for ``rebuild_ann_index`` (round 10, r9 verdict
item 2): a quantized streaming ANN store whose corpus OUTGREW its
first-batch int8 grid clamps silently — ``ann_scale_headroom`` measures
the drift (round 9), and the rebuild is the executable cure. This probe
builds exactly that pathology, measures recall against the float batch
index before and after the rebuild, and requires the rebuild to restore
both the headroom and the recall class.

Drift construction: the clustered corpus is folded in ``N_BATCHES``
range-split batches with batch ``b``'s vectors scaled by ``1 + 3b`` —
directions (and therefore TRUE cosine ranks) are unchanged, but the
grid pinned from batch 0's max-abs clamps most components of the later
batches to the ±127 rails, destroying their relative geometry. Queries
are drawn from the LAST (most-clamped) batch, where the damage
concentrates.

Prints ONE JSON line; results recorded in BASELINE.md.

Usage: python scripts/ann_rebuild_probe.py [n]
"""

from __future__ import annotations

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

from embedding_scale_probe import clustered_embeddings  # noqa: E402
from twitter_social_triangle_mapreduce_spark.operators import (  # noqa: E402
    similarity,
)
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402
from twitter_social_triangle_mapreduce_spark.streaming import (  # noqa: E402
    ann_scale_headroom,
    ann_topk_snapshot,
    fold_ann_index_batch,
    rebuild_ann_index,
)

N_QUERIES = 64
K = 3
NPROBE = 1
N_BATCHES = 4


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(
        app_name="ann-rebuild-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="ann_rebuild_probe_")
    per = (n + N_BATCHES - 1) // N_BATCHES
    try:
        # per-batch magnitude drift: direction-preserving, so the float
        # reference ranks are the truth the quantized arms chase
        drifted = clustered_embeddings(spark, n).select(
            "vec_id",
            F.expr(
                f"transform(embedding, x -> cast(x *"
                f" (1.0 + 3.0 * (vec_id div {per})) as float))"
            ).alias("embedding"),
        )
        drifted.write.mode("overwrite").parquet(f"{tmp}/emb")
        emb = spark.read.parquet(f"{tmp}/emb")
        # queries from the LAST batch — the most-clamped vectors
        qs = emb.where(f"vec_id >= {n - N_QUERIES}")

        # float batch index: the recall reference
        similarity.write_ivf_index(emb, f"{tmp}/float_idx")
        float_pairs = {
            (r["qid"], r["nid"])
            for r in similarity.ann_topk_indexed(
                spark, f"{tmp}/float_idx", qs, k=K, nprobe=NPROBE
            ).collect()
        }

        # quantized streaming store, grid pinned from batch 0
        snap = f"{tmp}/snap"
        t0 = time.time()
        for b in range(N_BATCHES):
            fold_ann_index_batch(
                emb.where(
                    f"vec_id >= {b * per} AND vec_id < {(b + 1) * per}"
                ),
                b,
                snap,
                quantize=True,
            )
        fold_s = time.time() - t0

        def recall() -> float:
            pairs = {
                (r["qid"], r["nid"])
                for r in ann_topk_snapshot(
                    spark, snap, qs, k=K, nprobe=NPROBE
                ).collect()
            }
            return len(float_pairs & pairs) / max(len(float_pairs), 1)

        def headroom():
            r = ann_scale_headroom(spark, snap).collect()[0]
            return {
                "pinned_scale": round(r["pinned_scale"], 4),
                "corpus_max_abs": round(r["corpus_max_abs"], 4),
                "headroom_ratio": round(r["headroom_ratio"], 4),
                "n_clamped_batches": r["n_clamped_batches"],
            }

        recall_drifted = recall()
        head_before = headroom()
        t0 = time.time()
        new_scale = rebuild_ann_index(spark, snap, emb)
        rebuild_s = time.time() - t0
        recall_rebuilt = recall()
        head_after = headroom()

        # done-criteria: headroom restored, recall recovered to the
        # batch-int8 class (>= 0.95, the r7/r8 streaming-int8 bar)
        assert head_before["headroom_ratio"] < 1.0
        assert head_before["n_clamped_batches"] >= N_BATCHES - 1
        assert head_after["headroom_ratio"] >= 1.0
        assert head_after["n_clamped_batches"] == 0
        assert recall_rebuilt >= 0.95, (recall_drifted, recall_rebuilt)
        assert recall_rebuilt > recall_drifted
        print(
            json.dumps(
                {
                    "n": n,
                    "n_queries": N_QUERIES,
                    "k": K,
                    "nprobe": NPROBE,
                    "n_batches": N_BATCHES,
                    "fold_s": round(fold_s, 1),
                    "rebuild_s": round(rebuild_s, 1),
                    "new_scale": round(new_scale, 4),
                    "recall_drifted": round(recall_drifted, 4),
                    "recall_rebuilt": round(recall_rebuilt, 4),
                    "headroom_before": head_before,
                    "headroom_after": head_after,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
