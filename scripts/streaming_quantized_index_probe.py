#!/usr/bin/env python
"""1M-vector pin for the STREAMING quantized ANN index (round 8, r7
verdict item 5): the int8 fold (`fold_ann_index_batch(quantize=True)`)
is parity-tested at test scale only; this folds the 1M clustered corpus
through four micro-batches, serves from the marker-committed snapshot,
and reports recall against the batch FLOAT index's top-k (the same
64-query/k=3/nprobe=1 protocol as the round-6 batch figure of 186/192
= 96.9%), plus on-disk bytes for both arms and fold/serve walls.
Prints ONE JSON line; results recorded in BASELINE.md.

Batch 0 carries vec_id 0..k_cells-1 (range split, not modulo), so the
stand-in codebook pin and the first-batch scale pin both come from the
stream itself — the production shape when no trained artifacts exist.

Usage: python scripts/streaming_quantized_index_probe.py [n]
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

from embedding_scale_probe import clustered_embeddings  # noqa: E402
from twitter_social_triangle_mapreduce_spark.operators import (  # noqa: E402
    similarity,
)
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402
from twitter_social_triangle_mapreduce_spark.streaming import (  # noqa: E402
    ann_topk_snapshot,
    fold_ann_index_batch,
)

N_QUERIES = 64
K = 3
NPROBE = 1
N_BATCHES = 4


def du_mb(path: str) -> float:
    return round(
        sum(
            os.path.getsize(os.path.join(dp, f)) / 1e6
            for dp, _, fs in os.walk(path)
            for f in fs
        ),
        1,
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(
        app_name="streaming-quantized-index-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="sqidx_probe_")
    try:
        clustered_embeddings(spark, n).write.mode("overwrite").parquet(
            f"{tmp}/emb"
        )
        emb = spark.read.parquet(f"{tmp}/emb")
        qs = emb.where(f"vec_id < {N_QUERIES}")

        # float BATCH index — the recall reference
        t0 = time.time()
        similarity.write_ivf_index(emb, f"{tmp}/float_idx")
        float_build_s = time.time() - t0
        float_pairs = {
            (r["qid"], r["nid"])
            for r in similarity.ann_topk_indexed(
                spark, f"{tmp}/float_idx", qs, k=K, nprobe=NPROBE
            ).collect()
        }

        # int8 STREAMING snapshot — range-split folds (batch 0 pins the
        # stand-in codebook and the int8 grid scale)
        snap = f"{tmp}/snap"
        per = (n + N_BATCHES - 1) // N_BATCHES
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
        t0 = time.time()
        snap_pairs = {
            (r["qid"], r["nid"])
            for r in ann_topk_snapshot(
                spark, snap, qs, k=K, nprobe=NPROBE
            ).collect()
        }
        serve_s = time.time() - t0

        # compaction at scale: fold the safe batches into one
        # generation, re-serve, and require the SAME pairs — the
        # marker-flip parity theorem checked at 1M, not just test size
        from twitter_social_triangle_mapreduce_spark.streaming import (
            compact_ann_index,
        )

        def n_files() -> int:
            return sum(
                1
                for dp, _, fs_ in os.walk(f"{snap}/vectors")
                for f in fs_
                if f.endswith(".parquet")
            )

        files_before = n_files()
        t0 = time.time()
        gen = compact_ann_index(spark, snap)
        compact_s = time.time() - t0
        t0 = time.time()
        compacted_pairs = {
            (r["qid"], r["nid"])
            for r in ann_topk_snapshot(
                spark, snap, qs, k=K, nprobe=NPROBE
            ).collect()
        }
        serve_compacted_s = time.time() - t0
        assert gen is not None and compacted_pairs == snap_pairs
        files_after = n_files()
        recall = len(float_pairs & snap_pairs) / max(len(float_pairs), 1)
        # budget guards (r7 verdict item 5's done-criterion): the int8
        # streaming arm must hold the batch arm's recall class and its
        # storage advantage — a regression in either is a probe FAILURE,
        # not a number to record
        assert recall >= 0.95, (recall, len(float_pairs))
        assert du_mb(f"{snap}/vectors") < du_mb(f"{tmp}/float_idx/vectors")
        print(
            json.dumps(
                {
                    "n": n,
                    "n_queries": N_QUERIES,
                    "k": K,
                    "nprobe": NPROBE,
                    "n_batches": N_BATCHES,
                    "float_build_s": round(float_build_s, 1),
                    "quantized_fold_s": round(fold_s, 1),
                    "snapshot_serve_s": round(serve_s, 1),
                    "float_pairs": len(float_pairs),
                    "overlap": len(float_pairs & snap_pairs),
                    "recall_vs_float": round(
                        len(float_pairs & snap_pairs)
                        / max(len(float_pairs), 1),
                        4,
                    ),
                    "float_index_mb": du_mb(f"{tmp}/float_idx/vectors"),
                    "quantized_snapshot_mb": du_mb(f"{snap}/vectors"),
                    "compact_s": round(compact_s, 1),
                    "serve_compacted_s": round(serve_compacted_s, 1),
                    "files_before_compact": files_before,
                    "files_after_compact": files_after,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
