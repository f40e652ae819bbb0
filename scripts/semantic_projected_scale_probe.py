#!/usr/bin/env python
"""End-to-end pricing of the projection tier INSIDE a corpus-owning
pipeline (round 12, r11 verdict item 1): ``semantic_dedup_clusters``
at 1M vectors and PRODUCTION-ish width (256 dims), three arms:

1. ``raw``      — the pipeline at dims=256 (the pre-round-12 only option);
2. ``inline``   — ``project_dims=32`` (8× compression) applied inside the
                  pipeline: every corpus scan re-evaluates the
                  O(dims·out_dims) projection expression (~3 scans);
3. ``at_rest``  — ``project_embeddings`` written to parquet ONCE, then
                  the pipeline at dims=32: the projection cost is paid
                  once at rest (reported separately) and every scan
                  reads 8×-narrower vectors — the shape
                  ``write_ivf_index(project_dims=)`` and
                  ``streaming_semantic_maintenance(project_dims=)``
                  build in.

Corpus: the clustered generator of embedding_scale_probe re-expressed
at parameterized width (members-sized planted ~0.999-cosine clusters —
the high-similarity regime where the JL projection provably preserves
structure; the r11 projection probe measured planted-pair cosine
p1 >= 0.9994 through 8x compression). Every arm reports wall, shuffle
bytes, and the semantic-dups-dropped count so recall movement is
visible next to the wall numbers. One JSON line per arm.

The 20k smoke run already prices the arms honestly: inline LOSES
(61.6 s vs raw 25.6 s — the nested projection expression re-evaluates
under every signature/scoring scan and swamps the narrower arithmetic)
while at_rest WINS outright (6.9 s + a one-time 7.7 s projection,
identical dropped-count) — which is why the knob's docstring steers
pipelines to the at-rest shape and the 1M row records raw vs at_rest.

Usage: python scripts/semantic_projected_scale_probe.py [n] [dims]
[out_dims] [arms]  (defaults 1000000 256 32 raw,inline,at_rest)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import ShuffleAccounting  # noqa: E402
from twitter_social_triangle_mapreduce_spark.operators import similarity  # noqa: E402
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402

MEMBERS = 4
MIN_SIM_E4 = 9900


def clustered_embeddings_wide(spark, n: int, dims: int, members: int = MEMBERS):
    """The embedding_scale_probe generator at parameterized width:
    vec i belongs to cluster i // members; members share a base vector
    with small per-member noise (planted cosine ~0.999)."""
    base = (
        f"cast(pmod(hash(cast(id div {members} as int) * 131 + d), 2001)"
        " - 1000 as double) / 1000.0"
    )
    noise = (
        "cast(pmod(hash(cast(id as int) * 7 + d), 41)"
        " - 20 as double) / 2000.0"
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dims - 1}),"
            f" d -> cast({base} + {noise} as float))"
        ).alias("embedding"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    out_dims = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    arms = (
        sys.argv[4].split(",")
        if len(sys.argv) > 4
        else ["raw", "inline", "at_rest"]
    )
    spark = get_spark(
        app_name="semantic-projected-scale-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    acct = ShuffleAccounting(spark)
    tmp = tempfile.mkdtemp(prefix="semproj_probe_")

    def du(path: str) -> int:
        total = 0
        for dirpath, _, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(dirpath, f))
        return total

    def run(arm: str, emb, run_dims: int, project_dims=None, extra=None):
        w0, r0 = acct.snapshot()
        t0 = time.perf_counter()
        clusters = similarity.semantic_dedup_clusters(
            emb,
            min_sim_e4=MIN_SIM_E4,
            dims=run_dims,
            project_dims=project_dims,
        )
        dropped = clusters.where("is_canonical = 0").count()
        wall = time.perf_counter() - t0
        w1, r1 = acct.snapshot()
        rec = {
            "entry": "semantic_dedup_clusters",
            "arm": arm,
            "n_vectors": n,
            "dims": dims,
            "out_dims": out_dims if arm != "raw" else None,
            "wall_sec": round(wall, 1),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            "semantic_dups_dropped": dropped,
        }
        rec.update(extra or {})
        print(json.dumps(rec), flush=True)

    try:
        clustered_embeddings_wide(spark, n, dims).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/embeddings")
        emb = spark.read.parquet(f"{tmp}/embeddings")
        raw_bytes = du(f"{tmp}/embeddings")

        if "raw" in arms:
            run("raw", emb, dims)
        if "inline" in arms:
            run("inline", emb, dims, project_dims=out_dims)
        if "at_rest" not in arms:
            return

        # at-rest: pay the projection once, then the pipeline reads
        # narrow vectors (the write_ivf_index / streaming-fold shape)
        t0 = time.perf_counter()
        similarity.project_embeddings(emb, out_dims, dims).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/projected")
        project_wall = time.perf_counter() - t0
        proj = spark.read.parquet(f"{tmp}/projected")
        proj_bytes = du(f"{tmp}/projected")
        run(
            "at_rest",
            proj,
            out_dims,
            extra={
                "project_once_sec": round(project_wall, 1),
                "at_rest_bytes_ratio": round(raw_bytes / proj_bytes, 2)
                if proj_bytes
                else None,
            },
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
