#!/usr/bin/env python
"""Large-k codebook training probe (round 6): k-means|| at the regime
it exists for — k in the tens-to-hundreds over a 1M-vector corpus,
where the farthest-point seeder's k−1 sequential corpus scans stop
being viable (k=64 → 63 scans vs ~2·(⌈log2 64⌉+2) = 16 scan-shaped
jobs for the sampler).

Reuses the deterministic clustered corpus from embedding_scale_probe
(n/members planted clusters); with k == n_clusters a good seeding
recovers ~one centroid per planted cluster. Reports one JSON line:
seeding + Lloyd wall seconds, WCSS of the trained codebook vs the
first-k-vectors stand-in (the quality case FOR training), and how many
planted clusters got a dedicated centroid (dominant-cluster coverage).

Usage: python scripts/kmeanspar_probe.py [n] [k]   (default 1000000 64)
Results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from twitter_social_triangle_mapreduce_spark.operators import (  # noqa: E402
    similarity,
)
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    from embedding_scale_probe import clustered_embeddings

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_000_000
    k = int(args[1]) if len(args) > 1 else 64
    assign_mode = "numpy" if "--assign=numpy" in sys.argv else "exact"
    # members = n // k so the planted cluster count equals k
    members = max(2, n // k)
    spark = get_spark(
        app_name="kmeanspar-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="kmpar_probe_")
    try:
        clustered_embeddings(spark, n, members=members).write.mode(
            "overwrite"
        ).parquet(tmp)
        emb = spark.read.parquet(tmp)

        t0 = time.perf_counter()
        seeds = similarity._collect_kmeanspar_seeds(emb, k)
        t_seed = time.perf_counter() - t0
        t0 = time.perf_counter()
        rows = seeds
        for _ in range(similarity.IVF_TRAIN_ROUNDS):
            cents = similarity.codebook_df(spark, rows)
            got = similarity._lloyd_round(
                emb, k, cents,
                assign_rows=rows if assign_mode == "numpy" else None,
            ).collect()
            rows = sorted(
                (int(r["cid"]), tuple(float(x) for x in r["centroid"]))
                for r in got
            )
        t_lloyd = time.perf_counter() - t0
        trained = similarity.codebook_df(spark, rows)

        def wcss_of(cent_df) -> float:
            return similarity.wcss(
                emb, cent_df, assign_centroids=cent_df
            ).collect()[0]["wcss"]

        w_trained = wcss_of(trained)
        w_standin = wcss_of(
            emb.where(F.col("vec_id") < k).select(
                F.col("vec_id").alias("cid"),
                F.col("embedding").alias("centroid"),
            )
        )
        # coverage: a planted cluster is "owned" when it is the dominant
        # true cluster of some trained cell
        assign = similarity.ivf_cells(emb, k, centroids=trained)
        owned = (
            assign.withColumn(
                "true_c", (F.col("vec_id") / members).cast("long")
            )
            .groupBy("cell", "true_c")
            .count()
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("cell").orderBy(
                        F.col("count").desc(), F.col("true_c")
                    )
                ),
            )
            .where("rn = 1")
            .select("true_c")
            .distinct()
            .count()
        )
        print(
            json.dumps(
                {
                    "n": n,
                    "k": k,
                    "members": members,
                    "rounds": similarity.kmeanspar_rounds(k),
                    "assign": assign_mode,
                    "sec_seed": round(t_seed, 2),
                    "sec_lloyd": round(t_lloyd, 2),
                    "wcss_trained": round(w_trained, 1),
                    "wcss_standin": round(w_standin, 1),
                    "wcss_ratio": round(w_trained / w_standin, 4),
                    "planted_clusters_owned": owned,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
