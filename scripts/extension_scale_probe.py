#!/usr/bin/env python
"""Scale probes for the extension operators fixed in round 2: LSH
signatures at real embedding widths and neighborhood Jaccard on a
hub-heavy graph. Prints one JSON line per probe.

- lsh_wide: signature computation over synthetic embeddings at dims
  768/1024 — the regime where the old per-term md5/CASE codegen choked;
  the coefficient-array fold must stay scan-bound.
- jaccard_hub: a power-law follower graph with one celebrity node. The
  capped operator's candidate pairs stay bounded; the uncapped pair count
  is reported for contrast (quadratic in the hub's fan-in).

Usage: python scripts/extension_scale_probe.py [--uncapped]
(--uncapped also times the no-cap Jaccard run for contrast; slow — the
hub's quadratic pair fan-out is the point being demonstrated)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from twitter_social_triangle_mapreduce_spark.operators.graph import (  # noqa: E402
    neighborhood_jaccard_pairs,
)
from twitter_social_triangle_mapreduce_spark.operators.similarity import (  # noqa: E402
    lsh_signature,
)
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402


def synth_embeddings(spark, n: int, dims: int):
    """Deterministic pseudo-random float vectors, generated JVM-side."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dims - 1}),"
            " d -> cast(pmod(hash(id * 31 + d), 2001) - 1000 as float) / 1000.0F)"
        ).alias("embedding"),
    )


def hub_graph(spark, n_follows: int, n_users: int, hub_followers: int):
    """Follower edges with a long-tail neighbor space (mean fan-in ~10)
    plus ONE celebrity hub followed by ``hub_followers`` distinct users —
    the single pathological key the cap must neutralize."""
    base = spark.range(n_follows).select(
        F.pmod(F.hash("id"), n_users).alias("src"),
        F.pmod(F.hash(F.col("id") + 1), n_follows // 10).alias("dst"),
    )
    hub = spark.range(hub_followers).select(
        F.col("id").alias("src"), F.lit(999_999_999).alias("dst")
    )
    return base.unionByName(hub)


def timed(fn):
    t0 = time.perf_counter()
    v = fn()
    return v, round(time.perf_counter() - t0, 2)


def _ui_stage_stats(spark) -> dict:
    """Shuffle totals + top stages from the local UI REST API (the probe
    session runs with the UI enabled for exactly this)."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return {}
    with urllib.request.urlopen(f"{base}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    tot_w = sum(s["shuffleWriteBytes"] for s in stages)
    tot_r = sum(s["shuffleReadBytes"] for s in stages)
    top = sorted(stages, key=lambda s: -s["shuffleWriteBytes"])[:5]
    return {
        "n_stages": len(stages),
        "shuffle_write_mb": round(tot_w / 1e6, 1),
        "shuffle_read_mb": round(tot_r / 1e6, 1),
        "top_stage_writes_mb": [
            round(s["shuffleWriteBytes"] / 1e6, 1) for s in top
        ],
        "max_task_peak_exec_mem_mb": round(
            max((s.get("peakExecutionMemory", 0) for s in stages), default=0)
            / 1e6,
            1,
        ),
    }


def probe_capstone(mult: int = 10) -> None:
    """prepare_training_corpus at ``mult``× sf0.1 (50k docs at 10×):
    the five-stage capstone is the likeliest place a hidden barrier or
    driver-proportional state hides. Replication is EXACT (new doc_ids,
    same text): curation, minhash/LSH banding, clustering and
    decontamination all process the full multiplied volume — and the
    replica groups stress the LSH collision path maximally (every band
    bucket collides ≥ mult ways). Packing/shard-write intentionally see
    only the canonical survivors; the 1M-doc ``pack_1m`` probe covers
    that stage's scaling separately."""
    import shutil
    import tempfile

    from twitter_social_triangle_mapreduce_spark.operators.corpus import (
        prepare_training_corpus,
    )
    from twitter_social_triangle_mapreduce_spark.sources.io import load_table

    spark = get_spark(
        app_name="tstm-capstone-probe",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",  # REST stage metrics
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    big = (
        docs.crossJoin(spark.range(mult).select(F.col("id").alias("rep")))
        .select(
            (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        .persist()
    )
    n_in = big.count()
    ev = big.where(F.col("doc_id") % 17 == 0)
    out_dir = tempfile.mkdtemp(prefix="capstone_probe_")
    try:
        t0 = time.perf_counter()
        audit = prepare_training_corpus(big, ev, out_dir)
        verdicts = {
            r["verdict"]: r["n"]
            for r in audit.groupBy("verdict")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        wall = round(time.perf_counter() - t0, 2)
        # every kept doc lands in a shard; the dir is empty (unreadable)
        # when the gates drop everything, which the verdict mix records
        if verdicts.get("kept"):
            n_shard_rows = spark.read.parquet(out_dir).count()
        else:
            n_shard_rows = 0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    big.unpersist()
    print(
        json.dumps(
            {
                "probe": f"capstone_{mult}x_sf0.1",
                "n_docs_in": n_in,
                "verdicts": verdicts,
                "n_shard_rows": n_shard_rows,
                "sec": wall,
                **_ui_stage_stats(spark),
            }
        ),
        flush=True,
    )


def synth_boiler_docs(spark, n_docs: int, body_words: int = 24):
    """Every doc: a unique ``body_words``-token body plus ONE shared
    8-token banner — the passage-dedup worst case: a single window hash
    with ``n_docs`` occurrences (the mega-duplicated boilerplate key)."""
    banner = "please accept all cookies to continue browsing here"
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.expr(
                f"array_join(transform(sequence(1, {body_words}),"
                " j -> concat('w', id, 'x', j)), ' ')"
            ),
            F.lit(" " + banner),
        ).alias("text"),
    )


def probe_passages(spark) -> None:
    """Passage cut lists on the boilerplate-skew corpus at two sizes:
    the cut count must be exactly n_docs - 1 (every non-canonical banner
    occurrence, nothing else), and doubling the corpus must ~double the
    wall time — the single hot window hash stays linear because the
    canonical aggregate is map-side combinable and AQE splits the
    occurrences join."""
    from twitter_social_triangle_mapreduce_spark.operators.passages import (
        passage_cut_spans,
    )

    for n_docs in (100_000, 200_000):
        docs = synth_boiler_docs(spark, n_docs).persist()
        docs.count()
        cuts, sec = timed(lambda: passage_cut_spans(docs).count())
        docs.unpersist()
        print(
            json.dumps(
                {
                    "probe": "passages_boiler_skew",
                    "n_docs": n_docs,
                    "cut_spans": cuts,
                    "expected": n_docs - 1,
                    "sec": sec,
                }
            ),
            flush=True,
        )


def main() -> None:
    if "--passages" in sys.argv:
        spark = get_spark(
            app_name="tstm-passage-probe",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        probe_passages(spark)
        return
    if "--capstone" in sys.argv:
        mult = next(
            (int(a.split("=", 1)[1]) for a in sys.argv if a.startswith("--mult=")),
            10,
        )
        probe_capstone(mult)
        return
    spark = get_spark(
        app_name="tstm-ext-scale-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    for n, dims in [(100_000, 768), (100_000, 1024)]:
        emb = synth_embeddings(spark, n, dims).persist()
        emb.count()
        cnt, sec = timed(lambda: lsh_signature(emb, dims=dims).count())
        emb.unpersist()
        print(
            json.dumps(
                {"probe": "lsh_wide", "n": n, "dims": dims, "rows": cnt, "sec": sec}
            ),
            flush=True,
        )

    e = hub_graph(spark, 1_000_000, 200_000, 20_000).persist()
    e.count()
    capped, sec_c = timed(
        lambda: neighborhood_jaccard_pairs(
            e, min_common=3, max_neighbor_freq=10_000
        ).count()
    )
    out = {
        "probe": "jaccard_hub",
        "n_follows": 1_020_000,
        "hub_fanin": 20_000,
        "capped_pairs": capped,
        "sec": sec_c,
        "uncapped_hub_pairs_alone": 20_000 * 19_999 // 2,
    }
    if "--uncapped" in sys.argv:
        un, sec_u = timed(
            lambda: neighborhood_jaccard_pairs(
                e, min_common=3, max_neighbor_freq=10**12
            ).count()
        )
        out["uncapped_pairs"], out["uncapped_sec"] = un, sec_u
    print(json.dumps(out), flush=True)
    e.unpersist()

    # bucketed interval join: 1M points vs 50k intervals. The bucketed
    # equi-join's work is linear; the naive theta-join on the same
    # inputs is a nested-loop over 5*10^10 pairs (not run by default —
    # pass --theta to demonstrate, slow by design).
    from twitter_social_triangle_mapreduce_spark.operators.timeseries import (
        interval_join,
    )

    pts = spark.range(1_000_000).select(
        F.col("id").alias("pid"),
        F.pmod(F.hash("id"), 30 * 86_400).alias("p"),
    ).persist()
    iv = spark.range(50_000).select(
        F.col("id").alias("ivid"),
        F.pmod(F.hash(F.col("id") * 7 + 3), 30 * 86_400).alias("s"),
    ).withColumn("e", F.col("s") + 900).persist()
    pts.count(), iv.count()
    matches, sec_b = timed(
        lambda: interval_join(pts, iv, "p", "s", "e", bucket_s=3600).count()
    )
    out = {
        "probe": "range_join_1m",
        "n_points": 1_000_000,
        "n_intervals": 50_000,
        "matches": matches,
        "sec": sec_b,
    }
    if "--theta" in sys.argv:
        naive = pts.join(
            iv, (F.col("p") >= F.col("s")) & (F.col("p") <= F.col("e"))
        )
        _, sec_t = timed(naive.count)
        out["theta_sec"] = sec_t
    print(json.dumps(out), flush=True)
    pts.unpersist(), iv.unpersist()

    # heavy hitters over ~10M tokens with a huge distinct tail: the MG
    # candidate pass must stay linear and emit bounded candidates
    from twitter_social_triangle_mapreduce_spark.operators.sketches import (
        heavy_hitter_tokens,
    )

    hh_docs = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat(array_join(transform(sequence(1, 40),"
            " i -> concat('r', CAST(id AS STRING), '_', CAST(i AS STRING))),"
            " ' '), CASE WHEN id % 2 = 0 THEN ' hot hot hot hot hot hot"
            " hot hot hot hot' ELSE '' END)"
        ).alias("text"),
    ).persist()
    hh_docs.count()
    hh, sec_h = timed(lambda: heavy_hitter_tokens(hh_docs, k=50).collect())
    print(
        json.dumps(
            {
                "probe": "heavy_hitters_10m",
                "n_tokens": 200_000 * 40 + 100_000 * 10,
                "n_distinct": 200_000 * 40 + 1,
                "hitters": [r["tok"] for r in hh],
                "sec": sec_h,
            }
        ),
        flush=True,
    )
    hh_docs.unpersist()

    # two-pass prefix-sum packing over 1M synthetic docs: must stay
    # linear (the only ordered window runs over #buckets rows)
    from twitter_social_triangle_mapreduce_spark.operators.corpus import (
        pack_sequences,
    )

    docs = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(1, 5 + pmod(hash(id), 60)),"
            " i -> 'w'), ' ')"
        ).alias("text"),
    ).persist()
    docs.count()
    rows, sec_p = timed(
        lambda: pack_sequences(docs, bucket_span=10_000).count()
    )
    print(
        json.dumps(
            {
                "probe": "pack_1m",
                "n_docs": 1_000_000,
                "rows": rows,
                "sec": sec_p,
            }
        ),
        flush=True,
    )
    docs.unpersist()


if __name__ == "__main__":
    main()
