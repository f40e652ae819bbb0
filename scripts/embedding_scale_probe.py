#!/usr/bin/env python
"""10×-scale probe for the embedding tier (round-6 verdict item 6): the
graph tier has 1M/10M/30M/100M series; this gives the banded-LSH /
semantic-dedup tier its own beyond-testdata series.

Corpus: deterministic CLUSTERED vectors generated JVM-side (no RNG, no
driver data) — ``n`` vectors in ``n/members`` clusters; each cluster's
base vector comes from hash(cluster, dim) scaled to [-1, 1], each
member adds hash-derived noise ≤ ±0.01 per coordinate, so
within-cluster cosine ≈ 0.9997+ (genuine near-dups) and cross-cluster
cosine is isotropic-random. Ground truth is the planted within-cluster
pair set, which makes RECALL measurable at sizes where brute force
(n²/2 cosines) is not.

Per size, reports one JSON line:
- ``candidates``: |banded_lsh_candidates| — the relation whose growth
  must stay ~linear in n (sub-quadratic guard);
- ``pairs`` / ``recall``: near-dup pairs at sim ≥ 0.99 and the planted
  recall;
- ``clusters_found`` (semantic tier, --semantic): non-singleton
  semantic clusters vs planted;
- shuffle write/read MB (REST stage metrics, same accounting as
  bench.py) and wall seconds.

Usage: python scripts/embedding_scale_probe.py [n ...] [--semantic]
(default sizes 100000 1000000; results recorded in BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from twitter_social_triangle_mapreduce_spark.operators import (  # noqa: E402
    similarity,
)
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402

DIMS = 64
MEMBERS = 2  # planted pairs = n/2, the recall denominator

# the scale rule under test lives IN the package (round 6): at fixed
# bits the candidate count is n²·bands/2^(bits+1) — quadratic — so
# bits must track log2(n/occupancy); see similarity.lsh_bits_for
bits_for = similarity.lsh_bits_for


def clustered_embeddings(spark, n: int, members: int = MEMBERS):
    """Deterministic clustered corpus, all JVM expressions: vec i
    belongs to cluster i // members."""
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
            f"transform(sequence(0, {DIMS - 1}),"
            f" d -> cast({base} + {noise} as float))"
        ).alias("embedding"),
    )


#: module-level monotone accumulator (bench.ShuffleAccounting) — the
#: raw retained-stage sum this probe used pre-r7 can DECREASE when the
#: UI evicts stages between snapshots
_ACCT = None


def shuffle_totals(spark):
    global _ACCT
    if _ACCT is None:
        from bench import ShuffleAccounting

        _ACCT = ShuffleAccounting(spark)
    return _ACCT.snapshot()


def probe(
    spark, n: int, semantic: bool, bits: int | None = None,
    nprobe: int = 1, sem_bands: int = 1,
) -> dict:
    import shutil
    import tempfile

    # materialize the corpus to parquet and read it back: the
    # range+transform lineage carries an 8 B/row Catalyst estimate (the
    # optimizer cannot cost the generated array), which under-costs the
    # real ~280 B/row relation ~35× and lets every join broadcast a
    # corpus that real deployments would shuffle — parquet scan stats
    # make the probe's join planning honest
    tmp = tempfile.mkdtemp(prefix="emb_probe_")
    out: dict = {}
    try:
        clustered_embeddings(spark, n).write.mode("overwrite").parquet(tmp)
        emb = spark.read.parquet(tmp)
        out = _probe_on(spark, emb, n, semantic, bits, nprobe, sem_bands)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _probe_on(
    spark, emb, n: int, semantic: bool, bits: int | None,
    nprobe: int = 1, sem_bands: int = 1,
) -> dict:
    bits = bits or bits_for(n)
    planted = n // MEMBERS  # one within-cluster pair per 2-member cluster
    w0, r0 = shuffle_totals(spark)
    t0 = time.perf_counter()
    candidates = similarity.banded_lsh_candidates(emb, bits=bits).count()
    t_cand = time.perf_counter() - t0
    t0 = time.perf_counter()
    # recall: a found pair is planted iff both ids share a cluster
    found = similarity.embedding_near_dup_pairs(
        emb, bits=bits, min_sim_e4=9900
    )
    hits = found.where(
        (F.col("vec_a") / MEMBERS).cast("long")
        == (F.col("vec_b") / MEMBERS).cast("long")
    ).count()
    n_pairs = found.count()
    t_pairs = time.perf_counter() - t0
    w1, r1 = shuffle_totals(spark)
    out = {
        "n": n,
        "bits": bits,
        "planted_pairs": planted,
        "candidates": candidates,
        "cand_per_vec": round(candidates / n, 2),
        "pairs": n_pairs,
        "recall": round(hits / planted, 4),
        "sec_candidates": round(t_cand, 2),
        "sec_pairs": round(t_pairs, 2),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
    }
    if semantic:
        w0, r0 = shuffle_totals(spark)
        t0 = time.perf_counter()
        clusters = similarity.semantic_dedup_clusters(
            emb, min_sim_e4=9900, bits=bits, nprobe=nprobe, bands=sem_bands
        )
        nontrivial = (
            clusters.groupBy("cluster_id")
            .count()
            .where("count > 1")
            .count()
        )
        w1, r1 = shuffle_totals(spark)
        out["semantic_nprobe"] = nprobe
        out["semantic_bands"] = sem_bands
        out["semantic_nontrivial_clusters"] = nontrivial
        out["semantic_planted_clusters"] = n // MEMBERS
        out["sec_semantic"] = round(time.perf_counter() - t0, 2)
        out["semantic_shuffle_write_mb"] = round((w1 - w0) / 1e6, 1)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]  # sizes
    semantic = "--semantic" in sys.argv
    fixed_bits = (
        similarity.LSH_BITS if "--fixed-bits" in sys.argv else None
    )
    nprobe, sem_bands = 1, 1
    for a in sys.argv[1:]:
        if a.startswith("--nprobe="):
            nprobe = int(a.split("=", 1)[1])
        if a.startswith("--sem-bands="):
            sem_bands = int(a.split("=", 1)[1])
    sizes = [int(a) for a in args] or [100_000, 1_000_000]
    spark = get_spark(
        app_name="embedding-scale-probe",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        print(
            json.dumps(
                probe(spark, n, semantic, bits=fixed_bits, nprobe=nprobe,
                      sem_bands=sem_bands)
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
