#!/usr/bin/env python
"""Measure what reband_semantic_store buys a GROWN stream (round 9,
r8 verdict item 3): a streaming semantic snapshot pins its LSH band
width at first fold, and a first micro-batch is typically tiny, so a
stream that grows 1000× keeps generating banded candidates on the
n²·bands/2^(bits+1) quadratic line — the regime the batch tier's
corpus-derived default (round 8) escaped. The re-band maintenance
fold recomputes the state at ``lsh_bits_for(current total)``; this
probe builds a store whose first fold pins the 8-bit floor, grows it
to ``--n`` vectors, then records:

* the banded candidate-pair count over the at-rest corpus at the
  pinned width vs after the re-band (the occupancy-pinned line is
  ~bands·n·occupancy/2 — candidates linear in n);
* the wall time of one identical ingest fold before vs after the
  re-band (fold cost is driven by the candidate screen);
* the re-band's own wall time (a maintenance job, priced like a
  compaction: run it when the corpus has outgrown its width, not per
  fold).

Usage: python scripts/reband_probe.py [--n 100000] [--dims 16]
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
from twitter_social_triangle_mapreduce_spark.operators import similarity  # noqa: E402
from twitter_social_triangle_mapreduce_spark.streaming.streams import (  # noqa: E402
    fold_semantic_batch,
    reband_semantic_store,
    read_semantic_snapshot,
)


def synth_embeddings(spark, lo: int, hi: int, dims: int):
    """Deterministic pseudo-random unit-ish vectors keyed by vec_id —
    hash-derived, so every run and every arm sees identical data."""
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {dims}),"
            " j -> cast(pmod(hash(id, j), 1000) / 500.0 - 1.0 as float))"
        ).alias("embedding"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dims", type=int, default=16)
    ap.add_argument("--first-batch", type=int, default=2_000)
    ap.add_argument("--probe-batch", type=int, default=2_000)
    ap.add_argument(
        "--exact-dedup",
        action="store_true",
        help="count DISTINCT candidate pairs (the r9 metric) instead"
        " of the occupancy-exact pre-dedup collision rows; at 1M and"
        " a pinned narrow width the distinct spills past this box's"
        " disk — use only at ≤100k",
    )
    ap.add_argument(
        "--pin-bits",
        type=int,
        default=None,
        help="pin the FIRST fold at this width (comparison arm: the"
        " same ingest with the right-sized width from the start"
        " prices what the 8-bit pin costs in the 250k-batch regime)",
    )
    ap.add_argument(
        "--ingest-only",
        action="store_true",
        help="stop after the ingest JSON line (for the --pin-bits"
        " comparison arm)",
    )
    args = ap.parse_args()

    if args.n < args.first_batch + 3 * args.probe_batch:
        raise SystemExit(
            f"--n {args.n} too small: need at least first-batch +"
            f" 3*probe-batch = {args.first_batch + 3 * args.probe_batch}"
            " so the growth folds are non-empty and the candidate"
            " denominators are positive"
        )
    spark = get_spark(
        app_name="reband-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="reband_probe_")
    snap = f"{work}/snap"
    try:
        # ingest: tiny first batch pins the 8-bit floor, then growth
        # folds to --n, leaving two --probe-batch folds for timing
        t0 = time.time()
        bounds = [0, args.first_batch]
        grow_end = args.n - 2 * args.probe_batch
        n_grow = 4
        step = max(1, (grow_end - args.first_batch) // n_grow)
        bounds += [
            min(args.first_batch + i * step, grow_end)
            for i in range(1, n_grow)
        ] + [grow_end]
        for i in range(len(bounds) - 1):
            fold_semantic_batch(
                synth_embeddings(spark, bounds[i], bounds[i + 1], args.dims),
                i,
                snap,
                dims=args.dims,
                **({"bits": args.pin_bits} if i == 0 and args.pin_bits else {}),
            )
        pinned = int(
            spark.read.parquet(f"{snap}/lsh_bits").collect()[0]["bits"]
        )
        print(
            json.dumps(
                {
                    "stage": "ingest",
                    "n": grow_end,
                    "pinned_bits": pinned,
                    "sec": round(time.time() - t0, 1),
                }
            ),
            flush=True,
        )
        if args.ingest_only:
            return

        corpus = spark.read.parquet(f"{snap}/embs/*")
        derived = similarity.lsh_bits_for(args.n)
        for label, bits in (("pinned", pinned), ("rebanded", derived)):
            t0 = time.time()
            if args.exact_dedup:
                # the r9 metric: DISTINCT cross-band pairs — exactly
                # the operator's candidate relation. Infeasible at
                # 1M × a pinned narrow width: the distinct must
                # shuffle every pre-dedup collision row (~1.2e10 at
                # 8 bits), >80 GB of spill on this box — which is the
                # quadratic the re-band exists to kill, demonstrated
                # by the disk instead of the clock.
                cand = similarity.banded_lsh_candidates(
                    corpus, bits=bits, dims=args.dims
                ).count()
                metric = "distinct_pairs"
            else:
                # occupancy-exact PRE-DEDUP collision rows: group the
                # banded keys (O(n) rows, bands·2^bits groups) and sum
                # m·(m−1)/2 — the exact row count the candidate join
                # emits before its dedup, i.e. the work the screen
                # pays, without materializing it
                bands = similarity.LSH_BANDS
                mask = (1 << bits) - 1
                sig = corpus.select(
                    similarity._sig_col(bits * bands, args.dims).alias(
                        "sig"
                    )
                )
                occ = (
                    sig.select(
                        F.explode(
                            F.expr(
                                f"transform(sequence(0, {bands - 1}),"
                                " b -> named_struct('band', b, 'bkey',"
                                f" shiftright(sig, b * {bits}) & {mask}))"
                            )
                        ).alias("bb")
                    )
                    .groupBy("bb.band", "bb.bkey")
                    .count()
                )
                row = occ.agg(
                    F.sum(F.expr("count * (count - 1) / 2")).alias("p")
                ).collect()[0]
                cand = int(row["p"] or 0)
                metric = "collision_rows_pre_dedup"
            print(
                json.dumps(
                    {
                        "stage": f"candidates_{label}",
                        "metric": metric,
                        "bits": bits,
                        "n": grow_end,
                        "pairs": int(cand),
                        "pairs_per_vec": round(cand / grow_end, 2),
                        "count_sec": round(time.time() - t0, 1),
                    }
                ),
                flush=True,
            )

        # one identical-size fold at the stuck width...
        nb = len(bounds) - 1
        t0 = time.time()
        fold_semantic_batch(
            synth_embeddings(
                spark, grow_end, grow_end + args.probe_batch, args.dims
            ),
            nb,
            snap,
            dims=args.dims,
        )
        fold_before = time.time() - t0
        print(
            json.dumps(
                {
                    "stage": "fold_at_pinned",
                    "bits": pinned,
                    "batch": args.probe_batch,
                    "sec": round(fold_before, 1),
                }
            ),
            flush=True,
        )

        # ...the re-band itself...
        t0 = time.time()
        new_bits = reband_semantic_store(spark, snap, dims=args.dims)
        reband_sec = time.time() - t0
        print(
            json.dumps(
                {
                    "stage": "reband",
                    "bits": new_bits,
                    "sec": round(reband_sec, 1),
                }
            ),
            flush=True,
        )

        # ...and the same-size fold at the re-banded width
        t0 = time.time()
        fold_semantic_batch(
            synth_embeddings(
                spark,
                grow_end + args.probe_batch,
                grow_end + 2 * args.probe_batch,
                args.dims,
            ),
            nb + 1,
            snap,
            dims=args.dims,
        )
        fold_after = time.time() - t0
        print(
            json.dumps(
                {
                    "stage": "fold_at_rebanded",
                    "bits": new_bits,
                    "batch": args.probe_batch,
                    "sec": round(fold_after, 1),
                    "speedup_vs_pinned": round(fold_before / fold_after, 2),
                }
            ),
            flush=True,
        )
        n_state = read_semantic_snapshot(spark, snap).count()
        assert n_state == grow_end + 2 * args.probe_batch, n_state
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
