#!/usr/bin/env python
"""Measure the distributed BPE fallback's touched-word rewrite (round 8,
r7 verdict item 6): the over-gate arm used to greedy-rewrite the WHOLE
vocabulary every round even though a merge only changes words containing
the chosen pair adjacently. This times the merge rounds three
ways — full rewrite, filter+union split, and the shipped per-row
``when`` guard — over the same prebuilt word table, asserts the chosen
merges are identical across all three, and reports per-round seconds
plus the touched-word fraction per round.

Corpus: bpe_scale_probe's hash-drawn synthetic words (large vocab →
most pairs live in a small fraction of words, the realistic skew).
Pass --vocab above n_words to make every word distinct — the
vocabulary-dominated regime the distributed fallback exists for.

Usage: python scripts/bpe_distributed_touched_probe.py [n_words]
        [--vocab=N] [--merges=N]
(defaults 1000000 words, vocab 10000, 8 merges; results in BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts.bpe_scale_probe import synthetic_docs  # noqa: E402
from twitter_social_triangle_mapreduce_spark.operators import bpe  # noqa: E402
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402


def run_rounds(spark, wtab, merges: int, mode: str):
    """Mirror of train_bpe_merges' distributed loop body, with the
    rewrite strategy switchable — "full" (rewrite every word),
    "union" (filter+union split; measured SLOWER, kept for the
    record), "when" (per-row guard, the shipped shape); returns
    (chosen, per-round seconds, per-round touched fractions)."""
    from pyspark.storagelevel import StorageLevel

    cur = wtab
    chosen = []
    round_s = []
    touched_frac = []
    total = cur.count()
    for _ in range(merges):
        t0 = time.time()
        best = (
            bpe.pair_counts(cur)
            .orderBy(
                F.col("n").desc(), F.col("left").asc(), F.col("right").asc()
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["left"], best[0]["right"]
        chosen.append((a, b))
        cond = F.array_contains(
            F.zip_with(
                F.expr("slice(syms, 1, size(syms) - 1)"),
                F.expr("slice(syms, 2, size(syms) - 1)"),
                lambda x, y: (x == F.lit(a)) & (y == F.lit(b)),
            ),
            F.lit(True),
        )
        if mode == "union":
            nxt = (
                cur.where(cond)
                .select(
                    "word", "cnt", bpe._apply_merge_col(a, b).alias("syms")
                )
                .unionByName(cur.where(~cond))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
        elif mode == "when":
            nxt = cur.select(
                "word",
                "cnt",
                F.when(cond, bpe._apply_merge_col(a, b))
                .otherwise(F.col("syms"))
                .alias("syms"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        else:
            nxt = cur.select(
                "word", "cnt", bpe._apply_merge_col(a, b).alias("syms")
            ).persist(StorageLevel.MEMORY_AND_DISK)
        n_touched = cur.where(cond).count()
        nxt.count()
        if cur is not wtab:
            cur.unpersist()
        cur = nxt
        round_s.append(time.time() - t0)
        touched_frac.append(n_touched / max(total, 1))
    if cur is not wtab:
        cur.unpersist()
    return chosen, round_s, touched_frac


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_000_000
    vocab, merges = 10_000, 8
    for a in sys.argv[1:]:
        if a.startswith("--vocab"):
            vocab = int(a.split("=", 1)[1])
        if a.startswith("--merges"):
            merges = int(a.split("=", 1)[1])
    spark = get_spark(
        app_name="bpe-touched-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.storagelevel import StorageLevel

    wtab = bpe.word_symbol_table(synthetic_docs(spark, n, vocab)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_vocab = wtab.count()
    out = {}
    for mode in ("full", "union", "when"):
        chosen, round_s, frac = run_rounds(spark, wtab, merges, mode)
        out[mode] = {
            "chosen": chosen,
            "per_round_s": [round(s, 2) for s in round_s],
            "touched_frac": [round(f, 3) for f in frac],
        }
    assert out["full"]["chosen"] == out["when"]["chosen"], out
    assert out["full"]["chosen"] == out["union"]["chosen"], out
    print(
        json.dumps(
            {
                "n_words": n,
                "vocab_seen": n_vocab,
                "merges": len(out["full"]["chosen"]),
                "full_rounds_s": round(sum(out["full"]["per_round_s"]), 2),
                "union_rounds_s": round(
                    sum(out["union"]["per_round_s"]), 2
                ),
                "when_rounds_s": round(sum(out["when"]["per_round_s"]), 2),
                "touched_frac": out["when"]["touched_frac"],
            }
        ),
        flush=True,
    )
    wtab.unpersist()


if __name__ == "__main__":
    main()
