#!/usr/bin/env python
"""Scale probe for the BPE trainer: the claim under test is
VOCABULARY-scaling — the corpus is touched once (the word-frequency
groupBy) and every merge round runs against the distinct-word table,
so growing the corpus 10× at FIXED vocabulary should grow only the
one-off word-table build, not the per-round cost.

Corpus: deterministic synthetic docs of hash-drawn words from a fixed
``V``-word vocabulary (JVM expressions, no driver data). Per corpus
size, reports the word-table build seconds (corpus-scaled) and the
total merge-rounds seconds (vocab-scaled) separately.

  python scripts/bpe_scale_probe.py [n_words ...] [--vocab V] [--merges M]

Prints ONE JSON line per size; results recorded in BASELINE.md.
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

from twitter_social_triangle_mapreduce_spark.operators import bpe  # noqa: E402
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402

WORDS_PER_DOC = 50


def synthetic_docs(spark, n_words: int, vocab: int):
    """n_words hash-drawn words from a ``vocab``-word vocabulary,
    grouped into docs of WORDS_PER_DOC. Word text = base-26 letters of
    the vocab id, so symbol sequences are realistic multi-char."""
    n_docs = n_words // WORDS_PER_DOC
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"""array_join(transform(sequence(1, {WORDS_PER_DOC}),
                i -> concat('w', lower(conv(pmod(hash(id * 1000 + i),
                                              {vocab}), 10, 26)))),
                ' ')"""
        ).alias("text"),
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sizes = [int(a) for a in args] or [1_000_000, 10_000_000]
    vocab = 10_000
    merges = 8
    for a in sys.argv[1:]:
        if a.startswith("--vocab"):
            vocab = int(a.split("=", 1)[1])
        if a.startswith("--merges"):
            merges = int(a.split("=", 1)[1])
    spark = get_spark(
        app_name="bpe-scale-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        docs = synthetic_docs(spark, n, vocab)
        from pyspark.storagelevel import StorageLevel

        t0 = time.time()
        wtab = bpe.word_symbol_table(docs).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n_vocab = wtab.count()
        build_s = time.time() - t0
        # merge rounds against the prebuilt table — mirror the trainer
        # loop body so the probe isolates the vocab-scaled part
        t1 = time.time()
        cur = wtab
        chosen = []
        for rank in range(merges):
            best = (
                bpe.pair_counts(cur)
                .orderBy(
                    F.col("n").desc(),
                    F.col("left").asc(),
                    F.col("right").asc(),
                )
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b = best[0]["left"], best[0]["right"]
            chosen.append((a, b))
            nxt = cur.select(
                "word", "cnt", bpe._apply_merge_col(a, b).alias("syms")
            ).persist(StorageLevel.MEMORY_AND_DISK)
            nxt.count()
            cur.unpersist()
            cur = nxt
        rounds_s = time.time() - t1
        cur.unpersist()
        print(
            json.dumps(
                {
                    "n_words": n,
                    "vocab_target": vocab,
                    "vocab_seen": n_vocab,
                    "merges": len(chosen),
                    "word_table_build_s": round(build_s, 2),
                    "merge_rounds_s": round(rounds_s, 2),
                    "per_round_s": round(rounds_s / max(len(chosen), 1), 2),
                }
            )
        )


if __name__ == "__main__":
    main()
