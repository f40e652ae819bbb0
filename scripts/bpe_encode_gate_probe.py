#!/usr/bin/env python
"""Measure the bpe_encode SQL-arm vs pandas-arm crossover (round 8,
r7 verdict item 2): the SQL arm nests one HOF fold per merge, so its
cost grows with plan depth (Catalyst analysis + codegen), while the
Arrow-batched pandas arm is flat in merge count. This probe times BOTH
arms at a ladder of merge counts over the sf0.01 documents table and
prints one JSON line per point — the measured crossover sets
``bpe.SQL_MAX_MERGES_DEFAULT`` (the auto-gate threshold), the same
measure-don't-guess rule the trainer's localMaxWords gate followed.

Merge tables beyond the trained ladder are synthetic ranked pairs over
the testdata alphabet — the ENCODER's cost is per-merge plan depth /
per-merge Python pass, not merge hit rate, so unmatched merges measure
the same machinery (verified: both arms agree bit-for-bit at every
point regardless).

Usage: python scripts/bpe_encode_gate_probe.py [n_merges ...]
(default 8 32 64 96 128 256 512; results in BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402
from twitter_social_triangle_mapreduce_spark.operators import bpe  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def synthetic_merges(n: int) -> list[tuple[int, str, str, int]]:
    """Deterministic ranked merge table: every lowercase bigram (676)
    then bigrams of already-merged symbols — enough distinct ranked
    pairs for any probe ladder, each a structurally-valid merge."""
    out: list[tuple[int, str, str, int]] = []
    alphabet = [chr(ord("a") + i) for i in range(26)]
    syms = list(alphabet)
    r = 0
    i = 0
    while len(out) < n:
        a = syms[i % len(syms)]
        b = syms[(i * 7 + 1) % len(syms)]
        i += 1
        if any(x == a and y == b for _, x, y, _n in out):
            continue
        out.append((r, a, b, 1))
        syms.append(a + b)
        r += 1
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [8, 32, 64, 96, 128, 256, 512]
    spark = get_spark(
        app_name="bpe-encode-gate-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.persist().count()  # take the scan out of both arms' timing
    for n in sizes:
        merges = synthetic_merges(n)
        # force the SQL arm regardless of the gate (probe both sides)
        spark.conf.set(bpe.SQL_MAX_MERGES_CONF, str(10**9))
        t0 = time.time()
        sql_tok = bpe.bpe_encode(docs, merges).agg(
            {"n_tokens": "sum"}
        ).collect()[0][0]
        sql_s = time.time() - t0
        t0 = time.time()
        pd_tok = bpe.bpe_encode_pandas(docs, merges).agg(
            {"n_tokens": "sum"}
        ).collect()[0][0]
        pd_s = time.time() - t0
        spark.conf.unset(bpe.SQL_MAX_MERGES_CONF)
        assert sql_tok == pd_tok, (n, sql_tok, pd_tok)
        print(
            json.dumps(
                {
                    "merges": n,
                    "sql_sec": round(sql_s, 3),
                    "pandas_sec": round(pd_s, 3),
                    "total_tokens": int(sql_tok),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
