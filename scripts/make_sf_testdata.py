#!/usr/bin/env python
"""Generate schema-faithful testdata at an arbitrary scale factor
(round 10, r9 verdict item 5: drive the differential gate one more
decade — sf1 ≈ 6M lineitem rows, where broadcast thresholds cross and
AQE genuinely re-plans, which is exactly where Spark-vs-DuckDB parity
could silently diverge).

The driver testdata tops out at sf0.1 and is read-only, so off-scale
gates need locally-generated input. This writes the same ten tables
with the same schemas (column names/types verified against the driver
parquet, including µs NTZ timestamps), the same value domains
(samples + min/max/distinct audited per column at sf0.01), the same
key relationships (contiguous primary keys, FKs uniform over the
parents), and the sf0.01→sf0.1 row-count scaling continued:

    customer 150k·sf   supplier 10k·sf    part 200k·sf
    orders   1.5M·sf   lineitem 6M·sf     events 1M·sf (users 15k·sf)
    documents max(500, 50k·sf)   embeddings max(500, 20k·sf)

Parity gating does NOT require value-identical data — the driver
compares the repo's Spark plans against the repo's DuckDB oracles over
the SAME files — it requires realistic shape: every column the 50
queries touch draws from the audited domain, embeddings are clustered
(10 labels, center+noise at 64 dims) so the semantic/ANN tier does
real work, and documents use the fixed 31-word vocabulary so the
text/dedup tier sees natural collisions.

Usage: python scripts/make_sf_testdata.py [sf] [out_dir]
       (defaults: sf=1 → /tmp/testdata_sf1)
Then:  python scripts/driver_sim.py /tmp/testdata_sf1 \
           --json-out=CORRECTNESS_sf1_r10.json
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ORDERSTATUS = ["F", "O", "P"]
PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUS = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "en", "en", "en", "de", "zh", "fr", "es"]  # en-heavy
P_ADJ = ["small", "red", "blue", "green", "large", "shiny", "dull", "heavy"]
P_NOUN = ["ring", "widget", "bolt", "gear", "cap", "pin", "rod", "plate"]
P_TYPES = ["ECONOMY", "SMALL", "MEDIUM", "LARGE", "STANDARD", "PROMO"]
#: the driver corpus' 31-word vocabulary (audited at sf0.01)
DOC_VOCAB = (
    "a the spark table row scan slow fast value part hash merge batch "
    "key agg window order data column join small line customer query "
    "group big vector stream filter sort none"
).split()

EMBED_DIMS = 64
N_LABELS = 10

US_PER_DAY = 86_400_000_000


def _ts_us(base_us: int, offsets_us):
    return pa.array(
        (base_us + offsets_us).astype("int64"), pa.timestamp("us")
    )


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/testdata_sf{sf:g}"
    )
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_line = int(6_000_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    def write(name, table, rows_per_rg=500_000):
        pq.write_table(
            table, f"{out}/{name}.parquet", row_group_size=rows_per_rg
        )
        print(f"{name:12s} {table.num_rows:>10,} rows")

    # region / nation: fixed dimensional tables
    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": [
                    "AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST",
                ],
            }
        ),
    )
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array(
                    [i % 5 for i in range(25)], pa.int32()
                ),
            }
        ),
    )

    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust).astype("int32")
                ),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(-999.99, 9999.99, n_cust), 2)
                ),
                "c_mktsegment": pa.array(
                    np.array(MKTSEGMENTS)[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
    )

    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp).astype("int32")
                ),
                "s_acctbal": pa.array(
                    np.round(rng.uniform(-999.99, 9999.99, n_supp), 2)
                ),
            }
        ),
    )

    adj = np.array(P_ADJ)[rng.integers(0, len(P_ADJ), n_part)]
    noun = np.array(P_NOUN)[rng.integers(0, len(P_NOUN), n_part)]
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
                "p_name": np.char.add(np.char.add(adj, " "), noun),
                "p_brand": [
                    f"Brand#{b}" for b in rng.integers(1, 26, n_part)
                ],
                "p_type": pa.array(
                    np.array(P_TYPES)[rng.integers(0, len(P_TYPES), n_part)]
                ),
                "p_size": pa.array(
                    rng.integers(1, 51, n_part).astype("int32")
                ),
                "p_retailprice": pa.array(
                    np.round(900.0 + np.arange(n_part) * 0.1, 2)
                ),
            }
        ),
    )

    # orders: 1995-01-01 .. 2001-08-01 (audited range), µs NTZ
    base_1995 = np.datetime64("1995-01-01", "us").astype("int64")
    span_days = int(
        (
            np.datetime64("2001-08-01", "us")
            - np.datetime64("1995-01-01", "us")
        ).astype("int64")
        // US_PER_DAY
    )
    odate_days = rng.integers(0, span_days + 1, n_ord)
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, n_ord).astype("int64")
                ),
                "o_orderstatus": pa.array(
                    np.array(ORDERSTATUS)[rng.integers(0, 3, n_ord)]
                ),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(1000.0, 500_000.0, n_ord), 2)
                ),
                "o_orderdate": _ts_us(base_1995, odate_days * US_PER_DAY),
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
                ),
            }
        ),
    )

    # lineitem: FK to orders with 1..7 lines (avg 4, the audited mean);
    # shipdate = orderdate + 1..95 days
    lines_per = rng.integers(1, 8, n_ord)
    # trim/pad to exactly n_line rows
    csum = np.cumsum(lines_per)
    cut = int(np.searchsorted(csum, n_line, side="left")) + 1
    lines_per = lines_per[:cut]
    if csum[cut - 1] > n_line:
        lines_per[-1] -= int(csum[cut - 1] - n_line)
    l_orderkey = np.repeat(
        np.arange(len(lines_per), dtype=np.int64), lines_per
    )
    l_linenumber = (
        np.arange(len(l_orderkey)) -
        np.repeat(
            np.concatenate(([0], np.cumsum(lines_per)[:-1])), lines_per
        )
        + 1
    ).astype("int32")
    n_li = len(l_orderkey)
    ship_days = odate_days[l_orderkey] + rng.integers(1, 96, n_li)
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(l_orderkey),
                "l_partkey": pa.array(
                    rng.integers(0, n_part, n_li).astype("int64")
                ),
                "l_suppkey": pa.array(
                    rng.integers(0, n_supp, n_li).astype("int64")
                ),
                "l_linenumber": pa.array(l_linenumber),
                "l_quantity": pa.array(
                    rng.integers(1, 51, n_li).astype("float64")
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(900.0, 105_000.0, n_li), 2)
                ),
                "l_discount": pa.array(
                    np.round(rng.integers(0, 11, n_li) / 100.0, 2)
                ),
                "l_tax": pa.array(
                    np.round(rng.integers(0, 9, n_li) / 100.0, 2)
                ),
                "l_returnflag": pa.array(
                    np.array(RETURNFLAGS)[rng.integers(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(
                    np.array(LINESTATUS)[rng.integers(0, 2, n_li)]
                ),
                "l_shipdate": _ts_us(base_1995, ship_days * US_PER_DAY),
            }
        ),
    )

    # events: 30 days of 2024-01 (audited window, density scales)
    base_2024 = np.datetime64("2024-01-01", "us").astype("int64")
    ev_off = np.sort(
        rng.integers(0, 30 * US_PER_DAY - US_PER_DAY // 86400, n_events)
    )
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
                "ts": _ts_us(base_2024, ev_off),
                "user_id": pa.array(
                    rng.integers(0, n_users, n_events).astype("int64")
                ),
                "event_type": pa.array(
                    np.array(EVENT_TYPES)[rng.integers(0, 5, n_events)]
                ),
                "value": pa.array(
                    np.round(rng.uniform(0.01, 490.02, n_events), 2)
                ),
                "props": [
                    '{"k": %d}' % k
                    for k in rng.integers(0, 100, n_events)
                ],
            }
        ),
    )

    # documents: 31-word vocabulary, 10..100 words per doc
    vocab = np.array(DOC_VOCAB)
    n_words = rng.integers(10, 101, n_docs)
    flat = vocab[rng.integers(0, len(vocab), int(n_words.sum()))]
    texts = []
    pos = 0
    for w in n_words:
        texts.append(" ".join(flat[pos:pos + w]))
        pos += int(w)
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
                "text": texts,
                "lang": pa.array(
                    np.array(LANGS)[rng.integers(0, len(LANGS), n_docs)]
                ),
                "source": [
                    f"src{s}" for s in rng.integers(0, 20, n_docs)
                ],
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], dtype="int64")
                ),
            }
        ),
        rows_per_rg=20_000,
    )

    # embeddings: 10 clustered labels, center+noise, audited ±0.53 range
    labels = rng.integers(0, N_LABELS, n_emb).astype("int32")
    centers = rng.uniform(-0.4, 0.4, (N_LABELS, EMBED_DIMS))
    emb = (
        centers[labels]
        + rng.uniform(-0.12, 0.12, (n_emb, EMBED_DIMS))
    ).astype("float32")
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(emb.reshape(-1)), EMBED_DIMS
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(labels),
            }
        ),
        rows_per_rg=10_000,
    )
    print(f"wrote sf={sf:g} testdata to {out}")


if __name__ == "__main__":
    main()
