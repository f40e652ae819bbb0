#!/usr/bin/env python
"""Simulate the driver's correctness harness locally, end to end.

Builds a VANILLA SparkSession (no factory confs — the round-1 failure
mode), runs every ``__spark_entry__.queries()`` entry at sf0.01, runs the
matching ``oracle_sql()`` in DuckDB with the tables pre-registered as
views, and compares row count, column names, and an order-insensitive,
column-name-sorted value multiset — the same gate the driver applies.

Usage: python scripts/driver_sim.py [sf_dir] [--include-extra]
                                    [--json-out=PATH]
(default sf_dir /root/testdata/sf0.01; --include-extra also checks the
pytest-tier queries the 50-row driver cap keeps off the registry;
--json-out writes per-query records in the driver's CORRECTNESS_r{N}
shape so off-default-scale gates can be checked in as auditable
artifacts — round 9, r8 verdict item 5)
Prints one line per query and a final tally; exit code 1 on any mismatch.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from twitter_social_triangle_mapreduce_spark.sources.io import TABLES  # noqa: E402


def _norm(v):
    if isinstance(v, float):
        return round(v, 9) if math.isfinite(v) else v
    return v


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--include-extra"]
    include_extra = "--include-extra" in sys.argv[1:]
    only: set[str] | None = None
    json_out: str | None = None
    for a in list(args):
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
            args.remove(a)
        elif a.startswith("--json-out="):
            json_out = a.split("=", 1)[1]
            args.remove(a)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    builder = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        # deliberately NON-UTC: any timezone-sensitive arithmetic must fail here
        .config("spark.sql.session.timeZone", "America/New_York")
    )
    # "vanilla" means no SEMANTIC factory confs (timezone above is
    # adversarial, not helpful) — JVM sizing is environment, not
    # semantics: the 1g default OOMs at sf1 (round 10), and the real
    # driver's harness sizes its own heap too
    mem = os.environ.get("DRIVER_SIM_MEMORY")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if include_extra:
        from twitter_social_triangle_mapreduce_spark import registry

        queries = registry.all_queries(include_extra=True)
        oracles = registry.all_oracles(include_extra=True)
    else:
        queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    if only is not None:
        queries = {k: v for k, v in queries.items() if k in only}
    n_pass = n_rows_only = 0
    failures: list[str] = []
    records: dict[str, dict] = {}

    def rec(name, **kw):
        records[name] = {
            "rows_match": kw.get("rows_match"),
            "schema_match": kw.get("schema_match"),
            "hash_match": kw.get("hash_match"),
            "spark_rows": kw.get("spark_rows"),
            "oracle_rows": kw.get("oracle_rows"),
            "err": kw.get("err"),
        }

    for name, fn in queries.items():
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            rec(name, rows_match=False, schema_match=False,
                hash_match=False, err=f"{type(e).__name__}: {str(e)[:160]}")
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:160]}")
            continue
        if name not in oracles:
            n_rows_only += 1
            rec(name, rows_match=True, spark_rows=len(srows))
            print(f"rows {name}: {len(srows)} rows (no oracle)")
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            rec(name, rows_match=len(srows) == len(orows),
                schema_match=False, hash_match=False,
                spark_rows=len(srows), oracle_rows=len(orows))
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            continue
        perm = [scols.index(c) for c in sorted(scols)]
        operm = [ocols.index(c) for c in sorted(ocols)]
        # key=repr: NULLs are not orderable against ints; repr gives a
        # total order that is identical on both sides, which is all an
        # equality comparison of sorted multisets needs
        sset = sorted(
            (tuple(_norm(r[i]) for i in perm) for r in srows), key=repr
        )
        oset = sorted(
            (tuple(_norm(r[i]) for i in operm) for r in orows), key=repr
        )
        if sset != oset:
            failures.append(name)
            rec(name, rows_match=len(sset) == len(oset), schema_match=True,
                hash_match=False, spark_rows=len(sset), oracle_rows=len(oset))
            print(
                f"FAIL {name}: rows {len(sset)} vs {len(oset)}; "
                f"first diff {next((a, b) for a, b in zip(sset, oset) if a != b) if len(sset) == len(oset) else 'count'}"
            )
            continue
        n_pass += 1
        rec(name, rows_match=True, schema_match=True, hash_match=True,
            spark_rows=len(sset), oracle_rows=len(oset))
        print(f"ok   {name}: {len(sset)} rows hash-match")

    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1)
    print(
        json.dumps(
            {
                "queries": len(queries),
                "hash_match": n_pass,
                "rows_only": n_rows_only,
                "failures": failures,
            }
        )
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
