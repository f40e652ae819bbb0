#!/usr/bin/env python
"""Scale-up probe: run the graph core on synthetic graphs 10-100x the
bench scale (generated in-engine, no testdata mutation) and print one
JSON line per size. Evidence that the aggregated formulations hold far
beyond sf0.1 on a single node — and, by shuffle-volume extrapolation, on
a cluster.

Usage: python scripts/scale_probe.py [n_edges ...]   (default 1M 10M)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from twitter_social_triangle_mapreduce_spark.operators import graph  # noqa: E402
from twitter_social_triangle_mapreduce_spark.session import get_spark  # noqa: E402


def synth_edges(spark, n_edges: int, n_nodes: int):
    """Deterministic skewed multigraph: squared-uniform endpoints give a
    moderate power-law (hub share ~ N^-1/2 — cubed skew makes the hub's
    distinct-neighbor product quadratic at large N, which is the
    documented pathological regime, not a throughput probe)."""
    base = spark.range(n_edges)
    u = lambda salt: (  # noqa: E731
        (F.pmod(F.hash(F.col("id") + salt), 1000000) + 1000000) % 1000000
    ) / 1000000.0
    return base.select(
        F.floor(F.pow(u(0), 2) * n_nodes).cast("long").alias("src"),
        F.floor(F.pow(u(7919), 2) * n_nodes).cast("long").alias("dst"),
    )


def main() -> None:
    argv = list(sys.argv[1:])
    skip: set[str] = set()
    for a in list(argv):
        if a.startswith("--skip="):
            skip = set(a.split("=", 1)[1].split(","))
            argv.remove(a)
    sizes = [int(s) for s in argv] or [1_000_000, 10_000_000]
    spark = get_spark(
        app_name="tstm-scale-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        n_nodes = max(2000, n // 50)  # keep density(~50 edges/node) fixed
        e = synth_edges(spark, n, n_nodes).persist()
        e.count()
        out = {"n_edges": n, "n_nodes": n_nodes}
        for name, fn in [
            ("exact_cardinality", lambda: graph.path2_cardinality_total(e)),
            (
                "triangle_shuffle",
                lambda: graph.triangle_count_shuffle(e),
            ),
            (
                "triangle_broadcast_filtered",
                # broadcast strategy needs a bounded cache side, like the
                # reference's MAX cutoff: filter to the low-id quarter
                lambda: graph.triangle_count_broadcast(e, max_id=n_nodes // 4),
            ),
            (
                "triangle_ordered",
                # hub-safe O(E^1.5) wedge strategy, full graph (no cutoff)
                lambda: graph.triangle_count_ordered(e),
            ),
        ]:
            if name in skip:
                continue
            t0 = time.perf_counter()
            val = fn().collect()[0][0]
            out[name] = {"value": int(val), "sec": round(time.perf_counter() - t0, 2)}
        e.unpersist()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
