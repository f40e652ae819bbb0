"""Driver-parity regression guards — the class of bug that cost round 1.

The driver's correctness harness builds a VANILLA
``SparkSession.builder.getOrCreate()`` (no factory confs, machine-local
timezone). Round 1 lost 22/50 queries because ``load_table`` depended on a
session conf only ``session.get_spark`` set. These tests make that
unreproducible:

1. a subprocess with a truly vanilla, non-UTC session imports
   ``__spark_entry__`` and runs one query per table family end-to-end;
2. in-process, ts-dependent queries are executed under two different
   ``spark.sql.session.timeZone`` values and must return identical rows.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from twitter_social_triangle_mapreduce_spark import registry

from conftest import SF_SMOKE

# one query per table family: events(graph) / events(relational) /
# documents / embeddings / lineitem / events+orders
_SMOKE_QUERIES = [
    "exact_cardinality",
    "sessionize",
    "dedup_exact",
    "ann_topk_bruteforce",
    "pricing_summary",
    "events_last_order_asof",
]

_VANILLA_SCRIPT = f"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# vanilla on purpose: NO factory confs; deliberately non-UTC timezone
spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "America/New_York")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

out = {{"entry_rows": e.entry(spark).count()}}
qs = e.queries()
for name in {_SMOKE_QUERIES!r}:
    out[name] = qs[name](spark, {SF_SMOKE!r}).count()
print("RESULT:" + __import__("json").dumps(out))
spark.stop()
"""


def test_vanilla_session_runs_every_table_family():
    proc = subprocess.run(
        [sys.executable, "-c", _VANILLA_SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT:")),
        None,
    )
    assert line is not None, proc.stdout[-2000:]
    counts = json.loads(line[len("RESULT:"):])
    assert counts["entry_rows"] >= 1
    for name in _SMOKE_QUERIES:
        assert counts[name] > 0, f"{name} returned no rows under vanilla session"


#: every registered query whose result depends on event-time arithmetic
_TS_QUERIES = [
    "sessionize",
    "user_event_setops",
    "events_last_order_asof",
    "sessionize_native",
]


@pytest.mark.parametrize("name", _TS_QUERIES)
def test_ts_queries_are_timezone_independent(spark, name):
    """Identical results under UTC and a +05:30 session timezone — epoch
    math must come from the NTZ wall clock, never the session zone."""
    fn = registry.all_queries(include_extra=True)[name]
    tz_key = "spark.sql.session.timeZone"
    original = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "UTC")
        utc_rows = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
        # half-hour offset catches second-level shifts, not just hours
        spark.conf.set(tz_key, "Asia/Kolkata")
        ist_rows = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    finally:
        spark.conf.set(tz_key, original)
    assert utc_rows == ist_rows
