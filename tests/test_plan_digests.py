"""Standing plan-digest guard (round 11): the optimized-plan digests of
the bench perf surface (12 headline + the 4 non-capstone extension
queries) are pinned against a committed manifest at sf0.001 — a plan-arm
flip is caught at TEST time, not at the next idle-machine bench run.

Why a same-scale manifest instead of comparing against
BENCH_DETAIL.json (sf0.1): 13 of the 16 digests are scale-stable, but
dedup_minhash_pairs / sessionize / doc_passage_cuts legitimately plan
differently at sf0.001, and excluding them would blind the guard to
exactly the queries whose plans are most data-sensitive. The manifest
pins ALL 16 at the test's own scale under the test session's own confs.

When a digest change is INTENTIONAL (a deliberate plan improvement),
regenerate the manifest and commit it with the change:

    PLAN_DIGEST_REGEN=1 python -m pytest tests/test_plan_digests.py -q

The digest normalization (bench.plan_digest) strips expression ids, AQE
counters, and codegen span numbers, so equality means the plan SHAPE and
expressions are unchanged — the same signal the per-round bench digest
audit uses, available per-commit."""

from __future__ import annotations

import json
import os

import pytest

from conftest import SF_SMOKE

MANIFEST = os.path.join(os.path.dirname(__file__), "plan_digests_sf0001.json")


#: non-bench queries whose plans are ALSO pinned — operators whose
#: scale story depends on a specific plan shape (round-11 flagships);
#: extend as new shape-critical operators land
FLAGSHIPS = [
    "ann_topk_projected",
    "doc_weighted_sample",
    "token_count_sketch",
    "doc_unigram_logprob",
]


def _bench_surface():
    from bench import EXTENSION, HEADLINE

    # the capstones are excluded: they eagerly write training shards at
    # call time (bench times that on purpose; a plan-only guard must not)
    return [
        n for n in HEADLINE + EXTENSION if not n.startswith("prepare_")
    ] + FLAGSHIPS


def _plan_digest(df) -> str:
    """bench.plan_digest's normalization PLUS the lambda-variable
    counter (``lambda x_651#`` — Spark numbers higher-order-function
    variables from a session-GLOBAL counter, so a query's optimized
    plan text depends on how many lambda-bearing plans the session
    built before it; bench.py is immune because it constructs its
    queries in a fixed order in a fresh session, but this guard runs
    inside the shared pytest session after an arbitrary prefix of the
    suite). bench.plan_digest itself stays untouched so the committed
    BENCH_DETAIL digest history keeps its round-over-round continuity."""
    import hashlib
    import re

    s = df._jdf.queryExecution().optimizedPlan().toString()
    s = re.sub(r"\blambda ([A-Za-z]+)_\d+#", r"lambda \1_#", s)
    s = re.sub(r"#\d+", "#", s)
    s = re.sub(r"plan_id=\d+", "plan_id=", s)
    s = re.sub(r"QueryStage \d+", "QueryStage", s)
    s = re.sub(r"\brdd_\d+\b", "rdd_", s)
    s = re.sub(r"\*\(\d+\)", "*(", s)
    return hashlib.md5(s.encode()).hexdigest()[:8]


def _current_digests(spark) -> dict[str, str]:
    from twitter_social_triangle_mapreduce_spark import registry

    qs = registry.all_queries(include_extra=True)
    return {n: _plan_digest(qs[n](spark, SF_SMOKE)) for n in _bench_surface()}


def test_bench_surface_plan_digests_pinned(spark):
    current = _current_digests(spark)
    if os.environ.get("PLAN_DIGEST_REGEN"):
        with open(MANIFEST, "w") as f:
            json.dump(current, f, indent=1, sort_keys=True)
            f.write("\n")
        pytest.skip(f"manifest regenerated with {len(current)} digests")
    assert os.path.exists(MANIFEST), (
        "no committed digest manifest — run PLAN_DIGEST_REGEN=1 pytest"
        " tests/test_plan_digests.py"
    )
    pinned = json.load(open(MANIFEST))
    flips = {
        n: (pinned.get(n), d)
        for n, d in current.items()
        if pinned.get(n) != d
    }
    assert not flips, (
        "plan digest flip(s) — a query's optimized plan changed shape. If"
        " intentional, regenerate the manifest (PLAN_DIGEST_REGEN=1) and"
        f" commit it with the plan change: {flips}"
    )
