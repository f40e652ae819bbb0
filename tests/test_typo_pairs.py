"""Deletion-neighborhood typo mining (dedup.token_typo_pairs). The
registry check runs on a vocabulary with no distance-1 pairs (empty
result pinned); the semantics are proven here with planted typos and a
blocking-completeness property."""

from __future__ import annotations

import random

from twitter_social_triangle_mapreduce_spark.operators.dedup import (
    token_typo_pairs,
)


def _docs(spark, words):
    return spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )


def test_typo_pairs_finds_all_edit_kinds(spark):
    """Substitution, insertion, and deletion neighbors are all found;
    distance-2 words are not; short tokens are exempt."""
    words = [
        "spark", "spork",        # substitution
        "table", "tables",       # insertion at end
        "merge", "merg",         # deletion at end
        "window", "wandow",      # substitution mid
        "totally", "different",  # distance >> 1
        "abc", "abd",            # below min_len -> exempt
    ]
    got = {
        (r["tok_a"], r["tok_b"])
        for r in token_typo_pairs(_docs(spark, words)).collect()
    }
    assert ("spark", "spork") in got
    assert ("table", "tables") in got
    assert ("merg", "merge") in got
    assert ("wandow", "window") in got
    assert ("abc", "abd") not in got
    assert all(
        not {"totally", "different"} & set(p) for p in got
    ), got


def test_typo_blocking_is_complete_on_random_pairs(spark):
    """Property: for random base words, every generated distance-1
    variant must pair with its base — the deletion-neighborhood join
    loses nothing (FastSS completeness)."""
    rng = random.Random(13)
    alpha = "abcdefghij"
    words, expect = [], set()
    for i in range(25):
        base = "".join(rng.choice(alpha) for _ in range(rng.randint(4, 8)))
        kind = rng.choice(["sub", "ins", "del"])
        pos = rng.randrange(len(base))
        if kind == "sub":
            ch = rng.choice([c for c in alpha if c != base[pos]])
            var = base[:pos] + ch + base[pos + 1 :]
        elif kind == "ins":
            var = base[:pos] + rng.choice(alpha) + base[pos:]
        else:
            if len(base) <= 4:
                var = base[:pos] + rng.choice(alpha) + base[pos:]
            else:
                var = base[:pos] + base[pos + 1 :]
        words += [base, var]
        if var != base:
            expect.add(tuple(sorted((base, var))))
    got = {
        (r["tok_a"], r["tok_b"])
        for r in token_typo_pairs(_docs(spark, words)).collect()
    }
    missing = {p for p in expect if p not in got}
    assert not missing, f"blocking lost pairs: {missing}"
