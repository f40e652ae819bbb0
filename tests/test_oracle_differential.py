"""Differential oracle tests (SURVEY.md §5.1): every registered query runs
in Spark AND as ANSI SQL in DuckDB on the same parquet tables; row sets
must match exactly (the driver's gate does the same at sf0.01 with a
value hash — here we compare the materialized multisets at sf0.001)."""

from __future__ import annotations

import math

import pytest

from twitter_social_triangle_mapreduce_spark import registry

from conftest import SF_SMOKE


def _normalize(v):
    if isinstance(v, float):
        return round(v, 9) if math.isfinite(v) else v
    return v


@pytest.mark.parametrize("name", sorted(registry.all_queries(include_extra=True)))
def test_query_matches_oracle(spark, duck, name):
    oracles = registry.all_oracles(include_extra=True)
    if name not in oracles:
        pytest.skip(f"{name}: no SQL oracle (rows-only check)")
    sdf = registry.all_queries(include_extra=True)[name](spark, SF_SMOKE)
    cur = duck.execute(oracles[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()

    assert sorted(sdf.columns) == sorted(ocols), "column names must match"

    # driver compare is column-name-sorted and order-insensitive
    perm = [sdf.columns.index(c) for c in sorted(sdf.columns)]
    operm = [ocols.index(c) for c in sorted(ocols)]
    srows = sorted(
        tuple(_normalize(r[i]) for i in perm) for r in sdf.collect()
    )
    orows = sorted(
        tuple(_normalize(r[i]) for i in operm) for r in orows
    )
    assert len(srows) == len(orows), "row counts differ"
    assert srows == orows
