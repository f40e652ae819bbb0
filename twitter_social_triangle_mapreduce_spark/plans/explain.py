"""Plan inspection helpers — the library-side utilities behind the
plan-shape tests (SURVEY.md §5.4) and the ``explain`` CLI subcommand."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_of(df: DataFrame, mode: str = "formatted") -> str:
    """The query's physical plan as a string (pre- or post-execution; with
    AQE the final plan appears after the first action). Classic sessions
    take the direct JVM path; anything without ``_jdf`` (Spark Connect)
    falls back to capturing ``df.explain`` — same text, Connect-safe."""
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), mode
        )
    except AttributeError:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode=mode)
        return buf.getvalue()


def assert_no_cartesian(df: DataFrame, allow_bnlj: bool = False) -> None:
    """Raise if the plan contains a cartesian product (or, unless
    ``allow_bnlj``, a broadcast nested-loop join)."""
    plan = plan_of(df)
    if "CartesianProduct" in plan:
        raise AssertionError("plan contains CartesianProduct")
    if not allow_bnlj and "BroadcastNestedLoopJoin" in plan:
        raise AssertionError("plan degenerates to BroadcastNestedLoopJoin")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the first scan, empty string if none —
    assert on this to prove predicate pushdown reached the source."""
    plan = plan_of(df)
    if "PushedFilters" not in plan:
        return ""
    return plan.split("PushedFilters")[1].split("\n", 1)[0]
