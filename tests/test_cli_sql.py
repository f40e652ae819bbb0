"""The sql CLI subcommand end-to-end (through run_sql)."""

from __future__ import annotations

from twitter_social_triangle_mapreduce_spark.cli import run_sql

from conftest import SF_SMOKE


def test_run_sql_executes_and_prints(spark, capsys):
    run_sql(
        spark,
        SF_SMOKE,
        "SELECT COUNT(*) AS n_edges FROM edges",
    )
    out = capsys.readouterr().out
    assert "n_edges" in out and "1000" in out
