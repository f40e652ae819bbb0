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


def test_run_query_prints_and_writes_parquet(spark, capsys, tmp_path):
    from twitter_social_triangle_mapreduce_spark.cli import run_query

    run_query(spark, SF_SMOKE, "exact_cardinality")
    out = capsys.readouterr().out
    assert "total_paths" in out

    dest = str(tmp_path / "q_out")
    run_query(spark, SF_SMOKE, "degree_distribution", dest)
    back = spark.read.parquet(dest)
    assert back.columns == ["out_degree", "n_nodes"]
    assert back.count() > 0


def test_run_query_rejects_unknown_name(spark):
    import pytest

    from twitter_social_triangle_mapreduce_spark.cli import run_query

    with pytest.raises(SystemExit):
        run_query(spark, SF_SMOKE, "no_such_query")


def test_run_explain_prints_plan(spark, capsys):
    from twitter_social_triangle_mapreduce_spark.cli import run_explain

    plan = run_explain(spark, SF_SMOKE, "exact_cardinality")
    out = capsys.readouterr().out
    assert "HashAggregate" in plan or "Physical Plan" in plan
    assert plan in out or out  # printed to stdout


def test_run_explain_rejects_unknown_query(spark):
    import pytest

    from twitter_social_triangle_mapreduce_spark.cli import run_explain

    with pytest.raises(SystemExit):
        run_explain(spark, SF_SMOKE, "nope")
