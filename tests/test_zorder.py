"""Z-order layout (functions/zorder.py + sources.io.write_zordered_parquet).
Curve-value parity with DuckDB is covered by the differential suite
(`event_zorder` runs the identical SQL text in both engines); here we pin
the interleave itself against an independent Python reference and prove
the LAYOUT claim with parquet footer statistics: under z-order, per-file
min/max stats stay tight on the non-leading dimension too, so point
queries on it can skip most files — which a single-column sort cannot do."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from twitter_social_triangle_mapreduce_spark.functions.zorder import (
    quantize_sql,
    zorder_sql,
)
from twitter_social_triangle_mapreduce_spark.sources.io import (
    load_table,
    write_zordered_parquet,
)

from conftest import SF_SMOKE


def _py_morton(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 1000, 65535) for b in (0, 3, 7, 65535)],
        "a long, b long",
    )
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", F.expr(zorder_sql(["a", "b"])).alias("z")
        ).collect()
    }
    for (a, b), z in got.items():
        assert z == _py_morton(a, b), (a, b)


def test_zorder_rejects_overflowing_widths(spark):
    import pytest

    with pytest.raises(ValueError):
        zorder_sql(["a", "b", "c", "d"], bits=16)  # 64 > 62


def _files_hit(path: str, col: str, point: float) -> tuple[int, int]:
    """(files whose [min,max] of col covers point, total files) from
    parquet footers — the skipping a stats-aware scan would do."""
    hit = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        total += 1
        if lo is not None and lo <= point <= hi:
            hit += 1
    return hit, total


def test_zorder_layout_prunes_non_leading_dimension(spark, tmp_path):
    # sf0.01 (10k events): enough rows that a user_id-sorted file
    # genuinely spans the value range, making the contrast meaningful
    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )
    z_sql = zorder_sql(
        [
            f"({quantize_sql('user_id', 0.0, 2000.0)})",
            f"({quantize_sql('value', 0.0, 600.0)})",
        ]
    )
    zpath = str(tmp_path / "z")
    write_zordered_parquet(ev, zpath, z_sql, n_files=8)

    # contrast: linear sort by user_id only (value is unordered per file)
    lpath = str(tmp_path / "lin")
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    probe = 250.0  # a mid-range value-point query
    z_hit, z_total = _files_hit(zpath, "value", probe)
    l_hit, l_total = _files_hit(lpath, "value", probe)
    assert z_total == 8 and l_total == 8
    # linear layout: files span ~the full value range -> no real skipping
    assert l_hit == l_total, (l_hit, l_total)
    # z-order: most files must be skippable for the value probe, and
    # strictly better than the linear layout
    assert z_hit <= z_total // 2, (z_hit, z_total)
    assert z_hit < l_hit

    # layout must not lose or duplicate rows
    assert spark.read.parquet(zpath).count() == ev.count()
