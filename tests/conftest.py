from __future__ import annotations

import os

import duckdb
import pytest

from twitter_social_triangle_mapreduce_spark.session import get_spark
from twitter_social_triangle_mapreduce_spark.sources.io import TABLES

SF_SMOKE = "/root/testdata/sf0.001"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow — the fresh-JVM subprocess"
        " probes and 100k+-row parity folds the default gate skips"
        " (the closing-battery path; RUN_SLOW=1 works too)",
    )


def pytest_collection_modifyitems(config, items):
    """Round-10 suite split (r9 verdict item 6): the default gate
    (``pytest tests/ -x -q``) skips ``slow``-marked probes-as-tests so
    it stays a fast pre-commit signal; the closing battery runs
    everything with ``--runslow``. Skipped-not-deselected so the
    default output still shows how many heavyweights were deferred."""
    run_slow = os.environ.get("RUN_SLOW", "").strip().lower()
    if config.getoption("--runslow") or run_slow not in ("", "0", "false"):
        return
    skip = pytest.mark.skip(
        reason="slow: run with --runslow (closing-battery path)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    # default.parallelism=8 (round 11, gate diet): the master stays
    # local[32] — 32 concurrent task threads — but tiny createDataFrame
    # relations stop being sliced into 32 near-empty partitions, which
    # quartered every fold's task count and part-file fan-out. Tests
    # that care about partition counts read the conf, never a constant.
    # shuffle/spill scratch on tmpfs: the gate runs thousands of tiny
    # Spark jobs whose shuffle files otherwise hit disk; RAM-backed
    # scratch is a test-session knob only (the product session leaves
    # spark.local.dir to the deployment)
    s = get_spark(
        app_name="tstm-tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.default.parallelism": "8",
            "spark.local.dir": "/dev/shm/tstm-test-scratch",
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the testdata tables registered as views —
    the same setup the driver's correctness harness uses."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


def edges_df(spark, rows):
    """Inline golden-graph fixture → canonical edges(src,dst) DataFrame."""
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in rows], "src long, dst long"
    )


def scalar(df):
    return df.collect()[0][0]


# --- shared READ-ONLY streaming stores (round 11, r10 verdict item 1) ---
#
# Building a streaming-store snapshot is the expensive part of every
# maintenance-surface test (each semantic fold is several Spark jobs),
# and the round-10 additions built one PER TEST — the default gate
# crept back to ~60 min. Tests that only OBSERVE a store (status,
# check, clone-source reads, CLI summaries) now share these
# session-scoped snapshots. Contract: tests must treat them as
# read-only — anything that deletes, folds into, compacts, rebands, or
# plants garbage in the store builds its own via the per-file helpers.
# (Taking/releasing the maintenance lock is fine: it restores state.)

_STORE_DIMS = 8


def build_semantic_store(spark, root, folds=3, dims=_STORE_DIMS):
    """The canonical little semantic store every maintenance test
    uses: ``folds`` micro-batches of 2 one-hot-ish vectors each."""
    from twitter_social_triangle_mapreduce_spark.streaming import (
        fold_semantic_batch,
    )

    snap = str(root)
    for b in range(folds):
        rows = [
            (
                b * 4 + i,
                [1.0 * ((b * 4 + i) % dims == d) for d in range(dims)],
            )
            for i in range(2)
        ]
        df = spark.createDataFrame(
            [(v, [float(x) for x in e]) for v, e in rows],
            "vec_id long, embedding array<float>",
        )
        fold_semantic_batch(df, b, snap, dims=dims)
    return snap


@pytest.fixture(scope="session")
def shared_semantic_store(spark, tmp_path_factory):
    """READ-ONLY 3-fold semantic store: embs b_0..b_2, serving
    versions v_1/v_2 (keep-window 2), width pin. No generations."""
    return build_semantic_store(
        spark, tmp_path_factory.mktemp("shared_sem") / "snap"
    )


@pytest.fixture(scope="session")
def shared_semantic_store_compacted(spark, tmp_path_factory):
    """READ-ONLY 3-fold semantic store with ONE committed embs
    generation (the richest flat-store layout: batch dirs + g_* +
    ledger + versions + pin)."""
    from twitter_social_triangle_mapreduce_spark.streaming import (
        compact_semantic_embs,
    )

    snap = build_semantic_store(
        spark, tmp_path_factory.mktemp("shared_sem_gen") / "snap"
    )
    compact_semantic_embs(spark, snap)
    return snap


@pytest.fixture(scope="session")
def shared_quantized_ann_store(spark, tmp_path_factory):
    """READ-ONLY 2-fold QUANTIZED ANN store (4 dims, 2-centroid
    codebook, scale pin + per-batch scale_stats)."""
    from twitter_social_triangle_mapreduce_spark.operators.similarity import (
        codebook_df,
    )
    from twitter_social_triangle_mapreduce_spark.streaming import (
        fold_ann_index_batch,
    )

    snap = str(tmp_path_factory.mktemp("shared_ann") / "snap")
    cb = codebook_df(
        spark, [(c, [10.0 * (c == d) for d in range(4)]) for c in range(2)]
    )
    for b in range(2):
        df = spark.createDataFrame(
            [
                (b * 2 + i, [1.0 * (d == b % 2) for d in range(4)])
                for i in range(2)
            ],
            "vec_id long, embedding array<float>",
        )
        fold_ann_index_batch(
            df, b, snap, centroids=cb, quantize=True, scale=1.0
        )
    return snap


@pytest.fixture(scope="session")
def _semantic_store_2fold_template(spark, tmp_path_factory):
    return build_semantic_store(
        spark, tmp_path_factory.mktemp("sem2_tpl") / "snap", folds=2
    )


def _copy_store(template: str, tmp_path, name: str) -> str:
    import shutil

    dst = tmp_path / name
    shutil.copytree(template, dst)
    return str(dst)


@pytest.fixture()
def fresh_semantic_store(shared_semantic_store, tmp_path):
    """DISPOSABLE copy of the 3-fold semantic store for tests that
    mutate (delete dirs, plant garbage, compact, fold): a filesystem
    copytree is ~three orders of magnitude cheaper than rebuilding the
    store with Spark folds, and the store layout is path-relocatable
    by construction (markers/ledgers/pins hold ids and values, never
    absolute paths)."""
    return _copy_store(shared_semantic_store, tmp_path, "sem3")


@pytest.fixture()
def fresh_semantic_store_2fold(_semantic_store_2fold_template, tmp_path):
    """Disposable 2-fold copy — for scenarios that fold batch id 2
    next (crash replays, incremental syncs)."""
    return _copy_store(_semantic_store_2fold_template, tmp_path, "sem2")


@pytest.fixture()
def fresh_semantic_store_compacted(shared_semantic_store_compacted, tmp_path):
    return _copy_store(
        shared_semantic_store_compacted, tmp_path, "sem3gen"
    )


@pytest.fixture()
def fresh_quantized_ann_store(shared_quantized_ann_store, tmp_path):
    return _copy_store(shared_quantized_ann_store, tmp_path, "ann2")
