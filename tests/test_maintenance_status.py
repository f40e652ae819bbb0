"""maintenance_status (round 10): the read-only observe side of the
maintenance surface.

Every mutator (compactors, re-band, rebuild) and the drift audit were
CLI-dispatchable, but choosing WHICH to run — is compaction overdue, is
a lock stuck, did the re-band land, is the quantizer drifting — meant
poking at marker files by hand. ``maintenance_status`` answers from
the same crash-consistent listings the readers use, takes NO lock
(asserted: it works, unchanged, while a rival lock is held), and emits
only rows for sub-stores that exist.
"""

from __future__ import annotations

import pytest

import os

from twitter_social_triangle_mapreduce_spark.cli import run_maintain
from twitter_social_triangle_mapreduce_spark.operators.similarity import (
    codebook_df,
)
from twitter_social_triangle_mapreduce_spark.streaming import (
    compact_semantic_embs,
    fold_ann_index_batch,
    fold_semantic_batch,
    maintenance_status,
    reband_semantic_store,
)

# Round 13 (r12 verdict item 1a): this whole suite is a streaming-
# fold / maintenance / rebuild probe battery - heavyweight by nature
# (fresh stores, multi-generation snapshots, stateful queries). It
# runs in the closing battery (--runslow / RUN_SLOW=1), keeping the
# default gate inside the driver's window. The oracle-differential,
# golden, plan-shape, and digest suites stay in the default gate.
pytestmark = pytest.mark.slow

DIMS = 8


def _emb(spark, rows):
    return spark.createDataFrame(
        [(v, [float(x) for x in e]) for v, e in rows],
        "vec_id long, embedding array<float>",
    )


def _semantic_store(spark, tmp_path, folds=3):
    snap = str(tmp_path / "snap")
    for b in range(folds):
        rows = [
            (b * 4 + i, [1.0 * ((b * 4 + i) % DIMS == d) for d in range(DIMS)])
            for i in range(2)
        ]
        fold_semantic_batch(_emb(spark, rows), b, snap, dims=DIMS)
    return snap


def _rows(df):
    return {
        (r["component"], r["metric"]): (r["value"], r["detail"])
        for r in df.collect()
    }


def test_empty_snapshot_reports_only_the_lock(spark, tmp_path):
    snap = str(tmp_path / "nothing")
    os.makedirs(snap)
    got = _rows(maintenance_status(spark, snap))
    assert got[("lock", "held")][0] == 0.0
    assert got[("lock", "reclaim_parks")][0] == 0.0
    assert got[("lock", "stage_dirs")][0] == 0.0
    assert {c for c, _ in got} == {"lock"}


def test_semantic_store_versions_batches_and_bits(
    spark, fresh_semantic_store
):
    snap = fresh_semantic_store
    got = _rows(maintenance_status(spark, snap))
    # the rollup keep-window prunes to 2 retained versions of the 3
    assert got[("versions", "committed")] == (2.0, "newest=v_2")
    # three folds → three live embs dirs, no generations yet
    assert got[("embs", "live_batch_dirs")][0] == 3.0
    assert ("embs", "generations") not in got
    assert got[("bits", "pinned")][0] >= 1.0
    assert ("vectors", "live_batches") not in got  # no ANN sub-store

    gen = compact_semantic_embs(spark, snap)
    got = _rows(maintenance_status(spark, snap))
    # two below-the-bound dirs folded into one generation; best-effort
    # cleanup ran, so no stale dirs linger — the live count is 1 batch
    # dir + the generation row reports itself separately
    assert got[("embs", "generations")][0] == 1.0
    assert f"live=[{gen}]" in got[("embs", "generations")][1]
    assert got[("embs", "live_batch_dirs")][0] == 1.0


def test_reband_reports_serving_state_and_new_width(
    spark, fresh_semantic_store
):
    snap = fresh_semantic_store
    before = _rows(maintenance_status(spark, snap))
    assert ("states", "rebands") not in before
    got_bits = reband_semantic_store(spark, snap, bits=10, dims=DIMS)
    assert got_bits == 10
    after = _rows(maintenance_status(spark, snap))
    assert after[("states", "rebands")][0] == 1.0
    assert after[("states", "rebands")][1].startswith("serving=r_")
    assert after[("bits", "pinned")][0] == 10.0
    assert after[("bits", "pinned")][1].startswith("state=r_")


def test_status_is_lockless_and_sees_the_holder(
    spark, fresh_semantic_store
):
    snap = fresh_semantic_store
    lock = os.path.join(snap, "markers", "_MAINTENANCE_LOCK")
    os.makedirs(os.path.dirname(lock), exist_ok=True)
    with open(lock, "w") as f:
        f.write("feedc0de" * 4)
    # a crashed holder's staging and a crashed reclaimer's park too
    os.makedirs(os.path.join(snap, "embs", "_stage_deadbeef"))
    with open(lock + ".reclaim_cafe", "w") as f:
        f.write("x")
    got = _rows(maintenance_status(spark, snap))  # must not raise/block
    assert got[("lock", "held")][0] == 1.0
    detail = got[("lock", "held")][1]
    assert "token=feedc0de" in detail and "age_s=" in detail
    assert got[("lock", "reclaim_parks")][0] == 1.0
    assert got[("lock", "stage_dirs")] == (1.0, "embs/_stage_deadbeef")


def test_quantized_ann_store_reports_scale_and_drift(spark, tmp_path):
    snap = str(tmp_path / "ann")
    cb = codebook_df(
        spark, [(c, [10.0 * (c == d) for d in range(4)]) for c in range(2)]
    )

    def emb4(rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )

    fold_ann_index_batch(
        emb4([(0, [1.0, 0, 0, 0]), (1, [0, 1.0, 0, 0])]),
        0,
        snap,
        centroids=cb,
        quantize=True,
        scale=1.0,
    )
    fold_ann_index_batch(  # drifted: max-abs 10 on a 1.0 grid
        emb4([(2, [10.0, 2.0, 0, 0])]),
        1,
        snap,
        centroids=cb,
        quantize=True,
    )
    got = _rows(maintenance_status(spark, snap))
    assert got[("vectors", "live_batches")] == (2.0, "newest=1")
    assert got[("vectors", "pinned_scale")][0] == 1.0
    assert got[("drift", "headroom_ratio")][0] < 1.0  # clamped → flagged
    assert got[("drift", "n_clamped_batches")][0] == 1.0
    # pure-listing probe: no Spark job over scale_stats
    lazy = _rows(maintenance_status(spark, snap, drift=False))
    assert ("drift", "headroom_ratio") not in lazy
    assert lazy[("vectors", "live_batches")][0] == 2.0


def test_cli_status_prints_the_report(
    spark, capsys, shared_semantic_store
):
    run_maintain(spark, shared_semantic_store, "status")
    out = capsys.readouterr().out
    lines = [ln.split("\t") for ln in out.strip().splitlines()]
    by_key = {(c, m): (v, d) for c, m, v, d in lines}
    assert by_key[("lock", "held")][0] == "0"  # integral → un-decimaled
    assert by_key[("versions", "committed")] == ("2", "newest=v_2")
    assert by_key[("embs", "live_batch_dirs")][0] == "3"


# --- maintenance_check (the fsck half) ---


import shutil  # noqa: E402

import pytest  # noqa: E402

from twitter_social_triangle_mapreduce_spark.streaming import (  # noqa: E402


    maintenance_check,
)


def _findings(df):
    return {
        (r["severity"], r["component"], r["finding"]): r["detail"]
        for r in df.collect()
    }


def _gen_name(snap, sub):
    root = os.path.join(snap, sub)
    gens = [d for d in os.listdir(root) if d.startswith("g_")]
    assert len(gens) == 1
    return gens[0]


def test_check_healthy_semantic_store_is_all_ok(
    spark, shared_semantic_store_compacted
):
    snap = shared_semantic_store_compacted
    got = _findings(maintenance_check(spark, snap))
    assert all(sev == "ok" for sev, _, _ in got)
    assert ("ok", "embs", "verified") in got
    assert ("ok", "states", "verified") in got
    assert got[("ok", "states", "verified")].startswith("serving=v_")


def test_check_flags_lost_live_generation_dir(
    spark, fresh_semantic_store_compacted
):
    snap = fresh_semantic_store_compacted
    shutil.rmtree(os.path.join(snap, "embs", _gen_name(snap, "embs")))
    got = _findings(maintenance_check(spark, snap))
    assert ("error", "embs", "live_generation_dir_missing") in got
    assert ("ok", "embs", "verified") not in got
    # the untouched stores still verify
    assert ("ok", "states", "verified") in got


def test_check_flags_live_generation_without_ledger(
    spark, fresh_semantic_store_compacted
):
    snap = fresh_semantic_store_compacted
    shutil.rmtree(os.path.join(snap, "embs", "compact_sources"))
    got = _findings(maintenance_check(spark, snap))
    assert ("error", "embs", "live_generation_without_ledger") in got


def test_check_flags_lost_serving_state(spark, fresh_semantic_store):
    snap = fresh_semantic_store
    shutil.rmtree(os.path.join(snap, "v_" + f"{2:020d}", "state"))
    got = _findings(maintenance_check(spark, snap))
    assert ("error", "states", "serving_state_missing") in got


def test_check_warns_on_stale_lock_and_dirless_ann_batch(
    spark, fresh_quantized_ann_store
):
    snap = fresh_quantized_ann_store
    # simulate an empty micro-batch: marker committed, no partition dir
    with open(
        os.path.join(snap, "markers", "b_" + f"{7:020d}" + "_APPLIED"), "w"
    ):
        pass
    lock = os.path.join(snap, "markers", "_MAINTENANCE_LOCK")
    with open(lock, "w") as f:
        f.write("deadc0de" * 4)
    week_ago = os.path.getmtime(lock) - 7 * 24 * 3600
    os.utime(lock, (week_ago, week_ago))
    got = _findings(maintenance_check(spark, snap))
    assert ("warning", "lock", "stale_lock_past_lease") in got
    assert ("warning", "vectors", "committed_batch_without_dir") in got
    # a dir-less batch is a warning, not an error: vectors still verify
    assert ("ok", "vectors", "verified") in got
    assert "quantized" in got[("ok", "vectors", "verified")]


def test_check_plain_rollup_versions_do_not_false_error(spark, tmp_path):
    """A plain incremental rollup's v_* dirs hold parquet DIRECTLY (no
    state/ subdir) — the serving-state invariant is semantic/cluster
    only and must not fire here."""
    snap = str(tmp_path / "rollup")
    vdir = os.path.join(snap, "v_" + "0" * 20)
    spark.createDataFrame([(1, 2)], "k int, n long").coalesce(
        1
    ).write.parquet(vdir)
    with open(os.path.join(vdir, "_APPLIED"), "w"):
        pass
    got = _findings(maintenance_check(spark, snap))
    assert not [k for k in got if k[0] == "error"]
    assert ("error", "states", "serving_state_missing") not in got


def test_cli_check_exits_nonzero_on_error(
    spark, capsys, fresh_semantic_store_compacted
):
    snap = fresh_semantic_store_compacted
    run_maintain(spark, snap, "check")
    assert "CHECK:\tOK" in capsys.readouterr().out
    shutil.rmtree(os.path.join(snap, "embs", "compact_sources"))
    with pytest.raises(SystemExit):
        run_maintain(spark, snap, "check")
    assert "ERRORS=1" in capsys.readouterr().out


def test_deep_check_counts_interleaved_write_duplicates(
    spark, fresh_semantic_store_2fold
):
    """deep=True reads the live union and counts duplicated FULL rows —
    the signature of two writers' interleaved overwrite part files both
    surviving (the corruption class the CAS lock prevents). Injected
    here by literally duplicating a part file inside a live batch
    dir, exactly what a lost overwrite race leaves behind."""
    snap = fresh_semantic_store_2fold
    got = _findings(maintenance_check(spark, snap, deep=True))
    assert ("ok", "embs", "deep_no_duplicates") in got
    assert ("warning", "embs", "duplicate_rows") not in got
    n_before = int(got[("ok", "embs", "deep_no_duplicates")].split("=")[1])

    b0 = os.path.join(snap, "embs", "b_" + "0" * 20)
    # largest part file: the write spreads 2 rows over many partitions,
    # so most part files are empty footers — duplicating one of those
    # would duplicate zero rows
    part = max(
        (
            f for f in os.listdir(b0)
            if f.endswith(".parquet") and not f.startswith("_")
        ),
        key=lambda f: os.path.getsize(os.path.join(b0, f)),
    )
    shutil.copy(
        os.path.join(b0, part), os.path.join(b0, "part-rival-" + part)
    )
    got = _findings(maintenance_check(spark, snap, deep=True))
    assert ("ok", "embs", "deep_no_duplicates") not in got
    detail = got[("warning", "embs", "duplicate_rows")]
    # the copied part file held >=1 of the batch's rows; every row it
    # held is now a full-row duplicate and the union grew by as many
    dups = int(detail.split("=")[1].split(" ")[0])
    total = int(detail.split(" of ")[1].split(" ")[0])
    assert dups >= 1 and total == n_before + dups
    # shallow pass unaffected: markers/ledgers are intact
    assert ("ok", "embs", "verified") in got


def test_cli_deep_check_stays_ok_on_duplicates(
    spark, capsys, shared_semantic_store
):
    """duplicate_rows is a WARNING (an upstream feeder that repeated
    rows is indistinguishable) — the CLI must not exit nonzero."""
    snap = shared_semantic_store
    run_maintain(spark, snap, "check", deep=True)
    out = capsys.readouterr().out
    assert "deep_no_duplicates" in out
    assert "CHECK:\tOK" in out


def test_cli_json_output_is_parseable(
    spark, capsys, shared_semantic_store
):
    import json

    snap = shared_semantic_store
    run_maintain(spark, snap, "status", as_json=True)
    rows = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    by_key = {(r["component"], r["metric"]): r for r in rows}
    assert by_key[("lock", "held")]["value"] == 0  # int, not 0.0
    assert by_key[("versions", "committed")]["detail"] == "newest=v_2"

    run_maintain(spark, snap, "check", as_json=True)
    rows = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert rows[-1] == {"check": "ok", "errors": 0}
    assert all("severity" in r for r in rows[:-1])


def test_deep_check_reads_exactly_what_readers_read_for_cuts(
    spark, tmp_path
):
    """cuts/ and packs/ gate reads on IN-DIR markers
    (read_passage_cuts / read_packed_corpus) — the deep scan must use
    the same gate, or an uncommitted crashed-fold dir joins the union:
    half-written parquet produces a spurious deep_scan_failed, and a
    complete-but-uncommitted dir skews the duplicate count with rows
    no reader sees (advisor finding, round 11)."""
    from twitter_social_triangle_mapreduce_spark.streaming import (
        fold_passage_batch,
    )

    snap = str(tmp_path / "psnap")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 30), (2, "unique text " * 40)],
        "doc_id long, text string",
    )
    fold_passage_batch(docs, 0, snap)
    got = _findings(maintenance_check(spark, snap, deep=True))
    assert ("ok", "cuts", "deep_no_duplicates") in got
    n_committed = int(
        got[("ok", "cuts", "deep_no_duplicates")].split("=")[1]
    )

    # crashed fold: a half-written cuts dir with NO in-dir marker —
    # invisible to read_passage_cuts, so invisible to the deep scan
    crashed = os.path.join(snap, "cuts", "c_" + f"{1:020d}")
    os.makedirs(crashed)
    with open(os.path.join(crashed, "part-00000.parquet"), "w") as f:
        f.write("not parquet - a torn write")
    got = _findings(maintenance_check(spark, snap, deep=True))
    assert ("warning", "cuts", "deep_scan_failed") not in got
    assert int(
        got[("ok", "cuts", "deep_no_duplicates")].split("=")[1]
    ) == n_committed
