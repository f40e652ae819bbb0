"""maintenance_gc (round 10): explicit reclamation of the benign
garbage ``maintenance_status`` counts — folded dirs whose best-effort
delete failed, stale generation markers, crashed holders' staging.
Readers never see any of it (markers + ledgers exclude it), so gc
must change NOTHING a reader returns while driving the status
backlog counters to zero.
"""

from __future__ import annotations

import pytest

import os

from twitter_social_triangle_mapreduce_spark.cli import run_maintain
from twitter_social_triangle_mapreduce_spark.streaming import (


    compact_semantic_embs,
    fold_semantic_batch,
    maintenance_gc,
    maintenance_status,
    read_semantic_snapshot,
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


def _store(spark, tmp_path, folds=3):
    snap = str(tmp_path / "snap")
    for b in range(folds):
        rows = [
            (b * 4 + i, [1.0 * ((b * 4 + i) % DIMS == d) for d in range(DIMS)])
            for i in range(2)
        ]
        fold_semantic_batch(_emb(spark, rows), b, snap, dims=DIMS)
    return snap


def _status(spark, snap):
    return {
        (r["component"], r["metric"]): r["value"]
        for r in maintenance_status(spark, snap, drift=False).collect()
    }


def test_gc_reclaims_fabricated_crash_leftovers(
    spark, fresh_semantic_store_compacted
):
    """Simulate the exact leftovers a crashed cleanup leaves: a folded
    batch dir resurrected after its delete failed, plus a foreign
    staging dir — status counts them, gc removes them, serving is
    bit-identical before and after."""
    snap = fresh_semantic_store_compacted
    served = sorted(map(tuple, read_semantic_snapshot(spark, snap).collect()))

    # resurrect a folded dir (= the compactor's best-effort delete
    # failed) and strand a crashed holder's staging
    os.makedirs(os.path.join(snap, "embs", "b_" + "0" * 20))
    os.makedirs(os.path.join(snap, "embs", "_stage_deadbeef"))
    before = _status(spark, snap)
    assert before[("embs", "folded_dirs_pending_cleanup")] == 1.0
    assert before[("lock", "stage_dirs")] == 1.0

    got = maintenance_gc(spark, snap)
    assert got["folded_dirs"] == 1 and got["stages"] == 1

    after = _status(spark, snap)
    assert ("embs", "folded_dirs_pending_cleanup") not in after
    assert after[("lock", "stage_dirs")] == 0.0
    assert after[("lock", "held")] == 0.0  # gc released its lock
    assert sorted(
        map(tuple, read_semantic_snapshot(spark, snap).collect())
    ) == served


def test_gc_reclaims_a_stale_generation_marker(
    spark, fresh_semantic_store
):
    """Two compactions: the second folds the first generation forward
    and cleans its marker. Resurrect that marker (= the crash window
    round 9 closed on the read side) — gc retires it again, and the
    read path is unchanged throughout."""
    snap = fresh_semantic_store
    g0 = compact_semantic_embs(spark, snap)
    fold_semantic_batch(
        _emb(spark, [(100, [0.0] * 7 + [1.0])]), 3, snap, dims=DIMS
    )
    fold_semantic_batch(
        _emb(spark, [(101, [0.0] * 6 + [1.0, 0.0])]), 4, snap, dims=DIMS
    )
    g1 = compact_semantic_embs(spark, snap)
    assert g1 == g0 + 1
    served = sorted(map(tuple, read_semantic_snapshot(spark, snap).collect()))

    marker = os.path.join(
        snap, "embs", "markers", f"g_{g0:020d}_APPLIED"
    )
    assert not os.path.exists(marker)  # the second compaction cleaned it
    with open(marker, "w"):
        pass  # resurrect: the failed-delete crash leftover
    got = maintenance_gc(spark, snap)
    assert got["stale_generations"] >= 1
    assert not os.path.exists(marker)
    assert sorted(
        map(tuple, read_semantic_snapshot(spark, snap).collect())
    ) == served


def test_gc_on_a_clean_store_is_a_noop(
    spark, capsys, shared_semantic_store
):
    snap = shared_semantic_store
    served = sorted(map(tuple, read_semantic_snapshot(spark, snap).collect()))
    run_maintain(spark, snap, "gc")
    out = capsys.readouterr().out
    assert out.startswith("GC:\t")
    assert "folded_dirs=0" in out and "stages=0" in out
    assert sorted(
        map(tuple, read_semantic_snapshot(spark, snap).collect())
    ) == served


def test_gc_reclaims_crashed_fold_scale_stats_orphans(
    spark, fresh_quantized_ann_store
):
    """A fold records scale_stats BEFORE flipping its batch marker, so
    every crashed attempt strands one stats dir; the drift audit skips
    them (round-10 advisor fix) but nothing deleted them — a
    crash-looping stream accumulates one per loop forever (r10 verdict
    item 6). status counts the lease-aged uncommitted ones, gc
    reclaims exactly those, and a FRESH pre-marker dir (an in-flight
    fold that may still commit) is left alone."""
    import time

    from twitter_social_triangle_mapreduce_spark.streaming import (
        ann_topk_snapshot,
    )

    snap = fresh_quantized_ann_store

    # crashed fold attempts: stats landed, marker never flipped
    old = os.path.join(snap, "scale_stats", "b_" + f"{5:020d}")
    os.makedirs(old)
    with open(os.path.join(old, "part-00000.parquet"), "w") as f:
        f.write("stats from a crashed attempt")
    stale = time.time() - (7 * 3600)
    os.utime(os.path.join(old, "part-00000.parquet"), (stale, stale))
    os.utime(old, (stale, stale))
    fresh = os.path.join(snap, "scale_stats", "b_" + f"{6:020d}")
    os.makedirs(fresh)
    with open(os.path.join(fresh, "part-00000.parquet"), "w") as f:
        f.write("stats from a fold still in flight")

    q = _emb(spark, [(0, [1.0, 0.0, 0.0, 0.0])])

    def serve():
        return sorted(
            map(
                tuple,
                ann_topk_snapshot(spark, snap, q, k=4, nprobe=2).collect(),
            )
        )

    served = serve()
    st = _status(spark, snap)
    assert st[("scale_stats", "orphaned_dirs")] == 1.0

    got = maintenance_gc(spark, snap)
    assert got["scale_stat_orphans"] == 1
    assert not os.path.exists(old)
    assert os.path.exists(fresh)  # may still commit — not garbage yet
    # committed batches' stats untouched; serving identical
    for b in range(2):
        assert os.path.exists(
            os.path.join(snap, "scale_stats", "b_" + f"{b:020d}")
        )
    assert serve() == served
    assert _status(spark, snap)[("scale_stats", "orphaned_dirs")] == 0.0
