"""rebuild_ann_index (round 10, r9 verdict item 2): the executable
response to the quantizer-drift signal.

A quantized streaming ANN store pins its int8 grid at first fold and
discards the floats, so a corpus that outgrows the grid CLAMPS —
``ann_scale_headroom`` measures that (round 9) but the remedy ("rebuild
from source") had no operator. The rebuild re-quantizes the whole
corpus from the float source onto a corpus-sized grid, committed as one
generation whose ``scale_gens`` record pins the new scale WITH the
vectors (one atomic marker — the quantized twin of the semantic store's
in-dir bits pin), restarts the drift ledger, keeps the newest stream
batch's marker as the replay fence, and refuses partial-corpus sources.
"""

from __future__ import annotations

import os

import pytest

from twitter_social_triangle_mapreduce_spark.operators.similarity import (
    codebook_df,
)
from twitter_social_triangle_mapreduce_spark.streaming import (
    ConcurrentMaintenanceError,
    ann_scale_headroom,
    ann_topk_snapshot,
    compact_ann_index,
    fold_ann_index_batch,
    rebuild_ann_index,
)

DIMS = 4


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _cb(spark):
    return codebook_df(
        spark,
        [(c, [10.0 * (c == d) for d in range(DIMS)]) for c in range(2)],
    )


B0 = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
#: drifted batch: max-abs 10 on a grid pinned at 1.0 — clamps
B1 = [(2, [10.0, 2.0, 0.0, 0.0]), (3, [5.0, 5.0, 0.0, 0.0])]


import pytest as _pytest

# Round 13 (r12 verdict item 1a): this whole suite is a streaming-
# fold / maintenance / rebuild probe battery - heavyweight by nature
# (fresh stores, multi-generation snapshots, stateful queries). It
# runs in the closing battery (--runslow / RUN_SLOW=1), keeping the
# default gate inside the driver's window. The oracle-differential,
# golden, plan-shape, and digest suites stay in the default gate.
pytestmark = pytest.mark.slow



@_pytest.fixture(scope="session")
def _drifted_template(spark, tmp_path_factory):
    """Session-built drifted quantized store — every test takes a
    DISPOSABLE copytree copy via _drifted_store (the layout is
    path-relocatable; rebuilding it per test cost ~10 s of folds)."""
    snap = str(tmp_path_factory.mktemp("drifted_tpl") / "snap")
    cb = _cb(spark)
    fold_ann_index_batch(
        _emb(spark, B0), 0, snap, centroids=cb, quantize=True, scale=1.0
    )
    fold_ann_index_batch(
        _emb(spark, B1), 1, snap, centroids=cb, quantize=True
    )
    return snap


def _drifted_store(spark, tmp_path, template):
    import shutil

    snap = str(tmp_path / "snap")
    shutil.copytree(template, snap)
    return snap, _cb(spark)


def _serve(spark, snap, q_rows, k=4):
    return {
        (r["qid"], r["nid"]): r["sim_e4"]
        for r in ann_topk_snapshot(
            spark, snap, _emb(spark, q_rows), k=k, nprobe=2
        ).collect()
    }


def test_rebuild_restores_headroom_and_ranking(spark, tmp_path, _drifted_template):
    """The full drift story: clamping destroys the ranking (two
    distinct vectors quantize identically), the audit flags it, the
    rebuild cures it — headroom back to 1.0, the true cosine order
    restored, folds continue on the NEW grid, the replay fence holds,
    and a later compaction carries the rebuilt scale forward."""
    snap, cb = _drifted_store(spark, tmp_path, _drifted_template)
    q = [(0, [1.0, 0.2, 0.0, 0.0])]
    before = _serve(spark, snap, q)
    # clamping collapsed v2=[10,2] and v3=[5,5] onto the same int8
    # point -> identical similarities (the information is GONE)
    assert before[(0, 2)] == before[(0, 3)]
    row = ann_scale_headroom(spark, snap).collect()[0]
    assert row["pinned_scale"] == 1.0
    assert row["corpus_max_abs"] == 10.0
    assert row["n_clamped_batches"] == 1  # the drifted batch
    # the cure: rebuild from the float source at the corpus max-abs
    source = _emb(spark, B0 + B1)
    got_scale = rebuild_ann_index(spark, snap, source)
    assert got_scale == 10.0
    row = ann_scale_headroom(spark, snap).collect()[0]
    assert row["pinned_scale"] == 10.0
    assert row["corpus_max_abs"] == 10.0
    assert row["headroom_ratio"] == 1.0
    assert row["n_batches"] == 1 and row["n_clamped_batches"] == 0
    after = _serve(spark, snap, q)
    assert set(after) == set(before)  # same corpus served, no dup/loss
    # true cosine order restored: v2 is parallel to q (sim ~1), v3 is
    # not -- the rebuilt grid separates what clamping had collapsed
    assert after[(0, 2)] > after[(0, 3)]
    assert after[(0, 2)] >= 9990
    # replay fence: the newest folded stream batch keeps its marker,
    # so a recovering stream's replay is a no-op, not a duplicate
    assert os.path.exists(
        f"{snap}/markers/b_" + "1".zfill(20) + "_APPLIED"
    )
    assert not os.path.exists(
        f"{snap}/markers/b_" + "0".zfill(20) + "_APPLIED"
    )
    fold_ann_index_batch(
        _emb(spark, B1), 1, snap, centroids=cb, quantize=True
    )
    assert _serve(spark, snap, q) == after
    # post-rebuild folds quantize on the NEW grid (resolution follows
    # the generation-pinned record, not the legacy root pin)
    fold_ann_index_batch(
        _emb(spark, [(4, [0.0, 7.0, 0.0, 0.0])]),
        2,
        snap,
        centroids=cb,
        quantize=True,
    )
    q2 = [(1, [0.0, 1.0, 0.0, 0.0])]
    served2 = _serve(spark, snap, q2, k=1)
    assert list(served2) == [(1, 4)] and served2[(1, 4)] >= 9990
    row = ann_scale_headroom(spark, snap).collect()[0]
    assert row["pinned_scale"] == 10.0 and row["n_clamped_batches"] == 0
    # a later compaction carries the rebuilt scale with the new
    # generation (and retires the fence marker once newer stream
    # batches exist)
    fold_ann_index_batch(
        _emb(spark, [(5, [0.0, 0.0, 0.0, 6.0])]),
        3,
        snap,
        centroids=cb,
        quantize=True,
    )
    full = _serve(spark, snap, q, k=6)
    assert compact_ann_index(spark, snap) is not None
    assert _serve(spark, snap, q, k=6) == full  # parity across the flip
    row = ann_scale_headroom(spark, snap).collect()[0]
    assert row["pinned_scale"] == 10.0
    assert not os.path.exists(
        f"{snap}/markers/b_" + "1".zfill(20) + "_APPLIED"
    )  # fence retired: newer stream batches committed


def test_rebuild_refuses_partial_source(spark, tmp_path, _drifted_template):
    """A source missing vectors the store serves would silently DELETE
    them from the index — refused up front."""
    snap, _ = _drifted_store(spark, tmp_path, _drifted_template)
    with pytest.raises(ValueError, match="partial corpus"):
        rebuild_ann_index(spark, snap, _emb(spark, B0))  # half the ids


def test_rebuild_requires_quantized_store(spark, tmp_path):
    """A float store has no grid to drift — rebuilding it is a usage
    error, not a no-op."""
    snap = str(tmp_path / "fsnap")
    fold_ann_index_batch(_emb(spark, B0), 0, snap, centroids=_cb(spark))
    with pytest.raises(ValueError, match="not a quantized"):
        rebuild_ann_index(spark, snap, _emb(spark, B0))


def test_rebuild_rejects_concurrent_rival(spark, tmp_path, _drifted_template):
    """The rebuild sits on the same per-snapshot maintenance lock as
    the compactors."""
    snap, _ = _drifted_store(spark, tmp_path, _drifted_template)
    os.makedirs(f"{snap}/markers", exist_ok=True)
    lock = f"{snap}/markers/_MAINTENANCE_LOCK"
    with open(lock, "w") as fh:
        fh.write("rival-token-0000")
    before = _serve(spark, snap, [(0, [1.0, 0.2, 0.0, 0.0])])
    with pytest.raises(ConcurrentMaintenanceError, match="holds"):
        rebuild_ann_index(spark, snap, _emb(spark, B0 + B1))
    assert _serve(spark, snap, [(0, [1.0, 0.2, 0.0, 0.0])]) == before
    os.remove(lock)
    assert rebuild_ann_index(spark, snap, _emb(spark, B0 + B1)) == 10.0


def test_rebuild_with_explicit_scale_keeps_ledger_honest(spark, tmp_path, _drifted_template):
    """An explicit --scale below the corpus max-abs still clamps; the
    restarted drift ledger must record the OBSERVED max-abs (measured
    inside the write job), so the audit immediately reports the
    remaining drift instead of trusting the caller's claim."""
    snap, _ = _drifted_store(spark, tmp_path, _drifted_template)
    got = rebuild_ann_index(
        spark, snap, _emb(spark, B0 + B1), scale=5.0
    )
    assert got == 5.0
    row = ann_scale_headroom(spark, snap).collect()[0]
    assert row["pinned_scale"] == 5.0
    assert row["corpus_max_abs"] == 10.0  # observed, not claimed
    assert row["headroom_ratio"] == 0.5
    assert row["n_clamped_batches"] == 1


@pytest.mark.slow  # crash-tolerance simulation over 5 folds (closing battery)
def test_empty_batch_marker_without_dir_breaks_nothing(spark, tmp_path, _drifted_template):
    """An empty micro-batch's dynamic-partition write emits NO
    ``vectors/batch=<id>`` dir yet still commits its marker (round-10
    review finding): the rebuild's byte-sizing loop and the
    compactor's source listing must both tolerate the dir-less
    committed batch instead of dying on getContentSummary — which
    would make the drift cure permanently unrunnable on any store
    that ever saw an empty fold."""
    snap, cb = _drifted_store(spark, tmp_path, _drifted_template)
    # empty fold: marker commits, no vectors/batch=2 dir appears
    fold_ann_index_batch(_emb(spark, []), 2, snap, centroids=cb, quantize=True)
    assert os.path.exists(f"{snap}/markers/b_{2:020d}_APPLIED")
    assert not os.path.exists(f"{snap}/vectors/batch=2")

    # rebuild over live = [0, 1, 2] walks the dir-less batch fine
    assert rebuild_ann_index(spark, snap, _emb(spark, B0 + B1)) == 10.0
    got = _serve(spark, snap, [(0, [10.0, 2.0, 0.0, 0.0])], k=1)
    assert set(got) == {(0, 2)}  # true nearest, un-clamped

    # compaction with a dir-less SOURCE batch: fold an empty batch 3
    # (compactable once batch 4 exists) and a real batch 4
    fold_ann_index_batch(_emb(spark, []), 3, snap, centroids=cb, quantize=True)
    fold_ann_index_batch(
        _emb(spark, [(4, [0.0, 0.0, 8.0, 0.0])]),
        4,
        snap,
        centroids=cb,
        quantize=True,
    )
    assert compact_ann_index(spark, snap) is not None
    # the merged generation serves the rebuilt corpus; batch 4 stays
    # live as the replay fence (qid 99: the top-k tail excludes
    # nid == qid, so a colliding query id would hide vec 0)
    got = _serve(spark, snap, [(99, [10.0, 2.0, 0.0, 0.0])], k=5)
    assert {nid for (_, nid) in got} == {0, 1, 2, 3, 4}


def test_rebuild_flip_fence_aborts_on_mid_rebuild_stream_commit(
    spark, tmp_path, monkeypatch
, _drifted_template):
    """A fold that commits WHILE the rebuild runs carries old-grid
    vectors the rebuild cannot cure (it is absent from the sources, so
    post-flip serving would dequantize it on the new grid). The
    pre-flip fence re-lists the committed batches and aborts with the
    store untouched (round-10 review finding)."""
    import twitter_social_triangle_mapreduce_spark.streaming.streams as S

    snap, cb = _drifted_store(spark, tmp_path, _drifted_template)
    before = _serve(spark, snap, [(0, [1.0, 0.2, 0.0, 0.0])])

    real = S._ann_marker_state
    calls = {"n": 0}

    def spy(spark_, path):
        live, left = real(spark_, path)
        calls["n"] += 1
        if calls["n"] == 2:  # the pre-flip fence re-listing
            live = list(live) + [7]  # a stream batch landed mid-rebuild
        return live, left

    monkeypatch.setattr(S, "_ann_marker_state", spy)
    with pytest.raises(ConcurrentMaintenanceError, match="Pause the"):
        rebuild_ann_index(spark, snap, _emb(spark, B0 + B1))
    monkeypatch.undo()
    assert calls["n"] == 2
    # nothing flipped: no rebuild generation committed, old serving intact
    markers = set(os.listdir(f"{snap}/markers"))
    assert {f"b_{0:020d}_APPLIED", f"b_{1:020d}_APPLIED"} <= markers
    assert not any(m.startswith("b_000000000010") for m in markers)
    assert _serve(spark, snap, [(0, [1.0, 0.2, 0.0, 0.0])]) == before
