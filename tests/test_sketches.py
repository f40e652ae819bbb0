"""Heavy-hitter sketch (operators/sketches.py): the MG-candidates +
exact-recount pipeline must equal the direct threshold query on
adversarial distributions, and candidate generation must stay bounded
per partition (the memory claim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_social_triangle_mapreduce_spark.operators import sketches
from twitter_social_triangle_mapreduce_spark.operators.dedup import tokens


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_heavy_hitters_exact_on_skewed_corpus(spark):
    """2 dominant tokens drowned in a sea of singletons, spread over
    many partitions: output must equal the direct HAVING query."""
    texts = []
    for i in range(200):
        row = [f"rare{i}_{j}" for j in range(20)]
        if i % 2 == 0:
            row += ["hot"] * 30
        if i % 5 == 0:
            row += ["warm"] * 40
        texts.append(" ".join(row))
    docs = _mk_docs(spark, texts).repartition(16)
    k = 50
    got = {
        r["tok"]: r["cnt"]
        for r in sketches.heavy_hitter_tokens(docs, k=k).collect()
    }
    toks = tokens(docs)
    n = toks.count()
    want = {
        r["tok"]: r["cnt"]
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * k > F.lit(n))
        .collect()
    }
    assert want, "fixture produced no heavy hitters"
    assert got == want


def test_mg_candidates_bounded_per_partition(spark):
    """Each partition emits at most k candidate rows no matter how many
    distinct tokens it holds."""
    texts = [" ".join(f"t{i}_{j}" for j in range(200)) for i in range(50)]
    docs = _mk_docs(spark, texts).repartition(4)
    k = 10
    cand_counts = (
        tokens(docs)
        .select("tok")
        .mapInPandas(sketches._mg_candidates(k), "tok string")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert cand_counts
    assert all(r["count"] <= k for r in cand_counts)


def test_heavy_hitters_empty_and_uniform_inputs(spark):
    """No token exceeds N/k on a uniform corpus -> empty result; empty
    corpus -> empty result (no division-by-zero / null total)."""
    uniform = _mk_docs(
        spark, [" ".join(f"u{i}_{j}" for j in range(30)) for i in range(20)]
    )
    assert sketches.heavy_hitter_tokens(uniform, k=50).count() == 0
    empty = _mk_docs(spark, []).where(F.lit(False))
    assert sketches.heavy_hitter_tokens(empty, k=50).count() == 0


# --- Count–Min sketch (round 11) ---


def test_cms_never_underestimates_and_bounds_error(spark):
    """The two CMS guarantees on a skewed corpus: est >= true for EVERY
    token (counters only over-count, via collisions), and the
    over-count is bounded — the theoretical tail is 2N/width per
    estimate w.h.p.; with N ~ 2.6k tokens over width 256 the expected
    collision mass is tiny, so the asserted ceiling is the loose
    theoretical one, not a tuned constant."""
    texts = ["alpha " * 200, "beta " * 50, " ".join(f"t{i}" for i in range(400))]
    docs = _mk_docs(spark, [t.strip() for t in texts])
    true = {
        r["tok"]: r["cnt"]
        for r in tokens(docs).groupBy("tok").agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(true.values())
    sketch = sketches.token_count_sketch(docs)
    est = {
        r["tok"]: r["est"]
        for r in sketches.cms_estimate(sketch, tokens(docs)).collect()
    }
    assert set(est) == set(true)
    for tok, t in true.items():
        assert est[tok] >= t, (tok, t, est[tok])
        assert est[tok] <= t + 2 * n / sketches.CMS_WIDTH + 1, (tok, t, est[tok])


def test_cms_sketch_is_mergeable(spark):
    """The 100 TB property: the sketch of a union is the elementwise
    counter sum, so per-partition/per-day sketches roll up losslessly."""
    a = _mk_docs(spark, ["x y z " * 10, "p q r"])
    b = spark.createDataFrame(
        [(100, "x x q w"), (101, "z w w")], "doc_id long, text string"
    )
    both = a.unionAll(b)
    def counters(df):
        return {
            (r["row"], r["col"]): r["cnt"]
            for r in sketches.token_count_sketch(df).collect()
        }
    ca, cb, cu = counters(a), counters(b), counters(both)
    merged = dict(ca)
    for k, v in cb.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == cu


def test_cms_sketch_size_is_bounded(spark):
    docs = _mk_docs(spark, [" ".join(f"w{i}" for i in range(5000))])
    rows = sketches.token_count_sketch(docs).count()
    assert rows <= sketches.CMS_DEPTH * sketches.CMS_WIDTH


def test_cms_absent_token_estimate_is_collision_mass_only(spark):
    docs = _mk_docs(spark, ["a b c d e f g h"])
    probes = spark.createDataFrame([("zzz_absent",)], "tok string")
    est = sketches.cms_estimate(
        sketches.token_count_sketch(docs), probes
    ).collect()
    # 8 tokens over 4x256 counters: an absent token's 4 cells are
    # almost surely all empty -> est 0 (and never negative)
    assert est[0]["est"] >= 0
    assert est[0]["est"] <= 8


def test_streaming_sketch_maintenance_equals_batch_sketch(spark, tmp_path):
    """The foreachBatch-maintained CMS snapshot must equal the direct
    whole-corpus sketch after the stream drains, with multiple
    micro-batches forcing real merges — O(sketch) work per batch while
    the committed state tracks an unbounded stream exactly."""
    from twitter_social_triangle_mapreduce_spark.sources.io import load_table
    from twitter_social_triangle_mapreduce_spark.streaming import streams as st

    from conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    json_dir = str(tmp_path / "docs_json")
    docs.repartition(4).write.mode("overwrite").json(json_dir)
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .json(json_dir)
    )
    snap = str(tmp_path / "sketch_snap")
    q = st.streaming_sketch_maintenance(stream, snap, str(tmp_path / "ckpt"))
    drained = q.awaitTermination(timeout=180)
    if not drained:
        q.stop()  # never leave a query running in the shared session
    assert drained, "availableNow stream did not drain within 180s"

    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in st.read_sketch_snapshot(spark, snap).collect()
    }
    want = {
        (r["row"], r["col"]): r["cnt"]
        for r in sketches.token_count_sketch(docs).collect()
    }
    assert got == want


def test_fold_sketch_batch_replay_is_idempotent(spark, tmp_path):
    from twitter_social_triangle_mapreduce_spark.streaming import streams as st

    snap = str(tmp_path / "snap")
    b0 = _mk_docs(spark, ["a a b", "c"])
    b1 = _mk_docs(spark, ["a d"])
    st.fold_sketch_batch(b0, 0, snap)
    st.fold_sketch_batch(b1, 1, snap)
    once = {
        (r["row"], r["col"]): r["cnt"]
        for r in st.read_sketch_snapshot(spark, snap).collect()
    }
    st.fold_sketch_batch(b0, 0, snap)  # replayed batch: must not re-fold
    again = {
        (r["row"], r["col"]): r["cnt"]
        for r in st.read_sketch_snapshot(spark, snap).collect()
    }
    assert once == again
    both = {
        (r["row"], r["col"]): r["cnt"]
        for r in sketches.token_count_sketch(b0.unionAll(b1)).collect()
    }
    assert once == both


def test_merged_sketch_split_is_exhaustive_with_null_ids(spark):
    """The split under the merge-algebra gate must PARTITION the corpus
    — a NULL doc_id row lands in the even half instead of vanishing
    from both (a plain %2==0 / %2!=0 pair silently drops it, and the
    gate would report a merge bug that is really a split bug)."""
    docs = spark.createDataFrame(
        [(0, "a a"), (1, "b"), (None, "c c c")],
        "doc_id long, text string",
    )
    merged = {
        (r["row"], r["col"]): r["cnt"]
        for r in sketches.merged_token_sketch(docs).collect()
    }
    direct = {
        (r["row"], r["col"]): r["cnt"]
        for r in sketches.token_count_sketch(docs).collect()
    }
    assert merged == direct  # the NULL row's 3 'c' tokens are counted


def test_maintenance_check_recognizes_versioned_sketch_store(spark, tmp_path):
    """The fsck must classify the plain versioned-state layout (the
    rollup/CMS sketch store: top-level v_* dirs, newest committed
    version IS the state) instead of misreporting it as an empty
    snapshot — and must flag an unreadable newest version as the error
    readers will hit."""
    from twitter_social_triangle_mapreduce_spark.streaming import streams as st

    snap = str(tmp_path / "snap")
    st.fold_sketch_batch(_mk_docs(spark, ["a b", "c"]), 0, snap)
    st.fold_sketch_batch(_mk_docs(spark, ["a d"]), 1, snap)
    rows = {
        (r["severity"], r["component"], r["finding"])
        for r in st.maintenance_check(spark, snap, deep=True).collect()
    }
    assert ("ok", "versions", "newest_version_readable") in rows, rows
    assert not any(sev == "error" for sev, _, _ in rows), rows

    # corrupt the newest committed version's data: error, not "empty"
    import glob
    import os

    newest = sorted(glob.glob(f"{snap}/v_*"))[-1]
    for f in glob.glob(f"{newest}/*.parquet"):
        with open(f, "wb") as fh:
            fh.write(b"not parquet")
    bad = {
        (r["severity"], r["component"], r["finding"])
        for r in st.maintenance_check(spark, snap).collect()
    }
    assert ("error", "versions", "newest_version_unreadable") in bad, bad


def test_clone_snapshot_clones_a_versioned_sketch_store(spark, tmp_path):
    """The backup verb must carry the plain versioned-state layout: the
    in-dir v_*/_APPLIED markers are part of the cut (created last), and
    the clone serves the same state as the source."""
    from twitter_social_triangle_mapreduce_spark.streaming import streams as st

    src = str(tmp_path / "src")
    st.fold_sketch_batch(_mk_docs(spark, ["a a b", "c"]), 0, src)
    st.fold_sketch_batch(_mk_docs(spark, ["a d"]), 1, src)
    dst = str(tmp_path / "dst")
    out = st.clone_snapshot(spark, src, dst)
    assert out["markers"] >= 2  # one _APPLIED per committed version
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in st.read_sketch_snapshot(spark, dst).collect()
    }
    want = {
        (r["row"], r["col"]): r["cnt"]
        for r in st.read_sketch_snapshot(spark, src).collect()
    }
    assert got == want


def test_mg_candidates_superset_of_true_heavy_hitters(spark):
    """The vectorized weighted fold (round 12) keeps the MG guarantee:
    every token with global freq > N/k appears in the candidate union."""
    texts = []
    for i in range(100):
        row = [f"noise{i}_{j}" for j in range(30)]
        if i % 3 == 0:
            row += ["alpha"] * 25
        if i % 4 == 0:
            row += ["beta"] * 30
        texts.append(" ".join(row))
    docs = _mk_docs(spark, texts).repartition(8)
    k = 40
    toks = tokens(docs)
    n = toks.count()
    heavies = {
        r["tok"]
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * k > F.lit(n))
        .collect()
    }
    assert heavies, "fixture produced no heavy hitters"
    cands = {
        r["tok"]
        for r in toks.select("tok")
        .mapInPandas(sketches._mg_candidates(k), "tok string")
        .collect()
    }
    assert heavies <= cands


def test_mg_weighted_fold_parity_with_unit_fold():
    """Pure-Python parity (round 12, r11 verdict item 4): the weighted
    value_counts fold and the classic unit-by-unit MG fold both keep
    every token whose frequency exceeds n/k, across batch splits and
    stream orders — the recount downstream then makes the outputs
    identical, so the candidate passes are interchangeable."""
    import pandas as pd

    def unit_fold(stream, capacity):
        counters = {}
        for tok in stream:
            if tok in counters:
                counters[tok] += 1
            elif len(counters) < capacity:
                counters[tok] = 1
            else:
                for key in [k for k, v in counters.items() if v == 1]:
                    del counters[key]
                for key in counters:
                    counters[key] -= 1
        return set(counters)

    stream = (
        ["hot"] * 40
        + [f"mid{i}" for i in range(30) for _ in range(3)]
        + [f"one{i}" for i in range(200)]
    )
    # deterministic interleave: worst case for MG is heavies arriving
    # after the table fills with singletons
    stream = stream[::-1] + stream
    n, k = len(stream), 12
    true_heavy = {
        t for t in set(stream) if stream.count(t) * k > n
    }
    assert true_heavy
    for split in (1, 3, 7):
        step = (len(stream) + split - 1) // split
        batches = [
            pd.DataFrame({"tok": stream[i : i + step]})
            for i in range(0, len(stream), step)
        ]
        got = set(
            next(iter(sketches._mg_candidates(k)(iter(batches))))["tok"]
        )
        assert len(got) <= k
        assert true_heavy <= got
    assert true_heavy <= unit_fold(stream, k)


# --- re-width migration (round 12, r11 verdict item 5) ---


def test_rewidth_sketch_store_midstream_parity(spark, tmp_path):
    """fold A (pins 4x256) -> rewidth to 4x512 from the corpus of
    record -> fold B: the snapshot must equal the direct batch sketch
    of A united B AT THE NEW GEOMETRY, exactly (deterministic md5
    placement -> dict equality, no tolerance)."""
    from twitter_social_triangle_mapreduce_spark.operators import sketches
    from twitter_social_triangle_mapreduce_spark.streaming import streams as st

    a = _mk_docs(spark, ["a a b c", "d e", "a f"])
    b = spark.createDataFrame(
        [(100, "b b g"), (101, "a h i")], "doc_id long, text string"
    )
    snap = str(tmp_path / "snap")
    st.fold_sketch_batch(a, 0, snap)
    assert st._sketch_pinned_geom(
        spark, st._semantic_state_dirs(spark, snap)
    ) == (sketches.CMS_DEPTH, sketches.CMS_WIDTH)
    out = st.rewidth_sketch_store(spark, snap, a, width=512)
    assert out == (sketches.CMS_DEPTH, 512)
    st.fold_sketch_batch(b, 1, snap)
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in st.read_sketch_snapshot(spark, snap).collect()
    }
    want = {
        (r["row"], r["col"]): r["cnt"]
        for r in sketches.token_count_sketch(
            a.unionByName(b), width=512
        ).collect()
    }
    assert got == want
    # geometry travelled with the post-migration fold's state
    assert st._sketch_pinned_geom(
        spark, st._semantic_state_dirs(spark, snap)
    ) == (sketches.CMS_DEPTH, 512)


def test_fold_sketch_batch_rejects_geometry_drift(spark, tmp_path):
    import pytest

    from twitter_social_triangle_mapreduce_spark.streaming import streams as st

    snap = str(tmp_path / "snap")
    st.fold_sketch_batch(_mk_docs(spark, ["a b"]), 0, snap)
    with pytest.raises(ValueError, match="rewidth_sketch_store"):
        st.fold_sketch_batch(_mk_docs(spark, ["c"]), 1, snap, width=512)
    st.rewidth_sketch_store(
        spark, snap, _mk_docs(spark, ["a b"]), width=512
    )
    with pytest.raises(ValueError, match="pinned at 4x512"):
        st.fold_sketch_batch(_mk_docs(spark, ["c"]), 1, snap, width=256)
    # the pinned geometry stated explicitly is accepted
    st.fold_sketch_batch(_mk_docs(spark, ["c"]), 1, snap, width=512)


def test_rewidth_noop_and_abs_err_sizing(spark, tmp_path):
    from twitter_social_triangle_mapreduce_spark.operators import sketches
    from twitter_social_triangle_mapreduce_spark.streaming import streams as st

    snap = str(tmp_path / "snap")
    docs = _mk_docs(spark, ["a b c d e f g h"])  # 8 tokens
    st.fold_sketch_batch(docs, 0, snap)
    # current geometry -> no-op, store untouched
    assert (
        st.rewidth_sketch_store(
            spark, snap, docs, width=sketches.CMS_WIDTH
        )
        is None
    )
    # abs_err derivation: width = ceil(2N/abs_err) = ceil(16/3) = 6
    assert sketches.cms_width_for(8, 3) == 6
    out = st.rewidth_sketch_store(spark, snap, docs, abs_err=3)
    assert out == (sketches.CMS_DEPTH, 6)
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in st.read_sketch_snapshot(spark, snap).collect()
    }
    want = {
        (r["row"], r["col"]): r["cnt"]
        for r in sketches.token_count_sketch(docs, width=6).collect()
    }
    assert got == want


def test_rewidth_rejects_concurrent_rival(spark, tmp_path):
    import os

    import pytest

    from twitter_social_triangle_mapreduce_spark.streaming import (
        ConcurrentMaintenanceError,
    )
    from twitter_social_triangle_mapreduce_spark.streaming import streams as st

    snap = str(tmp_path / "snap")
    docs = _mk_docs(spark, ["a b c"])
    st.fold_sketch_batch(docs, 0, snap)
    before = {
        (r["row"], r["col"]): r["cnt"]
        for r in st.read_sketch_snapshot(spark, snap).collect()
    }
    os.makedirs(f"{snap}/markers", exist_ok=True)
    with open(f"{snap}/markers/_MAINTENANCE_LOCK", "w") as fh:
        fh.write("rival-token-0000")
    with pytest.raises(ConcurrentMaintenanceError, match="holds"):
        st.rewidth_sketch_store(spark, snap, docs, width=512)
    # store untouched: same serving state, no r_ dir appeared
    assert {
        (r["row"], r["col"]): r["cnt"]
        for r in st.read_sketch_snapshot(spark, snap).collect()
    } == before
    assert not [d for d in os.listdir(snap) if d.startswith("r_")]
    os.remove(f"{snap}/markers/_MAINTENANCE_LOCK")
    assert st.rewidth_sketch_store(spark, snap, docs, width=512)


def test_fsck_and_clone_carry_a_rewidthed_sketch_store(spark, tmp_path):
    from twitter_social_triangle_mapreduce_spark.streaming import streams as st

    src = str(tmp_path / "src")
    docs = _mk_docs(spark, ["a a b", "c d"])
    st.fold_sketch_batch(docs, 0, src)
    st.rewidth_sketch_store(spark, src, docs, width=512)
    rows = {
        (r["severity"], r["component"], r["finding"])
        for r in st.maintenance_check(spark, src, deep=True).collect()
    }
    assert ("ok", "versions", "newest_version_readable") in rows, rows
    assert not any(sev == "error" for sev, _, _ in rows), rows
    dst = str(tmp_path / "dst")
    st.clone_snapshot(spark, src, dst)
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in st.read_sketch_snapshot(spark, dst).collect()
    }
    want = {
        (r["row"], r["col"]): r["cnt"]
        for r in st.read_sketch_snapshot(spark, src).collect()
    }
    assert got == want
    # the clone's pinned geometry matches the source's
    assert st._sketch_pinned_geom(
        spark, st._semantic_state_dirs(spark, dst)
    ) == (4, 512)
