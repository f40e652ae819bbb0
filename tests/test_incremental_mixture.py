"""Semantics tests for the round-3 ingest-pipeline additions:
data-driven mixture sampling (`sampling.mixture_rates/mixture_sample`)
and incremental dedup against the corpus band index
(`dedup.incremental_dedup`). Registry oracle parity is covered by the
differential tier; these pin the operator-level invariants on planted
fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitter_social_triangle_mapreduce_spark.operators import dedup, sampling

# Round 13 (r12 verdict item 1a): this whole suite is a streaming-
# fold / maintenance / rebuild probe battery - heavyweight by nature
# (fresh stores, multi-generation snapshots, stateful queries). It
# runs in the closing battery (--runslow / RUN_SLOW=1), keeping the
# default gate inside the driver's window. The oracle-differential,
# golden, plan-shape, and digest suites stay in the default gate.
pytestmark = pytest.mark.slow



def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, source STRING, text STRING")


@pytest.fixture(scope="module")
def mix_docs(spark):
    """Three sources with known token totals: web 60, code 20, ref 10."""
    rows = []
    did = 0
    for src, n_docs, words in (("web", 6, 10), ("code", 4, 5), ("ref", 2, 5)):
        for _ in range(n_docs):
            rows.append((did, src, " ".join(f"w{did}x{j}" for j in range(words))))
            did += 1
    return _docs(spark, rows)


def test_mixture_rates_equalize_token_counts(mix_docs):
    """Uniform parts: K = min stratum tokens (10), so the smallest
    stratum keeps everything (rate exactly 1e6) and every other stratum
    is rated to its exact integer formula (1e6*K) div n_tokens."""
    r = {
        row["strata"]: row
        for row in sampling.mixture_rates(mix_docs).collect()
    }
    assert r["web"]["n_tokens"] == 60
    assert r["code"]["n_tokens"] == 20
    assert r["ref"]["n_tokens"] == 10
    assert r["ref"]["rate_e6"] == 1_000_000
    assert r["code"]["rate_e6"] == (1_000_000 * 10) // 20
    assert r["web"]["rate_e6"] == (1_000_000 * 10) // 60


def test_mixture_rates_weighted_parts_and_exclusion(mix_docs):
    """parts {web: 2, code: 1}: K = min(60 div 2, 20 div 1) = 20; web
    targets 40 of 60 tokens, code all 20; 'ref' (absent from parts) is
    excluded entirely."""
    r = {
        row["strata"]: row
        for row in sampling.mixture_rates(
            mix_docs, parts={"web": 2, "code": 1}
        ).collect()
    }
    assert set(r) == {"web", "code"}
    assert r["code"]["rate_e6"] == 1_000_000
    assert r["web"]["rate_e6"] == (1_000_000 * 2 * 20) // 60


def test_mixture_sample_membership_is_deterministic_hash(mix_docs):
    """Kept set: exactly the docs whose split-bucket hash falls under
    their stratum's rate — a pure function of (doc_id, salt), so two
    evaluations agree row-for-row, and the full-rate stratum is kept
    whole."""
    kept1 = sorted(
        (row["doc_id"], row["source"])
        for row in sampling.mixture_sample(mix_docs, "doc_id").collect()
    )
    kept2 = sorted(
        (row["doc_id"], row["source"])
        for row in sampling.mixture_sample(mix_docs, "doc_id").collect()
    )
    assert kept1 == kept2
    ref_ids = {
        row["doc_id"]
        for row in mix_docs.where("source = 'ref'").select("doc_id").collect()
    }
    assert ref_ids <= {d for d, _ in kept1}
    # membership matches the first-principles recomputation of the
    # bucket predicate for every document
    rates = {
        row["strata"]: row["rate_e6"]
        for row in sampling.mixture_rates(mix_docs).collect()
    }
    buckets = {
        row["doc_id"]: (row["b"], row["source"])
        for row in sampling._with_bucket(mix_docs, "doc_id", "mix")
        .select("doc_id", "source", F.col("__tstm_bucket").alias("b"))
        .collect()
    }
    expected = sorted(
        (d, src) for d, (b, src) in buckets.items() if b < rates[src]
    )
    assert kept1 == expected


@pytest.fixture(scope="module")
def ingest_docs(spark):
    """Corpus of 3 docs; a new batch holding an exact copy of corpus
    doc 0, a fresh document, and a too-short-to-shingle document."""
    corpus = _docs(
        spark,
        [
            (0, "web", "alpha beta gamma delta epsilon zeta"),
            (1, "web", "one two three four five six seven"),
            (2, "web", "lorem ipsum dolor sit amet elit"),
        ],
    )
    new = _docs(
        spark,
        [
            (100, "web", "alpha beta gamma delta epsilon zeta"),
            (101, "web", "completely novel content nothing shared here"),
            (102, "web", "tiny doc"),
        ],
    )
    return new, corpus


def test_incremental_dedup_flags_copies_and_passes_novel(ingest_docs):
    new, corpus = ingest_docs
    got = {
        row["doc_id"]: (row["n_dup_of"], row["is_new"])
        for row in dedup.incremental_dedup(new, corpus).collect()
    }
    assert set(got) == {100, 101, 102}  # every new doc gets a verdict
    # identical text -> identical minhash signature -> collides with
    # its corpus twin in every band
    assert got[100][0] >= 1 and got[100][1] == 0
    assert got[101] == (0, 1)
    # < SHINGLE_N words: no bands, conservatively new
    assert got[102] == (0, 1)


def test_incremental_dedup_agrees_with_batch_pairs(spark):
    """Splitting the smoke corpus in two, the incremental screen's
    collision set must equal the batch pair generator's pairs restricted
    to (new, corpus) — the incremental path adds no and loses no
    collisions versus recomputing from scratch."""
    from twitter_social_triangle_mapreduce_spark.sources.io import load_table

    from conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    new, corpus = docs.where("doc_id % 5 = 0"), docs.where("doc_id % 5 <> 0")
    inc = {
        row["doc_id"]
        for row in dedup.incremental_dedup(new, corpus)
        .where("is_new = 0")
        .collect()
    }
    pairs = dedup.minhash_candidate_pairs(docs)
    # a new doc must be flagged iff some batch pair links it to a
    # corpus doc
    flagged = {
        r["x"]
        for r in pairs.selectExpr(
            "CASE WHEN doc_a % 5 = 0 AND doc_b % 5 <> 0 THEN doc_a "
            "     WHEN doc_b % 5 = 0 AND doc_a % 5 <> 0 THEN doc_b END AS x"
        )
        .where("x IS NOT NULL")
        .collect()
    }
    assert inc == flagged


# ---------------------------------------------------------------------------
# Incremental near-dup CLUSTER maintenance (round-4: update the cluster /
# canonical state in place instead of rebuilding per run)
# ---------------------------------------------------------------------------

#: two distinct near-dup cluster seeds and a bridge document whose
#: shingle set spans both — empirically verified (md5 is fixed, so the
#: LSH collisions are deterministic forever) to band-collide with BOTH
T1 = "alpha beta gamma delta epsilon zeta eta theta"
T2 = "lorem ipsum dolor sit amet consectetur adipiscing elit"
BRIDGE = f"{T1} {T2}"


def _sorted_state(df):
    return sorted(
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in df.collect()
    )


def test_update_clusters_merges_two_existing_clusters(spark):
    """A new bridge document colliding with two converged clusters must
    merge them transitively: everything relabels to the global-min
    doc_id, exactly as the batch recompute elects."""
    corpus = _docs(
        spark,
        [(1, "web", T1), (2, "web", T1), (10, "web", T2), (11, "web", T2),
         (20, "web", "totally unrelated singleton content here present")],
    )
    new = _docs(spark, [(30, "web", BRIDGE), (40, "web", "novel fresh words nothing shared anywhere")])
    state0 = dedup.near_dup_clusters(corpus)
    updated = dedup.update_near_dup_clusters(
        state0, dedup.minhash_bands(corpus), new
    )
    got = _sorted_state(updated)
    assert got == [
        (1, 1, 1), (2, 1, 0), (10, 1, 0), (11, 1, 0),
        (20, 20, 1), (30, 1, 0), (40, 40, 1),
    ]
    # and equals the from-scratch batch recompute
    batch = dedup.near_dup_clusters(corpus.unionByName(new))
    assert got == _sorted_state(batch)


def test_update_clusters_new_only_cluster_and_singletons(spark):
    """New docs colliding only with each other form their own cluster
    labeled by the min NEW doc_id; non-colliding new docs stay
    singletons; untouched corpus clusters keep their labels."""
    corpus = _docs(spark, [(1, "web", T1), (2, "web", T1)])
    new = _docs(
        spark,
        [(30, "web", T2), (31, "web", T2), (40, "web", "tiny doc")],
    )
    updated = dedup.update_near_dup_clusters(
        dedup.near_dup_clusters(corpus), dedup.minhash_bands(corpus), new
    )
    assert _sorted_state(updated) == [
        (1, 1, 1), (2, 1, 0), (30, 30, 1), (31, 30, 0), (40, 40, 1),
    ]


def test_update_clusters_matches_batch_on_smoke_corpus(spark):
    """The two-batch fixture of the verdict: split the smoke corpus,
    cluster batch 0, fold batch 1 in incrementally — the result must
    equal near_dup_clusters over everything (the user_state_merge
    equality pattern applied to cluster state)."""
    from twitter_social_triangle_mapreduce_spark.sources.io import load_table

    from conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.where("doc_id % 5 <> 0")
    new = docs.where("doc_id % 5 = 0")
    updated = dedup.update_near_dup_clusters(
        dedup.near_dup_clusters(corpus), dedup.minhash_bands(corpus), new
    )
    batch = dedup.near_dup_clusters(docs)
    assert _sorted_state(updated) == _sorted_state(batch)


def test_streaming_cluster_maintenance_matches_batch(spark, tmp_path):
    """The foreachBatch twin: two micro-batches fold through the
    versioned snapshot; the final committed state equals the batch
    recompute over all ingested docs, and replaying a committed batch id
    is a no-op (idempotent under at-least-once delivery)."""
    import json
    import os

    from twitter_social_triangle_mapreduce_spark.streaming import (
        fold_cluster_batch,
        read_cluster_snapshot,
        streaming_cluster_maintenance,
    )

    b0 = [(1, T1), (2, T1), (20, "unrelated singleton content words here")]
    b1 = [(30, BRIDGE), (10, T2), (40, "novel fresh words nothing shared")]
    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    for i, rows in enumerate((b0, b1)):
        p = stream_dir / f"b{i}.json"
        p.write_text(
            "\n".join(
                json.dumps({"doc_id": d, "source": "web", "text": t})
                for d, t in rows
            )
        )
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = (
        spark.readStream.schema("doc_id BIGINT, source STRING, text STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(stream_dir))
    )
    snap = str(tmp_path / "snap")
    q = streaming_cluster_maintenance(stream, snap, str(tmp_path / "ckpt"))
    q.awaitTermination(timeout=120)

    all_docs = _docs(
        spark, [(d, "web", t) for d, t in b0 + b1]
    )
    got = _sorted_state(read_cluster_snapshot(spark, snap))
    assert got == _sorted_state(dedup.near_dup_clusters(all_docs))
    # bridge merged T1- and T2-clusters across the two batches
    by_doc = dict((d, c) for d, c, _ in got)
    assert by_doc[10] == by_doc[1] == by_doc[30] == 1

    # replay of an already-committed batch id must be a no-op
    fold_cluster_batch(all_docs, 1, snap)
    assert _sorted_state(read_cluster_snapshot(spark, snap)) == got


def test_update_clusters_reingest_is_idempotent(spark):
    """A batch replaying doc_ids already in the state must not duplicate
    state rows — replayed ids keep their (possibly remapped) corpus
    assignment, fresh ids append once."""
    corpus = _docs(spark, [(1, "web", T1), (2, "web", T1)])
    state0 = dedup.near_dup_clusters(corpus)
    bands0 = dedup.minhash_bands(corpus)
    batch = _docs(
        spark,
        [(2, "web", T1), (30, "web", T2)],  # 2 is a replay, 30 is fresh
    )
    updated = dedup.update_near_dup_clusters(state0, bands0, batch)
    assert _sorted_state(updated) == [(1, 1, 1), (2, 1, 0), (30, 30, 1)]


def test_update_clusters_reingest_bridges_transitive_merge(spark):
    """Round-5 ADVICE regression: a batch that re-ingests a NON-LABEL
    member of an existing cluster with text now colliding with a
    DIFFERENT cluster must merge the two clusters — the doc's identity
    is the only bridge. Before the fix, the collision edge carried the
    re-ingested doc's raw id (never a cluster_id), so the remap join
    missed cluster 10 entirely and the merge was silently dropped."""
    corpus = _docs(
        spark,
        [(1, "web", T1), (2, "web", T1), (10, "web", T2), (11, "web", T2)],
    )
    state0 = dedup.near_dup_clusters(corpus)
    bands0 = dedup.minhash_bands(corpus)
    # doc 11 (member of cluster 10, NOT its label) re-arrives as a T1 dup
    batch = _docs(spark, [(11, "web", T1)])
    updated = dedup.update_near_dup_clusters(state0, bands0, batch)
    assert _sorted_state(updated) == [
        (1, 1, 1), (2, 1, 0), (10, 1, 0), (11, 1, 0),
    ]


def test_cluster_fold_band_index_survives_version_pruning(spark, tmp_path):
    """Review finding: the band index must be listed from bands/
    directly, not derived from the committed-version list — version
    pruning (keep_versions=2) deletes old v_ dirs while band dirs are
    append-only. A batch-3 doc that near-duplicates ONLY a batch-0 doc
    must still merge into its cluster after v_0 was pruned."""
    from twitter_social_triangle_mapreduce_spark.streaming import (
        fold_cluster_batch,
        read_cluster_snapshot,
    )

    snap = str(tmp_path / "snap")
    batches = [
        [(1, "web", T1)],
        [(10, "web", "first filler batch with its own words")],
        [(20, "web", "second filler batch containing different words")],
        [(30, "web", T1)],  # duplicates ONLY the batch-0 doc
    ]
    for i, rows in enumerate(batches):
        fold_cluster_batch(_docs(spark, rows), i, snap)
    state = {r["doc_id"]: r["cluster_id"]
             for r in read_cluster_snapshot(spark, snap).collect()}
    assert state[30] == 1, state  # merged across the pruned horizon
    assert state == {1: 1, 10: 10, 20: 20, 30: 1}


def test_streaming_semantic_maintenance_matches_batch(spark, tmp_path):
    """The embedding-tier foreachBatch twin (round 6): two micro-batches
    of (vec_id, embedding) rows fold through the versioned semantic
    snapshot; the final committed state equals the batch
    ``semantic_dedup_clusters`` recompute over everything ingested, and
    replaying a committed batch id is a no-op. Batch 1 contains a
    vector joining a batch-0 cluster — the cross-batch collision the
    embs/ append-only index exists for."""
    import json
    import os

    from twitter_social_triangle_mapreduce_spark.operators import similarity
    from twitter_social_triangle_mapreduce_spark.streaming import (
        fold_semantic_batch,
        read_semantic_snapshot,
        streaming_semantic_maintenance,
    )

    a = [1.0, 0.2, 0.0, 0.0, 0.1, 0.0, 0.0, 0.0]
    b = [0.0, 0.0, 1.0, 0.3, 0.0, 0.1, 0.0, 0.0]
    s1 = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0]
    b0 = [(0, a), (1, a), (2, b), (3, b), (4, s1)]
    b1 = [(5, a), (6, s1), (7, [0.0] * 7 + [1.0])]  # append-only ids
    stream_dir = tmp_path / "emb_stream"
    stream_dir.mkdir()
    for i, rows in enumerate((b0, b1)):
        p = stream_dir / f"b{i}.json"
        p.write_text(
            "\n".join(
                json.dumps({"vec_id": v, "embedding": e}) for v, e in rows
            )
        )
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = (
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1)
        .json(str(stream_dir))
    )
    snap = str(tmp_path / "snap")
    q = streaming_semantic_maintenance(
        stream, snap, str(tmp_path / "ckpt"), dims=8
    )
    q.awaitTermination(timeout=120)

    def vstate(df):
        return sorted(
            (r["vec_id"], r["cluster_id"], r["is_canonical"])
            for r in df.collect()
        )

    all_emb = spark.createDataFrame(
        [(v, [float(x) for x in e]) for v, e in b0 + b1],
        "vec_id long, embedding array<float>",
    )
    got = vstate(read_semantic_snapshot(spark, snap))
    assert got == vstate(
        similarity.semantic_dedup_clusters(all_emb, dims=8)
    )
    by_vec = {v: c for v, c, _ in got}
    assert by_vec[5] == by_vec[0]  # batch-1 vector joined batch-0 cluster
    assert by_vec[6] == by_vec[4]  # joined the s1 singleton's cluster
    assert by_vec[7] == 7          # fresh singleton

    # replay of an already-committed batch id must be a no-op
    fold_semantic_batch(all_emb, 1, snap, dims=8)
    assert vstate(read_semantic_snapshot(spark, snap)) == got


def test_semantic_fold_pins_band_width(spark, tmp_path):
    """Round-8 (r7 verdict item 1, streaming half): the semantic fold
    PINS the LSH band width at first fold under the same
    stored-contract as the ANN fold's quantizer scale — first fold
    stores (caller value, else derived from the first batch's count),
    later folds load the stored width, and a conflicting explicit
    width raises instead of silently splitting signature agreement
    mid-stream. Snapshot state equals the batch recompute AT THE
    PINNED WIDTH."""
    import pytest

    from twitter_social_triangle_mapreduce_spark.operators import similarity
    from twitter_social_triangle_mapreduce_spark.streaming import (
        fold_semantic_batch,
        read_semantic_snapshot,
    )

    a = [1.0, 0.2, 0.0, 0.0, 0.1, 0.0, 0.0, 0.0]
    b = [0.0, 0.0, 1.0, 0.3, 0.0, 0.1, 0.0, 0.0]
    s1 = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0]

    def emb(rows):
        return spark.createDataFrame(
            [(v, [float(x) for x in e]) for v, e in rows],
            "vec_id long, embedding array<float>",
        )

    b0 = [(0, a), (1, a), (2, b), (3, b), (4, s1)]
    b1 = [(5, a), (6, s1), (7, [0.0] * 7 + [1.0])]
    snap = str(tmp_path / "snap")
    # first fold pins an EXPLICIT non-default width
    fold_semantic_batch(emb(b0), 0, snap, dims=8, bits=9)
    stored = spark.read.parquet(f"{snap}/lsh_bits").collect()
    assert [int(r["bits"]) for r in stored] == [9]
    # later fold with the default loads the pin (no drift to derived)
    fold_semantic_batch(emb(b1), 1, snap, dims=8)
    got = sorted(map(tuple, read_semantic_snapshot(spark, snap).collect()))
    want = sorted(
        map(
            tuple,
            similarity.semantic_dedup_clusters(
                emb(b0 + b1), dims=8, bits=9
            ).collect(),
        )
    )
    assert got == want
    # a conflicting explicit width raises — width is immutable
    with pytest.raises(ValueError, match="pinned at bits=9"):
        fold_semantic_batch(emb([(8, a)]), 2, snap, dims=8, bits=10)
    # a MATCHING explicit width is accepted
    fold_semantic_batch(emb([(8, a)]), 2, snap, dims=8, bits=9)
    by_vec = {
        r["vec_id"]: r["cluster_id"]
        for r in read_semantic_snapshot(spark, snap).collect()
    }
    assert by_vec[8] == by_vec[0]


@pytest.mark.slow  # multi-fold compaction scenario (closing battery)
def test_semantic_embs_compaction_preserves_folds_and_bounds_dirs(
    spark, tmp_path
):
    """Round-8 (r7 verdict item 3): the semantic snapshot's embs/
    store accumulates one dir per fold; compact_semantic_embs rewrites
    the safe batches into ONE marker-committed generation and the next
    fold must still merge across the compacted horizon (its corpus
    read goes through the generation). Also pins: no-op re-run below
    two sources, dir-count bound, crash-before-flip invisibility, and
    second-generation fold-forward."""
    from twitter_social_triangle_mapreduce_spark.operators import similarity
    from twitter_social_triangle_mapreduce_spark.streaming import (
        compact_semantic_embs,
        fold_semantic_batch,
        read_semantic_snapshot,
    )
    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        _list_batch_dirs,
    )

    a = [1.0, 0.2, 0.0, 0.0, 0.1, 0.0, 0.0, 0.0]
    b = [0.0, 0.0, 1.0, 0.3, 0.0, 0.1, 0.0, 0.0]
    s1 = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0]

    def emb(rows):
        return spark.createDataFrame(
            [(v, [float(x) for x in e]) for v, e in rows],
            "vec_id long, embedding array<float>",
        )

    snap = str(tmp_path / "snap")
    batches = [
        [(0, a), (1, a), (2, b), (3, b), (4, s1)],
        [(5, [0.0] * 7 + [1.0])],
        [(6, [0.0, 1.0] + [0.0] * 6)],
    ]
    rows_so_far = []
    for i, rows in enumerate(batches):
        fold_semantic_batch(emb(rows), i, snap, dims=8)
        rows_so_far += rows

    def embs_dirs():
        return _list_batch_dirs(spark, f"{snap}/embs", "b_")

    assert len(embs_dirs()) == 3
    gen = compact_semantic_embs(spark, snap)
    assert gen == 0
    # newest committed batch (2) stays out; 0 and 1 folded into g_0
    dirs = embs_dirs()
    assert [d.rsplit("/", 1)[1] for d in dirs] == [
        "g_" + "0".zfill(20),
        "b_" + "2".zfill(20),
    ]
    # single safe source (the generation) -> no-op
    assert compact_semantic_embs(spark, snap) is None
    # a batch-3 vector near-duplicating ONLY a batch-0 vector must
    # still merge — the fold's corpus union now includes the generation
    fold_semantic_batch(emb([(7, a)]), 3, snap, dims=8)
    rows_so_far += [(7, a)]
    got = sorted(map(tuple, read_semantic_snapshot(spark, snap).collect()))
    want = sorted(
        map(
            tuple,
            similarity.semantic_dedup_clusters(
                emb(rows_so_far), dims=8
            ).collect(),
        )
    )
    assert got == want
    by_vec = {v: c for v, c, _ in got}
    assert by_vec[7] == by_vec[0]  # merged across the compacted horizon
    # second compaction folds the prior generation forward
    gen2 = compact_semantic_embs(spark, snap)
    assert gen2 == 1
    names = [d.rsplit("/", 1)[1] for d in embs_dirs()]
    assert names == ["g_" + "1".zfill(20), "b_" + "3".zfill(20)]
    # crash-before-flip: a generation whose data+sources landed but
    # whose marker never committed must be invisible to listings
    emb([(99, a)]).write.mode("overwrite").parquet(
        f"{snap}/embs/g_" + "7".zfill(20)
    )
    spark.createDataFrame([(3,)], "src long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{snap}/embs/compact_sources/g_" + "7".zfill(20))
    assert [d.rsplit("/", 1)[1] for d in embs_dirs()] == names
    # and a fold after the orphan still matches the batch recompute
    fold_semantic_batch(emb([(8, b)]), 4, snap, dims=8)
    rows_so_far += [(8, b)]
    got = sorted(map(tuple, read_semantic_snapshot(spark, snap).collect()))
    assert got == sorted(
        map(
            tuple,
            similarity.semantic_dedup_clusters(
                emb(rows_so_far), dims=8
            ).collect(),
        )
    )


def test_cluster_bands_compaction_preserves_cross_horizon_merge(
    spark, tmp_path
):
    """compact_cluster_bands: after compacting batches 0..1 of the
    band-signature index into a generation, a later doc duplicating
    ONLY a compacted-away batch's doc must still merge into its
    cluster (the dedup screen reads through the generation), and the
    final state equals the batch recompute."""
    from twitter_social_triangle_mapreduce_spark.streaming import (
        compact_cluster_bands,
        fold_cluster_batch,
        read_cluster_snapshot,
    )
    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        _list_batch_dirs,
    )

    snap = str(tmp_path / "snap")
    batches = [
        [(1, "web", T1)],
        [(10, "web", "first filler batch with its own words")],
        [(20, "web", "second filler batch containing different words")],
    ]
    for i, rows in enumerate(batches):
        fold_cluster_batch(_docs(spark, rows), i, snap)
    assert compact_cluster_bands(spark, snap) == 0
    names = [
        d.rsplit("/", 1)[1]
        for d in _list_batch_dirs(spark, f"{snap}/bands", "b_")
    ]
    assert names == ["g_" + "0".zfill(20), "b_" + "2".zfill(20)]
    fold_cluster_batch(_docs(spark, [(30, "web", T1)]), 3, snap)
    all_docs = _docs(
        spark, [r for rows in batches for r in rows] + [(30, "web", T1)]
    )
    got = _sorted_state(read_cluster_snapshot(spark, snap))
    assert got == _sorted_state(dedup.near_dup_clusters(all_docs))
    by_doc = {d: c for d, c, _ in got}
    assert by_doc[30] == 1  # merged across the compacted horizon


def test_passage_windows_compaction_preserves_screen(spark, tmp_path):
    """compact_passage_windows: after compacting the window index, a
    later batch repeating ONLY a compacted-away batch's passage must
    still be cut (the screen reads through the generation)."""
    from twitter_social_triangle_mapreduce_spark.streaming import (
        compact_passage_windows,
        fold_passage_batch,
        read_passage_cuts,
    )
    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        _list_batch_dirs,
    )

    boiler = "please accept cookies to continue using this website"
    snap = str(tmp_path / "snap")
    batches = [
        [(1, f"alpha beta gamma {boiler}")],
        [(10, "unique middle batch content with nothing shared here")],
        [(20, "another filler batch of fully distinct words indeed")],
    ]
    for i, rows in enumerate(batches):
        fold_passage_batch(
            spark.createDataFrame(rows, "doc_id long, text string"),
            i,
            snap,
        )
    assert compact_passage_windows(spark, snap) == 0
    names = [
        d.rsplit("/", 1)[1]
        for d in _list_batch_dirs(spark, f"{snap}/windows", "w_")
    ]
    assert names == ["g_" + "0".zfill(20), "w_" + "2".zfill(20)]
    # doc 30 repeats ONLY the batch-0 boilerplate passage
    fold_passage_batch(
        spark.createDataFrame(
            [(30, f"closing words {boiler} tail words")],
            "doc_id long, text string",
        ),
        3,
        snap,
    )
    cut_docs = {
        r["doc_id"] for r in read_passage_cuts(spark, snap).collect()
    }
    assert 30 in cut_docs  # screened against the compacted index


def test_pack_rows_compaction_preserves_tape_and_appends(spark, tmp_path):
    """compact_pack_rows: merging the safe packs/p_<id> dirs into one
    generation must leave (a) read_packed_corpus equal to the batch
    pack_sequences recompute, (b) the NEXT fold's tape end intact —
    committed[-1]/meta must keep resolving to the newest stream batch,
    which is why _list_batch_dirs returns generations first — and (c)
    a no-op on re-run below two sources."""
    from twitter_social_triangle_mapreduce_spark.operators.corpus import (
        pack_sequences,
    )
    from twitter_social_triangle_mapreduce_spark.streaming import (
        compact_pack_rows,
        fold_pack_batch,
        read_packed_corpus,
    )

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    snap = str(tmp_path / "snap")
    budget = 8
    batches = [
        [(0, "alpha beta gamma"), (1, "delta epsilon")],
        [(2, "zeta eta theta iota kappa")],
        [(3, "lam mu"), (4, "nu xi omicron pi")],
    ]
    for i, rows in enumerate(batches):
        fold_pack_batch(docs(rows), i, snap, budget=budget)
    gen = compact_pack_rows(spark, snap)
    assert gen == 0
    all_docs = docs([r for rows in batches for r in rows])
    want = sorted(
        map(tuple, pack_sequences(all_docs, budget=budget).collect())
    )
    got = sorted(map(tuple, read_packed_corpus(spark, snap).collect()))
    assert got == want
    # the next fold appends at the true tape end across the compacted
    # horizon (a stale generation meta would restart mid-tape)
    fold_pack_batch(docs([(5, "rho sigma tau")]), 3, snap, budget=budget)
    all_docs = docs([r for rows in batches for r in rows] + [(5, "rho sigma tau")])
    want = sorted(
        map(tuple, pack_sequences(all_docs, budget=budget).collect())
    )
    got = sorted(map(tuple, read_packed_corpus(spark, snap).collect()))
    assert got == want
    # single safe source (the generation) after the new fold is still
    # >= 2 sources (gen + p_2)? p_2 was the newest at compaction time
    # and stayed out; re-compaction folds gen 0 + p_2 forward
    gen2 = compact_pack_rows(spark, snap)
    assert gen2 == 1
    got = sorted(map(tuple, read_packed_corpus(spark, snap).collect()))
    assert got == want
    assert compact_pack_rows(spark, snap) is None  # gen 1 alone is safe
    # crash-before-flip: an orphan generation (rows + sources, no
    # marker) must be invisible to the packed read
    docs([(99, "ghost")]).write.mode("overwrite").parquet(
        f"{snap}/packs/g_" + "7".zfill(20) + "/rows"
    )
    spark.createDataFrame([(3,)], "src long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{snap}/packs/compact_sources/g_" + "7".zfill(20))
    got = sorted(map(tuple, read_packed_corpus(spark, snap).collect()))
    assert got == want


def test_passage_cuts_compaction_preserves_served_cuts(spark, tmp_path):
    """compact_passage_cuts: the served cut-list union must be
    identical across the flip, and later folds keep appending."""
    from twitter_social_triangle_mapreduce_spark.streaming import (
        compact_passage_cuts,
        fold_passage_batch,
        read_passage_cuts,
    )

    boiler = "please accept cookies to continue using this website"
    snap = str(tmp_path / "snap")
    batches = [
        [(1, f"alpha beta gamma {boiler}")],
        [(10, f"{boiler} epsilon zeta eta theta iota")],
        [(20, f"closing batch lambda mu {boiler} nu xi")],
    ]
    for i, rows in enumerate(batches):
        fold_passage_batch(
            spark.createDataFrame(rows, "doc_id long, text string"), i, snap
        )
    before = sorted(map(tuple, read_passage_cuts(spark, snap).collect()))
    assert compact_passage_cuts(spark, snap) == 0
    assert sorted(
        map(tuple, read_passage_cuts(spark, snap).collect())
    ) == before
    # a later duplicate of the compacted-away batch-0 passage still cuts
    fold_passage_batch(
        spark.createDataFrame(
            [(30, f"tail repeat {boiler} here")], "doc_id long, text string"
        ),
        3,
        snap,
    )
    after = sorted(map(tuple, read_passage_cuts(spark, snap).collect()))
    assert set(before) <= set(after)
    assert 30 in {d for d, _, _ in after}


def _resurrect_gen(spark, parent, gen, saved_data, saved_sources):
    """Recreate generation ``gen`` exactly as a crash-after-flip leaves
    it: data dir + compact_sources + COMMITTED marker all present while
    a later generation's ledger already records it as folded forward."""
    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        _gen_dir,
        _gen_marker_path,
        _rollup_fs,
    )

    spark.read.parquet(saved_data).write.mode("overwrite").parquet(
        _gen_dir(parent, gen)
    )
    spark.read.parquet(saved_sources).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{parent}/compact_sources/g_{gen:020d}")
    jvm, fs = _rollup_fs(spark, parent)
    fs.create(_gen_marker_path(jvm, parent, gen), True).close()


def test_compact_batch_store_crash_after_flip_is_duplicate_free(
    spark, tmp_path
):
    """Round-9 (r8 verdict item 1): a crash AFTER the new generation's
    marker commit but BEFORE the old generation's cleanup leaves BOTH
    markers on disk. Exclusion must come from the committed
    compact_sources ledger (the -(gen+1) entries), not from marker
    deletion: listings skip the folded generation, the union read is
    duplicate-free, and the NEXT compaction neither re-reads the stale
    generation (which would bake the duplicates in permanently) nor
    leaves its marker behind."""
    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        _committed_gens,
        _compact_batch_store,
        _gen_dir,
        _list_batch_dirs,
    )

    parent = str(tmp_path / "store")

    def write_batch(bid, vals):
        spark.createDataFrame([(int(v),) for v in vals], "x long").write.parquet(
            f"{parent}/b_{bid:020d}"
        )

    write_batch(0, [1, 2])
    write_batch(1, [3])
    write_batch(2, [4])
    assert _compact_batch_store(spark, parent, "b_", 2) == 0  # folds 0,1
    write_batch(3, [5])
    # snapshot g_0's data + ledger before the second compaction deletes
    # them, so we can resurrect the exact crash-after-flip state
    saved_data = str(tmp_path / "saved_g0")
    saved_sources = str(tmp_path / "saved_g0_sources")
    spark.read.parquet(_gen_dir(parent, 0)).write.parquet(saved_data)
    spark.read.parquet(f"{parent}/compact_sources/g_" + "0".zfill(20)).write.parquet(
        saved_sources
    )
    assert _compact_batch_store(spark, parent, "b_", 3) == 1  # folds g0 + b_2
    _resurrect_gen(spark, parent, 0, saved_data, saved_sources)
    assert _committed_gens(spark, parent) == [0, 1]  # both markers live
    # the listing excludes the folded generation via g_1's ledger
    dirs = _list_batch_dirs(spark, parent, "b_")
    assert [d.rsplit("/", 1)[1] for d in dirs] == [
        "g_" + "1".zfill(20),
        "b_" + "3".zfill(20),
    ]
    got = sorted(r["x"] for r in spark.read.parquet(*dirs).collect())
    assert got == [1, 2, 3, 4, 5]  # duplicate-free
    # next compaction: folds g_1 + b_3 only (never re-reads stale g_0),
    # and its cleanup retires the stale marker
    assert _compact_batch_store(spark, parent, "b_", 4) == 2
    dirs = _list_batch_dirs(spark, parent, "b_")
    assert [d.rsplit("/", 1)[1] for d in dirs] == ["g_" + "2".zfill(20)]
    got = sorted(r["x"] for r in spark.read.parquet(*dirs).collect())
    assert got == [1, 2, 3, 4, 5]  # still duplicate-free: nothing baked
    assert _committed_gens(spark, parent) == [2]


@pytest.mark.slow  # crash-replay simulation (closing battery)
def test_semantic_embs_crash_after_flip_fold_stays_batch_equal(
    spark, tmp_path
):
    """The semantic store through the PUBLIC path: with a stale
    folded-forward generation resurrected (crash-after-flip), the next
    fold's corpus read must not double-count the old embeddings and the
    snapshot must still equal the batch recompute."""
    from twitter_social_triangle_mapreduce_spark.operators import similarity
    from twitter_social_triangle_mapreduce_spark.streaming import (
        compact_semantic_embs,
        fold_semantic_batch,
        read_semantic_snapshot,
    )
    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        _gen_dir,
        _list_batch_dirs,
    )

    a = [1.0, 0.2, 0.0, 0.0, 0.1, 0.0, 0.0, 0.0]
    b = [0.0, 0.0, 1.0, 0.3, 0.0, 0.1, 0.0, 0.0]

    def emb(rows):
        return spark.createDataFrame(
            [(v, [float(x) for x in e]) for v, e in rows],
            "vec_id long, embedding array<float>",
        )

    snap = str(tmp_path / "snap")
    parent = f"{snap}/embs"
    batches = [
        [(0, a), (1, b)],
        [(2, [0.0] * 7 + [1.0])],
        [(3, [0.0, 1.0] + [0.0] * 6)],
    ]
    rows_so_far = []
    for i, rows in enumerate(batches):
        fold_semantic_batch(emb(rows), i, snap, dims=8)
        rows_so_far += rows
    assert compact_semantic_embs(spark, snap) == 0
    fold_semantic_batch(emb([(4, [0.0, 0.0, 0.0, 1.0] + [0.0] * 4)]), 3, snap, dims=8)
    rows_so_far += [(4, [0.0, 0.0, 0.0, 1.0] + [0.0] * 4)]
    saved_data = str(tmp_path / "saved_g0")
    saved_sources = str(tmp_path / "saved_g0_sources")
    spark.read.parquet(_gen_dir(parent, 0)).write.parquet(saved_data)
    spark.read.parquet(f"{parent}/compact_sources/g_" + "0".zfill(20)).write.parquet(
        saved_sources
    )
    assert compact_semantic_embs(spark, snap) == 1
    _resurrect_gen(spark, parent, 0, saved_data, saved_sources)
    # the corpus union is duplicate-free despite both markers existing
    dirs = _list_batch_dirs(spark, parent, "b_")
    ids = sorted(
        r["vec_id"] for r in spark.read.parquet(*dirs).collect()
    )
    assert ids == [0, 1, 2, 3, 4]
    # a vec duplicating ONLY a compacted-away batch-0 vector merges,
    # and the state equals the batch recompute (no double-counted rows)
    fold_semantic_batch(emb([(5, a)]), 4, snap, dims=8)
    rows_so_far += [(5, a)]
    got = sorted(map(tuple, read_semantic_snapshot(spark, snap).collect()))
    want = sorted(
        map(
            tuple,
            similarity.semantic_dedup_clusters(emb(rows_so_far), dims=8).collect(),
        )
    )
    assert got == want


def test_pack_rows_crash_after_flip_is_duplicate_free(spark, tmp_path):
    """compact_pack_rows' inline layout (rows/ + meta/ subdirs) shares
    the ledger contract: a resurrected folded-forward generation is
    excluded read-side, the packed corpus stays equal to the batch
    recompute (duplicate pack rows = duplicated training data), and the
    next compaction converges without baking the stale rows in."""
    from twitter_social_triangle_mapreduce_spark.operators.corpus import (
        pack_sequences,
    )
    from twitter_social_triangle_mapreduce_spark.streaming import (
        compact_pack_rows,
        fold_pack_batch,
        read_packed_corpus,
    )
    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        _committed_gens,
        _gen_dir,
        _gen_marker_path,
        _rollup_fs,
    )

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    snap = str(tmp_path / "snap")
    parent = f"{snap}/packs"
    budget = 8
    batches = [
        [(0, "alpha beta gamma"), (1, "delta epsilon")],
        [(2, "zeta eta theta iota kappa")],
        [(3, "lam mu"), (4, "nu xi omicron pi")],
    ]
    for i, rows in enumerate(batches):
        fold_pack_batch(docs(rows), i, snap, budget=budget)
    assert compact_pack_rows(spark, snap) == 0
    fold_pack_batch(docs([(5, "rho sigma tau")]), 3, snap, budget=budget)
    # save g_0 (rows + meta + ledger) before it is cleaned up
    saved_rows = str(tmp_path / "saved_g0_rows")
    saved_meta = str(tmp_path / "saved_g0_meta")
    saved_sources = str(tmp_path / "saved_g0_sources")
    spark.read.parquet(f"{_gen_dir(parent, 0)}/rows").write.parquet(saved_rows)
    spark.read.parquet(f"{_gen_dir(parent, 0)}/meta").write.parquet(saved_meta)
    spark.read.parquet(f"{parent}/compact_sources/g_" + "0".zfill(20)).write.parquet(
        saved_sources
    )
    assert compact_pack_rows(spark, snap) == 1
    spark.read.parquet(saved_rows).write.parquet(f"{_gen_dir(parent, 0)}/rows")
    spark.read.parquet(saved_meta).coalesce(1).write.parquet(
        f"{_gen_dir(parent, 0)}/meta"
    )
    spark.read.parquet(saved_sources).coalesce(1).write.parquet(
        f"{parent}/compact_sources/g_" + "0".zfill(20)
    )
    jvm, fs = _rollup_fs(spark, parent)
    fs.create(_gen_marker_path(jvm, parent, 0), True).close()
    assert _committed_gens(spark, parent) == [0, 1]
    all_docs = docs([r for rows in batches for r in rows] + [(5, "rho sigma tau")])
    want = sorted(map(tuple, pack_sequences(all_docs, budget=budget).collect()))
    got = sorted(map(tuple, read_packed_corpus(spark, snap).collect()))
    assert got == want  # stale generation invisible: no duplicate rows
    # another fold, then the next compaction converges (g_1 + p_3,
    # never the stale g_0) and its cleanup retires the stale marker
    fold_pack_batch(docs([(6, "upsilon phi chi")]), 4, snap, budget=budget)
    assert compact_pack_rows(spark, snap) == 2
    all_docs = docs(
        [r for rows in batches for r in rows]
        + [(5, "rho sigma tau"), (6, "upsilon phi chi")]
    )
    want = sorted(map(tuple, pack_sequences(all_docs, budget=budget).collect()))
    got = sorted(map(tuple, read_packed_corpus(spark, snap).collect()))
    assert got == want
    assert _committed_gens(spark, parent) == [2]


def test_fold_semantic_legacy_snapshot_pins_historical_default(
    spark, tmp_path, monkeypatch
):
    """A snapshot with COMMITTED versions but no lsh_bits marker
    predates the round-8 width contract; its history folded at the
    fixed LSH_BITS default, so the next fold must pin LSH_BITS — never
    a width derived from the CURRENT batch's count, which would be a
    silent mid-stream width change (advisor finding, round 8)."""
    import shutil

    from twitter_social_triangle_mapreduce_spark.operators import similarity
    from twitter_social_triangle_mapreduce_spark.streaming import (
        fold_semantic_batch,
    )

    a = [1.0, 0.2, 0.0, 0.0, 0.1, 0.0, 0.0, 0.0]

    def emb(rows):
        return spark.createDataFrame(
            [(v, [float(x) for x in e]) for v, e in rows],
            "vec_id long, embedding array<float>",
        )

    snap = str(tmp_path / "snap")
    fold_semantic_batch(emb([(0, a)]), 0, snap, dims=8)
    # strip the width contract files — the pre-round-8 on-disk layout
    # (root pin + marker AND the round-9 per-version pin)
    shutil.rmtree(f"{snap}/lsh_bits")
    import glob
    import os

    os.remove(f"{snap}/lsh_bits_APPLIED")
    for d in glob.glob(f"{snap}/v_*/bits"):
        shutil.rmtree(d)
    # make batch-derived sizing loud: if the fold (wrongly) derives
    # from this batch instead of pinning the historical default, it
    # would store 99
    monkeypatch.setattr(similarity, "lsh_bits_for", lambda n, **k: 99)
    fold_semantic_batch(emb([(1, a)]), 1, snap, dims=8)
    stored = [
        int(r["bits"])
        for r in spark.read.parquet(f"{snap}/lsh_bits").collect()
    ]
    assert stored == [similarity.LSH_BITS]


@pytest.mark.slow  # multi-fold migration scenario (closing battery)
def test_reband_semantic_store_mid_stream_migration(spark, tmp_path):
    """Round-9 (r8 verdict item 3): a stream pinned at its first-fold
    width can migrate mid-stream — reband_semantic_store recomputes
    the state over the at-rest corpus at the NEW width under one
    atomic marker (state + width flip together), folds continue at the
    new width, and the final state equals the batch recompute AT THE
    WIDE WIDTH. Also pins: no-op at the serving width, the drift raise
    now tracking the re-banded pin, crash-before-flip invisibility of
    an uncommitted re-band, and read-through of the re-band by
    read_semantic_snapshot."""
    from twitter_social_triangle_mapreduce_spark.operators import similarity
    from twitter_social_triangle_mapreduce_spark.streaming import (
        fold_semantic_batch,
        read_semantic_snapshot,
    )
    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        reband_semantic_store,
    )

    a = [1.0, 0.2, 0.0, 0.0, 0.1, 0.0, 0.0, 0.0]
    b = [0.0, 0.0, 1.0, 0.3, 0.0, 0.1, 0.0, 0.0]

    def emb(rows):
        return spark.createDataFrame(
            [(v, [float(x) for x in e]) for v, e in rows],
            "vec_id long, embedding array<float>",
        )

    snap = str(tmp_path / "snap")
    b0 = [(0, a), (1, a), (2, b), (3, b)]
    b1 = [(4, [0.0] * 7 + [1.0]), (5, [0.0, 1.0] + [0.0] * 6)]
    # folds at the (derived) 8-bit floor
    fold_semantic_batch(emb(b0), 0, snap, dims=8)
    fold_semantic_batch(emb(b1), 1, snap, dims=8)
    # no-op: already serving at 8 bits, derived width floors to 8 too
    assert reband_semantic_store(spark, snap, dims=8) is None
    assert reband_semantic_store(spark, snap, bits=8, dims=8) is None
    # migrate to 9 bits: serving state must equal the batch recompute
    # at the NEW width immediately
    assert reband_semantic_store(spark, snap, bits=9, dims=8) == 9
    got = sorted(map(tuple, read_semantic_snapshot(spark, snap).collect()))
    want = sorted(
        map(
            tuple,
            similarity.semantic_dedup_clusters(
                emb(b0 + b1), dims=8, bits=9
            ).collect(),
        )
    )
    assert got == want
    # the pin moved atomically with the state: the OLD width now raises
    with pytest.raises(ValueError, match="pinned at bits=9"):
        fold_semantic_batch(emb([(6, a)]), 2, snap, dims=8, bits=8)
    # continue folding (default loads the re-banded pin) — final state
    # == batch recompute at the wide width across the migration point
    b2 = [(6, a), (7, [0.0, 0.0, 0.0, 1.0] + [0.0] * 4)]
    fold_semantic_batch(emb(b2), 2, snap, dims=8)
    got = sorted(map(tuple, read_semantic_snapshot(spark, snap).collect()))
    want = sorted(
        map(
            tuple,
            similarity.semantic_dedup_clusters(
                emb(b0 + b1 + b2), dims=8, bits=9
            ).collect(),
        )
    )
    assert got == want
    # crash-before-flip: an uncommitted re-band (state + bits, no
    # marker) is invisible — serving state and pin unchanged
    import os

    rdir = f"{snap}/r_" + "2".zfill(20) + "_" + "1".zfill(4)
    emb([(99, a)]).write.mode("overwrite").parquet(f"{rdir}/state")
    spark.createDataFrame([(12,)], "bits int").write.mode(
        "overwrite"
    ).parquet(f"{rdir}/bits")
    assert not os.path.exists(f"{rdir}/_APPLIED")
    got2 = sorted(map(tuple, read_semantic_snapshot(spark, snap).collect()))
    assert got2 == got
    fold_semantic_batch(emb([(8, b)]), 3, snap, dims=8)
    got = sorted(map(tuple, read_semantic_snapshot(spark, snap).collect()))
    want = sorted(
        map(
            tuple,
            similarity.semantic_dedup_clusters(
                emb(b0 + b1 + b2 + [(8, b)]), dims=8, bits=9
            ).collect(),
        )
    )
    assert got == want


@pytest.mark.slow  # multi-fold migration scenario (closing battery)
def test_reband_reads_through_compacted_embs(spark, tmp_path):
    """reband_semantic_store's corpus read goes through the same
    generation-aware listing as the folds: after compact_semantic_embs
    rewrites the old batches into a generation, the re-band recompute
    must still cover the compacted-away embeddings and subsequent
    folds must extend it with batch parity at the new width."""
    from twitter_social_triangle_mapreduce_spark.operators import similarity
    from twitter_social_triangle_mapreduce_spark.streaming import (
        compact_semantic_embs,
        fold_semantic_batch,
        read_semantic_snapshot,
    )
    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        reband_semantic_store,
    )

    a = [1.0, 0.2, 0.0, 0.0, 0.1, 0.0, 0.0, 0.0]
    b = [0.0, 0.0, 1.0, 0.3, 0.0, 0.1, 0.0, 0.0]

    def emb(rows):
        return spark.createDataFrame(
            [(v, [float(x) for x in e]) for v, e in rows],
            "vec_id long, embedding array<float>",
        )

    snap = str(tmp_path / "snap")
    batches = [
        [(0, a), (1, b)],
        [(2, [0.0] * 7 + [1.0])],
        [(3, [0.0, 1.0] + [0.0] * 6)],
    ]
    rows = []
    for i, brows in enumerate(batches):
        fold_semantic_batch(emb(brows), i, snap, dims=8)
        rows += brows
    assert compact_semantic_embs(spark, snap) == 0
    assert reband_semantic_store(spark, snap, bits=9, dims=8) == 9
    got = sorted(map(tuple, read_semantic_snapshot(spark, snap).collect()))
    want = sorted(
        map(
            tuple,
            similarity.semantic_dedup_clusters(
                emb(rows), dims=8, bits=9
            ).collect(),
        )
    )
    assert got == want  # compacted-away embeddings covered
    # a vec near-duplicating ONLY a compacted batch-0 vector merges
    # through the re-banded state
    fold_semantic_batch(emb([(4, a)]), 3, snap, dims=8)
    rows += [(4, a)]
    got = sorted(map(tuple, read_semantic_snapshot(spark, snap).collect()))
    want = sorted(
        map(
            tuple,
            similarity.semantic_dedup_clusters(
                emb(rows), dims=8, bits=9
            ).collect(),
        )
    )
    assert got == want
    by_vec = {v: c for v, c, _ in got}
    assert by_vec[4] == by_vec[0]


def test_compaction_carries_folded_batch_ids_forward(spark, tmp_path):
    """Round-9 review finding: a source batch dir whose own deletion
    failed (crash inside the best-effort cleanup) stays excluded only
    by its generation's ledger — and the NEXT compaction deletes that
    ledger. The new generation's ledger must therefore carry every
    stale generation's batch ids forward, or the leftover dir
    resurfaces as live data and its rows duplicate permanently. Also
    pins that the next compaction RETRIES the leftover's deletion."""
    import os

    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        _compact_batch_store,
        _gen_sources,
        _list_batch_dirs,
    )

    parent = str(tmp_path / "store")

    def write_batch(bid, vals):
        spark.createDataFrame(
            [(int(v),) for v in vals], "x long"
        ).write.parquet(f"{parent}/b_{bid:020d}")

    write_batch(0, [1, 2])
    write_batch(1, [3])
    write_batch(2, [4])
    # save b_1 so we can simulate its failed deletion
    saved = str(tmp_path / "saved_b1")
    spark.read.parquet(f"{parent}/b_" + "1".zfill(20)).write.parquet(saved)
    assert _compact_batch_store(spark, parent, "b_", 2) == 0  # folds 0,1
    b1_dir = f"{parent}/b_" + "1".zfill(20)
    spark.read.parquet(saved).write.mode("overwrite").parquet(b1_dir)
    write_batch(3, [5])
    # second compaction folds g_0 + b_2 and deletes g_0's ledger; its
    # own ledger must still exclude batch 1
    assert _compact_batch_store(spark, parent, "b_", 3) == 1
    srcs1 = _gen_sources(spark, parent, 1)
    assert 1 in srcs1  # the observed leftover is carried forward
    # ...but NOT the whole folded history — batch 0's dir was deleted
    # successfully, and a folded id can never be re-written, so the
    # ledger stays bounded by live sources + crash leftovers
    assert 0 not in srcs1
    dirs = _list_batch_dirs(spark, parent, "b_")
    assert [d.rsplit("/", 1)[1] for d in dirs] == [
        "g_" + "1".zfill(20),
        "b_" + "3".zfill(20),
    ]
    got = sorted(r["x"] for r in spark.read.parquet(*dirs).collect())
    assert got == [1, 2, 3, 4, 5]  # no resurfaced duplicates
    # the leftover dir's deletion was retried by the cleanup
    assert not os.path.exists(b1_dir)
    # and a further compaction converges without re-reading batch 1
    write_batch(4, [6])
    assert _compact_batch_store(spark, parent, "b_", 5) == 2
    dirs = _list_batch_dirs(spark, parent, "b_")
    got = sorted(r["x"] for r in spark.read.parquet(*dirs).collect())
    assert got == [1, 2, 3, 4, 5, 6]


def test_reband_refreshes_legacy_root_pin(spark, tmp_path):
    """Advisor finding (round 10): the root ``lsh_bits`` parquet is the
    documented legacy fallback for pre-round-9 tooling, so a committed
    re-band must (best-effort) refresh it — otherwise external readers
    see the pre-migration width forever. Authority is unchanged: the
    in-dir pin wins for folds."""
    from twitter_social_triangle_mapreduce_spark.streaming import (
        fold_semantic_batch,
    )
    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        _semantic_pinned_bits,
        _semantic_state_dirs,
        reband_semantic_store,
    )

    def emb(rows):
        return spark.createDataFrame(
            [(v, [float(x) for x in e]) for v, e in rows],
            "vec_id long, embedding array<float>",
        )

    snap = str(tmp_path / "snap")
    rows = [(i, [1.0 * (i % 4 == d) for d in range(8)]) for i in range(6)]
    fold_semantic_batch(emb(rows), 0, snap, dims=8)
    assert (
        spark.read.parquet(f"{snap}/lsh_bits").collect()[0]["bits"] == 8
    )
    assert reband_semantic_store(spark, snap, bits=10, dims=8) == 10
    # the legacy root pin now reports the post-migration width too
    assert (
        spark.read.parquet(f"{snap}/lsh_bits").collect()[0]["bits"] == 10
    )
    # and the authoritative in-dir pin agrees
    dirs = _semantic_state_dirs(spark, snap)
    assert _semantic_pinned_bits(spark, snap, dirs) == 10


def test_gen_ledger_tolerates_folded_leftover_without_ledger(
    spark, tmp_path
):
    """Advisor finding (round 10): cleanup deletes a stale generation's
    marker, data dir, and ledger — if the marker delete fails WITHOUT
    raising (fs.delete returning false) while the ledger delete
    succeeds, the store would present a marker-committed generation
    with no readable compact_sources. The reader must tolerate exactly
    that shape — a generation another committed ledger records as
    folded needs no ledger of its own — while a LIVE generation with a
    missing ledger (real corruption) still fails loudly."""
    import os
    import shutil

    from twitter_social_triangle_mapreduce_spark.streaming.streams import (
        _compact_batch_store,
        _gen_ledger,
        _list_batch_dirs,
    )

    parent = str(tmp_path / "store")

    def write_batch(bid, vals):
        spark.createDataFrame(
            [(int(v),) for v in vals], "x long"
        ).write.parquet(f"{parent}/b_{bid:020d}")

    write_batch(0, [1, 2])
    write_batch(1, [3])
    write_batch(2, [4])
    assert _compact_batch_store(spark, parent, "b_", 2) == 0  # folds 0,1
    write_batch(3, [5])
    assert _compact_batch_store(spark, parent, "b_", 3) == 1  # folds g0+b2
    # resurrect g_0's MARKER alone (failed non-raising marker delete)
    # while its ledger and data stay deleted (successful deletes)
    marker = f"{parent}/markers/g_" + "0".zfill(20) + "_APPLIED"
    open(marker, "w").close()
    assert not os.path.exists(f"{parent}/compact_sources/g_" + "0".zfill(20))
    gens, live, folded_srcs = _gen_ledger(spark, parent)
    assert gens == [0, 1] and live == [1]  # leftover excluded, no raise
    # g_1's ledger lists its DIRECT batch source only (0 and 1 were
    # g_0's — cleanly deleted, so no carry was needed)
    assert folded_srcs == {2}
    dirs = _list_batch_dirs(spark, parent, "b_")
    got = sorted(r["x"] for r in spark.read.parquet(*dirs).collect())
    assert got == [1, 2, 3, 4, 5]  # duplicate-free serving
    # a LIVE generation with no ledger is real corruption: loud
    os.remove(marker)
    shutil.rmtree(f"{parent}/compact_sources/g_" + "1".zfill(20))
    with pytest.raises(Exception):
        _gen_ledger(spark, parent)
