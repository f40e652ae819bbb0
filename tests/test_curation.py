"""Semantic tests for the dedup/curation DELIVERABLES: near-dup cluster
closure + canonical election (dedup.near_dup_clusters) and the composed
curation gates (text.curate_corpus). The sf0.001 oracle hash-match lives
in test_oracle_differential; these pin the semantics on crafted corpora
where the expected answer is known by construction."""

from __future__ import annotations

from twitter_social_triangle_mapreduce_spark.operators import dedup, text


def docs_df(spark, rows):
    return spark.createDataFrame(
        [(int(i), t) for i, t in rows], "doc_id long, text string"
    )


# a base document long enough to shingle, plus near-variants that keep
# most 3-shingles intact (high minhash collision probability)
_BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
_VAR1 = _BASE + " lambda"
_VAR2 = _BASE + " lambda mu"
_OTHER = "one two three four five six seven eight nine ten eleven"


def test_near_dup_clusters_transitive_and_singletons(spark):
    """VAR1 collides with BASE and VAR2; even if BASE and VAR2 never share
    a band, transitive closure must place all three in ONE cluster with
    the min doc_id canonical. Unrelated docs stay singletons."""
    corpus = docs_df(
        spark, [(10, _BASE), (11, _VAR1), (12, _VAR2), (30, _OTHER)]
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup.near_dup_clusters(corpus).collect()
    }
    assert got[10] == (10, 1)
    assert got[11] == (10, 0)
    assert got[12] == (10, 0)
    assert got[30] == (30, 1)


def test_near_dup_clusters_exact_copies_cluster(spark):
    """Exact copies share every band — always one cluster."""
    corpus = docs_df(spark, [(1, _BASE), (2, _BASE), (3, _OTHER)])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_dup_clusters(corpus).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3}


def test_curate_corpus_gate_precedence(spark):
    """Each crafted doc fails exactly the gate its name says; the dup of
    the kept doc reports exact_dup even though it would also pass every
    other gate (precedence: dup > lang > length > stopword)."""
    kept = (
        "the quick brown fox of the meadow jumps over a lazy dog and "
        "runs to the river in the morning of a bright day to rest"
    )
    short = "the a of and to in seven eight"  # < 20 tokens, high stopword
    no_lang = " ".join(f"tok{i}" for i in range(30))  # no markers at all
    no_stop = "der hund und die katze und der vogel " + " ".join(
        f"wort{i}" for i in range(20)
    )  # German: markers hit, zero English stopwords
    corpus = docs_df(
        spark,
        [(1, kept), (2, kept), (3, short), (4, no_lang), (5, no_stop)],
    )
    got = {
        r["doc_id"]: (r["keep"], r["reason"])
        for r in text.curate_corpus(corpus).collect()
    }
    assert got[1] == (1, "kept")
    assert got[2] == (0, "exact_dup")
    assert got[3] == (0, "too_short")
    assert got[4] == (0, "lang_unknown")
    assert got[5] == (0, "low_stopword")


def test_curate_corpus_keep_matches_reason(spark):
    """keep is exactly the kept-reason indicator on real testdata, and
    the curation verdict covers every document exactly once."""
    from twitter_social_triangle_mapreduce_spark.sources.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = text.curate_corpus(docs).collect()
    assert len(out) == docs.count()
    assert all((r["reason"] == "kept") == (r["keep"] == 1) for r in out)
    # thresholds chosen to produce real variety on the synthetic corpus
    reasons = {r["reason"] for r in out}
    assert "kept" in reasons and len(reasons) >= 2


def _src_docs(spark, rows):
    return spark.createDataFrame(
        [(int(i), s, t) for i, s, t in rows],
        "doc_id long, source string, text string",
    )


def test_quality_gate_quota_and_whole_bucket_semantics(spark):
    """Per-source top-q gate: 10 docs in source A with distinct scores
    (stopword counts 0..9 over 10 tokens) at q=0.3 keeps exactly the 3
    best; source B's 4 equal-score docs (one bucket of 4 > quota 1) are
    dropped ENTIRELY — whole-bucket all-or-nothing, never a tie split."""
    fill = ["w{}".format(j) for j in range(10)]
    rows = []
    for i in range(10):  # source A: i stopwords, 10 - i fillers
        toks = (["the"] * i + fill)[:10]
        rows.append((i, "A", " ".join(toks)))
    for i in range(4):  # source B: all score 100000 (1 stopword / 10)
        rows.append((100 + i, "B", " ".join(["the"] + fill[:9])))
    got = {
        r["doc_id"]: (r["score_e6"], r["keep"])
        for r in text.quality_threshold_gate(
            _src_docs(spark, rows), q_e6=300_000
        ).collect()
    }
    assert len(got) == 14  # every doc gets a verdict
    kept_a = {d for d, (_, k) in got.items() if k == 1 and d < 100}
    assert kept_a == {9, 8, 7}  # the 3 highest stopword densities
    assert all(got[100 + i][1] == 0 for i in range(4))  # B: bucket > quota
    assert got[100][0] == 100_000  # sanity on the score itself


def test_quality_gate_never_exceeds_quota_on_real_docs(spark):
    """On the smoke corpus, each source keeps at most floor(q * n_s)
    documents, and verdicts are a pure function of (source, score)."""
    from twitter_social_triangle_mapreduce_spark.sources.io import load_table
    from pyspark.sql import functions as F

    from conftest import SF_SMOKE

    q_e6 = 250_000
    docs = load_table(spark, SF_SMOKE, "documents")
    g = text.quality_threshold_gate(docs, q_e6=q_e6)
    agg = {
        r["source"]: (r["kept"], r["n"])
        for r in g.groupBy("source")
        .agg(
            F.sum("keep").alias("kept"), F.count(F.lit(1)).alias("n")
        )
        .collect()
    }
    assert agg, "no sources"
    for src, (kept, n) in agg.items():
        assert kept <= (q_e6 * n) // 1_000_000, (src, kept, n)
    # same (source, score) -> same verdict everywhere
    assert (
        g.groupBy("source", "score_e6")
        .agg(F.count_distinct("keep").alias("v"))
        .where("v > 1")
        .count()
        == 0
    )


def test_lang_id_classifies_real_nonenglish_prose(spark):
    """Round-3 verdict item 8: with the ~50-word function-word marker
    sets, real sentences in each supported language classify correctly
    (not just shaped right), and markerless text stays 'und'."""
    rows = [
        (1, "the cat sat on the mat and it was happy to be there"),
        (2, "der alte mann ging mit dem hund durch den park und war froh"),
        (3, "la casa de mi abuela es muy grande y tiene un jardín bonito"),
        (4, "le chat noir est sur la table et il regarde par la fenêtre"),
        (5, "zxqv plomp trill krunk blarp fizzle womp"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in text.lang_id(docs).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "fr", 5: "und"}


def test_elect_canonicals_longest_wins_ties_to_min_id(spark):
    """Quality re-election: the highest score per cluster wins, ties
    break to the smaller doc_id, singletons stay canonical, and exactly
    one canonical exists per cluster."""
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (7, 1), (10, 4), (11, 4)],
        "doc_id long, score long",
    )
    got = sorted(
        map(tuple, dedup.elect_canonicals(clusters, scores).collect())
    )
    assert got == [
        (1, 1, 0), (2, 1, 1), (3, 1, 0),  # 2 beats 3 on the tie
        (7, 7, 1),
        (10, 10, 1), (11, 10, 0),  # tie -> min doc_id
    ]


def test_elect_canonicals_total_under_partial_and_duplicate_scores(spark):
    """Review finding: the election must be total — unscored members
    rank below scored ones (an all-unscored cluster falls back to the
    min-id election), and duplicate score rows never duplicate output
    rows."""
    clusters = spark.createDataFrame(
        [(5, 5), (9, 5), (20, 20), (21, 20)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(9, 1), (9, 7)],  # doc 5 unscored; doc 9 scored twice
        "doc_id long, score long",
    )
    got = sorted(
        map(tuple, dedup.elect_canonicals(clusters, scores).collect())
    )
    assert got == [
        (5, 5, 0), (9, 5, 1),      # scored member beats unscored
        (20, 20, 1), (21, 20, 0),  # all-unscored cluster: min id wins
    ]


def test_unigram_logprob_separates_noise_from_bulk(spark):
    """The quality signal the operator exists for: documents made of
    corpus-common tokens must score (avg log-probability) strictly
    above a document of corpus-unique noise, and every score is
    negative (probabilities < 1)."""
    from twitter_social_triangle_mapreduce_spark.operators.text import (
        doc_unigram_logprob,
    )

    texts = ["the cat sat"] * 20 + ["zqx9 j77k v00m wpp3"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["avg_lp_e6"] for r in doc_unigram_logprob(docs).collect()}
    bulk = [got[i] for i in range(20)]
    noise = got[20]
    assert all(v < 0 for v in got.values())
    assert min(bulk) > noise  # common-token docs score strictly higher
    assert len(set(bulk)) == 1  # identical docs score identically
