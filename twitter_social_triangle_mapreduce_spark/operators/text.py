"""Text-analysis operators over ``documents``: token statistics / quality
scoring, n-gram-heuristic language ID, content fingerprinting, and corpus
token frequency — the text side of a training-data pipeline.

Same portability contract as ``dedup``: integer outputs (``floor(1e6·r)``
for ratios), md5 for fingerprints, all built-in JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens

#: per-language marker sets for the stopword-membership language
#: heuristic: the ~50 most frequent function words of each language
#: (public frequency-list knowledge). Deterministic and
#: oracle-reproducible — the SQL twins GENERATE their membership lists
#: from these same tuples (registry_ext), so extending a list changes
#: both engines identically. Words sharing surface forms across
#: languages (es/fr 'la', es 'de', …) are fine: scores are counted per
#: language and ties break by code order. The broadcast-membership
#: operator shape is unchanged at any list size.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (
        "the", "of", "and", "a", "to", "in", "is", "was", "he", "for",
        "it", "with", "as", "his", "on", "be", "at", "by", "i", "this",
        "had", "not", "are", "but", "from", "or", "have", "an", "they",
        "which", "one", "you", "were", "her", "all", "she", "there",
        "would", "their", "we", "him", "been", "has", "when", "who",
        "will", "more", "no", "if", "out",
    ),
    "de": (
        "der", "die", "und", "den", "von", "zu", "das", "mit", "sich",
        "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine",
        "als", "auch", "es", "werden", "aus", "er", "hat", "dass",
        "sie", "nach", "wird", "bei", "einer", "um", "am", "sind",
        "noch", "wie", "einem", "über", "einen", "so", "zum", "war",
        "haben", "nur", "oder", "aber", "vor", "zur", "bis", "mehr",
    ),
    "es": (
        "de", "la", "que", "el", "en", "y", "los", "del", "se", "las",
        "por", "un", "para", "con", "una", "su", "al", "lo", "como",
        "más", "pero", "sus", "le", "ya", "o", "este", "porque",
        "esta", "entre", "cuando", "muy", "sin", "sobre", "también",
        "me", "hasta", "hay", "donde", "quien", "desde", "todo", "nos",
        "durante", "todos", "uno", "les", "ni", "contra", "otros",
        "ese",
    ),
    "fr": (
        "le", "la", "et", "les", "des", "en", "un", "du", "une", "que",
        "est", "pour", "qui", "dans", "par", "plus", "pas", "au",
        "sur", "ne", "se", "ce", "il", "sont", "avec", "ou", "son",
        "lui", "nous", "comme", "mais", "on", "ces", "ses", "elle",
        "tout", "fait", "aux", "leur", "bien", "où", "sans", "peut",
        "cette", "votre", "aussi", "si", "deux", "même", "vous",
    ),
}

#: stopword list for the quality score — the English function-word set
#: (the C4-style prose proxy scores ENGLISH prose density by design;
#: note 'die'/'in'-style cross-language surface forms are excluded
#: from or included in the EN list on English-frequency grounds only)
STOPWORDS: tuple[str, ...] = LANG_MARKERS["en"]


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-document quality metrics: token count, distinct tokens,
    type-token ratio, mean token length, stopword ratio — the standard
    cheap quality-filter features.

    ROW-LOCAL computation (optimization round 12, guide §2.4): every
    metric is a per-document aggregate over that document's own tokens,
    so all five are array expressions over ``split(text, ' ')`` — no
    token explode, no groupBy exchange; the whole operator is a
    projection of the document scan. Σ token length uses the split
    identity ``length(text) == Σ len(tok) + (n_tokens − 1)`` (single-
    char split reconstructs exactly), so not even a fold is needed.
    Measured 0.69 s → 0.22 s at 2 cores on sf0.1 with the 2.3 MB
    token exchange removed; values bit-identical (same oracle). Docs
    with NULL text produce no row — identical to the exploded form
    (``explode`` of a null array emits nothing). Ratios are
    ``floor(1e6·r)`` BIGINT for engine-exact comparison."""
    stop_set = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        documents.where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.split("text", " ").alias("__ws"),
            F.length("text").alias("__len"),
        )
        .selectExpr(
            "doc_id",
            "CAST(size(__ws) AS BIGINT) AS n_tokens",
            "CAST(size(array_distinct(__ws)) AS BIGINT) AS n_types",
            "CAST(floor(1000000 * size(array_distinct(__ws))"
            " / size(__ws)) AS BIGINT) AS ttr_e6",
            "CAST(floor(1000000 * (__len - size(__ws) + 1)"
            " / size(__ws)) AS BIGINT) AS mean_tok_len_e6",
            f"CAST(floor(1000000 * size(filter(__ws,"
            f" w -> w IN ({stop_set}))) / size(__ws)) AS BIGINT)"
            " AS stopword_e6",
        )
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """(doc_id, pred_lang) — marker-word language heuristic: count marker
    hits per language over the token stream; predict the language with the
    most hits (ties broken by language code order, 'und' when no marker
    hits at all). Deterministic and SQL-reproducible.

    ROW-LOCAL (optimization round 12, guide §2.4): the per-language
    marker-hit counts are ``size(filter(...))`` array expressions over
    the document's own token array — no explode, no groupBy exchange;
    the predictor is a pure projection. Values identical to the
    exploded form (same oracle); NULL-text docs emit no row in both."""
    scores = (
        documents.where(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("__ws"))
        .selectExpr(
            "doc_id",
            *[
                "size(filter(__ws, w -> w IN ({}))) AS s_{}".format(
                    ", ".join(f"'{w}'" for w in ws), lang
                )
                for lang, ws in sorted(LANG_MARKERS.items())
            ],
        )
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # first language reaching the max wins (code order)
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return scores.select("doc_id", pred.alias("pred_lang"))


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, fp) — 128-bit content fingerprint of the
    whitespace-normalized, lower-cased text. The normalize-then-hash shape
    is the exact-dedup key for noisy corpora."""
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), " +", " "))
    return documents.select("doc_id", F.md5(norm).alias("fp"))


#: BPE-ish subword pattern: greedy ≤4-char alpha/digit chunks — a stand-in
#: with the same shape as a real BPE pre-tokenizer regex (both engines'
#: regex dialects agree on this class/quantifier subset)
BPE_PATTERN = "[a-z]{1,4}|[0-9]{1,4}"

#: rolling-hash parameters (modulus keeps acc*base+val inside int64)
RH_BASE = 131
RH_MOD = 1_000_000_007


def token_counts_multi(documents: DataFrame) -> DataFrame:
    """(doc_id, n_ws, n_bpe, n_chars_calc) — token counting under both
    tokenizers a data pipeline meters with: whitespace words and BPE-ish
    subword chunks (``regexp_extract_all``, JVM-side)."""
    return documents.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_ws"),
        F.size(F.expr(f"regexp_extract_all(text, '{BPE_PATTERN}', 0)"))
        .cast("long")
        .alias("n_bpe"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )


def doc_rolling_hash(documents: DataFrame) -> DataFrame:
    """(doc_id, rhash) — order-sensitive polynomial rolling hash over the
    token stream: fold (acc·B + val(tok)) mod M left-to-right, with
    val(tok) the 28-bit md5 prefix. Unlike the order-insensitive content
    md5 (``doc_fingerprint``), this detects reorderings — the
    rolling-fingerprint shape used for shingle-free near-dup passes.
    Pure integer arithmetic → oracle-exact (DuckDB ``list_reduce`` has
    first-element-as-seed semantics; the Spark fold seeds identically)."""
    val = (
        "transform(split(text, ' '),"
        " x -> CAST(conv(substr(md5(x), 1, 7), 16, 10) AS BIGINT))"
    )
    fold = (
        f"aggregate(slice(vals, 2, size(vals) - 1), vals[0],"
        f" (acc, x) -> (acc * {RH_BASE} + x) % {RH_MOD})"
    )
    return documents.select(
        "doc_id", F.expr(val).alias("vals")
    ).select("doc_id", F.expr(fold).alias("rhash"))


def token_topk(documents: DataFrame, k: int = 100) -> DataFrame:
    """(tok, cnt) — corpus-wide token frequency, top ``k`` by (count desc,
    token asc) — deterministic total order. Exercises the engine's
    sort/limit path (absent from the reference, SURVEY.md §2.5)."""
    t = tokens(documents)
    return (
        t.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(k)
    )


#: co-occurrence guards: pairs must appear in at least this many docs,
#: and docs with more distinct tokens than the cap are excluded from
#: PAIR GENERATION (their per-doc pair fan-out is quadratic) while still
#: counting toward the document frequencies — the same hot-key shape as
#: the n-gram Jaccard `max_doc_freq` cap
COOC_MIN_PAIR_DOCS = 5
COOC_MAX_DOC_TYPES = 1000


def token_cooccurrence_lift(
    documents: DataFrame,
    min_pair_docs: int = COOC_MIN_PAIR_DOCS,
    max_doc_types: int = COOC_MAX_DOC_TYPES,
) -> DataFrame:
    """(tok_a, tok_b, n_both, lift_e6) — document-level co-occurrence
    lift P(a,b)/(P(a)·P(b)) for unordered token pairs, the
    collocation/phrase-mining primitive (lift is the exp of PMI; the
    log is monotone, so ranking is PMI ranking without the
    engine-divergent ``ln``).

    Scale shape: pair generation is a doc-local self-join of the
    DISTINCT-token relation (`a.tok < b.tok`), so fan-out is bounded by
    ``max_doc_types``² per document, never corpus-size²; the pair count
    then aggregates with map-side partials, and document frequencies
    join in on the (small) surviving pair vocabulary. All arithmetic on
    the lift is exact-integer inputs under correctly-rounded double
    ops — engine-exact after the e6 floor."""
    tok_docs = (
        tokens(documents).select("doc_id", "tok").distinct()
    )
    n_types = tok_docs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__nt")
    )
    eligible = tok_docs.join(
        n_types.where(F.col("__nt") <= max_doc_types).select("doc_id"),
        "doc_id",
    )
    a = eligible.select("doc_id", F.col("tok").alias("tok_a"))
    b = eligible.select("doc_id", F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= min_pair_docs)
    )
    df_rel = tok_docs.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        pairs.join(
            df_rel.select(
                F.col("tok").alias("tok_a"), F.col("df").alias("df_a")
            ),
            "tok_a",
        )
        .join(
            df_rel.select(
                F.col("tok").alias("tok_b"), F.col("df").alias("df_b")
            ),
            "tok_b",
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "n_both",
            F.expr(
                "CAST(FLOOR(1000000.0 * n_both * n_docs"
                " / (CAST(df_a AS DOUBLE) * CAST(df_b AS DOUBLE)))"
                " AS BIGINT)"
            ).alias("lift_e6"),
        )
    )


def cooccurrence_oracle_sql(
    toks_sql: str,
    min_pair_docs: int = COOC_MIN_PAIR_DOCS,
    max_doc_types: int = COOC_MAX_DOC_TYPES,
) -> str:
    """DuckDB twin of ``token_cooccurrence_lift``."""
    return f"""
        WITH toks AS ({toks_sql}),
        td AS (SELECT DISTINCT doc_id, tok FROM toks),
        nt AS (SELECT doc_id FROM td GROUP BY doc_id
               HAVING COUNT(*) <= {max_doc_types}),
        elig AS (SELECT td.doc_id, td.tok FROM td JOIN nt USING (doc_id)),
        pairs AS (
            SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS n_both
            FROM elig a JOIN elig b
              ON a.doc_id = b.doc_id AND a.tok < b.tok
            GROUP BY a.tok, b.tok
            HAVING COUNT(*) >= {min_pair_docs}
        ),
        dfs AS (SELECT tok, COUNT(*) AS df FROM td GROUP BY tok),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT tok_a, tok_b, n_both,
               CAST(FLOOR(1000000.0 * n_both * n_docs
                    / (CAST(da.df AS DOUBLE) * CAST(db.df AS DOUBLE)))
                    AS BIGINT) AS lift_e6
        FROM pairs
        JOIN dfs da ON da.tok = tok_a
        JOIN dfs db ON db.tok = tok_b
        CROSS JOIN n
    """


#: vocabulary size for the OOV-rate query
VOCAB_SIZE = 100


def vocab_oov_rates(
    documents: DataFrame, vocab_size: int = VOCAB_SIZE
) -> DataFrame:
    """(doc_id, n_tokens, n_oov, oov_e6) — build the corpus vocabulary
    (top ``vocab_size`` tokens by count desc, token asc — deterministic)
    and report each document's out-of-vocabulary token fraction — the
    coverage check run before freezing any tokenizer vocabulary.

    Shape: the vocabulary is a ``limit`` over the corpus token counts
    (TakeOrderedAndProject) and BROADCASTS into a left join against the
    exploded tokens — the corpus is never shuffled for membership; one
    aggregate keyed on doc_id produces the rates."""
    t = tokens(documents)
    vocab = (
        t.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("__in_vocab"))
    )
    return (
        t.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .withColumn(
            "oov_e6",
            F.floor(1_000_000 * F.col("n_oov") / F.col("n_tokens"))
            .cast("long"),
        )
    )


def vocab_oov_oracle_sql(
    toks_sql: str, vocab_size: int = VOCAB_SIZE
) -> str:
    """DuckDB twin of ``vocab_oov_rates``."""
    return f"""
        WITH toks AS ({toks_sql}),
        vocab AS (SELECT tok FROM toks GROUP BY tok
                  ORDER BY COUNT(*) DESC, tok ASC LIMIT {vocab_size}),
        j AS (SELECT t.doc_id,
                     CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
              FROM toks t LEFT JOIN vocab v ON v.tok = t.tok)
        SELECT doc_id, COUNT(*) AS n_tokens,
               CAST(SUM(oov) AS BIGINT) AS n_oov,
               CAST(FLOOR(1000000 * SUM(oov) / COUNT(*)) AS BIGINT)
                   AS oov_e6
        FROM j GROUP BY doc_id
    """


def source_token_divergence(documents: DataFrame) -> DataFrame:
    """(source, n_tokens, chi2_e6) — how far each source's token
    distribution sits from the corpus-wide distribution: the chi-square
    statistic Σ_tok (o - e)²/e with e the count expected under the
    corpus distribution — the mixture-diagnostics number a pretraining
    pipeline watches when re-weighting sources (a source that drifts
    from the mix shows a growing chi2).

    Engine-exact formulation: with integer counts o (source×token),
    tc (token), st (source), ct (corpus total), each term equals
    (o·ct − tc·st)² / (ct·tc·st) — all-integer inputs pushed through
    the same IEEE double ops in both engines, floored at 1e6 and
    integer-summed, so no float-accumulation order can diverge.

    Shape: one exploded-token pass feeds three partial-agg aggregates
    (source×token, token, source); the term join is keyed on tok with
    the tiny source/corpus relations broadcast. Includes the e>0-only
    terms (every token in the vocabulary has tc>0 by construction)."""
    t = tokens(documents.select("doc_id", "text")).join(
        documents.select("doc_id", "source"), "doc_id"
    )
    st_tok = t.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("o"))
    tok_tot = t.groupBy("tok").agg(F.count(F.lit(1)).alias("tc"))
    src_tot = t.groupBy("source").agg(F.count(F.lit(1)).alias("st"))
    corpus = t.agg(F.count(F.lit(1)).alias("ct"))
    term = (
        st_tok.join(tok_tot, "tok")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(corpus))
        .select(
            "source",
            "o",
            F.expr(
                "CAST(FLOOR(1000000.0"
                " * (CAST(o AS DOUBLE) * ct - CAST(tc AS DOUBLE) * st)"
                " * (CAST(o AS DOUBLE) * ct - CAST(tc AS DOUBLE) * st)"
                " / (CAST(ct AS DOUBLE) * tc * st)) AS BIGINT)"
            ).alias("term_e6"),
        )
    )
    return term.groupBy("source").agg(
        F.sum("o").cast("long").alias("n_tokens"),
        F.sum("term_e6").cast("long").alias("chi2_e6"),
    )


def doc_unigram_logprob(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, sum_lp_e6, avg_lp_e6) — per-document mean
    unigram log-probability under the corpus's OWN token distribution:
    avg over the document's tokens of ln(count(tok)/N). The classic
    corpus-LM quality signal (CCNet/C4 lineage): documents dominated
    by tokens the corpus rarely emits — mojibake, boilerplate IDs,
    non-language noise — score far below the bulk, so a per-source
    percentile cut on ``avg_lp_e6`` is an outlier filter needing no
    trained model, only the corpus. (To build that cut at scale,
    re-bucket the score first and reuse the ``quality_threshold_gate``
    histogram-quota pattern — its score-domain bound assumes the
    [0, 1e6] stopword score; wider domains need coarse buckets to
    keep the quota walk off the corpus.)

    Engine-exact formulation (the ``source_token_divergence``
    recipe): each token's log-probability is floored to an integer at
    1e6 from all-integer inputs pushed through the same IEEE double
    ops in both engines — per-document aggregation then SUMS INTEGERS,
    so no float-accumulation order can diverge; the mean is one final
    floored division of two integers. (ln() itself may differ by an
    ulp between libms; the 1e-6 floor grid makes a flip astronomically
    unlikely and the value is stable within each engine regardless.)

    Shape: one exploded-token pass feeds the vocabulary count and the
    corpus total (both partial-agg reduced); the per-token scores join
    back onto the token stream keyed on tok — vocabulary-sized build
    side (Zipf-bounded), corpus-sized probe, the standard shape AQE
    broadcasts when the vocabulary is small and hash-joins when it is
    not."""
    toks = tokens(documents.select("doc_id", "text"))
    tok_tot = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tc"))
    corpus = toks.agg(F.count(F.lit(1)).alias("ct"))
    per_tok = tok_tot.crossJoin(F.broadcast(corpus)).select(
        "tok",
        F.expr(
            "CAST(FLOOR(1000000.0"
            " * ln(CAST(tc AS DOUBLE) / ct)) AS BIGINT)"
        ).alias("lp_e6"),
    )
    return (
        toks.join(per_tok, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("lp_e6").cast("long").alias("sum_lp_e6"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_lp_e6",
            F.expr(
                "CAST(FLOOR(CAST(sum_lp_e6 AS DOUBLE) / n_tokens)"
                " AS BIGINT)"
            ).alias("avg_lp_e6"),
        )
    )


def unigram_logprob_oracle_sql(toks_sql: str) -> str:
    """DuckDB twin of ``doc_unigram_logprob`` — same floored integer
    per-token scores, same integer sums, same final floored division."""
    return f"""
        WITH toks AS ({toks_sql}),
        tok_tot AS (SELECT tok, COUNT(*) AS tc FROM toks GROUP BY tok),
        corpus AS (SELECT COUNT(*) AS ct FROM toks),
        per_tok AS (
            SELECT tok,
                   CAST(FLOOR(1000000.0
                        * ln(CAST(tc AS DOUBLE) / ct)) AS BIGINT) AS lp_e6
            FROM tok_tot CROSS JOIN corpus
        ),
        doc AS (
            SELECT toks.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(lp_e6) AS BIGINT) AS sum_lp_e6
            FROM toks JOIN per_tok USING (tok)
            GROUP BY toks.doc_id
        )
        SELECT doc_id, n_tokens, sum_lp_e6,
               CAST(FLOOR(CAST(sum_lp_e6 AS DOUBLE) / n_tokens)
                    AS BIGINT) AS avg_lp_e6
        FROM doc
    """


def divergence_oracle_sql(toks_sql: str) -> str:
    """DuckDB twin of ``source_token_divergence``."""
    return f"""
        WITH toks AS ({toks_sql}),
        t AS (SELECT toks.doc_id, toks.tok, d.source
              FROM toks JOIN documents d ON d.doc_id = toks.doc_id),
        st_tok AS (SELECT source, tok, COUNT(*) AS o
                   FROM t GROUP BY source, tok),
        tok_tot AS (SELECT tok, COUNT(*) AS tc FROM t GROUP BY tok),
        src_tot AS (SELECT source, COUNT(*) AS st FROM t GROUP BY source),
        corpus AS (SELECT COUNT(*) AS ct FROM t),
        term AS (
            SELECT source, o,
                   CAST(FLOOR(1000000.0
                        * (CAST(o AS DOUBLE) * ct - CAST(tc AS DOUBLE) * st)
                        * (CAST(o AS DOUBLE) * ct - CAST(tc AS DOUBLE) * st)
                        / (CAST(ct AS DOUBLE) * tc * st)) AS BIGINT)
                       AS term_e6
            FROM st_tok
            JOIN tok_tot USING (tok)
            JOIN src_tot USING (source)
            CROSS JOIN corpus
        )
        SELECT source, CAST(SUM(o) AS BIGINT) AS n_tokens,
               CAST(SUM(term_e6) AS BIGINT) AS chi2_e6
        FROM term GROUP BY source
    """


#: top-fraction kept by the per-source quality gate (1e6-scaled)
QUALITY_TOPQ_E6 = 250_000


def quality_threshold_gate(
    documents: DataFrame,
    q_e6: int = QUALITY_TOPQ_E6,
    strata_col: str = "source",
) -> DataFrame:
    """(doc_id, source, score_e6, keep) — per-source TOP-q% quality gate
    ("keep the best quarter of every domain"): a document is kept when
    its whole score bucket fits inside the source's quota
    floor(q·n_source) counting from the best score down. Whole-bucket
    semantics make the gate deterministic and rank-free — boundary-score
    documents are all-or-nothing, so the kept count is AT MOST the quota
    (never a nondeterministic tie split).

    Score: stopword density (floor 1e6, the same C4-style prose proxy
    ``curate_corpus`` thresholds absolutely; here the cut adapts per
    source instead of being a global constant).

    Scale shape — deliberately NOT a percent_rank window over the
    corpus: a 100 TB source would funnel into one window task. Instead
    (1) the score is a pure row expression (no token explode; the
    stopword count is promoted to BIGINT before the 1e6 scale so a
    dense 10k-word document can't overflow int32), (2) a histogram
    groupBy(source, score) reduces the corpus map-side to at most
    |sources|·1e6 rows, (3) the cumulative quota walk windows over
    that SCORE-DOMAIN-bounded relation (never corpus-sized), and
    (4) because the cumulative count is monotone as the score
    descends, the whole-bucket keep set collapses to ONE threshold
    score per source — the broadcast side is exactly |sources| rows
    (bounded regardless of score-domain width), and keep is a row
    expression against it. Corpus rows are never shuffled."""
    stop_set = ", ".join(f"'{w}'" for w in STOPWORDS)
    scored = documents.select(
        "doc_id",
        F.col(strata_col).alias("source"),
        F.expr(
            f"CAST(floor(CAST(1000000 AS BIGINT)"
            f" * size(filter(split(text, ' '),"
            f" w -> w IN ({stop_set}))) / size(split(text, ' ')))"
            " AS BIGINT)"
        ).alias("score_e6"),
    )
    from pyspark.sql.window import Window

    hist = scored.groupBy("source", "score_e6").agg(
        F.count(F.lit(1)).alias("__n")
    )
    cum_w = (
        Window.partitionBy("source")
        .orderBy(F.col("score_e6").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot_w = Window.partitionBy("source")
    # lowest score whose whole bucket still fits the quota — keep is then
    # score >= threshold (sources where even the best bucket overflows
    # the quota have no row here; the left join's null keeps nothing)
    thresholds = (
        hist.withColumn("__ns", F.sum("__n").over(tot_w))
        .withColumn("__cum", F.sum("__n").over(cum_w))
        .where(F.col("__cum") <= F.expr(f"({q_e6} * __ns) div 1000000"))
        .groupBy("source")
        .agg(F.min("score_e6").alias("__thresh"))
    )
    return scored.join(F.broadcast(thresholds), ["source"], "left").select(
        "doc_id",
        "source",
        "score_e6",
        F.coalesce(
            (F.col("score_e6") >= F.col("__thresh")).cast("long"), F.lit(0)
        ).alias("keep"),
    )


def quality_gate_oracle_sql(
    src_sql: str = "SELECT * FROM documents",
    q_e6: int = QUALITY_TOPQ_E6,
    strata_col: str = "source",
) -> str:
    """DuckDB twin of ``quality_threshold_gate``."""
    stop_set = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
        WITH s AS (SELECT doc_id, {strata_col} AS source,
                          CAST(FLOOR(1000000 *
                               len(list_filter(string_split(text, ' '),
                                               w -> w IN ({stop_set})))
                               / len(string_split(text, ' ')))
                               AS BIGINT) AS score_e6
                   FROM ({src_sql})),
        h AS (SELECT source, score_e6, COUNT(*) AS n
              FROM s GROUP BY source, score_e6),
        w AS (SELECT source, score_e6,
                     SUM(n) OVER (PARTITION BY source
                                  ORDER BY score_e6 DESC
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                     SUM(n) OVER (PARTITION BY source) AS ns
              FROM h)
        SELECT s.doc_id, s.source, s.score_e6,
               CAST(CASE WHEN w.cum <= ({q_e6} * w.ns) // 1000000
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM s JOIN w USING (source, score_e6)
    """


#: bottom-fraction DROPPED by the per-source log-prob gate (1e6-scaled):
#: the CCNet-style outlier cut — drop the worst 10% of every source
LOGPROB_CUT_BOTTOM_E6 = 100_000

#: coarse re-bucketing of ``avg_lp_e6`` for the histogram quota walk
#: (round 12, r11 verdict item 2): the stopword gate's histogram trick
#: assumes a [0, 1e6] score domain; ``avg_lp_e6`` is negative and wide,
#: so the walk runs over floor-div buckets instead. 0.1-nat buckets over
#: the [LOGPROB_FLOOR_E6, 0] domain bound the histogram at
#: |sources| × 400 rows regardless of corpus size.
LOGPROB_BUCKET_E6 = 100_000

#: hard floor of the score domain: avg_lp_e6 ≥ 1e6·ln(1/N) > −40e6 for
#: any corpus below e^40 ≈ 2.4e17 tokens; the clamp makes the bucket
#: arithmetic provably non-negative in both engines (same floor-div
#: then truncation == floor)
LOGPROB_FLOOR_E6 = -40_000_000


def unigram_logprob_gate(
    documents: DataFrame,
    p_e6: int = LOGPROB_CUT_BOTTOM_E6,
    bucket_e6: int = LOGPROB_BUCKET_E6,
    strata_col: str = "source",
) -> DataFrame:
    """(doc_id, source, avg_lp_e6, bucket, keep) — per-source BOTTOM-p%
    cut on the corpus-LM quality score (round 12, r11 verdict item 2:
    ``doc_unigram_logprob`` shipped the score; this is the gate that
    makes it an actionable curation stage). A document is DROPPED when
    its whole score BUCKET fits inside the source's drop quota
    ``floor(p·n_source)`` counting from the worst bucket up — the same
    whole-bucket determinism as ``quality_threshold_gate`` (boundary
    buckets are all-or-nothing, so the dropped count is AT MOST the
    quota and never a nondeterministic tie split). Sources where even
    the worst bucket overflows the quota drop nothing.

    Scale shape — the quality_threshold_gate histogram recipe with one
    extra move: (1) the per-document score comes from the shared
    ``doc_unigram_logprob`` pipeline (token-keyed join, integer-exact);
    (2) ``source`` attaches via a doc-sized post-aggregation equi-join
    (joining AFTER the per-doc reduce keeps the token stream narrow —
    the divergence query tags tokens instead because its aggregate is
    per-source); (3) the wide negative score domain re-buckets by
    clamped floor-div — non-negative by construction, so Spark's
    truncating ``div`` and DuckDB's flooring ``//`` agree — bounding
    the histogram the quota walk windows over at |sources| × 400 rows;
    (4) the per-source drop threshold collapses to ONE bucket id,
    broadcast back, keep is a row expression. Corpus rows shuffle only
    inside the score pipeline itself, never for the gate."""
    from pyspark.sql.window import Window

    scored = doc_unigram_logprob(documents).join(
        documents.select("doc_id", F.col(strata_col).alias("source")),
        "doc_id",
    ).select(
        "doc_id",
        "source",
        "avg_lp_e6",
        F.expr(
            f"(greatest(avg_lp_e6, {LOGPROB_FLOOR_E6})"
            f" - {LOGPROB_FLOOR_E6}) div {bucket_e6}"
        ).alias("bucket"),
    )
    hist = scored.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("__n")
    )
    cum_w = (
        Window.partitionBy("source")
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot_w = Window.partitionBy("source")
    # highest bucket whose whole population still fits the DROP quota,
    # walking from the worst score up; drop is then bucket <= threshold
    thresholds = (
        hist.withColumn("__ns", F.sum("__n").over(tot_w))
        .withColumn("__cum", F.sum("__n").over(cum_w))
        .where(F.col("__cum") <= F.expr(f"({p_e6} * __ns) div 1000000"))
        .groupBy("source")
        .agg(F.max("bucket").alias("__thresh"))
    )
    return scored.join(F.broadcast(thresholds), ["source"], "left").select(
        "doc_id",
        "source",
        "avg_lp_e6",
        "bucket",
        F.coalesce(
            (F.col("bucket") > F.col("__thresh")).cast("long"), F.lit(1)
        ).alias("keep"),
    )


def unigram_logprob_gate_oracle_sql(
    toks_sql: str,
    p_e6: int = LOGPROB_CUT_BOTTOM_E6,
    bucket_e6: int = LOGPROB_BUCKET_E6,
    strata_col: str = "source",
) -> str:
    """DuckDB twin of ``unigram_logprob_gate`` — the logprob oracle's
    doc relation, the same clamped floor-div bucket, the same
    worst-bucket-up quota walk."""
    return f"""
        WITH lp AS ({unigram_logprob_oracle_sql(toks_sql)}),
        s AS (SELECT lp.doc_id, d.{strata_col} AS source, lp.avg_lp_e6,
                     (greatest(lp.avg_lp_e6, {LOGPROB_FLOOR_E6})
                      - {LOGPROB_FLOOR_E6}) // {bucket_e6} AS bucket
              FROM lp JOIN documents d USING (doc_id)),
        h AS (SELECT source, bucket, COUNT(*) AS n
              FROM s GROUP BY source, bucket),
        w AS (SELECT source, bucket,
                     SUM(n) OVER (PARTITION BY source
                                  ORDER BY bucket ASC
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                     SUM(n) OVER (PARTITION BY source) AS ns
              FROM h),
        thr AS (SELECT source, MAX(bucket) AS th
                FROM w WHERE cum <= ({p_e6} * ns) // 1000000
                GROUP BY source)
        SELECT s.doc_id, s.source, s.avg_lp_e6, s.bucket,
               CAST(COALESCE(s.bucket > t.th, TRUE) AS BIGINT) AS keep
        FROM s LEFT JOIN thr t USING (source)
    """


#: curation gates: minimum token count and minimum (English) stopword
#: density — the classic cheap heuristics a pretraining pipeline applies
#: before any model-based scoring
CURATE_MIN_TOKENS = 20
CURATE_MIN_STOPWORD_E6 = 10000  # 1% of tokens


def curate_corpus(
    documents: DataFrame,
    min_tokens: int = CURATE_MIN_TOKENS,
    min_stopword_e6: int = CURATE_MIN_STOPWORD_E6,
) -> DataFrame:
    """(doc_id, keep, reason) — the composed curation pipeline: every
    document is tagged kept or dropped with the FIRST failing gate as its
    reason, in fixed precedence order:

    1. ``exact_dup``     — not the lowest doc_id of its md5(text) group
    2. ``lang_unknown``  — the marker heuristic predicts no language
    3. ``too_short``     — fewer than ``min_tokens`` tokens
    4. ``low_stopword``  — stopword density below ``min_stopword_e6``
                           (boilerplate / non-prose signal; English-
                           centric by construction, like the classic
                           C4-style heuristic)
    5. ``kept``          — survived every gate (``keep = 1``)

    One pass builds all features, ROW-LOCALLY (optimization round 12,
    guide §2.4; supersedes the round-4 fused-explode form): the
    token-count, stopword-count, and per-language marker-hit features
    are array expressions over the document's own token array — no
    token explode, no groupBy(doc_id) exchange, and no feats-side join:
    the feature projection carries the md5 key along, so the ONLY
    exchange left is the (16-byte-keyed, partial-agg) keep-first
    aggregate plus its join back. Semantics identical, pinned by the
    unchanged oracle. At 100 TB this is one shuffle over a compact
    aggregate regardless of document size."""
    langs_sorted = sorted(LANG_MARKERS)
    stop_set = ", ".join(f"'{w}'" for w in STOPWORDS)
    feats = (
        documents.where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.unhex(F.md5("text")).alias("__h"),
            F.split("text", " ").alias("__ws"),
        )
        .selectExpr(
            "doc_id",
            "__h",
            "CAST(size(__ws) AS BIGINT) AS n_tokens",
            f"CAST(floor(1000000 * size(filter(__ws,"
            f" w -> w IN ({stop_set}))) / size(__ws)) AS BIGINT)"
            " AS stopword_e6",
            *[
                "size(filter(__ws, w -> w IN ({}))) AS s_{}".format(
                    ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]), lang
                )
                for lang in langs_sorted
            ],
        )
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs_sorted])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs_sorted:  # first language reaching the max (code order)
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    feats = feats.withColumn("pred_lang", pred)
    # binary digest key: the keep-first aggregate shuffles 16-byte
    # hashes instead of 32-char hex (the key never leaves the operator)
    keep_first = feats.groupBy("__h").agg(
        F.min("doc_id").alias("__keep_id")
    )
    reason = (
        F.when(F.col("doc_id") != F.col("__keep_id"), F.lit("exact_dup"))
        .when(F.col("pred_lang") == "und", F.lit("lang_unknown"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(
            F.col("stopword_e6") < min_stopword_e6, F.lit("low_stopword")
        )
        .otherwise(F.lit("kept"))
    )
    return (
        feats.join(keep_first, "__h")
        .select(
            "doc_id",
            reason.alias("reason"),
        )
        .withColumn("keep", (F.col("reason") == "kept").cast("long"))
        .select("doc_id", "keep", "reason")
    )
