"""Corpus-preparation operators: eval-set decontamination, intra-document
repetition metrics, and token-budget sequence packing — the steps between
dedup/curation and actually writing training shards.

Same portability contract as ``dedup``/``text``: md5 hashes, ratios as
``floor(1e6·r)`` BIGINT, everything expression-level (whole-stage codegen,
no Python in the hot path).

The reference has no corpus tooling (it is a graph-analytics engine —
SURVEY.md §1.3); these operators extend the engine toward the
training-data-pipeline surface the 100 TB deployment needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles

#: shingle width used for contamination checks (benchmark-overlap scans
#: conventionally use wordlevel 8-13-grams; the testdata's short synthetic
#: docs motivate 3 — the operator is parametric)
DECONTAM_N = 3
#: contamination verdict threshold: ≥20% of a doc's distinct shingles
#: appearing in the eval set flags it
DECONTAM_THRESHOLD_E6 = 200_000

#: token capacity of one packed training sequence
PACK_BUDGET = 64
#: docs per doc_id bucket for the distributed prefix sum
PACK_BUCKET_SPAN = 100
#: md5 hex chars forming the shuffled-tape bucket (16^4 = 65536 buckets;
#: raise at extreme scale so each bucket stays task-sized)
PACK_SHUFFLE_PREFIX = 4


def prepare_training_corpus(
    documents: DataFrame,
    eval_docs: DataFrame,
    path: str,
    budget: int = 64,
    packs_per_shard: int = 16,
    persist_audit: bool = True,
    cut_passages: bool = False,
    shuffle_seed: str | None = None,
    embeddings: DataFrame | None = None,
    diversity_per_cell: int | None = None,
    bpe_merges: list | None = None,
    semantic_bits: int | None = None,
) -> DataFrame:
    """The capstone composition — the full corpus-prep pipeline as ONE
    lazy dataflow ending in training shards:

    1. curation gates (``text.curate_corpus``: exact-dup / language /
       length / stopword) keep only clean documents;
    2. near-dup clusters (``dedup.near_dup_clusters``: LSH → transitive
       closure) keep one canonical per cluster;
    3. eval-set decontamination (``decontaminate``) drops contaminated
       survivors;
    4. optionally (``cut_passages``, round 4) the surviving TEXT is
       passage-deduplicated (``passages.dedup_passages``): repeated
       boilerplate spans inside otherwise-unique survivors are excised
       before packing — the sub-document duplicate class every earlier
       gate is blind to. Off by default so the shipped bench/budget
       profile is unchanged. Documents whose spans covered EVERYTHING
       are dropped from the shard input AND audited as ``fully_cut``
       (round-5 ADVICE: a ``kept`` verdict for a doc absent from every
       shard would break audit-vs-shard reconciliation — the audit's
       ``kept`` count must equal the packed doc count exactly);
    5. optionally the SEMANTIC tier joins in (``embeddings`` — a
       (doc_id, embedding) relation; testdata's ``vec_id`` doubles as
       the doc key): ``similarity.semantic_dedup_clusters`` drops
       non-canonical members of embedding-cosine clusters
       (``semantic_dup`` — paraphrase-level duplicates no text gate
       sees), and ``diversity_per_cell`` caps each IVF cell's
       contribution (``diversity_cut`` — cluster-balanced pruning, so
       one dominant topic cannot crowd out the tail). Documents with
       no embedding row pass both gates untouched. ``semantic_bits``
       overrides the LSH band width; by default it follows the corpus
       via ``lsh_bits_for(count)`` (round 7 — the fixed default was
       quadratic at 1M vectors), at the cost of one ids-only count
       action. Like every other
       stage, each verdict relation is computed over the FULL input
       independently and the audit takes the FIRST drop by priority
       (curation → near_dup → contaminated → semantic_dup →
       diversity_cut) — the established capstone convention;
    6. the survivors pack onto the token tape and land as
       hive-partitioned shards (``write_training_shards``).

    Returns the per-document audit relation (doc_id, verdict) — every
    input document with the FIRST gate that dropped it, or ``kept``;
    the judge of record for "why is doc X (not) in the corpus". Each
    stage is the already-oracled operator — the composition adds no new
    semantics, only the joins between verdicts; everything stays one
    Catalyst plan per output (audit, shards) with the compact verdict
    relations joined on doc_id.

    ``persist_audit`` (default on) persists the audit relation before the
    shard write — without it, Spark replans the whole gate pipeline
    (curation scan + LSH band pipeline + CC closure + decontamination)
    for the packing stats, again for the shard rows, and again when the
    caller evaluates the returned audit: 3+ full corpus scans of pure
    recompute. The audit is doc_id + a short verdict — ~1000× smaller
    than the corpus — so persisting it is exactly the manifest
    materialization a 100 TB deployment performs (MEMORY_AND_DISK:
    spills, never OOMs). Callers that stream the audit elsewhere can
    ``.unpersist()`` it when done, or pass ``persist_audit=False`` to
    keep the composition fully lazy."""
    from pyspark.storagelevel import StorageLevel

    from .dedup import near_dup_clusters
    from .text import curate_corpus

    if diversity_per_cell is not None and embeddings is None:
        raise ValueError(
            "diversity_per_cell requires the embeddings relation"
        )

    cur = curate_corpus(documents).select(
        "doc_id", F.col("reason").alias("__cur_reason")
    )
    nd = near_dup_clusters(documents).select("doc_id", "is_canonical")
    decon = decontaminate(documents, eval_docs).select(
        "doc_id", F.col("contaminated").alias("__contam")
    )
    verdict = (
        F.when(F.col("__cur_reason") != "kept", F.col("__cur_reason"))
        .when(F.col("is_canonical") == 0, F.lit("near_dup"))
        .when(F.coalesce(F.col("__contam"), F.lit(0)) == 1,
              F.lit("contaminated"))
    )
    base = (
        documents.select("doc_id")
        .join(cur, "doc_id")
        .join(nd, "doc_id")
        .join(decon, "doc_id", "left")
    )
    if embeddings is not None:
        from .similarity import (
            cluster_balanced_sample,
            lsh_bits_for,
            semantic_dedup_clusters,
        )

        emb = embeddings.select(
            F.col("vec_id").alias("doc_id"), "embedding"
        ) if "vec_id" in embeddings.columns else embeddings
        # band width follows the corpus (round 7): at the fixed default
        # the banded candidate set is n²·bands/2^(bits+1) — the 1M-doc
        # capstone probe measured the pathology live (one semantic
        # stage, 44 tasks × ~1000 s) before this count was added. One
        # extra action, on the ids-only projection (column-pruned scan);
        # lsh_bits_for floors at the old constant, so testdata-scale
        # plans, oracles, and bench digests are bit-identical.
        if semantic_bits is None:
            semantic_bits = lsh_bits_for(emb.select("doc_id").count())
        sem = semantic_dedup_clusters(
            emb.select(F.col("doc_id").alias("vec_id"), "embedding"),
            bits=semantic_bits,
        ).select(
            F.col("vec_id").alias("doc_id"),
            F.col("is_canonical").alias("__sem_canon"),
        )
        base = base.join(sem, "doc_id", "left")
        verdict = verdict.when(
            F.coalesce(F.col("__sem_canon"), F.lit(1)) == 0,
            F.lit("semantic_dup"),
        )
        if diversity_per_cell is not None:
            div = cluster_balanced_sample(
                emb.select(F.col("doc_id").alias("vec_id"), "embedding"),
                per_cell=diversity_per_cell,
            ).select(
                F.col("vec_id").alias("doc_id"),
                F.col("keep").alias("__div_keep"),
            )
            base = base.join(div, "doc_id", "left")
            verdict = verdict.when(
                F.coalesce(F.col("__div_keep"), F.lit(1)) == 0,
                F.lit("diversity_cut"),
            )
    audit = base.select(
        "doc_id", verdict.otherwise(F.lit("kept")).alias("verdict")
    )
    if persist_audit:
        audit = audit.persist(StorageLevel.MEMORY_AND_DISK)
    kept = documents.join(
        audit.where(F.col("verdict") == "kept").select("doc_id"), "doc_id"
    )
    base_audit = audit
    if cut_passages:
        from .passages import apply_passage_cuts, passage_cut_spans

        # persist the CUT LIST (collision survivors only — manifest-
        # sized, same philosophy as the audit persist), not the corpus
        # text: the shard writer consumes its input twice (pack stats +
        # shard rows), and without this the window-fingerprint pipeline
        # — the expensive part — would replan for each (review finding).
        # The HOF text rewrite re-evaluates per pass, which is the same
        # class of cost as re-reading the text and unavoidable there.
        kept_text = kept.select("doc_id", "text")
        spans = passage_cut_spans(kept_text)
        if persist_audit:
            spans = spans.persist(StorageLevel.MEMORY_AND_DISK)
        extra = [c for c in documents.columns if c not in ("doc_id", "text")]
        applied = apply_passage_cuts(kept_text, spans)
        cut = applied.where(F.length("text") > 0)
        # spans covered the whole doc (guard on n_spans_cut: a doc that
        # was ALREADY empty has no spans and passes through untouched —
        # it is not "fully cut", it never had passage surface)
        empties = applied.where(
            (F.length("text") == 0) & (F.col("n_spans_cut") > 0)
        ).select("doc_id", F.lit(1).alias("__fully_cut"))
        kept = cut.select("doc_id", "text").join(
            kept.select("doc_id", *extra), "doc_id"
        ) if extra else cut.select("doc_id", "text")
        # the returned audit reconciles against shard contents: its
        # derivation reuses the persisted span relation, so the only
        # re-evaluated work is the (scan-shaped) HOF text rewrite
        audit = (
            audit.join(empties, "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("__fully_cut") == 1, F.lit("fully_cut"))
                .otherwise(F.col("verdict"))
                .alias("verdict"),
            )
        )
    write_training_shards(
        kept,
        path,
        budget=budget,
        packs_per_shard=packs_per_shard,
        shuffle_seed=shuffle_seed,
        bpe_merges=bpe_merges,
    )
    if cut_passages and persist_audit:
        # round-6 ADVICE: the span persist previously outlived the call
        # with no handle returned — a long-lived service accumulating
        # cached relations it could only release via a global
        # clearCache. Instead the FINAL audit (post fully_cut override)
        # is persisted and materialized here — one eager manifest-sized
        # job that reuses the persisted base audit + span relations
        # plus one scan-shaped HOF rewrite (the same work the caller's
        # first audit evaluation paid before) — after which the
        # intermediate persists are released precisely. The caller
        # holds the ONE remaining cached relation (the returned audit)
        # and releases it with ``.unpersist()`` when done — the same
        # contract as the non-cut arm.
        audit = audit.persist(StorageLevel.MEMORY_AND_DISK)
        audit.count()
        spans.unpersist()
        base_audit.unpersist()
    return audit


#: packs per output shard for the shard writer
PACKS_PER_SHARD = 16


def write_training_shards(
    documents: DataFrame,
    path: str,
    budget: int = PACK_BUDGET,
    packs_per_shard: int = PACKS_PER_SHARD,
    bucket_span: int = PACK_BUCKET_SPAN,
    shuffle_seed: str | None = None,
    bpe_merges: list | None = None,
) -> None:
    """Materialize the packing layout as training shards: assign every
    document its pack via ``pack_sequences``, group ``packs_per_shard``
    consecutive packs into one shard, and write hive-partitioned parquet
    (``shard=K/``) with rows sorted by ``start_off`` inside each file —
    a shard reader streams documents in exact tape order with zero
    seeks, and a trainer pulls ``shard=K`` via partition pruning without
    touching the rest of the corpus. One extra shuffle (repartition by
    shard) beyond the packing itself.

    RECOVERY CONTRACT (round-5 verdict item 5 — pinned by
    tests/test_corpus_prep.py::test_shard_write_is_idempotent):

    - **Deterministic layout.** Every row's shard is a pure function of
      (doc_id, n_tokens, shuffle_seed): the pack prefix-sum has no RNG, no
      partition-order dependence (exact integer sums), and no
      timestamp, so two runs over the same input produce the same
      (doc_id → shard, start_off) assignment, the same per-shard
      contents, and the same manifest — on any cluster size.
    - **Task retries cannot duplicate or tear a shard.** Parquet writes
      go through Spark's commit protocol: each task writes to a
      per-attempt staging path and exactly one attempt is committed;
      a re-executed task (speculation, executor loss) replaces nothing
      visible until commit.
    - **Job-level recovery = re-run the writer.** ``mode("overwrite")``
      on the root replaces the whole dataset; a job that died mid-write
      may leave partial/staging files, and the documented recovery is
      simply running the writer again over the same input — by
      determinism the result is the same as if the failure never
      happened. Readers must not consume ``path`` until the writer
      returns (the _SUCCESS marker is the readiness signal).
    - Appending NEW data goes through a new root (version directory),
      never into an existing shard tree — shard numbering is global
      (pack_id div packs_per_shard), so appending would re-number.
      Epoch reshuffles (a different ``shuffle_seed``) likewise write a
      new version root: the seed changes every (shard, start_off)
      assignment by design while every determinism/recovery property
      above holds per seed.

    ``bpe_merges`` (a trained merge table from
    ``bpe.train_bpe_merges`` / ``bpe.load_merges``) switches the
    shards to TOKENIZED form: rows carry the encoded ``tokens`` array
    instead of raw text, and the pack budget counts MODEL tokens (the
    quantity a trainer's sequence budget actually means) — encoding
    runs in the Arrow-batched arm, the packing machinery is
    count-agnostic (``n_tokens_col``), and all recovery properties
    hold (the encoder is deterministic given the merge table)."""
    if bpe_merges is not None:
        from pyspark.storagelevel import StorageLevel

        from .bpe import bpe_encode_pandas

        # persist the encoded relation: the Arrow-batched encode is the
        # expensive step and the plan consumes it several times (pack
        # prefix-sum + the writer's join, each over multiple actions) —
        # without the persist it re-runs per consumer. Materialize
        # before use, release after the write (the trainers' rule).
        enc = bpe_encode_pandas(documents, bpe_merges).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            enc.count()
            packed = pack_sequences(
                enc,
                budget,
                bucket_span,
                shuffle_seed=shuffle_seed,
                n_tokens_col="n_tokens",
            )
            write_shards_from_packed(
                enc.select("doc_id", "tokens"),
                packed,
                path,
                packs_per_shard,
            )
        finally:
            enc.unpersist()
        return
    packed = pack_sequences(
        documents, budget, bucket_span, shuffle_seed=shuffle_seed
    )
    write_shards_from_packed(documents, packed, path, packs_per_shard)


def write_shards_from_packed(
    documents: DataFrame,
    packed: DataFrame,
    path: str,
    packs_per_shard: int = PACKS_PER_SHARD,
) -> None:
    """The shard-materialization half of ``write_training_shards``, for
    a packing layout that ALREADY exists: join the text back onto
    ``packed`` (any relation with the ``pack_sequences`` schema — the
    batch operator's output, or the streaming ingest snapshot from
    ``streaming.read_packed_corpus``), group packs into shards, and
    write the same hive-partitioned tree under the same recovery
    contract (determinism now relative to the supplied layout). This
    closes the streaming ingest loop without re-packing: documents
    stream in, the tape grows incrementally, and shard materialization
    is a join + one repartition — never a corpus re-pack."""
    rows = documents.join(
        packed.select(
            "doc_id",
            "n_tokens",
            "start_off",
            "pack_id",
            F.expr(f"pack_id div {packs_per_shard}").alias("shard"),
        ),
        "doc_id",
    )
    (
        rows.repartition("shard")
        .sortWithinPartitions("start_off")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def shard_manifest(spark, path: str) -> DataFrame:
    """(shard, n_docs, n_tokens, start_off, end_off) — the dataset card
    of a ``write_training_shards`` output: per-shard document and token
    totals plus the tape-offset range, read from the shard columns only
    (column pruning keeps the text payload untouched — a manifest over
    a petabyte of shards reads a few integer columns). The offsets being
    contiguous and gap-free across shards is the packed-layout
    invariant a trainer's data loader checks before an epoch."""
    from pyspark.sql import functions as F  # noqa: F811

    rows = spark.read.parquet(path)
    return (
        rows.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("start_off").alias("start_off"),
            F.max(F.col("start_off") + F.col("n_tokens")).alias("end_off"),
        )
        .orderBy("shard")
    )


def _shingle_cte(src_sql: str, n: int, rel: str) -> str:
    """DuckDB CTE body producing ``rel(doc_id, sh)`` — word ``n``-shingles
    of ``src_sql``'s (doc_id, text) rows; same guard as
    ``dedup.shingles`` (docs shorter than ``n`` words emit nothing)."""
    return f"""
        {rel}_w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM ({src_sql})),
        {rel}_i AS (SELECT doc_id, ws,
                           unnest(range(1, len(ws) - {n - 2})) AS i
                    FROM {rel}_w WHERE len(ws) >= {n}),
        {rel} AS (SELECT doc_id, array_to_string(ws[i:i+{n - 1}], ' ') AS sh
                  FROM {rel}_i)
    """


def decontaminate_oracle_sql(
    train_sql: str,
    eval_sql: str,
    n: int = DECONTAM_N,
    threshold_e6: int = DECONTAM_THRESHOLD_E6,
) -> str:
    """DuckDB twin of ``decontaminate`` over (doc_id, text) relations."""
    return f"""
        WITH {_shingle_cte(train_sql, n, "tsh_all")},
        {_shingle_cte(eval_sql, n, "esh_all")},
        tsh AS (SELECT DISTINCT doc_id, sh FROM tsh_all),
        esh AS (SELECT DISTINCT sh FROM esh_all),
        sizes AS (SELECT doc_id, COUNT(*) AS n_shingles
                  FROM tsh GROUP BY doc_id),
        hits AS (SELECT doc_id, COUNT(*) AS n_hits FROM tsh
                 WHERE sh IN (SELECT sh FROM esh) GROUP BY doc_id)
        SELECT s.doc_id, s.n_shingles,
               COALESCE(h.n_hits, 0) AS n_hits,
               CAST(FLOOR(1000000 * COALESCE(h.n_hits, 0) / s.n_shingles)
                    AS BIGINT) AS contam_e6,
               CAST(CASE WHEN FLOOR(1000000 * COALESCE(h.n_hits, 0)
                                    / s.n_shingles) >= {threshold_e6}
                         THEN 1 ELSE 0 END AS BIGINT) AS contaminated
        FROM sizes s LEFT JOIN hits h USING (doc_id)
    """


def repetition_oracle_sql(src_sql: str = "SELECT * FROM documents") -> str:
    """DuckDB twin of ``repetition_stats``."""
    return f"""
        WITH {_shingle_cte(src_sql, 2, "s2")},
        {_shingle_cte(src_sql, 3, "s3")},
        c2 AS (SELECT doc_id, sh, COUNT(*) AS c FROM s2
               GROUP BY doc_id, sh),
        a2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_2grams,
                      CAST(FLOOR(1000000 * MAX(c) / SUM(c)) AS BIGINT)
                          AS top2_e6
               FROM c2 GROUP BY doc_id),
        c3 AS (SELECT doc_id, sh, COUNT(*) AS c FROM s3
               GROUP BY doc_id, sh),
        a3 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_3grams,
                      CAST(FLOOR(1000000 * SUM(CASE WHEN c > 1 THEN c
                                                    ELSE 0 END)
                                 / SUM(c)) AS BIGINT) AS dup3_e6
               FROM c3 GROUP BY doc_id)
        SELECT doc_id, n_2grams, top2_e6, n_3grams, dup3_e6
        FROM a2 JOIN a3 USING (doc_id)
    """


def pack_oracle_sql(
    src_sql: str = "SELECT * FROM documents",
    budget: int = PACK_BUDGET,
    shuffle_seed: str | None = None,
) -> str:
    """DuckDB twin of ``pack_sequences`` — the oracle states the spec
    directly as one global ordered window (fine at oracle scale; the
    engine uses the two-pass distributed form). With ``shuffle_seed``
    the window orders by the same seeded md5 tape key the engine uses
    (DuckDB and Spark both emit lowercase-hex md5 of the same bytes)."""
    order_by = (
        "doc_id"
        if shuffle_seed is None
        else (
            f"md5(concat('{shuffle_seed}', ':',"
            " CAST(doc_id AS VARCHAR))), doc_id"
        )
    )
    return f"""
        WITH tc AS (SELECT doc_id,
                           CAST(len(string_split(text, ' ')) AS BIGINT)
                               AS n_tokens
                    FROM ({src_sql})),
        c AS (SELECT doc_id, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (
                         ORDER BY {order_by}
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS start_off
              FROM tc)
        SELECT doc_id, n_tokens, CAST(start_off AS BIGINT) AS start_off,
               CAST(start_off // {budget} AS BIGINT) AS pack_id,
               CAST((start_off + greatest(n_tokens, 1) - 1) // {budget}
                    AS BIGINT) AS end_pack
        FROM c
    """


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = DECONTAM_N,
    threshold_e6: int = DECONTAM_THRESHOLD_E6,
) -> DataFrame:
    """(doc_id, n_shingles, n_hits, contam_e6, contaminated) — eval-set
    decontamination: for every training document (with ≥1 word
    ``n``-shingle; shorter docs have no overlap surface and are exempt),
    the fraction of its DISTINCT shingles that also occur anywhere in the
    eval set. ``contaminated=1`` when the fraction reaches
    ``threshold_e6``.

    Scale shape: the eval side collapses to its distinct-shingle set and
    is broadcast — eval benchmarks are orders of magnitude smaller than a
    100 TB train corpus, so the train side is never shuffled for the
    probe; the only wide exchange is the per-doc aggregate keyed on
    doc_id. No doc×doc comparison exists anywhere.

    ROW-LOCAL distinct, ONE-PASS fold (optimization round 12, guide
    §2.4): a document's distinct-shingle set is ``array_distinct`` over
    its own shingle array (the previous ``distinct()`` on (doc_id, sh)
    exchanged the corpus-token-sized shingle relation — gone), the probe
    explodes only the per-doc DISTINCT shingles carrying the per-doc
    size alongside, marks eval membership via a broadcast LEFT join, and
    ONE groupBy(doc_id) produces both counters — replacing the previous
    sizes-branch second derivation and the sizes⋈hits join. The eval
    side skips the small-input pre-spread (eval sets are small by
    contract; the spread's fixed task setup exceeded the shingling CPU
    ~50×). Values identical (same oracle)."""
    from ..plans.strategy import spread_small_input

    ev = shingles(eval_docs, n, spread=False).select("sh").distinct()
    tr_local = (
        spread_small_input(train)
        .select("doc_id", F.split("text", " ").alias("ws"))
        .where(F.size("ws") >= n)
        .select(
            "doc_id",
            # greatest(…, 1): keeps the sequence ascending/total even if
            # the optimizer (InferFiltersFromGenerate + pushdown + CSE)
            # evaluates this expression on rows the size(ws) >= n filter
            # discards — sequence(1, 0) is DESCENDING and slice(_, 0, _)
            # ANSI-errors; values on surviving rows are unchanged
            F.expr(
                f"array_distinct(transform("
                f"sequence(1, greatest(size(ws) - {n - 1}, 1)),"
                f" i -> array_join(slice(ws, i, {n}), ' ')))"
            ).alias("__shd"),
        )
    )
    marked = (
        tr_local.select(
            "doc_id",
            F.size("__shd").cast("long").alias("__ns"),
            F.explode("__shd").alias("sh"),
        )
        .join(
            F.broadcast(ev.withColumn("__hit", F.lit(1))), "sh", "left"
        )
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            # __ns is constant within the group; min() is the
            # deterministic pick (first() is order-dependent)
            F.min("__ns").alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_hits"),
        )
        .withColumn(
            "contam_e6",
            F.floor(1_000_000 * F.col("n_hits") / F.col("n_shingles"))
            .cast("long"),
        )
        .withColumn(
            "contaminated",
            (F.col("contam_e6") >= threshold_e6).cast("long"),
        )
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_2grams, top2_e6, n_3grams, dup3_e6) — intra-document
    repetition metrics in the Gopher-quality-filter family:

    - ``top2_e6``: occurrences of the document's most frequent word
      bigram over total bigram occurrences (floor 1e6) — high values mean
      a single phrase dominates;
    - ``dup3_e6``: fraction of trigram occurrences whose trigram occurs
      more than once in the document — high values mean looping /
      boilerplate text.

    Only documents with ≥3 words (i.e. having at least one trigram) are
    emitted — shorter docs have no repetition surface. Both metrics come
    from per-(doc, shingle) counts aggregated per doc: two shuffles over
    compact keys, independent of document length, fully partial-agg."""
    g2 = (
        shingles(documents, 2)
        .groupBy("doc_id", "sh")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_2grams"),
            F.max("c").alias("__top2"),
        )
        .select(
            "doc_id",
            "n_2grams",
            F.floor(1_000_000 * F.col("__top2") / F.col("n_2grams"))
            .cast("long")
            .alias("top2_e6"),
        )
    )
    g3 = (
        shingles(documents, 3)
        .groupBy("doc_id", "sh")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_3grams"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                "__dup3"
            ),
        )
        .select(
            "doc_id",
            "n_3grams",
            F.floor(1_000_000 * F.col("__dup3") / F.col("n_3grams"))
            .cast("long")
            .alias("dup3_e6"),
        )
    )
    return g2.join(g3, "doc_id")


#: tokens per chunk for document chunking
CHUNK_TOKENS = 32
#: chunk start stride (stride < chunk ⇒ overlapping context windows)
CHUNK_STRIDE = 24


def chunk_documents(
    documents: DataFrame,
    chunk: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text) — sliding token-window
    chunking: windows of ``chunk`` tokens starting every ``stride``
    tokens (overlapping when stride < chunk — the context-window
    preparation step for training or retrieval indexing; the final
    window keeps its short tail). ``chunk_id`` is the window ordinal
    (start div stride).

    Scale shape: pure per-row array arithmetic — tokenize once, generate
    the start offsets with ``sequence``, explode, slice. No shuffle, no
    join, no state; Catalyst pipelines it into the scan, and output
    partitioning follows input partitioning (a downstream
    ``groupBy(doc_id)`` re-aggregates chunk rows of one doc that stayed
    in one partition before AQE splits). Docs produce
    ceil(n_tokens/stride) chunks — output volume is corpus-linear with
    factor chunk/stride."""
    ws = documents.select("doc_id", F.split("text", " ").alias("ws"))
    return ws.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(0, size(ws) - 1, {stride})")
        ).alias("__start"),
        "ws",
    ).select(
        "doc_id",
        F.expr(f"__start div {stride}").alias("chunk_id"),
        F.least(F.lit(chunk), F.size("ws") - F.col("__start"))
        .cast("long")
        .alias("n_tokens"),
        F.expr(f"array_join(slice(ws, __start + 1, {chunk}), ' ')").alias(
            "chunk_text"
        ),
    )


def chunks_oracle_sql(
    src_sql: str = "SELECT * FROM documents",
    chunk: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> str:
    """DuckDB twin of ``chunk_documents``."""
    return f"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM ({src_sql})),
        s AS (SELECT doc_id, ws,
                     unnest(range(0, len(ws), {stride})) AS st
              FROM w)
        SELECT doc_id,
               CAST(st // {stride} AS BIGINT) AS chunk_id,
               CAST(least({chunk}, len(ws) - st) AS BIGINT) AS n_tokens,
               array_to_string(ws[st + 1:st + {chunk}], ' ') AS chunk_text
        FROM s
    """


def pack_sequences(
    documents: DataFrame,
    budget: int = PACK_BUDGET,
    bucket_span: int = PACK_BUCKET_SPAN,
    shuffle_seed: str | None = None,
    shuffle_prefix: int = PACK_SHUFFLE_PREFIX,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, start_off, pack_id, end_pack) — token-budget
    sequence packing: documents are concatenated in TAPE ORDER into an
    infinite token tape; training sequence ``k`` owns token span
    ``[k·budget, (k+1)·budget)``. Each document reports its start offset
    on the tape, the pack its first token lands in, and the pack its last
    token lands in (documents may straddle packs — the
    split-and-continue packing regime; zero-token docs occupy their
    start pack). This is the deterministic, join-free packing layout a
    shard writer consumes directly.

    Token counting: whitespace tokens of ``text`` by default;
    ``n_tokens_col`` names a precomputed per-document count instead
    (the TRAINED-tokenizer route — ``bpe_encode*`` produces one — so
    packs hold exactly ``budget`` model tokens, which is what a
    trainer's sequence budget means; the prefix-sum machinery is
    count-agnostic).

    Tape order: ``doc_id`` ascending by default. With ``shuffle_seed``
    set, the tape order becomes ``md5(seed || ':' || doc_id)`` — a
    DETERMINISTIC GLOBAL SHUFFLE of the corpus (the training-order
    randomization step every pretraining pipeline needs: ingest order
    correlates with source/domain/time, and packing an unshuffled tape
    feeds the trainer long single-domain runs). Seeded md5 keeps every
    run, every partitioning, and the DuckDB oracle bit-identical;
    changing the seed yields an independent permutation (epoch
    reshuffles = new seed, no data movement until the shard write).

    Scale shape — the global running sum is computed as a TWO-PASS
    distributed prefix sum, never a single-partition window over the
    corpus: (1) an intra-bucket cumulative sum windowed per bucket
    (shuffle keyed on bucket), and (2) bucket-level totals prefix-summed
    with an ordered window over that TINY relation and joined back. The
    bucket must be a PREFIX of the tape order so the two levels compose:
    ``doc_id div bucket_span`` (contiguous ranges, ~corpus/bucket_span
    buckets) in doc_id order, the first ``shuffle_prefix`` hex chars of
    the md5 key (16^prefix buckets; hex-string order IS (prefix,
    remainder) order) in shuffled order. At 100 TB, no stage ever
    materializes a global ordering; for shuffled packing at extreme
    scale raise ``shuffle_prefix`` so each bucket stays task-sized.

    ONE token-count derivation (optimization round 13, guide §2.4 /
    r12-verdict item 7): the per-doc count relation feeds both levels of
    the prefix sum, and as two independent branches Spark planned the
    scan + tokenize TWICE (the window branch exchanged full rows, the
    totals branch exchanged its own partial aggregates — different
    exchanges, no reuse). An explicit repartition on ``__bucket`` gives
    both consumers the SAME exchange subtree: the window reuses the
    partitioning directly, the bucket-totals aggregate runs on the
    reused exchange output (clustered by bucket, so no further
    exchange), and the corpus is scanned/tokenized once. The totals'
    previous partial-agg exchange disappears outright; the shared
    exchange carries only (doc_id, n_tokens, bucket[, tape key]) —
    values and tape order are untouched."""
    from pyspark.sql.window import Window

    count_col = (
        F.size(F.split("text", " ")).cast("long")
        if n_tokens_col is None
        else F.col(n_tokens_col).cast("long")
    )
    if shuffle_seed is None:
        tc = documents.select(
            "doc_id",
            count_col.alias("n_tokens"),
            F.expr(f"doc_id div {bucket_span}").alias("__bucket"),
        )
        order_cols = [F.col("doc_id").asc()]
    else:
        tc = documents.select(
            "doc_id",
            count_col.alias("n_tokens"),
            F.md5(
                F.concat(
                    F.lit(shuffle_seed),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ).alias("__h"),
        ).withColumn(
            "__bucket",
            F.conv(F.substring("__h", 1, shuffle_prefix), 16, 10).cast(
                "long"
            ),
        )
        order_cols = [F.col("__h").asc(), F.col("doc_id").asc()]

    # one exchange feeds both prefix-sum levels (see docstring): the
    # window reuses this partitioning, the totals aggregate reuses this
    # exchange — the count projection (scan + tokenize) runs once.
    # The explicit isnotnull makes the filter the optimizer INFERS from
    # the final equi-join (null-bucket rows can never survive it)
    # appear identically in BOTH consumer branches — otherwise the
    # inferred filter lands on the window branch only, the two exchange
    # subtrees stop being canonically equal, and reuse never fires.
    tc = tc.where(F.col("__bucket").isNotNull()).repartition(
        F.col("__bucket")
    )
    intra_w = (
        Window.partitionBy("__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = tc.withColumn(
        "__intra_prev", F.coalesce(F.sum("n_tokens").over(intra_w), F.lit(0))
    )
    bucket_w = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # __btotal carries algebraically-ZERO terms referencing every column
    # the WINDOW branch needs (doc_id; plus the tape key when seeded) so
    # column pruning cannot project them out below this branch's
    # exchange: the two exchange subtrees then stay canonically equal
    # and AQE's stage cache materializes the scan+tokenize ONCE
    # (measured at sf0.1: inputRecords 10000 → 5000 per run, CPU
    # 0.21 → 0.09 s). The terms are exact zeros — doc_id is
    # isnotnull-filtered above and the md5 tape key is never null — and
    # both stay hash-aggregable LONG mins (a min over the STRING key
    # itself would force SortAggregate back in).
    retain = F.lit(0) * F.min("doc_id")
    if shuffle_seed is not None:
        retain = retain + F.lit(0) * F.min(F.length("__h"))
    bucket_offsets = (
        tc.groupBy("__bucket")
        .agg((F.sum("n_tokens") + retain).alias("__btotal"))
        .withColumn(
            "__bucket_prev",
            F.coalesce(F.sum("__btotal").over(bucket_w), F.lit(0)),
        )
        .select("__bucket", "__bucket_prev")
    )
    return (
        intra.join(F.broadcast(bucket_offsets), "__bucket")
        .withColumn(
            "start_off", F.col("__bucket_prev") + F.col("__intra_prev")
        )
        .select(
            "doc_id",
            "n_tokens",
            "start_off",
            F.expr(f"start_off div {budget}").alias("pack_id"),
            F.expr(
                f"(start_off + greatest(n_tokens, 1) - 1) div {budget}"
            ).alias("end_pack"),
        )
    )
