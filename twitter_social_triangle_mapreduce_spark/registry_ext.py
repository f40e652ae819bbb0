"""Extension-query registry: dedup, similarity search, text analysis,
events/relational, multimodal — each Spark callable paired with a DuckDB
oracle that reproduces values bit-exactly (md5 hashing, integer
``floor(1eN·r)`` ratios, DECIMAL money sums; see the operator modules for
the portability contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import (
    components,
    corpus,
    dedup,
    multimodal,
    relational,
    similarity,
    text,
)
from .operators.dedup import BAND_SIZE, NUM_HASHES
from .operators.similarity import LSH_BITS
from .sources.io import EDGES_FROM_EVENTS_SQL, edges_from_events, load_table

# shared SQL fragments -------------------------------------------------------

_TOKS = "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents"

_SHINGLES = """
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
idx AS (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
        FROM words WHERE len(ws) >= 3),
shingles AS (SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS sh FROM idx)
"""

def _bands_sql() -> str:
    """DuckDB twin of dedup.minhash_bands' wide integer-minhash pipeline."""
    from .functions.hashing import hex_prefix_to_long_sql

    from .operators.dedup import MINHASH_HEX_CHARS

    n = NUM_HASHES
    hex_cols = ", ".join(
        f"md5(sh || '#{d}') AS h{d}" for d in range(n // 4)
    )
    long_cols = ", ".join(
        hex_prefix_to_long_sql(
            f"substr(h{i // 4}, {1 + MINHASH_HEX_CHARS * (i % 4)},"
            f" {MINHASH_HEX_CHARS})",
            MINHASH_HEX_CHARS,
        )
        + f" AS l{i}"
        for i in range(n)
    )
    min_cols = ", ".join(f"MIN(l{i}) AS m{i}" for i in range(n))
    n_bands = n // BAND_SIZE
    place = 16 ** MINHASH_HEX_CHARS
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, CAST({b} AS BIGINT) AS band, "
        + " + ".join(
            f"m{b * BAND_SIZE + j} * {place ** (BAND_SIZE - 1 - j)}"
            for j in range(BAND_SIZE)
        )
        + " AS bh FROM sig"
        for b in range(n_bands)
    )
    return f"""
WITH {_SHINGLES},
hexed AS (SELECT doc_id, {hex_cols} FROM shingles),
longed AS (SELECT doc_id, {long_cols} FROM hexed),
sig AS (SELECT doc_id, {min_cols} FROM longed GROUP BY doc_id),
bands AS ({band_selects})
"""


_BANDS = _bands_sql()

def _near_dup_clusters_oracle() -> str:
    """DuckDB twin of ``dedup.near_dup_clusters``: the band pipeline, the
    distinct collision pairs, then the SAME min-label rounds the Spark
    side runs, unrolled (every round CTE MATERIALIZED — DuckDB re-inlines
    multiply-referenced CTEs exponentially otherwise), and the final
    corpus left-join electing min-label canonicals."""
    from .operators.dedup import NEAR_DUP_CC_ROUNDS

    it = NEAR_DUP_CC_ROUNDS
    parts = [
        f"{_BANDS.rstrip()},",
        "pairs AS MATERIALIZED (SELECT DISTINCT a.doc_id AS src,"
        " b.doc_id AS dst FROM bands a JOIN bands b"
        " ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),",
        "sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs)),",
        "verts AS MATERIALIZED (SELECT DISTINCT v FROM ("
        "SELECT src AS v FROM pairs UNION ALL SELECT dst FROM pairs)),",
        "it0 AS (SELECT v, v AS l FROM verts),",
    ]
    for k in range(it):
        parts.append(
            f"nm{k} AS MATERIALIZED (SELECT s.dst AS v2, MIN(i.l) AS nl"
            f" FROM sym s JOIN it{k} i ON s.src = i.v GROUP BY s.dst),"
        )
        parts.append(
            f"it{k + 1} AS MATERIALIZED (SELECT i.v,"
            f" LEAST(i.l, COALESCE(n.nl, i.l)) AS l"
            f" FROM it{k} i LEFT JOIN nm{k} n ON i.v = n.v2),"
        )
    body = "\n".join(parts).rstrip(",")
    return f"""
{body}
SELECT d.doc_id,
       COALESCE(cc.l, d.doc_id) AS cluster_id,
       CAST(d.doc_id = COALESCE(cc.l, d.doc_id) AS BIGINT) AS is_canonical
FROM documents d LEFT JOIN it{it} cc ON d.doc_id = cc.v
"""


_SQ_SUM = (
    "list_sum(list_transform({col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)

_DOT = (
    "list_sum(list_transform(range(1, len(qe) + 1),"
    " i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)))"
)


#: widest signature any oracle pre-computes for the derived-width mask
#: (round 10): covers corpora to occupancy·2^20 ≈ 16M vectors per band
#: — far beyond any gate scale; banded oracles use bands·this ≤ 60
#: hyperplanes, still inside one BIGINT
_LSH_SQL_MAX_BITS = 20


def _lsh_bits_sql(n_sql: str) -> str:
    """SQL twin of ``similarity.lsh_bits_for`` — the corpus-derived
    band width, computed by DUCKDB from the same relation the Spark
    side sizes (round 10, found by the sf1 gate: the Spark operators
    derive width from the corpus count, so a fixed-width oracle
    silently diverges at the first scale where the derivation leaves
    the LSH_BITS floor — embeddings ≈ 20k at sf1). ``n_sql`` is a
    scalar COUNT subquery/CTE reference for the sizing relation."""
    from .operators.similarity import LSH_TARGET_OCCUPANCY

    return (
        f"GREATEST({LSH_BITS}, CAST(CEIL(LOG2(GREATEST(({n_sql}), 2)"
        f" / {LSH_TARGET_OCCUPANCY}.0)) AS BIGINT))"
    )


def _lsh_sig_sql_derived(
    dims: int, n_sql: str, col: str = "embedding", bands: int = 1
) -> str:
    """Signature at the DERIVED width, as SQL: hyperplane b's
    coefficients depend only on b (never on the total width), so the
    W-bit signature is the low-W-bit PREFIX of a wider one — compute
    the signature once at the fixed ``_LSH_SQL_MAX_BITS``(·bands)
    ceiling and mask to the derived width. ``bands > 1`` widens the
    precomputed signature for banded callers, which slice their own
    band keys with the derived width (the mask here keeps the low
    ``bands·W`` bits — exactly the hyperplanes the Spark side draws)."""
    bits_sql = _lsh_bits_sql(n_sql)
    full = _lsh_sig_sql(dims, bits=_LSH_SQL_MAX_BITS * bands, col=col)
    return (
        f"(CAST({full} AS BIGINT)"
        f" & ((CAST(1 AS BIGINT) << ({bands} * ({bits_sql}))) - 1))"
    )


def _balanced_sum(exprs: list[str]) -> str:
    """Sum as a BALANCED parse tree (depth log2 n instead of n): wide
    derived-width signatures (round 10: up to 60 hyperplanes for the
    banded mask) overflow DuckDB's 128-deep binder recursion when the
    per-bit CASE terms are chained left-associatively. Only ever used
    on the INTEGER per-bit terms — exact arithmetic, so regrouping
    cannot change the value; the per-bit FLOAT projection sums below
    stay strictly left-to-right to match the Spark fold bit-for-bit."""
    while len(exprs) > 1:
        exprs = [
            f"({exprs[i]} + {exprs[i + 1]})"
            if i + 1 < len(exprs)
            else exprs[i]
            for i in range(0, len(exprs), 2)
        ]
    return exprs[0]


def _proj_elem_sql(j: int, dims: int, col: str = "embedding") -> str:
    """One Johnson–Lindenstrauss projected coordinate — the same ±1
    scheme as the LSH planes under the distinct ``p``-prefixed key
    namespace (similarity._proj_coeffs), term order identical to the
    Spark fold so the double sums agree bit-for-bit."""
    return " + ".join(
        (
            f"(CASE WHEN strpos('0123456789abcdef',"
            f" substr(md5('p{j}#{d}'), 1, 1)) % 2 = 0"
            f" THEN 1.0 ELSE -1.0 END)"
            f" * CAST({col}[{d + 1}] AS DOUBLE)"
        )
        for d in range(dims)
    )


def _projection_oracle_sql(dims: int, out_dims: int) -> str:
    """Exploded (vec_id, dim, proj_e6) — one SELECT per output
    coordinate, unioned; mirrors the Spark posexplode shape, including
    its NULL semantics: posexplode emits NOTHING for a NULL projected
    array (project_embeddings maps NULL→NULL), so NULL embeddings are
    filtered here too — without the filter the oracle would emit
    out_dims NULL-valued rows per NULL vector and rows_match would
    fail on any corpus with missing embeddings."""
    selects = [
        f"SELECT vec_id, CAST({j} AS BIGINT) AS dim,"
        f" CAST(FLOOR(1000000 * ({_proj_elem_sql(j, dims)})) AS BIGINT)"
        f" AS proj_e6 FROM embeddings WHERE embedding IS NOT NULL"
        for j in range(out_dims)
    ]
    return " UNION ALL ".join(selects)


def _projected_topk_oracle_sql(dims: int, out_dims: int) -> str:
    """Brute-force cosine top-k over the PROJECTED vectors — the
    bruteforce oracle body with each side's embedding replaced by its
    JL projection, built once in a CTE."""
    elems = ", ".join(
        f"({_proj_elem_sql(j, dims)})" for j in range(out_dims)
    )
    return f"""
        WITH pe AS (SELECT vec_id, list_value({elems}) AS e
                    FROM embeddings),
        q AS (SELECT vec_id AS qid, e AS qe FROM pe WHERE vec_id < 5),
        c AS (SELECT vec_id AS nid, e AS ce FROM pe),
        scored AS (
            SELECT qid, nid,
                   {_DOT}
                   / (sqrt({_SQ_SUM.format(col='qe')})
                      * sqrt({_SQ_SUM.format(col='ce')})) AS sim
            FROM q JOIN c ON qid <> nid
        ),
        ranked AS (
            SELECT qid, nid, sim,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY sim DESC, nid ASC) AS rank
            FROM scored
        )
        SELECT qid, nid, rank,
               CAST(FLOOR(10000 * sim) AS BIGINT) AS sim_e4
        FROM ranked WHERE rank <= 3
    """


def _lsh_sig_sql(dims: int, bits: int = LSH_BITS, col: str = "embedding") -> str:
    """Same ±1 hyperplane expression the Spark side generates
    (similarity.lsh_signature) with DuckDB's 1-based array indexing; term
    order matches exactly so the double sums agree bit-for-bit."""
    bit_exprs = []
    for b in range(bits):
        terms = " + ".join(
            (
                f"(CASE WHEN strpos('0123456789abcdef',"
                f" substr(md5('{b}#{d}'), 1, 1)) % 2 = 0"
                f" THEN 1.0 ELSE -1.0 END)"
                f" * CAST({col}[{d + 1}] AS DOUBLE)"
            )
            for d in range(dims)
        )
        bit_exprs.append(f"(CASE WHEN ({terms}) > 0 THEN {1 << b} ELSE 0 END)")
    return _balanced_sum(bit_exprs)


# Spark callables ------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup_groups(load_table(spark, sf_dir, "documents"))


def q_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_bands(load_table(spark, sf_dir, "documents"))


def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_candidate_pairs(load_table(spark, sf_dir, "documents"))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash16(load_table(spark, sf_dir, "documents"))


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.text_stats(load_table(spark, sf_dir, "documents"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.lang_id(load_table(spark, sf_dir, "documents"))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.doc_fingerprint(load_table(spark, sf_dir, "documents"))


def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_topk(load_table(spark, sf_dir, "documents"))


def q_token_counts_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_counts_multi(load_table(spark, sf_dir, "documents"))


def q_doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.doc_rolling_hash(load_table(spark, sf_dir, "documents"))


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_norms(load_table(spark, sf_dir, "embeddings"))


def q_ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ann_topk_bruteforce(
        load_table(spark, sf_dir, "embeddings")
    )


def q_embedding_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    proj = similarity.project_embeddings(
        load_table(spark, sf_dir, "embeddings")
    )
    return proj.select(
        "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.floor(1000000 * F.col("val")).cast("long").alias("proj_e6"),
    )


def q_ann_topk_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ann_topk_projected(
        load_table(spark, sf_dir, "embeddings")
    )


def q_lsh_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_signature(load_table(spark, sf_dir, "embeddings"))


def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ann_topk_lsh(load_table(spark, sf_dir, "embeddings"))


def q_events_json_kpi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.events_json_kpi(load_table(spark, sf_dir, "events"))


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.sessionize(load_table(spark, sf_dir, "events"))


def q_sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.streams import sessionize_native

    return sessionize_native(load_table(spark, sf_dir, "events"))


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.pricing_summary(load_table(spark, sf_dir, "lineitem"))


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.top_customers(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


def q_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.revenue_by_region(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return components.connected_components(edges_from_events(spark, sf_dir))


#: BFS source for the registered k-hop query (vertex 0 is always present:
#: dst = (...)%200 covers 0..199 on the testdata graph)
BFS_SOURCE = 0


def q_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    return components.bfs_levels(edges_from_events(spark, sf_dir), BFS_SOURCE)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return components.pagerank(edges_from_events(spark, sf_dir))


def q_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.user_value_trend(load_table(spark, sf_dir, "events"))


def q_user_value_trend_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.user_value_trend_pandas(
        load_table(spark, sf_dir, "events")
    )


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.value_percentiles(load_table(spark, sf_dir, "events"))


def q_bpe_word_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import bpe

    # initial BPE state: word-frequency table with char+sentinel
    # symbols (joined form — array hashing is engine-specific)
    return bpe.word_symbol_table(
        load_table(spark, sf_dir, "documents")
    ).select(
        "word", "cnt", F.array_join("syms", " ").alias("syms_str")
    )


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import bpe

    # round-0 corpus-weighted adjacent-pair counts (the trainer's
    # argmax input; later rounds depend on trained merges, covered by
    # the pure-Python reference in tests/test_bpe.py)
    return bpe.pair_counts(
        bpe.word_symbol_table(load_table(spark, sf_dir, "documents"))
    )


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.value_histogram(load_table(spark, sf_dir, "events"))


def q_order_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.order_status_rollup(load_table(spark, sf_dir, "orders"))


def q_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.customers_with_orders(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.customers_without_orders(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


def q_user_event_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.user_event_setops(load_table(spark, sf_dir, "events"))


def q_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.user_counts(load_table(spark, sf_dir, "events"))


def q_user_counts_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.user_counts_by_type(load_table(spark, sf_dir, "events"))


def q_events_last_order_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.events_last_order_asof(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "orders")
    )


def q_embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings")
    )


def q_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_cells(load_table(spark, sf_dir, "embeddings"))


#: process-lifetime cache of trained codebooks, keyed on (corpus path,
#: k, rounds) and holding PLAIN-PYTHON rows (no session-bound handles —
#: safe across SparkSession restarts; the DataFrame is rebuilt per call
#: against the caller's session). Round-6 verdict item 1: the three
#: trained-codebook consumers share ONE training run instead of each
#: re-embedding the full seeding+Lloyd lineage into their lazy plans
#: (BENCH_r05: ann_topk_ivf 0.60 → 3.93 s from exactly that).
_CODEBOOK_CACHE: dict[tuple[str, int, int], tuple] = {}


def trained_codebook(
    spark: SparkSession,
    sf_dir: str,
    k: int = similarity.IVF_CELLS,
    rounds: int = similarity.IVF_TRAIN_ROUNDS,
) -> DataFrame:
    """The trained (cid, centroid) codebook for ``sf_dir``'s embeddings
    as a ``LocalRelation`` constant — trained at most once per
    (corpus, k, rounds) per process; bit-deterministic (the trainer has
    no RNG or partition-order dependence), so caching cannot change
    values."""
    import os as _os

    key = (_os.path.abspath(sf_dir), k, rounds)
    if key not in _CODEBOOK_CACHE:
        _CODEBOOK_CACHE[key] = tuple(
            similarity.collect_codebook(
                load_table(spark, sf_dir, "embeddings"), k, rounds
            )
        )
    return similarity.codebook_df(spark, _CODEBOOK_CACHE[key])


def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 5: the registered IVF query quantizes against the TRAINED
    # codebook (deterministic farthest-point seed + exact-Lloyd rounds);
    # round 6: materialized once via trained_codebook — the consumer
    # plan embeds a constant, not the training lineage
    return similarity.ann_topk_ivf(
        load_table(spark, sf_dir, "embeddings"),
        centroids=trained_codebook(spark, sf_dir),
    )


def q_ann_topk_ivf2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ann_topk_ivf(
        load_table(spark, sf_dir, "embeddings"), nprobe=2
    )


#: process-cached streaming ANN snapshots keyed by sf_dir — built once
#: (three ingest folds + one compaction) and served many times, like
#: trained_codebook's materialize-once contract; content is
#: deterministic (same embeddings, same codebook, same fold split).
#: The temp dirs are removed at interpreter exit (consumers hold lazy
#: plans only within the process, so exit-time removal is safe).
_ANN_SNAPSHOTS: dict[str, str] = {}


def _cleanup_snapshot_caches() -> None:  # pragma: no cover - exit hook
    import shutil

    for cache in (_ANN_SNAPSHOTS, _SEM_SNAPSHOTS):
        for path in cache.values():
            shutil.rmtree(path, ignore_errors=True)
        cache.clear()


import atexit  # noqa: E402

atexit.register(_cleanup_snapshot_caches)


def q_ann_topk_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 8 (r7 verdict item 8): driver-hash-gate the STREAMING
    at-rest ANN path end to end — the corpus arrives as three ingest
    folds (``fold_ann_index_batch`` against the trained codebook), the
    first two batches are rewritten by ``compact_ann_index`` (marker
    flip, sources dropped), and serving reads only committed
    generations/batches through partition-pruned cells. The oracle is
    the SAME cells+cosine SQL as ``ann_topk_ivf``: the snapshot must
    reproduce the batch answer bit-for-bit THROUGH the fold + compact +
    marker protocol, which is exactly the evidence the pytest-only
    parity tests carried before."""
    import tempfile

    from .streaming import (
        ann_topk_snapshot,
        compact_ann_index,
        fold_ann_index_batch,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    snap = _ANN_SNAPSHOTS.get(sf_dir)
    if snap is None:
        snap = tempfile.mkdtemp(prefix="annsnap_q_")
        cb = trained_codebook(spark, sf_dir)
        for b in range(3):
            fold_ann_index_batch(
                emb.where(F.col("vec_id") % 3 == b), b, snap, centroids=cb
            )
        compact_ann_index(spark, snap)
        _ANN_SNAPSHOTS[sf_dir] = snap
    queries_df = emb.where(F.col("vec_id") < 5)
    return ann_topk_snapshot(spark, snap, queries_df, k=3, nprobe=1)


def q_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.media_stats(load_table(spark, sf_dir, "documents"))


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.decode_media_features(
        load_table(spark, sf_dir, "documents")
    )


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.resize_media(load_table(spark, sf_dir, "documents"))


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.sample_frames(load_table(spark, sf_dir, "documents"))


EXT_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "minhash_bands": q_minhash_bands,
    "dedup_minhash_pairs": q_dedup_minhash_pairs,
    "simhash": q_simhash,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "text_stats": q_text_stats,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    # round 12: token_topk rotated to the pytest tier (its tokens →
    # count → order/limit chain is wholly contained in the driver-gated
    # unigram gate's vocabulary pass plus the other ordered queries) in
    # favor of unigram_logprob_gate — the CCNet-style per-source
    # bottom-p% quality cut, driver-hash-gated end to end (appended
    # below its definition, like semantic_decontam)
    "token_counts_multi": q_token_counts_multi,
    # round 7: doc_rolling_hash rotated to the pytest tier (it is an
    # intermediate of the driver-gated passage pipelines) in favor of
    # semantic_decontam — appended below its definition, like
    # ivf_cells_trained
    # round 11: embedding_norms rotated to the pytest tier (the norm
    # fold is the shared intermediate of every driver-gated cosine
    # query) in favor of ann_topk_projected — the JL
    # dimensionality-reduction tier, driver-hash-gated end to end
    "ann_topk_projected": q_ann_topk_projected,
    "ann_topk_bruteforce": q_ann_topk_bruteforce,
    # round 9: lsh_signature rotated to the pytest tier (it is the
    # shared intermediate of the driver-gated ann_topk_lsh,
    # embedding_near_dup_pairs, and semantic_* queries, so its
    # marginal driver signal was the lowest) in favor of
    # semantic_snapshot_compacted — appended below its definition
    "ann_topk_lsh": q_ann_topk_lsh,
    "events_json_kpi": q_events_json_kpi,
    "sessionize": q_sessionize,
    "value_percentiles": q_value_percentiles,
    # round 6: value_histogram rotated to the pytest tier (the plain
    # floor-div groupBy is the 50's lowest-signal row — percentiles
    # and the quality-gate histogram cover the shape) in favor of
    # bpe_pair_counts, so the tokenizer-training tier is
    # driver-hash-gated end to end
    "bpe_pair_counts": q_bpe_pair_counts,
    "user_value_trend": q_user_value_trend,  # exact-decimal regression
    "pricing_summary": q_pricing_summary,
    "top_customers": q_top_customers,
    "revenue_by_region": q_revenue_by_region,
    "media_stats": q_media_stats,
    "media_features": q_media_features,
    # media_resize rotated to the pytest tier in round 6 (ledger in
    # __spark_entry__.py) to free the driver row for ivf_cells_trained;
    # media_frames rotated in round 8 for ann_topk_snapshot (the
    # streaming fold+compact+serve path) — media_stats/media_features
    # keep the multimodal tier driver-gated, frames shares their
    # mapInPandas plumbing and stays hash-oracled in the pytest tier
    "ann_topk_snapshot": q_ann_topk_snapshot,
    "connected_components": q_connected_components,
    "bfs_levels": q_bfs_levels,  # k-hop BFS, exact unrolled oracle
    "order_status_rollup": q_order_status_rollup,
    "customers_with_orders": q_customers_with_orders,
    "customers_without_orders": q_customers_without_orders,
    "user_event_setops": q_user_event_setops,
    "user_counts_by_type": q_user_counts_by_type,  # exact countDistinct
    "events_last_order_asof": q_events_last_order_asof,
    # round 10: embedding_near_dup_pairs rotated to the pytest tier —
    # its banded-candidates + exact-cosine machinery is fully inside
    # the driver-gated semantic_dedup_clusters / semantic_decontam /
    # semantic_snapshot_* queries, so the raw pair listing had the
    # lowest marginal driver signal — in favor of
    # semantic_snapshot_rebanded (the width-migration path), appended
    # below its definition
    "ann_topk_ivf": q_ann_topk_ivf,
}
# round-4 flagships take the two weakest marginal driver slots
# (ivf_cells — an intermediate of ann_topk_ivf — and ann_topk_ivf2, its
# nprobe=2 variant; both stay fully hash-oracled in the pytest tier):
# passage-level substring dedup cut lists, and the SemDeDup-shaped
# embedding dedup deliverable. Bound after their defs below.

#: oracle-checked by pytest (tests/test_oracle_differential.py) but NOT
#: exposed to the driver: the driver's correctness harness records at most
#: 50 queries (r01: 51 registered → exactly the first 50 got rows, the
#: 51st silently dropped), so the driver registry holds exactly 50.
#: sessionize_native duplicates sessionize's SEMANTICS through the native
#: ``session_window`` operator — the weakest marginal driver signal — and
#: keeps its full hash-level oracle check in pytest.
def q_user_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.user_sketch_rollup(load_table(spark, sf_dir, "events"))


def q_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.value_percentiles_approx(
        load_table(spark, sf_dir, "events")
    )


def q_doc_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import train_test_split

    return train_test_split(
        load_table(spark, sf_dir, "documents"), key="doc_id"
    ).select("doc_id", "split")


#: columns profiled by the documents data-quality audit query
PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def q_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.profile import column_profile

    return column_profile(load_table(spark, sf_dir, "documents"), PROFILE_COLS)


def q_doc_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.near_dup_clusters(load_table(spark, sf_dir, "documents"))


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.curate_corpus(load_table(spark, sf_dir, "documents"))


def q_doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import retrieval

    return retrieval.bm25_topk(load_table(spark, sf_dir, "documents"))


def q_user_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import cdc

    return cdc.user_latest_event(load_table(spark, sf_dir, "events"))


#: per-language keep rates for the stratified rebalance demo query:
#: downsample dominant English, keep German whole, halve Chinese, default
#: 10% for everything else
STRAT_FRACTIONS = {"en": 0.25, "de": 1.0, "zh": 0.5}
STRAT_DEFAULT = 0.1


def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import stratified_sample

    return stratified_sample(
        load_table(spark, sf_dir, "documents"),
        key="doc_id",
        strata_col="lang",
        fractions=STRAT_FRACTIONS,
        default_frac=STRAT_DEFAULT,
    ).select("doc_id", "lang")


#: weighted-sample query params: keep 5 docs per source, a document's
#: chance proportional to its length — the quality-weighted subsample
WSAMPLE_N = 5


def q_doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import weighted_sample

    return weighted_sample(
        load_table(spark, sf_dir, "documents"),
        key="doc_id",
        weight="n_chars",
        n=WSAMPLE_N,
        by="source",
    ).select("doc_id", "source", "n_chars")


def q_event_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.profile import key_skew_profile

    return key_skew_profile(load_table(spark, sf_dir, "events"), "user_id")


def q_token_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_cooccurrence_lift(
        load_table(spark, sf_dir, "documents")
    )


#: deterministic eval-set carve-out for the decontamination query: every
#: 17th doc_id plays the held-out benchmark, the rest are "train"
DECONTAM_EVAL_MOD = 17


def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return corpus.decontaminate(
        docs.where(F.col("doc_id") % DECONTAM_EVAL_MOD != 0),
        docs.where(F.col("doc_id") % DECONTAM_EVAL_MOD == 0),
    )


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.repetition_stats(load_table(spark, sf_dir, "documents"))


def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.pack_sequences(load_table(spark, sf_dir, "documents"))


#: tape-shuffle seed for the registered shuffled-packing query (an epoch
#: reshuffle is just a different seed)
PACK_SHUFFLE_SEED = "epoch0"


def q_doc_pack_shuffled(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic global corpus shuffle before packing: tape order is
    # md5(seed:doc_id), the training-order randomization step
    return corpus.pack_sequences(
        load_table(spark, sf_dir, "documents"),
        shuffle_seed=PACK_SHUFFLE_SEED,
    )


def q_event_incident_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import timeseries

    return timeseries.incident_event_counts(
        load_table(spark, sf_dir, "events")
    )


def q_user_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import timeseries

    return timeseries.resample_ffill(load_table(spark, sf_dir, "events"))


def q_order_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.order_cube(load_table(spark, sf_dir, "orders"))


def q_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.funnel_stages(load_table(spark, sf_dir, "events"))


def q_top_spenders_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.top_spenders_per_region(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_user_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import incremental

    return incremental.merged_user_state(load_table(spark, sf_dir, "events"))


def q_events_follow_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import intervals

    return intervals.events_follow_count(load_table(spark, sf_dir, "events"))


def _event_z_sql() -> str:
    """Shared z-value expression text (Spark == DuckDB): 16-bit Morton
    interleave of quantized (user_id, value). Quantization bounds are
    fixed constants so the curve is stable across scale factors (values
    beyond them clamp to the edge cell)."""
    from .functions.zorder import quantize_sql, zorder_sql

    qu = quantize_sql("user_id", 0.0, 2000.0)
    qv = quantize_sql("value", 0.0, 600.0)
    return zorder_sql([f"({qu})", f"({qv})"])


def q_media_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.media_dedup_exact(
        load_table(spark, sf_dir, "documents")
    )


def q_cogroup_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.cogrouped_user_activity(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "orders"),
    )


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.promo_revenue_share(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.local_supplier_volume(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.event_transitions(load_table(spark, sf_dir, "events"))


def q_customer_spend_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return relational.customer_spend_percentiles(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
    )


def q_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.referential_integrity_audit(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.shipping_priority(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


def q_user_value_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.user_value_rolling(load_table(spark, sf_dir, "events"))


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.retention_cohorts(load_table(spark, sf_dir, "events"))


def q_token_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.token_typo_pairs(load_table(spark, sf_dir, "documents"))


def q_user_type_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import cdc

    return cdc.user_type_scd2(load_table(spark, sf_dir, "events"))


def q_user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.user_event_type_pivot(
        load_table(spark, sf_dir, "events")
    )


def q_user_event_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.user_event_type_unpivot(
        load_table(spark, sf_dir, "events")
    )


def q_edge_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import graph as _graph

    return _graph.reciprocity(edges_from_events(spark, sf_dir))


def q_doc_oov_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.vocab_oov_rates(load_table(spark, sf_dir, "documents"))


def q_ann_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ann_topk_quantized(
        load_table(spark, sf_dir, "embeddings")
    )


def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.source_token_divergence(
        load_table(spark, sf_dir, "documents")
    )


def q_doc_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import hash_topk_sample

    return hash_topk_sample(
        load_table(spark, sf_dir, "documents"), "doc_id", 100
    ).select("doc_id", "lang")


def q_user_pseudonymized_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators import privacy

    ev = privacy.pseudonymize(
        load_table(spark, sf_dir, "events"), ["user_id"]
    )
    return ev.groupBy(F.col("user_id").alias("user_token")).agg(
        F.count(F.lit(1)).alias("n_events")
    )


def q_doc_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import privacy

    red = privacy.redact_text(load_table(spark, sf_dir, "documents"))
    return red.select(
        "doc_id", "n_emails", "n_phones", F.md5("text").alias("clean_md5")
    )


def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import graph as _graph

    return _graph.degree_distribution(edges_from_events(spark, sf_dir))


def q_wedge_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import graph as _graph

    return _graph.wedge_closure_per_node(edges_from_events(spark, sf_dir))


def q_temporal_path2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import intervals

    return intervals.temporal_path2_counts(load_table(spark, sf_dir, "events"))


def q_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import sketches

    return sketches.heavy_hitter_tokens(load_table(spark, sf_dir, "documents"))


def q_doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.doc_unigram_logprob(load_table(spark, sf_dir, "documents"))


def q_unigram_logprob_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 12 (r11 verdict item 2): the per-source bottom-p% cut on
    # the corpus-LM score — the CCNet-style curation stage, built on
    # the coarse-bucket histogram quota walk
    return text.unigram_logprob_gate(load_table(spark, sf_dir, "documents"))


def q_token_count_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import sketches

    return sketches.token_count_sketch(
        load_table(spark, sf_dir, "documents")
    )


def q_merged_token_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import sketches

    return sketches.merged_token_sketch(
        load_table(spark, sf_dir, "documents")
    )


def q_token_count_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import sketches

    docs = load_table(spark, sf_dir, "documents")
    from .operators.dedup import tokens

    return sketches.cms_estimate(
        sketches.token_count_sketch(docs), tokens(docs)
    )


def q_event_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as _F

    return load_table(spark, sf_dir, "events").select(
        "event_id", _F.expr(_event_z_sql()).alias("zval")
    )


def q_source_mixture_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import sampling

    return sampling.mixture_rates(load_table(spark, sf_dir, "documents"))


def q_doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import sampling

    return sampling.mixture_sample(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )


def q_doc_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text as _text

    return _text.quality_threshold_gate(
        load_table(spark, sf_dir, "documents")
    )


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import corpus

    return corpus.chunk_documents(load_table(spark, sf_dir, "documents"))


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup as _dedup

    docs = load_table(spark, sf_dir, "documents")
    return _dedup.incremental_dedup(
        docs.where("doc_id % 5 = 0"), docs.where("doc_id % 5 <> 0")
    )


def q_semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 5: cell assignment against the TRAINED codebook; round 6:
    # the codebook is the shared materialized constant (one training
    # run per process, zero training lineage in this plan)
    return similarity.semantic_dedup_clusters(
        load_table(spark, sf_dir, "embeddings"),
        min_sim_e4=SEMANTIC_QUERY_MIN_SIM_E4,
        centroids=trained_codebook(spark, sf_dir),
    )


#: process-cached streaming semantic snapshots keyed by sf_dir (same
#: materialize-once contract as _ANN_SNAPSHOTS)
_SEM_SNAPSHOTS: dict[str, str] = {}


def q_semantic_snapshot_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 8: differential-tier gate of the SEMANTIC streaming path —
    the embeddings arrive as three RANGE-SPLIT ingest folds (the
    append-only id invariant the stand-in-free fold==batch parity
    needs; trained codebook + the registered threshold, so the knobs
    match the batch query), the two oldest embs/ dirs are rewritten by
    ``compact_semantic_embs``, and the served snapshot must hash-match
    the SAME DuckDB clustering oracle as the batch
    ``semantic_dedup_clusters`` query — incremental == batch THROUGH
    the fold + compaction + marker protocol, checked by an independent
    engine rather than only by pytest self-parity."""
    import tempfile

    from .streaming import (
        compact_semantic_embs,
        fold_semantic_batch,
        read_semantic_snapshot,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    snap = _SEM_SNAPSHOTS.get(sf_dir)
    if snap is None:
        snap = tempfile.mkdtemp(prefix="semsnap_q_")
        cb = trained_codebook(spark, sf_dir)
        n = emb.count()
        per = (n + 2) // 3
        for b in range(3):
            fold_semantic_batch(
                emb.where(
                    (F.col("vec_id") >= b * per)
                    & (F.col("vec_id") < (b + 1) * per)
                ),
                b,
                snap,
                centroids=cb,
                min_sim_e4=SEMANTIC_QUERY_MIN_SIM_E4,
                # the EXPLICIT width the oracle SQL encodes (round 9,
                # advisor): the first fold would otherwise pin
                # lsh_bits_for(~n/3) while the oracle and the batch
                # twin derive from the full corpus — they agree only
                # because lsh_bits_for floors at LSH_BITS below ~4k
                # vectors, and the gate must not depend on the floor
                bits=similarity.LSH_BITS,
            )
        compact_semantic_embs(spark, snap)
        _SEM_SNAPSHOTS[sf_dir] = snap
    return read_semantic_snapshot(spark, snap)


#: the explicit migration width the re-banded twin serves at — one
#: above the floor so the gate proves a genuine width CHANGE (its
#: oracle regenerates every hyperplane at this width)
SEMANTIC_REBAND_BITS = 9


def q_semantic_snapshot_rebanded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 9 (r8 verdict item 3): the mid-stream WIDTH MIGRATION
    hash-gated by an independent engine — three range-split folds at
    the 8-bit floor, ``reband_semantic_store`` to
    ``SEMANTIC_REBAND_BITS``, then a FOURTH fold at the re-banded
    width; the served snapshot must match the DuckDB clustering
    oracle regenerated entirely at the NEW width (every hyperplane
    re-drawn). Passing requires (a) the re-band recompute to equal
    the batch semantics at 9 bits and (b) the post-migration fold to
    extend it with parity intact."""
    import tempfile

    from .streaming import fold_semantic_batch, read_semantic_snapshot
    from .streaming.streams import reband_semantic_store

    emb = load_table(spark, sf_dir, "embeddings")
    key = f"{sf_dir}|rebanded"
    snap = _SEM_SNAPSHOTS.get(key)
    if snap is None:
        snap = tempfile.mkdtemp(prefix="semsnap_rb_")
        cb = trained_codebook(spark, sf_dir)
        n = emb.count()
        per = (n + 3) // 4
        for b in range(3):
            fold_semantic_batch(
                emb.where(
                    (F.col("vec_id") >= b * per)
                    & (F.col("vec_id") < (b + 1) * per)
                ),
                b,
                snap,
                centroids=cb,
                min_sim_e4=SEMANTIC_QUERY_MIN_SIM_E4,
                bits=similarity.LSH_BITS,
            )
        rb = reband_semantic_store(
            spark,
            snap,
            bits=SEMANTIC_REBAND_BITS,
            centroids=cb,
            min_sim_e4=SEMANTIC_QUERY_MIN_SIM_E4,
        )
        if rb != SEMANTIC_REBAND_BITS:  # not assert: -O must not skip
            raise RuntimeError(f"re-band did not apply: {rb!r}")
        fold_semantic_batch(
            emb.where(F.col("vec_id") >= 3 * per),
            3,
            snap,
            centroids=cb,
            min_sim_e4=SEMANTIC_QUERY_MIN_SIM_E4,
        )
        _SEM_SNAPSHOTS[key] = snap
    return read_semantic_snapshot(spark, snap)


def q_ivf_cells_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    # end-to-end check of the trained assignment: the codebook values
    # come from the (cached) trainer, the oracle re-derives them from
    # scratch in SQL — a cache-corruption or trainer drift breaks the
    # hash match here first
    return similarity.ivf_cells(
        load_table(spark, sf_dir, "embeddings"),
        centroids=trained_codebook(spark, sf_dir),
    )


#: per-cell keep quota for the registered diversity-sampling query
CLUSTER_SAMPLE_PER_CELL = 50


def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # diversity pruning: cap each semantic cell's contribution at
    # CLUSTER_SAMPLE_PER_CELL deterministic-md5-ranked representatives
    return similarity.cluster_balanced_sample(
        load_table(spark, sf_dir, "embeddings"),
        per_cell=CLUSTER_SAMPLE_PER_CELL,
    )


def q_cluster_central_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # prototype selection: keep each cell's highest-centroid-similarity
    # members (bucketed top-k pre-reduction — no cell-only full window)
    return similarity.cluster_balanced_sample(
        load_table(spark, sf_dir, "embeddings"),
        per_cell=CLUSTER_SAMPLE_PER_CELL,
        rank_by="central",
    )


def q_semantic_pairs_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the OR-banded semantic candidate rule, hash-oracled end to end
    # (the knob path, not the composite-key fast path): same-cell AND
    # any-band-agreement before the exact cosine threshold
    return similarity.semantic_dedup_pairs(
        load_table(spark, sf_dir, "embeddings"),
        min_sim_e4=SEMANTIC_QUERY_MIN_SIM_E4,
        bands=similarity.LSH_BANDS,
    )


def q_semantic_pairs_probed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the multi-probe cell rule (nprobe=2, single band), hash-oracled:
    # a pair qualifies when either endpoint's two nearest cells cover
    # the other's primary cell and the signatures agree
    return similarity.semantic_dedup_pairs(
        load_table(spark, sf_dir, "embeddings"),
        min_sim_e4=SEMANTIC_QUERY_MIN_SIM_E4,
        nprobe=2,
    )


def q_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    # embedding-tier decontamination: every 4th vector plays the eval
    # set; threshold at the same exercised value as the cluster query
    # (the isotropic testdata's cosine range — see the constant's note)
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_decontaminate(
        emb.where("vec_id % 4 <> 0"),
        emb.where("vec_id % 4 = 0"),
        min_sim_e4=SEMANTIC_QUERY_MIN_SIM_E4,
    )


def q_doc_passage_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import passages

    # width comes from SPARK_GRAFT_PASSAGE_WINDOW (default 8); the
    # oracle generator reads the SAME env var, so the two sides can
    # never silently diverge on window width
    return passages.passage_cut_spans(
        load_table(spark, sf_dir, "documents"),
        window=passages.configured_window(),
    )


#: corpus/batch split point for the incremental passage screen: the
#: append-only ingest invariant (every batch id > every corpus id)
#: under which incremental == batch-restricted holds exactly
PASSAGE_INGEST_SPLIT = 400


def q_doc_canonical_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup as _dedup

    docs = load_table(spark, sf_dir, "documents")
    clusters = _dedup.near_dup_clusters(docs)
    scores = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("score")
    )
    return _dedup.elect_canonicals(clusters, scores)


def q_cluster_update_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators import dedup as _dedup

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where("doc_id % 5 <> 0")
    new = docs.where("doc_id % 5 = 0")
    return _dedup.update_near_dup_clusters(
        _dedup.near_dup_clusters(corpus), _dedup.minhash_bands(corpus), new
    )


def q_doc_passage_cuts_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators import passages

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(f"doc_id < {PASSAGE_INGEST_SPLIT}")
    new = docs.where(f"doc_id >= {PASSAGE_INGEST_SPLIT}")
    return passages.incremental_passage_cuts(
        new, passages.passage_windows(corpus)
    )


def q_doc_passage_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import passages

    docs = load_table(spark, sf_dir, "documents")
    return passages.decontaminate_passage_cuts(
        docs.where(f"doc_id % {DECONTAM_EVAL_MOD} <> 0"),
        docs.where(f"doc_id % {DECONTAM_EVAL_MOD} = 0"),
    )


def q_doc_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import passages

    out = passages.dedup_passages(load_table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.md5("text").alias("clean_md5"),
        "n_spans_cut",
        "n_tokens_cut",
    )


EXT_QUERIES["doc_passage_cuts"] = q_doc_passage_cuts
EXT_QUERIES["semantic_dedup_clusters"] = q_semantic_dedup_clusters
# round 6: the trained assignment driver-checked end to end — codebook
# values come from the (cached) trainer, the oracle re-derives them
# from scratch in SQL, so trainer drift or cache corruption fails the
# driver hash gate, not just the pytest tier
EXT_QUERIES["ivf_cells_trained"] = q_ivf_cells_trained
# round 7: the embedding-tier decontamination flagship, driver-gated
# (rotation ledger in __spark_entry__.py; doc_rolling_hash moved to the
# pytest tier below)
EXT_QUERIES["semantic_decontam"] = q_semantic_decontam
# round 9: the semantic STREAMING path driver-gated (r8 verdict item
# 6) — range-split folds + embs-store compaction + snapshot serving
# against the same DuckDB clustering oracle as the batch query; this
# is the store whose compaction crash window round 9 closed, so the
# fix's evidence is part of the hard signal (rotation ledger in
# __spark_entry__.py; lsh_signature moved to the pytest tier below)
EXT_QUERIES["semantic_snapshot_compacted"] = q_semantic_snapshot_compacted
# round 10 rotation: the mid-stream width migration (folds at the
# 8-bit floor -> reband_semantic_store to 9 bits -> a post-migration
# fold) is driver-hash-gated against the clustering oracle regenerated
# at the NEW width; embedding_near_dup_pairs moved to the pytest tier
EXT_QUERIES["semantic_snapshot_rebanded"] = q_semantic_snapshot_rebanded
# round 12 rotation: the per-source bottom-p% log-prob cut (r11 verdict
# item 2) — the score pipeline plus the coarse-bucket histogram quota
# walk, driver-hash-gated; token_topk moved to the pytest tier below
EXT_QUERIES["unigram_logprob_gate"] = q_unigram_logprob_gate

def q_semantic_dedup_projected(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # round 12 (r11 verdict item 1): the compression stack APPLIED by a
    # corpus-owning pipeline — the full SemDeDup clustering (cells,
    # derived-width signatures, thresholded cosine pairs, CC collapse)
    # run end to end in the JL-projected space via project_dims=. The
    # first-k stand-in quantizer keeps EVERY stage, including cell
    # assignment, in the projected space, which is what the oracle
    # twin rebuilds term-for-term.
    return similarity.semantic_dedup_clusters(
        load_table(spark, sf_dir, "embeddings"),
        min_sim_e4=SEMANTIC_QUERY_MIN_SIM_E4,
        project_dims=similarity.PROJECT_DIMS,
    )


EXT_EXTRA_QUERIES = {
    "sessionize_native": q_sessionize_native,
    # round 12: semantic dedup with the projection tier applied —
    # hash-oracled against the projected clustering twin
    "semantic_dedup_projected": q_semantic_dedup_projected,
    # round 12: rotated out of the driver 50 for unigram_logprob_gate —
    # the tokens → count → order/limit chain is contained in the gate's
    # vocabulary pass; still hash-oracled here
    "token_topk": q_token_topk,
    # round 11: deterministic JL dimensionality reduction (±1
    # md5-parity matrix, scan-side expression, zero shuffle) — the
    # exploded per-coordinate relation; its top-k consumer
    # ann_topk_projected is driver-registered
    "embedding_projection": q_embedding_projection,
    # round 11: rotated out of the driver 50 for ann_topk_projected —
    # the norm fold is the shared intermediate of every driver-gated
    # cosine query; still hash-oracled here
    "embedding_norms": q_embedding_norms,
    # round 11: the Count–Min sketch relation + its point estimates —
    # the fourth sketch family, and the only one hash-oracle-able (the
    # md5 counter placement is deterministic, so DuckDB reproduces
    # every counter and every min-estimate exactly)
    # round 11: corpus-LM unigram quality scoring (CCNet/C4-style
    # outlier signal) — integer-exact portable numerics
    "doc_unigram_logprob": q_doc_unigram_logprob,
    "token_count_sketch": q_token_count_sketch,
    "token_count_estimates": q_token_count_estimates,
    # round 11: the CMS merge algebra gated through the hash compare —
    # split-sketch-merge vs the oracle's direct whole-corpus sketch
    "merged_token_sketch": q_merged_token_sketch,
    # round 11: Efraimidis–Spirakis weighted sampling without
    # replacement (deterministic md5 uniforms, exponential race) —
    # the quality-weighted per-source corpus subsample
    "doc_weighted_sample": q_doc_weighted_sample,
    # the two rotated out of the driver 50 in round 4 (oracled here)
    "ivf_cells": q_ivf_cells,
    "ann_topk_ivf2": q_ann_topk_ivf2,  # multi-probe (nprobe=2)
    # media_resize (round 6): lower-signal media stub — media_frames
    # covers the fan-out mapInPandas shape and media_features the
    # decode contract; still hash-oracled here
    "media_resize": q_media_resize,
    # round 8: rotated out of the driver 50 for ann_topk_snapshot
    # (frames shares media_features' decode-ladder plumbing, so its
    # marginal driver signal was the lowest); still hash-oracled here
    "media_frames": q_media_frames,
    # round 9: rotated out of the driver 50 for
    # semantic_snapshot_compacted — the signature scalar is the shared
    # intermediate of the driver-gated ann_topk_lsh /
    # embedding_near_dup_pairs / semantic_* queries; still
    # hash-oracled here
    "lsh_signature": q_lsh_signature,
    # round 10: rotated out of the driver 50 for
    # semantic_snapshot_rebanded — the raw banded-LSH pair listing is
    # wholly contained in the driver-gated semantic_dedup_clusters /
    # semantic_decontam / semantic_snapshot_* pipelines; still
    # hash-oracled here
    "embedding_near_dup_pairs": q_embedding_near_dup_pairs,
    # round 7: rotated out of the driver 50 for semantic_decontam —
    # the rolling hash is an intermediate of the driver-gated passage
    # pipelines (doc_passage_cuts), so its marginal driver signal was
    # the lowest; still hash-oracled here
    "doc_rolling_hash": q_doc_rolling_hash,
    # round 6: the banded semantic candidate rule, oracle-checked
    "semantic_pairs_banded": q_semantic_pairs_banded,
    # round 6: the multi-probe cell rule, oracle-checked
    "semantic_pairs_probed": q_semantic_pairs_probed,
    # round 6: semantic diversity sampling (per-cell quota), exact
    "cluster_balanced_sample": q_cluster_balanced_sample,
    # round 6: prototype selection (per-cell top-sim quota), exact
    "cluster_central_sample": q_cluster_central_sample,
    # round 6: BPE word table (round-0 pair counts are driver-50),
    # exact oracles; the iterative trainer itself is reference-tested
    "bpe_word_symbols": q_bpe_word_symbols,
    # rotated out of the driver 50 for bpe_pair_counts (round 6)
    "value_histogram": q_value_histogram,
    # passage-level span applier (cut lists are driver-registered)
    "doc_passage_dedup": q_doc_passage_dedup,
    # daily-ingest passage screen vs the materialized window index;
    # oracle states the parity theorem (batch recompute restricted to
    # batch docs under the append-only id invariant)
    "doc_passage_cuts_incremental": q_doc_passage_cuts_incremental,
    # incremental cluster maintenance; its oracle IS the batch
    # recompute (incremental == batch at convergence — the parity
    # theorem checked through DuckDB, not just in pytest goldens)
    "cluster_update_incremental": q_cluster_update_incremental,
    # quality-based canonical re-election (longest member wins): exact
    "doc_canonical_longest": q_doc_canonical_longest,
    # passage-level decontamination: surgical eval-overlap excision
    # (cut lists, no canonical survivor): exact
    "doc_passage_decontam": q_doc_passage_decontam,
    # data-mixing: token census -> exact integer per-source rates
    "source_mixture_rates": q_source_mixture_rates,
    # deterministic membership at the data-derived mixture rates
    "doc_mixture_sample": q_doc_mixture_sample,
    # incoming batch screened against the corpus band index: exact
    "dedup_incremental": q_dedup_incremental,
    # sliding token-window chunking (pure array arithmetic, no shuffle)
    "doc_chunks": q_doc_chunks,
    # per-source top-q% quality gate via score-domain histogram: exact
    "doc_quality_gate": q_doc_quality_gate,
    # sketch results are implementation-specific: rows-only by nature;
    # merge-losslessness / error bounds asserted in pytest instead
    "user_sketch_rollup": q_user_sketch_rollup,
    "value_percentiles_approx": q_value_percentiles_approx,
    # float-valued iterative fixpoint: rows-only by nature; tolerance
    # + degree-algebra invariants asserted in pytest instead
    "pagerank": q_pagerank,
    # exact + HLL columns in one row; HLL value engine-specific:
    # rows-only (exact twin user_counts_by_type is driver-oracled)
    "user_counts": q_user_counts,
    # grouped applyInPandas split-apply-combine taxonomy demo; float
    # slope formulation-sensitive → pytest tolerance vs regr_slope
    "user_value_trend_pandas": q_user_value_trend_pandas,
    # deterministic hash split: exact oracle, hash-checked in pytest
    "doc_train_test_split": q_doc_train_test_split,
    # one-pass data-quality profile: exact oracle, hash-checked in pytest
    "doc_profile": q_doc_profile,
    # LSH pairs -> transitive closure -> canonical election: exact
    # unrolled-CC oracle, hash-checked in pytest
    "doc_near_dup_clusters": q_doc_near_dup_clusters,
    # composed curation gates (dup/lang/length/stopword): exact oracle
    "corpus_curation": q_corpus_curation,
    # BM25 top-k: shared score-expression text -> bit-exact oracle
    "doc_bm25_topk": q_doc_bm25_topk,
    # latest-wins snapshot: aggregate-argmax plan vs window oracle
    "user_latest_event": q_user_latest_event,
    # deterministic per-stratum rebalance: exact oracle
    "doc_stratified_sample": q_doc_stratified_sample,
    # one-row shuffle-key skew audit: exact oracle
    "event_key_skew": q_event_key_skew,
    # doc-level collocation lift with quadratic-fan-out guard: exact oracle
    "token_cooccurrence": q_token_cooccurrence,
    # eval-set n-gram decontamination (broadcast eval probe): exact oracle
    "doc_decontaminate": q_doc_decontaminate,
    # Gopher-style intra-doc repetition metrics: exact oracle
    "doc_repetition": q_doc_repetition,
    # token-budget sequence packing via two-pass prefix sum: exact oracle
    "doc_pack_sequences": q_doc_pack_sequences,
    # seeded deterministic corpus shuffle before packing: exact oracle
    "doc_pack_shuffled": q_doc_pack_shuffled,
    # bucketed range join (equi-shuffle on time buckets): exact oracle
    "event_incident_counts": q_event_incident_counts,
    # grid resampling + forward fill (per-user windows): exact oracle
    "user_resample_ffill": q_user_resample_ffill,
    # CUBE grouping sets in one pass with grouping() flags: exact oracle
    "order_cube": q_order_cube,
    # ordered funnel conversion via chained conditional mins: exact oracle
    "user_funnel": q_user_funnel,
    # per-group top-k (window rank over pre-aggregated spend): exact oracle
    "top_spenders_region": q_top_spenders_region,
    # snapshot+delta additive-state merge vs direct recompute: exact oracle
    "user_state_merge": q_user_state_merge,
    # keyed half-open interval self-join (retention/frequency-cap shape)
    "events_follow_count": q_events_follow_count,
    # Morton-code scalar (the z-order layout's curve position): the
    # oracle runs the IDENTICAL generated SQL text
    "event_zorder": q_event_zorder,
    # Misra-Gries candidates + exact recount: exact threshold oracle
    "heavy_hitter_tokens": q_heavy_hitter_tokens,
    # time-respecting path-2 (temporal twin of the reference core)
    "temporal_path2": q_temporal_path2,
    # degree histogram (two chained partial-agg aggregates)
    "degree_distribution": q_degree_distribution,
    # per-source wedge closure with existence-checked closing edge
    "wedge_closure": q_wedge_closure,
    # sha256 key pseudonymization (referential integrity preserved)
    "user_pseudonymized_counts": q_user_pseudonymized_counts,
    # in-text PII redaction with audit counts: exact oracle
    "doc_redaction": q_doc_redaction,
    # fixed-size deterministic sample (TakeOrderedAndProject, no sort)
    "doc_topk_sample": q_doc_topk_sample,
    # per-source chi-square vs the corpus token mix: exact oracle
    "source_divergence": q_source_divergence,
    # int8-quantized cosine top-k (integer dot/norms): exact oracle
    "ann_topk_quantized": q_ann_topk_quantized,
    # tokenizer-vocabulary coverage (broadcast membership): exact oracle
    "doc_oov_rates": q_doc_oov_rates,
    # long->wide / wide->long reshape (explicit pivot values): exact
    "user_event_pivot": q_user_event_pivot,
    "user_event_unpivot": q_user_event_unpivot,
    # mutual-edge fraction (distinct + reversed self-semi-join): exact
    "edge_reciprocity": q_edge_reciprocity,
    # SCD2 attribute history (change-collapse + validity intervals)
    "user_type_scd2": q_user_type_scd2,
    # distance-1 typo pairs via deletion-neighborhood blocking (the
    # synthetic vocabulary contains none — the check pins the empty
    # result + schema; planted-typo semantics live in pytest)
    "token_typo_pairs": q_token_typo_pairs,
    # weekly cohort retention matrix (integer epoch-week buckets)
    "retention_cohorts": q_retention_cohorts,
    # TPC-H Q3 shape: pruned 3-way join + decimal agg + top-k
    "shipping_priority": q_shipping_priority,
    # RANGE-framed event-time window (trailing 7d per-user sum)
    "user_value_rolling": q_user_value_rolling,
    # rank-family windows over pre-aggregated spend: exact oracle
    "customer_spend_percentiles": q_customer_spend_percentiles,
    # anti-join referential-integrity audit (1 row): exact oracle
    "integrity_audit": q_integrity_audit,
    # first-order Markov next-event matrix (lead window): exact oracle
    "event_transitions": q_event_transitions,
    # TPC-H Q14 shape: promo revenue share by ship month: exact oracle
    "promo_revenue_share": q_promo_revenue_share,
    # TPC-H Q5 shape: same-nation supplier revenue, 5-way star: exact
    "local_supplier_volume": q_local_supplier_volume,
    # cogrouped applyInPandas (two grouped relations, one UDF): exact
    "cogroup_user_activity": q_cogroup_user_activity,
    # exact dedup over opaque binary payloads (md5, no decode): exact
    "media_dedup_exact": q_media_dedup_exact,
}


# membership lists GENERATED from the operator-side constants so the
# oracles track any marker/stopword change automatically (the lists are
# ~50 words per language since round 4 — hard-coding died with that)
_STOPW = "(" + ", ".join(f"'{w}'" for w in text.STOPWORDS) + ")"

_LANGS = sorted(text.LANG_MARKERS)


def _lang_scores_sql() -> str:
    """The per-language marker-hit SUM columns (s_de, s_en, …), in
    sorted-code order — mirrors text.lang_id's aggregate exactly."""
    return ",\n                ".join(
        "SUM(CASE WHEN tok IN ("
        + ", ".join(f"'{w}'" for w in text.LANG_MARKERS[lang])
        + f") THEN 1 ELSE 0 END) AS s_{lang}"
        for lang in _LANGS
    )


def _lang_pred_sql() -> str:
    """The tie-break CASE: 'und' when no marker hits, else the FIRST
    language in code order reaching the max — same order as the Spark
    side's chained WHENs."""
    g = "greatest(" + ", ".join(f"s_{lang}" for lang in _LANGS) + ")"
    whens = "".join(
        f" WHEN s_{lang} = {g} THEN '{lang}'" for lang in _LANGS[:-1]
    )
    return f"CASE WHEN {g} <= 0 THEN 'und'{whens} ELSE '{_LANGS[-1]}' END"

EXT_ORACLES = {
    "dedup_exact": """
        SELECT md5(text) AS content_hash,
               MIN(doc_id) AS keep_doc_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "minhash_bands": f"""
        {_BANDS}
        SELECT doc_id, band, bh FROM bands
    """,
    "dedup_minhash_pairs": f"""
        {_BANDS}
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bh = b.bh
                     AND a.doc_id < b.doc_id
    """,
    "simhash": f"""
        WITH toks AS ({_TOKS}),
        h AS (SELECT doc_id, substr(md5(tok), 1, 4) AS h4 FROM toks),
        bits AS (SELECT doc_id, h4, unnest(range(0, 16)) AS bit FROM h),
        bv AS (SELECT doc_id, bit,
                      ((strpos('0123456789abcdef',
                               substr(h4, 1 + bit // 4, 1)) - 1)
                       >> CAST(bit % 4 AS INT)) % 2 AS b
               FROM bits),
        per_bit AS (SELECT doc_id, bit, SUM(b * 2 - 1) AS s
                    FROM bv GROUP BY doc_id, bit)
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0
                             THEN (CAST(1 AS BIGINT) << CAST(bit AS INT))
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM per_bit GROUP BY doc_id
    """,
    "ngram_jaccard_pairs": f"""
        WITH {_SHINGLES},
        sdist_all AS (SELECT DISTINCT doc_id, sh FROM shingles),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sdist_all GROUP BY doc_id),
        hot AS (SELECT sh FROM sdist_all GROUP BY sh HAVING COUNT(*) > 1000),
        sdist AS (SELECT * FROM sdist_all
                  WHERE sh NOT IN (SELECT sh FROM hot)),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
            FROM sdist a
            JOIN sdist b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
            HAVING COUNT(*) >= 2
        )
        SELECT doc_a, doc_b, common,
               CAST(FLOOR(1000000 * common / (sa.sz + sb.sz - common))
                    AS BIGINT) AS jaccard_e6
        FROM pairs
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
    """,
    "text_stats": f"""
        WITH toks AS ({_TOKS})
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               COUNT(DISTINCT tok) AS n_types,
               CAST(FLOOR(1000000 * COUNT(DISTINCT tok) / COUNT(*))
                    AS BIGINT) AS ttr_e6,
               CAST(FLOOR(1000000 * SUM(length(tok)) / COUNT(*))
                    AS BIGINT) AS mean_tok_len_e6,
               CAST(FLOOR(1000000 * SUM(CASE WHEN tok IN {_STOPW}
                                             THEN 1 ELSE 0 END) / COUNT(*))
                    AS BIGINT) AS stopword_e6
        FROM toks GROUP BY doc_id
    """,
    "lang_id": f"""
        WITH toks AS ({_TOKS}),
        s AS (SELECT doc_id,
                {_lang_scores_sql()}
              FROM toks GROUP BY doc_id)
        SELECT doc_id,
               {_lang_pred_sql()} AS pred_lang
        FROM s
    """,
    "doc_fingerprint": """
        SELECT doc_id,
               md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS fp
        FROM documents
    """,
    "token_topk": f"""
        WITH toks AS ({_TOKS})
        SELECT tok, COUNT(*) AS cnt
        FROM toks GROUP BY tok
        ORDER BY cnt DESC, tok ASC LIMIT 100
    """,
    "embedding_norms": f"""
        SELECT vec_id,
               CAST(FLOOR(1000000 * sqrt({_SQ_SUM.format(col='embedding')}))
                    AS BIGINT) AS norm_e6
        FROM embeddings
    """,
    "ann_topk_bruteforce": f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe
                   FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS nid, embedding AS ce FROM embeddings),
        scored AS (
            SELECT qid, nid,
                   {_DOT}
                   / (sqrt({_SQ_SUM.format(col='qe')})
                      * sqrt({_SQ_SUM.format(col='ce')})) AS sim
            FROM q JOIN c ON qid <> nid
        ),
        ranked AS (
            SELECT qid, nid, sim,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY sim DESC, nid ASC) AS rank
            FROM scored
        )
        SELECT qid, nid, rank,
               CAST(FLOOR(10000 * sim) AS BIGINT) AS sim_e4
        FROM ranked WHERE rank <= 3
    """,
    # lsh_signature / ann_topk_lsh SQL is generated per-dimension at call
    # time (needs the embedding width); see oracles_for_dims below.
    "events_json_kpi": """
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k
        FROM events GROUP BY event_type
    """,
    "sessionize": """
        WITH e AS (SELECT user_id, event_id, ts,
                          CAST(floor(epoch(ts)) AS BIGINT) AS ep
                   FROM events),
        f AS (SELECT user_id, event_id, ts, ep,
                     CASE WHEN lag(ep) OVER w IS NULL THEN 1
                          WHEN ep - lag(ep) OVER w > 1800 THEN 1
                          ELSE 0 END AS new_sess
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT user_id, ep,
                     SUM(new_sess) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS session_id
              FROM f)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events, MIN(ep) AS sess_start_s
        FROM s GROUP BY user_id, session_id
    """,
    # session_window semantics: a session's window is [first_ts,
    # last_ts + gap); an event exactly gap after the previous starts a NEW
    # session (end-exclusive) → manual rule `us - lag(us) >= gap_us`
    "sessionize_native": """
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        f AS (SELECT user_id, event_id, us,
                     CASE WHEN lag(us) OVER w IS NULL THEN 1
                          WHEN us - lag(us) OVER w >= 1800000000 THEN 1
                          ELSE 0 END AS new_sess
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        s AS (SELECT user_id, us,
                     SUM(new_sess) OVER (PARTITION BY user_id
                                         ORDER BY us, event_id) AS sid
              FROM f)
        SELECT user_id, MIN(us) AS sess_start_us, COUNT(*) AS n_events
        FROM s GROUP BY user_id, sid
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-12-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_customers": """
        WITH spend AS (
            SELECT o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spent,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey
        )
        SELECT c_custkey, c_name,
               CAST(spent AS DOUBLE) AS total_spent, n_orders
        FROM spend JOIN customer ON o_custkey = c_custkey
        ORDER BY total_spent DESC, c_custkey ASC LIMIT 10
    """,
    "revenue_by_region": """
        WITH spend AS (
            SELECT o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spent
            FROM orders GROUP BY o_custkey
        )
        SELECT r_name,
               CAST(SUM(spent) AS DOUBLE) AS revenue,
               COUNT(*) AS n_customers
        FROM spend
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "media_stats": """
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                    ELSE 'audio/wav' END AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    """,
    # oracle for the deterministic decode arm: the fake features are
    # deterministic functions of the payload, so even the mapInPandas
    # path is checkable.
    # first_byte: the stub returns the first UTF-8 BYTE (-1 when empty);
    # ascii() returns a CODEPOINT, so this oracle assumes ASCII text (true
    # of the synthetic testdata, same assumption as media_frames) and
    # mirrors the empty-payload -1 explicitly.
    # width/height/decode_ok (round 6): the synthetic payloads are UTF-8
    # text bytes — never a parseable image — so the REAL decode arm
    # produces the identical (-1, -1, 0) fallback on every row and this
    # oracle holds whether or not the container has codecs (the parity
    # is pinned by tests/test_multimodal.py in codec-equipped envs).
    "media_features": """
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                    ELSE 'audio/wav' END AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(CASE WHEN length(text) = 0 THEN -1
                         ELSE ascii(substr(text, 1, 1)) END
                    AS BIGINT) AS first_byte,
               substr(md5(text), 1, 8) AS digest8,
               CAST(-1 AS BIGINT) AS width,
               CAST(-1 AS BIGINT) AS height,
               CAST(0 AS BIGINT) AS decode_ok
        FROM documents
    """,
}


# resize stub truncates the (ASCII) payload to 64 bytes
EXT_ORACLES["media_resize"] = """
    SELECT doc_id,
           CAST(octet_length(encode(substr(text, 1, 64))) AS BIGINT)
               AS out_bytes,
           substr(md5(substr(text, 1, 64)), 1, 8) AS out_digest8
    FROM documents
"""

# frame sampling: 32-byte chunks, every 4th (ASCII payload → byte==char)
EXT_ORACLES["media_frames"] = """
    WITH f AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n,
               unnest(range(0, ((octet_length(encode(text)) + 31) // 32)))
                   AS idx
        FROM documents
    )
    SELECT doc_id,
           CAST(idx AS BIGINT) AS frame_idx,
           CAST(octet_length(encode(substr(text, 1 + idx * 32, 32)))
                AS BIGINT) AS frame_bytes,
           substr(md5(substr(text, 1 + idx * 32, 32)), 1, 8)
               AS frame_digest8
    FROM f WHERE idx % 4 = 0
"""

EXT_ORACLES["token_counts_multi"] = """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
           CAST(len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]{1,4}'))
                AS BIGINT) AS n_bpe,
           CAST(length(text) AS BIGINT) AS n_chars_calc
    FROM documents
"""


def _rolling_hash_oracle() -> str:
    from .functions.hashing import hex_prefix_to_long_sql
    from .operators.text import RH_BASE, RH_MOD

    tokval = hex_prefix_to_long_sql("md5(x)", 7)
    return f"""
        WITH v AS (
            SELECT doc_id,
                   list_transform(string_split(text, ' '),
                                  x -> {tokval}) AS vals
            FROM documents
        )
        SELECT doc_id,
               CAST(list_reduce(vals,
                    (acc, x) -> (acc * {RH_BASE} + x) % {RH_MOD})
                    AS BIGINT) AS rhash
        FROM v
    """


EXT_ORACLES["doc_rolling_hash"] = _rolling_hash_oracle()

EXT_ORACLES["value_percentiles"] = """
    SELECT event_type,
           CAST(FLOOR(10000 * percentile_cont(0.5) WITHIN GROUP
                (ORDER BY value)) AS BIGINT) AS p50_e4,
           CAST(FLOOR(10000 * percentile_cont(0.95) WITHIN GROUP
                (ORDER BY value)) AS BIGINT) AS p95_e4
    FROM events GROUP BY event_type
"""

EXT_ORACLES["value_histogram"] = """
    SELECT CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket, COUNT(*) AS n
    FROM events GROUP BY CAST(FLOOR(value / 50.0) AS BIGINT)
"""

EXT_ORACLES["user_value_trend"] = relational.USER_VALUE_TREND_SQL

EXT_ORACLES["user_counts_by_type"] = """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
"""

EXT_ORACLES["order_status_rollup"] = """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""

EXT_ORACLES["customers_with_orders"] = """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""

EXT_ORACLES["customers_without_orders"] = """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
"""

EXT_ORACLES["user_event_setops"] = """
    SELECT user_id, CAST(ts AS DATE) AS d FROM events
    WHERE event_type = 'click'
    INTERSECT
    SELECT user_id, CAST(ts AS DATE) FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT user_id, CAST(ts AS DATE) FROM events WHERE event_type = 'error'
"""

# same union-and-window formulation as relational.asof_join, so frame
# semantics and tie-breaks match exactly
EXT_ORACLES["events_last_order_asof"] = """
    WITH ev AS (SELECT event_id, user_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS t
                FROM events),
    od AS (SELECT o_custkey AS user_id,
                  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS t,
                  o_orderkey
           FROM orders),
    u AS (
        SELECT user_id AS k, t, 1 AS is_left,
               CAST(NULL AS BIGINT) AS rv, event_id
        FROM ev
        UNION ALL
        SELECT user_id, t, 0, o_orderkey, NULL FROM od
    ),
    w AS (
        SELECT k, is_left, event_id,
               last_value(rv IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY t, is_left, rv
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS asof_orderkey
        FROM u
    )
    SELECT event_id, k AS user_id, asof_orderkey
    FROM w WHERE is_left = 1
"""


def _ivf_cells_cte_src(src: str = "embeddings") -> str:
    """IVF cell assignment as a pure-SQL CTE chain (centroids = the
    first ``IVF_CELLS`` vec_ids of ``src``) — parameterized over the
    source relation so the projected twin (round 12) can run the same
    assignment over a projected CTE instead of the base table."""
    return f"""
cents AS (SELECT vec_id AS cid, embedding AS ce_c FROM {src}
          WHERE vec_id < {similarity.IVF_CELLS}),
cscored AS (
    SELECT e.vec_id, c.cid,
           list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.ce_c[i] AS DOUBLE)))
           / sqrt(list_sum(list_transform(c.ce_c,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS s
    FROM {src} e CROSS JOIN cents c
),
cells AS (
    SELECT vec_id, cid AS cell
    FROM (SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY s DESC, cid ASC) AS rn
          FROM cscored)
    WHERE rn = 1
)
"""


#: the default instance over the base table (pre-round-12 text)
_IVF_CELLS_CTE = _ivf_cells_cte_src()

EXT_ORACLES["ivf_cells"] = f"""
    WITH {_IVF_CELLS_CTE}
    SELECT vec_id, cell FROM cells
"""


def _ivf_trained_cells_cte(
    k: int = similarity.IVF_CELLS,
    rounds: int = similarity.IVF_TRAIN_ROUNDS,
) -> str:
    """DuckDB twin of ``similarity.train_ivf_centroids`` + the final
    cell assignment, unrolled: deterministic farthest-point seeding
    (k−1 argmax steps), then ``rounds`` Lloyd iterations whose
    recentering sums ``floor(x·1e6)`` BIGINTs — the associative-exact
    integer sums that make the trained codebook bit-identical between
    engines (a double ``avg`` would drift by accumulation order).
    Final CTE: ``cells(vec_id, cell)``; the last centroid relation is
    ``tcents(cid, ce)``."""
    q = similarity._MEAN_QUANT
    sqd = (
        "list_sum(list_transform(range(1, len(e.embedding) + 1),"
        " j -> (CAST(e.embedding[j] AS DOUBLE) - CAST(c.ce[j] AS DOUBLE))"
        " * (CAST(e.embedding[j] AS DOUBLE) - CAST(c.ce[j] AS DOUBLE))))"
    )
    cos = (
        "list_sum(list_transform(range(1, len(e.embedding) + 1),"
        " i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)))"
        " / sqrt(list_sum(list_transform(c.ce,"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )
    parts = [
        "seeds0 AS (SELECT 0 AS cid, embedding AS ce FROM embeddings"
        " WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings))"
    ]
    for i in range(1, k):
        parts.append(
            f"d{i} AS (SELECT e.vec_id, MIN({sqd}) AS d"
            f" FROM embeddings e CROSS JOIN seeds{i - 1} c"
            " GROUP BY e.vec_id)"
        )
        parts.append(
            f"pick{i} AS (SELECT vec_id FROM d{i}"
            " ORDER BY d DESC, vec_id ASC LIMIT 1)"
        )
        parts.append(
            f"seeds{i} AS (SELECT * FROM seeds{i - 1} UNION ALL"
            f" SELECT {i} AS cid, embedding AS ce FROM embeddings"
            f" WHERE vec_id = (SELECT vec_id FROM pick{i}))"
        )
    prev = f"seeds{k - 1}"
    for r in range(rounds):
        parts.append(
            f"tsc{r} AS (SELECT e.vec_id, c.cid, {cos} AS s"
            f" FROM embeddings e CROSS JOIN {prev} c)"
        )
        parts.append(
            f"asg{r} AS (SELECT vec_id, cid AS cell FROM"
            f" (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id"
            f" ORDER BY s DESC, cid ASC) AS rn FROM tsc{r}) WHERE rn = 1)"
        )
        parts.append(
            f"mp{r} AS (SELECT a.cell, e.embedding,"
            " unnest(range(1, len(e.embedding) + 1)) AS j"
            f" FROM embeddings e JOIN asg{r} a USING (vec_id))"
        )
        parts.append(
            f"md{r} AS (SELECT cell, j AS pos,"
            f" SUM(CAST(FLOOR(CAST(embedding[j] AS DOUBLE) * {q})"
            " AS BIGINT)) AS qsum, COUNT(*) AS n"
            f" FROM mp{r} GROUP BY cell, j)"
        )
        parts.append(
            f"cents{r} AS (SELECT cell AS cid,"
            f" list(CAST(qsum AS DOUBLE) / (CAST(n AS DOUBLE) * {q}.0)"
            f" ORDER BY pos) AS ce FROM md{r} GROUP BY cell)"
        )
        prev = f"cents{r}"
    parts.append(f"tcents AS (SELECT cid, ce FROM {prev})")
    parts.append(
        f"fsc AS (SELECT e.vec_id, c.cid, {cos} AS s"
        " FROM embeddings e CROSS JOIN tcents c)"
    )
    parts.append(
        "tranked AS (SELECT vec_id, cid, s, row_number() OVER"
        " (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn FROM fsc)"
    )
    parts.append(
        "cells AS (SELECT vec_id, cid AS cell FROM tranked WHERE rn = 1)"
    )
    return ",\n".join(parts)


EXT_ORACLES["ivf_cells_trained"] = f"""
    WITH {_ivf_trained_cells_cte()}
    SELECT vec_id, cell FROM cells
"""


#: threshold for the registry's semantic-dedup query — the synthetic
#: embeddings have no planted near-dups (max collision-pair cosine
#: ≈0.44), so the exercised threshold sits inside the observed range;
#: production pipelines pass ~9500 (similarity.SEMANTIC_MIN_SIM_E4)
SEMANTIC_QUERY_MIN_SIM_E4 = 2000


def _semantic_dedup_oracle(
    dims: int = 64, bits: int | None = None
) -> str:
    """DuckDB twin of ``similarity.semantic_dedup_clusters`` as
    registered: TRAINED IVF cell assignment (round 5 — the unrolled
    farthest-point + exact-Lloyd chain) + hyperplane signatures,
    cell-local thresholded cosine pairs, then the SAME unrolled
    min-label rounds as the MinHash cluster oracle. ``bits`` pins an
    explicit signature width (the streaming twins: the fold pin, the
    re-band migration width); ``None`` derives it from the corpus
    count exactly as the Spark operator does (round 10, sf1 gate)."""
    from .operators.dedup import NEAR_DUP_CC_ROUNDS

    it = NEAR_DUP_CC_ROUNDS
    if bits is None:
        sig = _lsh_sig_sql_derived(dims, "SELECT COUNT(*) FROM embeddings")
    else:
        sig = _lsh_sig_sql(dims, bits)
    parts = [
        f"WITH {_ivf_trained_cells_cte()},",
        f"sigs AS (SELECT vec_id, CAST({sig} AS BIGINT) AS sig"
        " FROM embeddings),",
        "em AS (SELECT e.vec_id, e.embedding, c.cell, s.sig"
        " FROM embeddings e JOIN cells c USING (vec_id)"
        " JOIN sigs s USING (vec_id)),",
        "a AS (SELECT vec_id AS vec_a, embedding AS qe, cell, sig FROM em),",
        "b AS (SELECT vec_id AS vec_b, embedding AS ce, cell, sig FROM em),",
        f"""pairs AS MATERIALIZED (
            SELECT vec_a AS src, vec_b AS dst
            FROM a JOIN b ON a.cell = b.cell AND a.sig = b.sig
                         AND vec_a < vec_b
            WHERE CAST(FLOOR(10000 * ({_DOT}
                  / (sqrt({_SQ_SUM.format(col='qe')})
                     * sqrt({_SQ_SUM.format(col='ce')})))) AS BIGINT)
                  >= {SEMANTIC_QUERY_MIN_SIM_E4}),""",
        "sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs)),",
        "verts AS MATERIALIZED (SELECT DISTINCT v FROM ("
        "SELECT src AS v FROM pairs UNION ALL SELECT dst FROM pairs)),",
        "it0 AS (SELECT v, v AS l FROM verts),",
    ]
    for k in range(it):
        parts.append(
            f"nm{k} AS MATERIALIZED (SELECT s.dst AS v2, MIN(i.l) AS nl"
            f" FROM sym s JOIN it{k} i ON s.src = i.v GROUP BY s.dst),"
        )
        parts.append(
            f"it{k + 1} AS MATERIALIZED (SELECT i.v,"
            f" LEAST(i.l, COALESCE(n.nl, i.l)) AS l"
            f" FROM it{k} i LEFT JOIN nm{k} n ON i.v = n.v2),"
        )
    body = "\n".join(parts).rstrip(",")
    return f"""
{body}
SELECT e.vec_id,
       COALESCE(cc.l, e.vec_id) AS cluster_id,
       CAST(e.vec_id = COALESCE(cc.l, e.vec_id) AS BIGINT) AS is_canonical
FROM embeddings e LEFT JOIN it{it} cc ON e.vec_id = cc.v
"""

def _semantic_dedup_projected_oracle(
    dims: int, out_dims: int, min_sim_e4: int
) -> str:
    """DuckDB twin of ``semantic_dedup_clusters(project_dims=...)``
    with the first-k-vectors stand-in quantizer (round 12, r11 verdict
    item 1): rebuild the JL projection term-for-term in a ``pe`` CTE
    (same ±1 md5-parity scheme, same strict left-to-right double fold
    as ``similarity._proj_col``), then run the WHOLE pipeline — cell
    assignment, derived-width signatures, thresholded cosine pairs,
    unrolled min-label rounds — over the projected vectors, exactly as
    the Spark operator does after ``_apply_projection``. A NULL
    embedding projects to NULL explicitly (list_value of NULL elements
    is a non-NULL list of NULLs — the CASE mirrors Spark's NULL→NULL
    contract)."""
    from .operators.dedup import NEAR_DUP_CC_ROUNDS

    it = NEAR_DUP_CC_ROUNDS
    elems = ", ".join(
        f"({_proj_elem_sql(j, dims)})" for j in range(out_dims)
    )
    sig = _lsh_sig_sql_derived(
        out_dims, "SELECT COUNT(*) FROM embeddings"
    )
    parts = [
        "WITH pe AS (SELECT vec_id,"
        " CASE WHEN embedding IS NULL THEN NULL"
        f" ELSE list_value({elems}) END AS embedding FROM embeddings),",
        f"{_ivf_cells_cte_src('pe').strip()},",
        f"sigs AS (SELECT vec_id, CAST({sig} AS BIGINT) AS sig"
        " FROM pe),",
        "em AS (SELECT e.vec_id, e.embedding, c.cell, s.sig"
        " FROM pe e JOIN cells c USING (vec_id)"
        " JOIN sigs s USING (vec_id)),",
        "a AS (SELECT vec_id AS vec_a, embedding AS qe, cell, sig FROM em),",
        "b AS (SELECT vec_id AS vec_b, embedding AS ce, cell, sig FROM em),",
        f"""pairs AS MATERIALIZED (
            SELECT vec_a AS src, vec_b AS dst
            FROM a JOIN b ON a.cell = b.cell AND a.sig = b.sig
                         AND vec_a < vec_b
            WHERE CAST(FLOOR(10000 * ({_DOT}
                  / (sqrt({_SQ_SUM.format(col='qe')})
                     * sqrt({_SQ_SUM.format(col='ce')})))) AS BIGINT)
                  >= {min_sim_e4}),""",
        "sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs)),",
        "verts AS MATERIALIZED (SELECT DISTINCT v FROM ("
        "SELECT src AS v FROM pairs UNION ALL SELECT dst FROM pairs)),",
        "it0 AS (SELECT v, v AS l FROM verts),",
    ]
    for k in range(it):
        parts.append(
            f"nm{k} AS MATERIALIZED (SELECT s.dst AS v2, MIN(i.l) AS nl"
            f" FROM sym s JOIN it{k} i ON s.src = i.v GROUP BY s.dst),"
        )
        parts.append(
            f"it{k + 1} AS MATERIALIZED (SELECT i.v,"
            f" LEAST(i.l, COALESCE(n.nl, i.l)) AS l"
            f" FROM it{k} i LEFT JOIN nm{k} n ON i.v = n.v2),"
        )
    body = "\n".join(parts).rstrip(",")
    return f"""
{body}
SELECT e.vec_id,
       COALESCE(cc.l, e.vec_id) AS cluster_id,
       CAST(e.vec_id = COALESCE(cc.l, e.vec_id) AS BIGINT) AS is_canonical
FROM embeddings e LEFT JOIN it{it} cc ON e.vec_id = cc.v
"""


EXT_ORACLES["cluster_balanced_sample"] = f"""
    WITH {_IVF_CELLS_CTE},
    ranked AS (SELECT vec_id, cell,
                      row_number() OVER (
                          PARTITION BY cell
                          ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC,
                                   vec_id ASC) AS rn
               FROM cells)
    SELECT vec_id, cell,
           CAST(rn <= {CLUSTER_SAMPLE_PER_CELL} AS BIGINT) AS keep
    FROM ranked
"""

def _bpe_oracles() -> dict[str, str]:
    from .operators import bpe

    return {
        "bpe_word_symbols": bpe.word_symbols_oracle_sql(),
        "bpe_pair_counts": bpe.pair_counts_oracle_sql(),
    }


EXT_ORACLES.update(_bpe_oracles())

EXT_ORACLES["cluster_central_sample"] = f"""
    WITH {_IVF_CELLS_CTE},
    qn AS (SELECT vec_id,
                  sqrt(list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn
           FROM embeddings),
    cw AS (SELECT c.vec_id, c.cell,
                  CASE WHEN q.qn = 0 THEN -2000000
                       ELSE CAST(FLOOR(1000000 * s.s / q.qn) AS BIGINT)
                  END AS sim_e6
           FROM cells c
           JOIN cscored s ON s.vec_id = c.vec_id AND s.cid = c.cell
           JOIN qn q ON q.vec_id = c.vec_id),
    ranked AS (SELECT vec_id, cell,
                      row_number() OVER (
                          PARTITION BY cell
                          ORDER BY sim_e6 DESC, vec_id ASC) AS rn
               FROM cw)
    SELECT vec_id, cell,
           CAST(rn <= {CLUSTER_SAMPLE_PER_CELL} AS BIGINT) AS keep
    FROM ranked
"""

EXT_ORACLES["ann_topk_ivf2"] = f"""
    WITH {_IVF_CELLS_CTE},
    probes AS (
        SELECT vec_id AS qid, cid AS qcell
        FROM (SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY s DESC, cid ASC) AS rn
              FROM cscored)
        WHERE rn <= 2 AND vec_id < 5
    ),
    q AS (SELECT e.vec_id AS qid, e.embedding AS qe, p.qcell
          FROM embeddings e JOIN probes p ON e.vec_id = p.qid),
    c AS (SELECT e.vec_id AS nid, e.embedding AS ce, cl.cell AS ccell
          FROM embeddings e JOIN cells cl ON e.vec_id = cl.vec_id),
    scored AS (
        SELECT qid, nid,
               {_DOT}
               / (sqrt({_SQ_SUM.format(col='qe')})
                  * sqrt({_SQ_SUM.format(col='ce')})) AS sim
        FROM q JOIN c ON qcell = ccell AND qid <> nid
    ),
    ranked AS (
        SELECT qid, nid, sim,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY sim DESC, nid ASC) AS rank
        FROM scored
    )
    SELECT qid, nid, rank,
           CAST(FLOOR(10000 * sim) AS BIGINT) AS sim_e4
    FROM ranked WHERE rank <= 3
"""

EXT_ORACLES["ann_topk_ivf"] = f"""
    WITH {_ivf_trained_cells_cte()},
    q AS (SELECT e.vec_id AS qid, e.embedding AS qe, cl.cell AS qcell
          FROM embeddings e JOIN cells cl ON e.vec_id = cl.vec_id
          WHERE e.vec_id < 5),
    c AS (SELECT e.vec_id AS nid, e.embedding AS ce, cl.cell AS ccell
          FROM embeddings e JOIN cells cl ON e.vec_id = cl.vec_id),
    scored AS (
        SELECT qid, nid,
               {_DOT}
               / (sqrt({_SQ_SUM.format(col='qe')})
                  * sqrt({_SQ_SUM.format(col='ce')})) AS sim
        FROM q JOIN c ON qcell = ccell AND qid <> nid
    ),
    ranked AS (
        SELECT qid, nid, sim,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY sim DESC, nid ASC) AS rank
        FROM scored
    )
    SELECT qid, nid, rank,
           CAST(FLOOR(10000 * sim) AS BIGINT) AS sim_e4
    FROM ranked WHERE rank <= 3
"""


# round 8: the streaming-snapshot query shares ann_topk_ivf's oracle
# VERBATIM — that is the point: the fold + compaction + marker-pruned
# serving path must reproduce the batch IVF answer an independent SQL
# engine derives from the raw parquet, bit for bit
EXT_ORACLES["ann_topk_snapshot"] = EXT_ORACLES["ann_topk_ivf"]


def ext_oracles(dims: int = 64) -> dict[str, str]:
    """All extension oracles, including the dimension-parameterized LSH
    SQL (testdata embeddings are FLOAT[64])."""
    out = dict(EXT_ORACLES)
    out["embedding_projection"] = _projection_oracle_sql(
        dims, similarity.PROJECT_DIMS
    )
    out["ann_topk_projected"] = _projected_topk_oracle_sql(
        dims, similarity.PROJECT_DIMS
    )
    out["connected_components"] = components.connected_components_oracle_sql(
        EDGES_FROM_EVENTS_SQL
    )
    out["bfs_levels"] = components.bfs_levels_oracle_sql(
        EDGES_FROM_EVENTS_SQL, BFS_SOURCE
    )
    from .operators.sampling import mixture_oracle_sql, split_oracle_sql

    out["doc_train_test_split"] = split_oracle_sql("documents", "doc_id")
    out["source_mixture_rates"] = mixture_oracle_sql(
        "documents", "doc_id", rates_only=True
    )
    out["doc_mixture_sample"] = mixture_oracle_sql("documents", "doc_id")
    from .operators.corpus import chunks_oracle_sql

    out["doc_chunks"] = chunks_oracle_sql()
    from .operators.text import quality_gate_oracle_sql

    out["doc_quality_gate"] = quality_gate_oracle_sql()
    out["dedup_incremental"] = f"""
        {_BANDS},
        np AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
               FROM bands a
               JOIN bands b ON a.band = b.band AND a.bh = b.bh
               WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0),
        hits AS (SELECT new_id, CAST(COUNT(*) AS BIGINT) AS n
                 FROM np GROUP BY new_id)
        SELECT d.doc_id, COALESCE(hits.n, 0) AS n_dup_of,
               CAST(CASE WHEN COALESCE(hits.n, 0) = 0
                         THEN 1 ELSE 0 END AS BIGINT) AS is_new
        FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
        LEFT JOIN hits ON hits.new_id = d.doc_id
    """
    from .operators.profile import profile_oracle_sql

    out["doc_profile"] = profile_oracle_sql("documents", PROFILE_COLS)
    out["doc_near_dup_clusters"] = _near_dup_clusters_oracle()
    from .operators import retrieval

    out["doc_bm25_topk"] = retrieval.bm25_oracle_sql(_TOKS)
    from .operators import cdc

    out["user_latest_event"] = cdc.user_latest_event_oracle_sql()
    from .operators.sampling import stratified_oracle_sql

    out["doc_stratified_sample"] = stratified_oracle_sql(
        "documents",
        key="doc_id",
        strata_col="lang",
        fractions=STRAT_FRACTIONS,
        default_frac=STRAT_DEFAULT,
        select="doc_id, lang",
    )
    from .operators.sampling import weighted_sample_oracle_sql

    out["doc_weighted_sample"] = weighted_sample_oracle_sql(
        "documents",
        key="doc_id",
        weight="n_chars",
        n=WSAMPLE_N,
        by="source",
        select="doc_id, source, n_chars",
    )
    from .operators.profile import key_skew_oracle_sql

    out["event_key_skew"] = key_skew_oracle_sql("events", "user_id")
    out["token_cooccurrence"] = text.cooccurrence_oracle_sql(_TOKS)
    out["doc_decontaminate"] = corpus.decontaminate_oracle_sql(
        train_sql=(
            "SELECT doc_id, text FROM documents"
            f" WHERE doc_id % {DECONTAM_EVAL_MOD} <> 0"
        ),
        eval_sql=(
            "SELECT doc_id, text FROM documents"
            f" WHERE doc_id % {DECONTAM_EVAL_MOD} = 0"
        ),
    )
    out["doc_repetition"] = corpus.repetition_oracle_sql()
    out["doc_pack_sequences"] = corpus.pack_oracle_sql()
    out["doc_pack_shuffled"] = corpus.pack_oracle_sql(
        shuffle_seed=PACK_SHUFFLE_SEED
    )
    from .operators import timeseries

    out["event_incident_counts"] = timeseries.incident_oracle_sql()
    out["user_resample_ffill"] = timeseries.resample_oracle_sql()
    out["order_cube"] = relational.ORDER_CUBE_ORACLE
    out["user_funnel"] = relational.funnel_oracle_sql()
    out["top_spenders_region"] = relational.top_spenders_oracle_sql()
    from .operators import incremental

    out["user_state_merge"] = incremental.MERGED_STATE_ORACLE
    from .operators import intervals as _intervals

    out["events_follow_count"] = _intervals.events_follow_count_oracle_sql()
    out["event_zorder"] = (
        f"SELECT event_id, {_event_z_sql()} AS zval FROM events"
    )
    from .operators import sketches

    out["heavy_hitter_tokens"] = sketches.heavy_hitter_oracle_sql(_TOKS)
    out["doc_unigram_logprob"] = text.unigram_logprob_oracle_sql(_TOKS)
    # round 12: the gated variant (driver tier after the rotation)
    out["unigram_logprob_gate"] = text.unigram_logprob_gate_oracle_sql(
        _TOKS
    )
    out["token_count_sketch"] = sketches.cms_sketch_oracle_sql(_TOKS)
    out["token_count_estimates"] = sketches.cms_estimate_oracle_sql(_TOKS)
    out["merged_token_sketch"] = sketches.cms_sketch_oracle_sql(_TOKS)
    out["temporal_path2"] = _intervals.temporal_path2_oracle_sql()
    from .operators import privacy as _privacy

    out["user_pseudonymized_counts"] = (
        _privacy.pseudonymized_events_oracle_sql()
    )
    out["doc_redaction"] = _privacy.redacted_docs_oracle_sql()
    from .operators.sampling import topk_sample_oracle_sql

    out["doc_topk_sample"] = topk_sample_oracle_sql(
        "documents", "doc_id", 100, select="doc_id, lang"
    )
    out["source_divergence"] = text.divergence_oracle_sql(_TOKS)
    out["doc_oov_rates"] = text.vocab_oov_oracle_sql(_TOKS)
    out["user_event_pivot"] = relational.PIVOT_ORACLE
    out["user_event_unpivot"] = relational.UNPIVOT_ORACLE
    from .operators.graph import RECIPROCITY_ORACLE_TEMPLATE

    out["edge_reciprocity"] = RECIPROCITY_ORACLE_TEMPLATE.format(
        edges_sql=EDGES_FROM_EVENTS_SQL
    )
    from .operators import cdc as _cdc

    out["user_type_scd2"] = _cdc.user_type_scd2_oracle_sql()
    out["token_typo_pairs"] = dedup.typo_pairs_oracle_sql(_TOKS)
    out["retention_cohorts"] = relational.retention_oracle_sql()
    out["shipping_priority"] = relational.shipping_priority_oracle_sql()
    out["user_value_rolling"] = relational.rolling_oracle_sql()
    out["customer_spend_percentiles"] = (
        relational.spend_percentiles_oracle_sql()
    )
    out["integrity_audit"] = relational.INTEGRITY_ORACLE
    out["event_transitions"] = relational.EVENT_TRANSITIONS_ORACLE
    out["promo_revenue_share"] = relational.PROMO_SHARE_ORACLE
    out["local_supplier_volume"] = relational.LOCAL_SUPPLIER_ORACLE
    out["cogroup_user_activity"] = relational.COGROUP_ACTIVITY_ORACLE
    out["media_dedup_exact"] = multimodal.MEDIA_DEDUP_ORACLE
    out["ann_topk_quantized"] = """
        WITH s AS (SELECT MAX(list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE))))) AS s
                   FROM embeddings),
        qz AS (SELECT vec_id,
                      list_transform(embedding,
                          x -> CAST(least(greatest(
                              floor(CAST(x AS DOUBLE) / s * 127 + 0.5),
                              -127), 127) AS BIGINT)) AS qemb
               FROM embeddings CROSS JOIN s),
        q AS (SELECT vec_id AS qid, qemb AS qe,
                     CAST(list_sum(list_transform(qemb, x -> x * x))
                          AS BIGINT) AS qn2
              FROM qz WHERE vec_id < 5),
        c AS (SELECT vec_id AS nid, qemb AS ce,
                     CAST(list_sum(list_transform(qemb, x -> x * x))
                          AS BIGINT) AS cn2
              FROM qz),
        scored AS (
            SELECT qid, nid,
                   CAST(list_sum(list_transform(range(1, len(qe) + 1),
                            i -> qe[i] * ce[i])) AS DOUBLE)
                   / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE)))
                       AS sim
            FROM c JOIN q ON qid <> nid
        ),
        ranked AS (SELECT qid, nid,
                          ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY sim DESC, nid ASC) AS rank,
                          sim
                   FROM scored)
        SELECT qid, nid, CAST(rank AS BIGINT) AS rank,
               CAST(FLOOR(10000 * sim) AS BIGINT) AS sim_e4
        FROM ranked WHERE rank <= 3
    """
    out["degree_distribution"] = f"""
        WITH edges AS ({EDGES_FROM_EVENTS_SQL}),
        deg AS (SELECT src, COUNT(*) AS out_degree FROM edges GROUP BY src)
        SELECT out_degree, COUNT(*) AS n_nodes FROM deg GROUP BY out_degree
    """
    out["wedge_closure"] = f"""
        WITH edges AS ({EDGES_FROM_EVENTS_SQL}),
        p AS (SELECT a.src AS x, b.dst AS z
              FROM edges a JOIN edges b ON a.dst = b.src
              WHERE a.src <> b.dst),
        cl AS (SELECT DISTINCT src AS cz, dst AS cx FROM edges),
        f AS (SELECT p.x, (cl.cz IS NOT NULL) AS closed
              FROM p LEFT JOIN cl ON cl.cz = p.z AND cl.cx = p.x)
        SELECT x, COUNT(*) AS n_path2,
               CAST(SUM(CASE WHEN closed THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_closed,
               CAST(FLOOR(1000000 * SUM(CASE WHEN closed THEN 1 ELSE 0 END)
                          / COUNT(*)) AS BIGINT) AS closure_e6
        FROM f GROUP BY x
    """
    out["corpus_curation"] = f"""
        WITH toks AS ({_TOKS}),
        stats AS (SELECT doc_id, COUNT(*) AS n_tokens,
                   CAST(FLOOR(1000000 * SUM(CASE WHEN tok IN {_STOPW}
                                            THEN 1 ELSE 0 END)
                              / COUNT(*)) AS BIGINT) AS stopword_e6
                  FROM toks GROUP BY doc_id),
        ls AS (SELECT doc_id,
                {_lang_scores_sql()}
               FROM toks GROUP BY doc_id),
        langs AS (SELECT doc_id,
                   {_lang_pred_sql()} AS pred_lang
                  FROM ls),
        hashed AS (SELECT doc_id, md5(text) AS h FROM documents),
        keepf AS (SELECT h, MIN(doc_id) AS keep_id FROM hashed GROUP BY h),
        flags AS (SELECT hashed.doc_id, keep_id FROM hashed JOIN keepf USING (h)),
        r AS (SELECT f.doc_id,
               CASE WHEN f.doc_id != f.keep_id THEN 'exact_dup'
                    WHEN l.pred_lang = 'und' THEN 'lang_unknown'
                    WHEN s.n_tokens < {text.CURATE_MIN_TOKENS} THEN 'too_short'
                    WHEN s.stopword_e6 < {text.CURATE_MIN_STOPWORD_E6}
                        THEN 'low_stopword'
                    ELSE 'kept' END AS reason
              FROM flags f JOIN stats s ON f.doc_id = s.doc_id
                           JOIN langs l ON f.doc_id = l.doc_id)
        SELECT doc_id, CAST(reason = 'kept' AS BIGINT) AS keep, reason
        FROM r
    """
    sig = _lsh_sig_sql(dims)
    out["lsh_signature"] = f"""
        SELECT vec_id, CAST({sig} AS BIGINT) AS sig FROM embeddings
    """
    bands = similarity.LSH_BANDS
    # derived band width (round 10): the Spark side sizes bits from
    # the corpus count; band b's key is hyperplanes [b·W, (b+1)·W) of
    # ONE wide signature, so the oracle precomputes the fixed-ceiling
    # signature and slices with the SQL-derived W
    _N_EMB_SQL = "SELECT COUNT(*) FROM embeddings"
    dbits = _lsh_bits_sql(_N_EMB_SQL)
    dmask = f"((CAST(1 AS BIGINT) << ({dbits})) - 1)"
    sig_all_d = _lsh_sig_sql_derived(dims, _N_EMB_SQL, bands=bands)
    out["embedding_near_dup_pairs"] = f"""
        WITH sigs AS (SELECT vec_id, {sig_all_d} AS sig
                      FROM embeddings),
        bx AS (SELECT vec_id, sig, unnest(range(0, {bands})) AS band
               FROM sigs),
        banded AS (SELECT vec_id, band,
                          (sig >> (band * ({dbits}))) & {dmask} AS bkey
                   FROM bx),
        cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
                 FROM banded x JOIN banded y
                   ON x.band = y.band AND x.bkey = y.bkey
                  AND x.vec_id < y.vec_id),
        ea AS (SELECT vec_id AS vec_a, embedding AS qe FROM embeddings),
        eb AS (SELECT vec_id AS vec_b, embedding AS ce FROM embeddings)
        SELECT vec_a, vec_b,
               CAST(FLOOR(10000 * ({_DOT}
                    / (sqrt({_SQ_SUM.format(col='qe')})
                       * sqrt({_SQ_SUM.format(col='ce')})))) AS BIGINT)
                   AS sim_e4
        FROM cand JOIN ea USING (vec_a) JOIN eb USING (vec_b)
        WHERE CAST(FLOOR(10000 * ({_DOT}
                   / (sqrt({_SQ_SUM.format(col='qe')})
                      * sqrt({_SQ_SUM.format(col='ce')})))) AS BIGINT) >= 0
    """
    # banded semantic pairs: same-cell AND any-band agreement (the knob
    # path with nprobe=1 — both directed probes collapse to one
    # symmetric join), then the exact thresholded cosine
    out["semantic_pairs_banded"] = f"""
        WITH {_IVF_CELLS_CTE},
        sigs AS (SELECT vec_id, {sig_all_d} AS sig
                 FROM embeddings),
        banded AS (SELECT vec_id, band,
                          (sig >> (band * ({dbits}))) & {dmask} AS bkey
                   FROM (SELECT vec_id, sig,
                                unnest(range(0, {bands})) AS band
                         FROM sigs)),
        keyed AS (SELECT b.vec_id, c.cell, b.band, b.bkey
                  FROM banded b JOIN cells c ON b.vec_id = c.vec_id),
        cand AS (SELECT DISTINCT LEAST(x.vec_id, y.vec_id) AS vec_a,
                        GREATEST(x.vec_id, y.vec_id) AS vec_b
                 FROM keyed x JOIN keyed y
                   ON x.cell = y.cell AND x.band = y.band
                  AND x.bkey = y.bkey AND x.vec_id <> y.vec_id),
        ea AS (SELECT vec_id AS vec_a, embedding AS qe FROM embeddings),
        eb AS (SELECT vec_id AS vec_b, embedding AS ce FROM embeddings)
        SELECT vec_a, vec_b,
               CAST(FLOOR(10000 * ({_DOT}
                    / (sqrt({_SQ_SUM.format(col='qe')})
                       * sqrt({_SQ_SUM.format(col='ce')})))) AS BIGINT)
                   AS sim_e4
        FROM cand JOIN ea USING (vec_a) JOIN eb USING (vec_b)
        WHERE CAST(FLOOR(10000 * ({_DOT}
                   / (sqrt({_SQ_SUM.format(col='qe')})
                      * sqrt({_SQ_SUM.format(col='ce')})))) AS BIGINT)
              >= {SEMANTIC_QUERY_MIN_SIM_E4}
    """
    # multi-probe semantic pairs (nprobe=2, single band): the directed
    # probed×primary join canonicalized by LEAST/GREATEST already
    # covers both directions (a probing b's home emits (a,b); b
    # probing a's emits (b,a) — same canonical pair), so one join
    # suffices where the engine unions two
    out["semantic_pairs_probed"] = f"""
        WITH {_IVF_CELLS_CTE},
        sigs AS (SELECT vec_id,
                        {_lsh_sig_sql_derived(dims, _N_EMB_SQL)} AS sig
                 FROM embeddings),
        ranked AS (SELECT vec_id, cid,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY s DESC, cid ASC)
                              AS rn
                   FROM cscored),
        probed AS (SELECT r.vec_id, r.cid AS cell, s.sig
                   FROM ranked r JOIN sigs s USING (vec_id)
                   WHERE rn <= 2),
        prim AS (SELECT r.vec_id, r.cid AS cell, s.sig
                 FROM ranked r JOIN sigs s USING (vec_id)
                 WHERE rn = 1),
        cand AS (SELECT DISTINCT LEAST(p.vec_id, q.vec_id) AS vec_a,
                        GREATEST(p.vec_id, q.vec_id) AS vec_b
                 FROM probed p JOIN prim q
                   ON p.cell = q.cell AND p.sig = q.sig
                  AND p.vec_id <> q.vec_id),
        ea AS (SELECT vec_id AS vec_a, embedding AS qe FROM embeddings),
        eb AS (SELECT vec_id AS vec_b, embedding AS ce FROM embeddings)
        SELECT vec_a, vec_b,
               CAST(FLOOR(10000 * ({_DOT}
                    / (sqrt({_SQ_SUM.format(col='qe')})
                       * sqrt({_SQ_SUM.format(col='ce')})))) AS BIGINT)
                   AS sim_e4
        FROM cand JOIN ea USING (vec_a) JOIN eb USING (vec_b)
        WHERE CAST(FLOOR(10000 * ({_DOT}
                   / (sqrt({_SQ_SUM.format(col='qe')})
                      * sqrt({_SQ_SUM.format(col='ce')})))) AS BIGINT)
              >= {SEMANTIC_QUERY_MIN_SIM_E4}
    """
    # decontam sizes its band width from the TRAIN side only, exactly
    # like similarity.semantic_decontaminate (round 10)
    _N_TRAIN_SQL = "SELECT COUNT(*) FROM train"
    tdbits = _lsh_bits_sql(_N_TRAIN_SQL)
    tdmask = f"((CAST(1 AS BIGINT) << ({tdbits})) - 1)"
    sig_all_t = _lsh_sig_sql_derived(dims, _N_TRAIN_SQL, bands=bands)
    out["semantic_decontam"] = f"""
        WITH train AS (SELECT * FROM embeddings WHERE vec_id % 4 <> 0),
        ev AS (SELECT * FROM embeddings WHERE vec_id % 4 = 0),
        tsigs AS (SELECT vec_id, {sig_all_t} AS sig
                  FROM train),
        esigs AS (SELECT vec_id, {sig_all_t} AS sig
                  FROM ev),
        tb AS (SELECT vec_id, band,
                      (sig >> (band * ({tdbits}))) & {tdmask} AS bkey
               FROM (SELECT vec_id, sig, unnest(range(0, {bands})) AS band
                     FROM tsigs)),
        eb AS (SELECT vec_id AS eval_id, band,
                      (sig >> (band * ({tdbits}))) & {tdmask} AS bkey
               FROM (SELECT vec_id, sig, unnest(range(0, {bands})) AS band
                     FROM esigs)),
        cand AS (SELECT DISTINCT tb.vec_id, eb.eval_id
                 FROM tb JOIN eb ON tb.band = eb.band
                                AND tb.bkey = eb.bkey),
        tq AS (SELECT vec_id, embedding AS qe FROM train),
        ec AS (SELECT vec_id AS eval_id, embedding AS ce FROM ev),
        scored AS (
            SELECT cand.vec_id, cand.eval_id,
                   CAST(FLOOR(10000 * ({_DOT}
                        / (sqrt({_SQ_SUM.format(col='qe')})
                           * sqrt({_SQ_SUM.format(col='ce')}))))
                        AS BIGINT) AS sim_e4
            FROM cand JOIN tq USING (vec_id) JOIN ec USING (eval_id)
        ),
        best AS (
            SELECT vec_id, eval_id AS matched_eval_id, sim_e4,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim_e4 DESC,
                                               eval_id ASC) AS rn
            FROM scored WHERE sim_e4 >= {SEMANTIC_QUERY_MIN_SIM_E4}
        )
        SELECT t.vec_id,
               CAST(b.vec_id IS NOT NULL AS BIGINT) AS contaminated,
               b.matched_eval_id, b.sim_e4
        FROM train t
        LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (vec_id)
    """
    # derived-width signatures (round 10): the Spark side sizes its
    # bucket width from the corpus count, so the oracle must too
    _N_EMB = "SELECT COUNT(*) FROM embeddings"
    qsig = _lsh_sig_sql_derived(dims, _N_EMB, col="qe")
    csig = _lsh_sig_sql_derived(dims, _N_EMB, col="ce")
    out["ann_topk_lsh"] = f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe,
                          CAST({qsig} AS BIGINT) AS qsig
                   FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS nid, embedding AS ce,
                     CAST({csig} AS BIGINT) AS csig
              FROM embeddings),
        scored AS (
            SELECT qid, nid,
                   {_DOT}
                   / (sqrt({_SQ_SUM.format(col='qe')})
                      * sqrt({_SQ_SUM.format(col='ce')})) AS sim
            FROM q JOIN c ON qsig = csig AND qid <> nid
        ),
        ranked AS (
            SELECT qid, nid, sim,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY sim DESC, nid ASC) AS rank
            FROM scored
        )
        SELECT qid, nid, rank,
               CAST(FLOOR(10000 * sim) AS BIGINT) AS sim_e4
        FROM ranked WHERE rank <= 3
    """
    from .operators import passages as _passages

    # bits=None → the oracle derives the width from the corpus count
    # like the Spark operator does (round 10, sf1 gate)
    out["semantic_dedup_clusters"] = _semantic_dedup_oracle(dims)
    # round 12: the projected twin — same clustering SQL regenerated
    # over the JL-projected vectors (pe CTE), stand-in quantizer
    out["semantic_dedup_projected"] = _semantic_dedup_projected_oracle(
        dims, similarity.PROJECT_DIMS, SEMANTIC_QUERY_MIN_SIM_E4
    )
    # round 8: the streaming-snapshot twin shares the clustering oracle
    # — fold + compaction + marker-pruned serving must land on the
    # same clusters an independent engine derives from raw parquet.
    # Width is the EXPLICIT fold pin (the registered folds pass
    # bits=LSH_BITS), never corpus-derived: a pinned stream serves at
    # its stored width at any sf (round 10 — the batch oracle now
    # derives, so the twins' oracles part ways above the floor)
    out["semantic_snapshot_compacted"] = _semantic_dedup_oracle(
        dims, bits=LSH_BITS
    )
    # round 9: the re-banded twin's oracle is the SAME clustering SQL
    # regenerated at the migration width — the snapshot that folded at
    # 8 bits, re-banded, and kept folding must match batch-at-9-bits
    out["semantic_snapshot_rebanded"] = _semantic_dedup_oracle(
        dims, bits=SEMANTIC_REBAND_BITS
    )
    out["cluster_update_incremental"] = _near_dup_clusters_oracle()
    out["doc_canonical_longest"] = f"""
        WITH cl AS ({_near_dup_clusters_oracle()}),
        s AS (SELECT doc_id, len(string_split(text, ' ')) AS score
              FROM documents),
        r AS (SELECT cl.doc_id, cl.cluster_id,
                     row_number() OVER (PARTITION BY cl.cluster_id
                                        ORDER BY s.score DESC,
                                                 cl.doc_id ASC) AS rn
              FROM cl JOIN s USING (doc_id))
        SELECT doc_id, cluster_id,
               CAST(rn = 1 AS BIGINT) AS is_canonical
        FROM r
    """
    out["doc_passage_cuts"] = _passages.passage_cuts_oracle_sql(
        window=_passages.configured_window()
    )
    out["doc_passage_decontam"] = _passages.decontam_passage_oracle_sql(
        train_sql=(
            "SELECT doc_id, text FROM documents"
            f" WHERE doc_id % {DECONTAM_EVAL_MOD} <> 0"
        ),
        eval_sql=(
            "SELECT doc_id, text FROM documents"
            f" WHERE doc_id % {DECONTAM_EVAL_MOD} = 0"
        ),
    )
    out["doc_passage_cuts_incremental"] = f"""
        SELECT doc_id, span_start, span_end
        FROM ({_passages.passage_cuts_oracle_sql()})
        WHERE doc_id >= {PASSAGE_INGEST_SPLIT}
    """
    out["doc_passage_dedup"] = f"""
        WITH pd AS ({_passages.passage_dedup_oracle_sql()})
        SELECT doc_id, md5(text) AS clean_md5, n_spans_cut, n_tokens_cut
        FROM pd
    """
    return out
