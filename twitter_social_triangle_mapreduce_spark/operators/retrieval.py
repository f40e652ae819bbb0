"""Text-retrieval scoring over ``documents``: BM25 ranking for a fixed
query-term set — the relevance-scoring stage of a corpus pipeline (score
documents against a probe query, keep the top-k; at training-data scale
the same shape scores documents against quality-probe term lists).

Engine-exactness contract (stricter than the usual float tolerance): the
whole score expression is built ONCE as SQL text (``bm25_score_sql``) and
evaluated verbatim by BOTH engines — Spark via ``F.expr``, DuckDB via the
registered oracle. Every input is an exact BIGINT aggregate, every
operation is +, -, *, / on doubles (correctly-rounded IEEE 754, so
bit-identical across engines for identical expression trees), and the
term contributions are summed in fixed textual order — no SUM() over
floats whose addition order could differ between engines. The final
``floor(1e6·score)`` BIGINT therefore hash-matches exactly.

The idf is the log-free rational Robertson form
``(N - df + 0.5) / (df + 0.5)`` rather than its logarithm: ``ln`` is the
one operation IEEE does NOT require to be correctly rounded, so two
engines' libm may disagree in the last ulp and a floor'd score could
flip. The rational idf is strictly monotone in ``df`` exactly like the
log form (the log is a monotone transform), so per-term document
ordering is identical; swapping ``ln(...)`` into ``bm25_score_sql`` is a
one-line change where cross-engine bit-equality is not required.

Scale shape (100 TB): one exploded-token shuffle to per-doc features
(partial-agg combines term counts map-side), one tiny global aggregate
(a single row: N, total length, per-term document frequencies)
broadcast back, then an embarrassingly parallel projection and a
``TakeOrdered`` top-k — no join on anything large, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens

#: Okapi BM25 defaults
BM25_K1 = 1.2
BM25_B = 0.75

#: default probe query for the registered demo query (terms occur in the
#: testdata vocabulary; any term list works)
DEFAULT_QUERY_TERMS: tuple[str, ...] = ("hash", "join", "stream")

DEFAULT_TOPK = 20


def bm25_score_sql(
    n_terms: int, k1: float = BM25_K1, b: float = BM25_B
) -> str:
    """The shared BM25 score expression over columns ``dl``, ``tf_{i}``,
    ``n_docs``, ``total_len``, ``df_{i}`` — identical text for Spark and
    DuckDB (see module docstring for why that guarantees bit-equality).

    Per term i::

        idf_i  = (N - df_i + 0.5) / (df_i + 0.5)          -- rational idf
        tfc_i  = tf_i·(k1+1) / (tf_i + k1·(1-b + b·dl/avgdl))
        score  = Σ_i idf_i · tfc_i

    ``dl/avgdl`` is expanded to ``dl·N/total_len`` so both engines
    evaluate the same three-operand chain.
    """
    terms = []
    for i in range(n_terms):
        idf = (
            f"(CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df_{i} AS DOUBLE) + 0.5)"
        )
        tfc = (
            f"(CAST(tf_{i} AS DOUBLE) * {k1 + 1!r})"
            f" / (CAST(tf_{i} AS DOUBLE) + {k1!r} * ({1.0 - b!r}"
            f" + {b!r} * CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)"
            f" / CAST(total_len AS DOUBLE)))"
        )
        terms.append(f"({idf}) * ({tfc})")
    return " + ".join(terms)


def term_doc_features(
    documents: DataFrame, terms: tuple[str, ...]
) -> DataFrame:
    """(doc_id, dl, tf_0..tf_{n-1}) — document length and per-query-term
    frequencies in one pass over the exploded tokens. The pivot to fixed
    columns (rather than a tall (doc, term, tf) relation) is what makes
    the downstream float sum order-deterministic."""
    t = tokens(documents)
    return t.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == term, 1).otherwise(0)).alias(
                f"tf_{i}"
            )
            for i, term in enumerate(terms)
        ],
    )


def bm25_topk(
    documents: DataFrame,
    terms: tuple[str, ...] = DEFAULT_QUERY_TERMS,
    k: int = DEFAULT_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, score_e6) — top ``k`` documents by BM25 against the fixed
    query ``terms``, deterministic total order (score desc, doc_id asc).

    The corpus statistics join is a broadcast of ONE row; everything else
    is a projection, so the plan is scan → partial/final agg → broadcast
    nested loop (1 row) → project → TakeOrdered.
    """
    feats = term_doc_features(documents, terms)
    stats = corpus_stats(feats, len(terms))
    score = bm25_score_sql(len(terms), k1=k1, b=b)
    return (
        feats.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                f"CAST(FLOOR(1000000 * ({score})) AS BIGINT)"
            ).alias("score_e6"),
        )
        .orderBy(F.col("score_e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def corpus_stats(feats: DataFrame, n_terms: int) -> DataFrame:
    """One-row corpus statistics (N, total length, per-term document
    frequencies) from the per-doc feature relation."""
    return feats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(
                f"df_{i}"
            )
            for i in range(n_terms)
        ],
    )


def bm25_oracle_sql(
    toks_sql: str,
    terms: tuple[str, ...] = DEFAULT_QUERY_TERMS,
    k: int = DEFAULT_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin of ``bm25_topk``; ``toks_sql`` is the shared
    tokenizer SQL (``SELECT doc_id, ... AS tok``). The score expression
    comes from the SAME ``bm25_score_sql`` the Spark side evaluates."""
    tf_cols = ", ".join(
        f"SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    score = bm25_score_sql(len(terms), k1=k1, b=b)
    return f"""
        WITH toks AS ({toks_sql}),
        feats AS (SELECT doc_id, COUNT(*) AS dl, {tf_cols}
                  FROM toks GROUP BY doc_id),
        stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len,
                         {df_cols}
                  FROM feats)
        SELECT doc_id,
               CAST(FLOOR(1000000 * ({score})) AS BIGINT) AS score_e6
        FROM feats, stats
        ORDER BY score_e6 DESC, doc_id ASC
        LIMIT {k}
    """
