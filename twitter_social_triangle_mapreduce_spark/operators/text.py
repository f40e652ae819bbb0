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

#: tiny per-language marker lists for the n-gram/stopword language
#: heuristic (deterministic, oracle-reproducible; real lists would be
#: larger but the operator shape is identical)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "und"),
    "es": ("el", "la", "de"),
    "fr": ("le", "la", "et"),
}

#: stopword list for the quality score
STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in")


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-document quality metrics: token count, distinct tokens,
    type-token ratio, mean token length, stopword ratio — the standard
    cheap quality-filter features.

    One pass over exploded tokens with partial aggregation; ratios are
    ``floor(1e6·r)`` BIGINT for engine-exact comparison."""
    t = tokens(documents)
    return t.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct(F.col("tok")).alias("n_types"),
        F.floor(
            1000000 * F.count_distinct(F.col("tok")) / F.count(F.lit(1))
        )
        .cast("long")
        .alias("ttr_e6"),
        F.floor(1000000 * F.sum(F.length("tok")) / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_tok_len_e6"),
        F.floor(
            1000000
            * F.sum(F.when(F.col("tok").isin(*STOPWORDS), 1).otherwise(0))
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("stopword_e6"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """(doc_id, pred_lang) — marker-word language heuristic: count marker
    hits per language over the token stream; predict the language with the
    most hits (ties broken by language code order, 'und' when no marker
    hits at all). Deterministic and SQL-reproducible."""
    t = tokens(documents)
    scores = t.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("tok").isin(*ws), 1).otherwise(0)).alias(
                f"s_{lang}"
            )
            for lang, ws in sorted(LANG_MARKERS.items())
        ]
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
