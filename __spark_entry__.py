"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``twitter_social_triangle_mapreduce_spark``;
this module is the thin registry adapter. ``queries()`` exposes EXACTLY
50 entries: the driver records at most 50 correctness rows (round 1: a
51st registered query was silently dropped). Lower-marginal-signal
queries (``sessionize_native``; since round 4 also ``ivf_cells`` and
``ann_topk_ivf2``, rotated out for the passage-dedup and semantic-dedup
flagships; since round 6 also ``media_resize`` rotated out for
``ivf_cells_trained`` — the trained-codebook assignment
driver-hash-checked end to end — and ``value_histogram`` rotated out
for ``bpe_pair_counts``, driver-gating the tokenizer-training tier)
stay fully hash-oracled in the pytest tier
(``registry.all_queries(include_extra=True)``).

Round 7 rotation: ``doc_rolling_hash`` → pytest tier (it is an
intermediate of the driver-gated passage-cut pipeline, so its marginal
driver signal was the lowest) in favor of ``semantic_decontam`` — the
embedding-tier decontamination flagship (cross-set banded-LSH
candidates + exact-cosine threshold) is now driver-hash-gated.

Round 8 rotation: ``media_frames`` → pytest tier (it shares
``media_features``' decode-ladder plumbing, so its marginal driver
signal was the lowest) in favor of ``ann_topk_snapshot`` — the
streaming ANN path (ingest folds + compaction + marker-pruned
serving) is now driver-hash-gated against the same independent
cells+cosine SQL as the batch IVF query.

Round 9 rotation: ``lsh_signature`` → pytest tier (the signature
scalar is the shared intermediate of the driver-gated
``ann_topk_lsh`` / ``embedding_near_dup_pairs`` / ``semantic_*``
queries, so its marginal driver signal was the lowest) in favor of
``semantic_snapshot_compacted`` — the semantic STREAMING path
(range-split folds + embs-store compaction + snapshot serving) is now
driver-hash-gated against the same DuckDB clustering oracle as the
batch query; it exercises the generalized compactor whose
crash-after-flip window round 9 closed.

Round 10 rotation: ``embedding_near_dup_pairs`` → pytest tier (the
raw banded-LSH pair listing is wholly contained in the driver-gated
``semantic_dedup_clusters`` / ``semantic_decontam`` /
``semantic_snapshot_*`` pipelines, so its marginal driver signal was
the lowest) in favor of ``semantic_snapshot_rebanded`` — the
mid-stream WIDTH MIGRATION (folds pinned at the 8-bit floor →
``reband_semantic_store`` to 9 bits → a post-migration fold) is now
driver-hash-gated against the DuckDB clustering oracle regenerated
entirely at the new width.

Round 11 rotation: ``embedding_norms`` → pytest tier (the norm fold is
the shared intermediate of EVERY driver-gated cosine query —
bruteforce, LSH, IVF, the semantic pipelines — so its marginal driver
signal was the lowest) in favor of ``ann_topk_projected`` — the
Johnson–Lindenstrauss dimensionality-reduction tier (±1 md5-parity
projection folded into the scan, then exact scoring in the projected
space) is now driver-hash-gated against a DuckDB twin that recomputes
the projection term-for-term.

Round 12 rotation: ``token_topk`` → pytest tier (its tokens → count →
order/limit chain is wholly contained in the new gate's vocabulary
pass plus the other driver-gated ordered queries, so its marginal
driver signal was the lowest) in favor of ``unigram_logprob_gate`` —
the per-source bottom-p% cut on the corpus-LM unigram score (the
CCNet-style curation stage: coarse-bucket re-scaling of the negative
score domain + the histogram quota walk, so the cut never sorts the
corpus) is now driver-hash-gated end to end. The round's other new
gated query, ``semantic_dedup_projected`` (the SemDeDup pipeline run
in the JL-projected space), is hash-oracled in the pytest tier.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this file from any cwd; make the package importable
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from twitter_social_triangle_mapreduce_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: repartition-join directed-triangle count
    (the reference's SocialTriangle_RS) on sf0.001."""
    return registry.q_social_triangle_rs(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    return registry.all_oracles()
