"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted via Arrow-batched ``mapInPandas``.

The image/audio codec libraries are not available in this environment, so
the decode step is STUBBED: ``decode_media_features`` computes a
deterministic fake feature vector (first bytes + length + digest prefix)
behind the same batch-shaped UDF signature a real decoder would use. The
Spark-side plumbing — schema, partition sizing, Arrow batch flow, output
contract — is real and tested; swap ``_fake_decode`` for a PIL/ffmpeg call
to productionize.

Scale notes: media rows are wide (MBs); ``media_table`` repartitions by
doc_id so a 100 TB corpus spreads evenly, and the UDF streams Arrow
batches (bounded memory) instead of collecting rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("first_byte", LongType(), False),
        StructField("digest8", StringType(), False),
    ]
)


def media_table(documents: DataFrame) -> DataFrame:
    """Derive a synthetic media table from ``documents``: the UTF-8 bytes
    of ``text`` stand in for an encoded image/audio payload (opaque binary
    + typed metadata — the real pipeline ingests these from object
    storage)."""
    return documents.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/png"))
        .otherwise(F.lit("audio/wav"))
        .alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def media_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, media_type, n_bytes) — payload metadata computed JVM-side
    (no UDF): the cheap pre-filter a pipeline runs before decode."""
    m = media_table(documents)
    return m.select(
        "doc_id", "media_type", F.octet_length("payload").cast("long").alias("n_bytes")
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("out_bytes", LongType(), False),
        StructField("out_digest8", StringType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_bytes", LongType(), False),
        StructField("frame_digest8", StringType(), False),
    ]
)


def resize_media(documents: DataFrame, max_bytes: int = 64) -> DataFrame:
    """Resize/re-encode stub over ``mapInPandas``: a real implementation
    would decode, scale, and re-encode; the deterministic stand-in
    truncates the payload to ``max_bytes`` and emits size + digest of the
    result. Batch shape (one row in → one row out) and bounded memory are
    the production contract."""
    m = media_table(documents)

    def resize_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            out = pdf["payload"].map(lambda b: bytes(b)[:max_bytes])
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_bytes": out.map(len),
                    "out_digest8": out.map(
                        lambda b: hashlib.md5(b).hexdigest()[:8]
                    ),
                }
            )

    return m.mapInPandas(resize_batches, RESIZED_SCHEMA)


def sample_frames(
    documents: DataFrame, frame_bytes: int = 32, stride: int = 4
) -> DataFrame:
    """Frame-sampling stub: treat the payload as consecutive
    ``frame_bytes`` chunks (video frames) and emit every ``stride``-th one
    — the one-to-many ``mapInPandas`` shape (a row fans out to N frame
    rows inside the Arrow batch, never materializing all frames driver-
    side). Real video decode would replace the slicing."""
    m = media_table(documents)

    def frame_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_digest8": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, stride):
                    fr = b[idx * frame_bytes : (idx + 1) * frame_bytes]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_bytes"].append(len(fr))
                    rows["frame_digest8"].append(
                        hashlib.md5(fr).hexdigest()[:8]
                    )
            yield _pd.DataFrame(rows)

    return m.mapInPandas(frame_batches, FRAME_SCHEMA)


def decode_media_features(documents: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the media table via
    ``mapInPandas`` — the real multimodal UDF shape: one pandas batch in,
    one batch out, bounded memory, schema declared up front.

    The decode step is a STUB (no PIL/ffmpeg in this container): a
    deterministic fake — (byte length, first byte, md5 prefix) — stands in
    for decoded dimensions / duration / features. The closure is fully
    self-contained (no module-level references) so cloudpickle ships it by
    value and Python workers never need this package on their import path.
    """
    m = media_table(documents).repartition("doc_id")

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def fake_decode(payload: bytes) -> tuple[int, int, str]:
            # swap for the real codec call to productionize
            return (
                len(payload),
                payload[0] if payload else -1,
                hashlib.md5(payload).hexdigest()[:8],
            )

        for pdf in batches:
            feats = pdf["payload"].map(fake_decode)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": feats.map(lambda t: t[0]),
                    "first_byte": feats.map(lambda t: t[1]),
                    "digest8": feats.map(lambda t: t[2]),
                }
            )

    return m.mapInPandas(decode_batches, FEATURE_SCHEMA)


def media_dedup_exact(documents: DataFrame) -> DataFrame:
    """(payload_hash, keep_doc_id, n_copies, media_type) — exact
    duplicate detection over the OPAQUE BINARY payload: md5 of the raw
    bytes (no decode), canonical = lowest doc_id, per media type. The
    binary twin of ``dedup.exact_dedup_groups`` — at 100 TB this is the
    first pass over any crawled media corpus (hashes shuffle, payloads
    never do: the aggregate carries the 16-byte digest + key only)."""
    m = media_table(documents)
    return (
        m.select(
            "doc_id",
            "media_type",
            F.unhex(F.md5(F.col("payload"))).alias("__h"),
        )
        .groupBy("media_type", "__h")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(
            F.lower(F.hex("__h")).alias("payload_hash"),
            "keep_doc_id",
            "n_copies",
            "media_type",
        )
    )


MEDIA_DEDUP_ORACLE = """
    WITH m AS (SELECT doc_id,
                      CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                           ELSE 'audio/wav' END AS media_type,
                      -- DuckDB md5 takes VARCHAR; the payload IS the
                      -- UTF-8 encoding of text, so md5(text) hashes
                      -- the identical bytes the Spark side hashes
                      md5(text) AS payload_hash
               FROM documents)
    SELECT payload_hash, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies, media_type
    FROM m GROUP BY media_type, payload_hash
"""
