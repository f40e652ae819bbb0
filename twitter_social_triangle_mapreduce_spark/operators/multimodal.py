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
