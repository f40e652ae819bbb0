"""Deduplication operators over the ``documents`` table — the training-data
pipeline surface: exact (content-hash), MinHash+LSH near-dup, SimHash
fingerprints, and n-gram Jaccard pairs.

Portability contract: every hash is ``md5`` (identical lowercase hex in
Spark and DuckDB) and every ratio is emitted as ``floor(1e6 * a / b)``
BIGINT so the DuckDB oracle reproduces values bit-exactly (no float
round-half ambiguity).

Scale design: everything is expression-level (whole-stage codegen, no
Python UDFs). The LSH pipeline is the standard shingle → minhash →
band-bucket → bucket-join shape: candidate generation joins on
``(band, band_signature)`` — shuffle keyed on small hashes, never the
quadratic doc×doc space. At 100 TB the band join is the only shuffle whose
size depends on collision rate, which the (num_hashes, band_size) knobs
control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: word-level shingle width for MinHash / Jaccard
SHINGLE_N = 3
#: number of minhash permutations (md5 salt 0..NUM_HASHES-1)
NUM_HASHES = 8
#: rows per LSH band (NUM_HASHES/BAND_SIZE bands)
BAND_SIZE = 2


def tokens(documents: DataFrame) -> DataFrame:
    """(doc_id, tok) — whitespace tokenization, one row per occurrence."""
    return documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )


def shingles(documents: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, sh) — overlapping word ``n``-shingles, one row per
    occurrence. Docs shorter than ``n`` words produce no shingles (the
    oracle applies the same guard)."""
    ws = documents.select("doc_id", F.split("text", " ").alias("ws")).where(
        F.size("ws") >= n
    )
    return ws.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(ws) - {n - 1}),"
                f" i -> array_join(slice(ws, i, {n}), ' '))"
            )
        ).alias("sh"),
    )


def exact_dedup_groups(documents: DataFrame) -> DataFrame:
    """Exact dedup via content hash: one row per distinct content with the
    canonical (minimum) doc_id and the duplicate count. The hash-groupBy
    shape scales to any corpus: shuffle keyed on the 128-bit digest."""
    return (
        documents.select("doc_id", F.md5(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_bands(documents: DataFrame) -> DataFrame:
    """(doc_id, band, bh) — the LSH band signatures.

    minhash_i(doc) = min over shingles of md5(shingle || '#' || i); the
    band signature concatenates its BAND_SIZE minhashes in hash-index
    order. Lexicographic min over hex digests is a valid uniform minhash
    (md5 is the random permutation)."""
    sh = shingles(documents)
    hs = sh.select(
        "doc_id",
        "sh",
        F.explode(F.sequence(F.lit(0), F.lit(NUM_HASHES - 1))).alias("hi"),
    )
    sig = hs.groupBy("doc_id", "hi").agg(
        F.min(
            F.md5(F.concat(F.col("sh"), F.lit("#"), F.col("hi").cast("string")))
        ).alias("mh")
    )
    return (
        sig.groupBy("doc_id", F.expr(f"hi div {BAND_SIZE}").alias("band"))
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(hi, mh))),"
                " x -> x.mh), '|')"
            ).alias("bh")
        )
    )


def minhash_candidate_pairs(documents: DataFrame) -> DataFrame:
    """(doc_a, doc_b) — near-duplicate candidates: pairs sharing at least
    one LSH band bucket. The join is keyed on (band, signature) — never a
    doc×doc cross product."""
    b = minhash_bands(documents)
    a = b.alias("a")
    c = b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash16(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 16-bit SimHash over token md5s.

    Bit j of the fingerprint is set iff Σ_tokens (±1 by bit j of the
    token's md5) is strictly positive. The 16 bits come from the first 4
    hex chars of the digest (4 bits each); all arithmetic is integer, so
    the oracle reproduces it exactly."""
    t = tokens(documents).withColumn("h4", F.substring(F.md5("tok"), 1, 4))
    bits = t.select(
        "doc_id",
        "h4",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit"),
    ).select(
        "doc_id",
        "bit",
        # nibble value of hex char (bit div 4), then extract bit (bit % 4)
        F.expr(
            "shiftright(instr('0123456789abcdef',"
            " substr(h4, 1 + (bit div 4), 1)) - 1, bit % 4) % 2"
        ).alias("b"),
    )
    per_bit = bits.groupBy("doc_id", "bit").agg(
        F.sum(F.col("b") * 2 - 1).alias("s")
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.expr(
                "CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), bit)"
                " ELSE 0 END"
            )
        )
        .cast("long")
        .alias("simhash")
    )


def ngram_jaccard_pairs(
    documents: DataFrame, min_common: int = 2
) -> DataFrame:
    """(doc_a, doc_b, common, jaccard_e6) — n-gram Jaccard similarity via
    an inverted-index join on distinct shingles (the scalable shape: join
    keyed on shingle, aggregate per pair; never doc×doc).

    jaccard_e6 = floor(1e6 * |A∩B| / |A∪B|) — integer output, exact in
    both engines."""
    sh = shingles(documents).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= min_common)
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "common",
            F.floor(
                1000000
                * F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
            )
            .cast("long")
            .alias("jaccard_e6"),
        )
    )
