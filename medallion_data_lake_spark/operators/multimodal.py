"""Multimodal columns: opaque binary payloads + typed metadata (north star).

Design (SURVEY.md §7.2 M4): image/audio/video content is an opaque
``BinaryType`` column with a typed metadata struct (schemas.MEDIA). The
JVM never interprets the bytes; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched pandas functions over
``mapInPandas`` — the one place Python is genuinely unavoidable.

The heavy codecs (PIL/cv2/librosa) are NOT in this container, so the
decode kernels are gated behind import-tries with a deterministic fake
fallback (clearly marked). Everything Spark-side — schema, partitioning,
UDF signatures, Arrow batch shapes — is real and tested; swapping the
fake for a real codec changes no plan.

Scale notes (100 TB of media):
- binary payloads dominate row size → keep metadata in separate columns
  so metadata-only queries never read the blob (parquet column pruning),
- partition by (modality, ingest_date); decode fan-out is embarrassingly
  parallel (mapInPandas, no shuffle),
- content addressing (sha256) enables exact dedup of media with the same
  hash-groupBy as document dedup (operators/../queries/dedup.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Real decoders when available; deterministic fake otherwise.
try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _real_decode_enabled() -> bool:
    """Real decode is opt-in via MDLS_REAL_DECODE=1 (checked per batch so
    executors pick up the env they were launched with)."""
    import os

    return os.environ.get("MDLS_REAL_DECODE", "") == "1"


def _pil_decode(payload: bytes):  # pragma: no cover - PIL absent here
    """Decode with Pillow; None on failure (caller falls back to fake)."""
    import io

    try:
        with Image.open(io.BytesIO(payload)) as img:
            width, height = img.size
            channels = len(img.getbands())
            gray = img.convert("L")
            hist = gray.histogram()
            n = sum(hist) or 1
            mean = round(sum(i * c for i, c in enumerate(hist)) / n / 255.0, 6)
        return width, height, channels, mean
    except Exception:
        return None


def attach_content_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Content-address a binary column: sha256 + byte length.

    Pure JVM expressions — no Python in this step, so it runs at full
    codegen speed over 100 TB of blobs.
    """
    return df.withColumn(
        "content_sha256", F.lower(F.sha2(F.col(content_col), 256))
    ).withColumn("byte_len", F.octet_length(F.col(content_col)).cast("long"))


# Output schema of the decode step (one row per media item).
DECODED_META = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for an image decoder.

    Derives stable pseudo-dimensions and a mean-intensity from the
    content hash — NOT a real decode (the codec libraries are absent
    here); replace with PIL/cv2 in production. Determinism keeps the
    Spark-side plumbing fully testable.
    """
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192          # 64..255
    height = 64 + h[1] % 192
    channels = 3
    mean = round(sum(h[:16]) / 16 / 255.0, 6)
    return width, height, channels, mean


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (media_id, modality, content) → DECODED_META rows.

    Arrow-batched: each ``pd.DataFrame`` is one Arrow batch; per-row
    Python cost is amortized across the batch. Real decoders slot into
    the marked branch.
    """
    for pdf in batches:
        rows = []
        for media_id, modality, content in zip(
            pdf["media_id"], pdf["modality"], pdf["content"]
        ):
            payload = bytes(content) if content is not None else b""
            decoded = None
            # Real decode is an explicit opt-in (MDLS_REAL_DECODE=1), not
            # triggered by mere library presence: the fixtures carry
            # synthetic payloads, so installing Pillow must not flip a
            # passing pipeline into decode errors. Failed decodes fall
            # back to the deterministic fake rather than poisoning the
            # batch (quarantine-by-default, like the bronze JSON path).
            if _real_decode_enabled() and _HAS_PIL and modality == "image":
                decoded = _pil_decode(payload)  # pragma: no cover
            if decoded is not None:  # pragma: no cover
                w, h, c, mean = decoded
                decoder = "pil"
            else:
                w, h, c, mean = _fake_decode(payload)
                decoder = "fake-sha256"
            rows.append((int(media_id), str(modality), w, h, c, mean, decoder))
        yield pd.DataFrame(
            rows,
            columns=[
                "media_id", "modality", "width", "height",
                "n_channels", "mean_intensity", "decoder",
            ],
        )


def decode_media(df: DataFrame) -> DataFrame:
    """Distributed decode: no shuffle, one Arrow pass per partition."""
    return df.select("media_id", "modality", "content").mapInPandas(
        decode_media_batch, schema=DECODED_META
    )


FRAME_SAMPLE = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def sample_frames_batch(n_frames: int):
    """mapInPandas kernel factory: pseudo frame-sampling (1 row → n rows).

    Demonstrates the expanding (1:N) batch shape video frame-sampling
    needs; the frame "content" is a content-derived hash stand-in for the
    same container-availability reason as ``_fake_decode``.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                for i in range(n_frames):
                    digest = hashlib.sha256(payload + i.to_bytes(4, "big")).hexdigest()
                    rows.append((int(media_id), i, digest))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha256"])

    return kernel


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    return df.select("media_id", "content").mapInPandas(
        sample_frames_batch(n_frames), schema=FRAME_SAMPLE
    )
