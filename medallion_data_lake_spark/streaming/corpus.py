"""Incremental corpus ingestion with cross-batch dedup.

A training corpus is not loaded once — it accrues (crawl drops, vendor
deliveries, user uploads). This module ingests document drops as a
file-source stream and admits only content never seen before, keeping a
compact fingerprint LEDGER (fingerprint, batch id) alongside the corpus
so dedup against ALL history is one anti-join against the ledger — the
corpus itself (with its text/blob payload) is never re-read for dedup.

Exactly-once without a transaction log: both corpus and ledger are
written with dynamic partition-overwrite keyed by the micro-batch id,
so a replayed batch rewrites exactly its own partition — idempotent by
construction. The ledger read for the anti-join EXCLUDES the current
batch id, so a replay does not see its own previous partial write and
drop everything (the failure mode of a naive append).

Scale: per batch, work = fingerprint map over the new docs + one
anti-join keyed on fingerprint. The ledger is (md5, long) — ~40 B/doc,
so a 100-billion-doc history is a few TB of parquet, shuffled only on
its compact key. Production upgrades, same plan: bucket the ledger by
fingerprint (zero-shuffle anti-join), or Delta + bloom-filter data
skipping. Near-dup admission control composes the same way: run
``queries.dedup.signatures`` on admitted docs and LSH them against a
signature ledger.

The reference has no incremental ingestion at all (its loads are
overwrite-the-world batch — ``bronze_to_silver.py``); this is the
north-star upgrade for corpus workflows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def content_fingerprint(text_col: str = "text") -> F.Column:
    """Whitespace-normalized, case-folded md5 — same normalization as
    the batch exact-dedup family (queries/dedup.py)."""
    return F.md5(F.lower(F.regexp_replace(text_col, r"\s+", " ")))


def admit_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus_dir: str,
    ledger_dir: str,
    chunks_dir: str | None = None,
    chunk_tokens: int = 64,
    chunk_stride: int = 48,
) -> None:
    """Process one micro-batch: fingerprint, dedup within the batch,
    anti-join the historical ledger, write admitted docs + ledger rows
    into the batch's own partitions (idempotent on replay). With
    ``chunks_dir`` the batch's admitted docs are also windowed into
    training chunks (operators.curation_pipeline.chunk_documents) and
    written under the same batch-id partition — chunks accrue
    incrementally with the corpus and replay rewrites exactly the
    batch's own chunk partition."""
    spark = batch_df.sparkSession
    fp = (
        batch_df.withColumn("fingerprint", content_fingerprint())
        # within-batch dedup: deterministic min-id winner per content
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("fingerprint").orderBy("doc_id")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if os.path.isdir(ledger_dir):
        seen = (
            spark.read.parquet(ledger_dir)
            # a replayed batch must not anti-join its own partial write
            .filter(F.col("_batch_id") != F.lit(batch_id))
            .select("fingerprint")
        )
        fp = fp.join(seen, "fingerprint", "left_anti")
    admitted = fp.withColumn("_batch_id", F.lit(batch_id))
    (
        admitted.drop("fingerprint")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(corpus_dir)
    )
    (
        admitted.select("fingerprint", "_batch_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(ledger_dir)
    )
    if chunks_dir is not None:
        from ..operators.curation_pipeline import chunk_documents

        (
            chunk_documents(
                admitted.drop("fingerprint", "_batch_id"),
                chunk_tokens=chunk_tokens,
                chunk_stride=chunk_stride,
            )
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(chunks_dir)
        )


def run_incremental_corpus_ingest(
    spark: SparkSession,
    input_dir: str,
    corpus_dir: str,
    ledger_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    chunks_dir: str | None = None,
):
    """Stream JSON-lines document drops from ``input_dir`` into a
    deduplicated corpus. ``available_now`` bounds the run to the files
    present (exactly-once catch-up); pass False for a continuous
    ingester. ``chunks_dir`` additionally materializes training chunks
    per admitted batch. Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "64")
        .json(input_dir)
    )
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: admit_batch(df, bid, corpus_dir, ledger_dir,
                                    chunks_dir=chunks_dir)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
