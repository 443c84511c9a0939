"""Bronze → silver conform rules (rule-driven, declarative).

Reproduces the reference's cleaning semantics
(reference ``sakila-data-lake/bronze_to_silver.py:73-120``) as a data-driven
rule table instead of four hand-written functions:

- flatten the ``data`` envelope struct (P1, reference ``:75``),
- re-impose types stringly-typed by JSON transit (P4, ``:79,89-93,103``),
- normalize strings — ``UPPER(TRIM(email))`` kept as-is for parity
  (``:76``; SURVEY.md §7.5), ``TRIM(title)`` (``:88``),
- clamp negative money to 0 — a defined cleaning rule, not a bug fix
  (``:103``; SURVEY.md §7.5),
- deterministic dedup by primary key (P7): the reference's
  ``dropDuplicates`` keeps an arbitrary row (``:80``); we keep the row
  with the **latest envelope timestamp** (ties → greatest operation,
  stable) so replays and repartitioning can't change the result
  (SURVEY.md §7.4.4),
- drop rows with null required columns (P6, ``:81,96,107,118``),
- stamp ``processed_at`` / ``processed_date`` audit columns (``:69-71``).

Scale: every rule is a narrow map-side expression except dedup, which
shuffles once on the PK — the same shuffle any keyed upsert needs. At
100 TB the input should arrive partitioned by ingest date so the conform
job streams partition-by-partition (availableNow in sources/stream.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ConformRule:
    """Declarative cleaning spec for one silver table."""

    table: str
    pk: str                                  # dedup key
    required: tuple[str, ...]                # null → row dropped
    casts: dict[str, str] = field(default_factory=dict)          # col -> spark type
    boolish: tuple[str, ...] = ()            # true/1/yes-style flags -> int 0/1
    timestamps: tuple[str, ...] = ()         # to_timestamp conversions
    trim: tuple[str, ...] = ()               # TRIM
    upper: tuple[str, ...] = ()              # UPPER(TRIM(...))
    clamp_nonneg: tuple[str, ...] = ()       # negative -> 0.0


# Rule table mirroring reference bronze_to_silver.py:73-120 semantics.
SAKILA_RULES: dict[str, ConformRule] = {
    "customer": ConformRule(
        table="customer",
        pk="customer_id",
        required=("customer_id", "email"),
        casts={"customer_id": "bigint", "store_id": "bigint",
               "address_id": "bigint"},
        boolish=("active",),
        timestamps=("create_date", "last_update"),
        upper=("email",),
    ),
    "film": ConformRule(
        table="film",
        pk="film_id",
        required=("film_id", "title"),
        casts={"film_id": "bigint", "release_year": "int", "language_id": "bigint",
               "rental_duration": "int", "rental_rate": "double",
               "length": "int", "replacement_cost": "double"},
        timestamps=("last_update",),
        trim=("title",),
    ),
    "payment": ConformRule(
        table="payment",
        pk="payment_id",
        required=("payment_id", "customer_id", "amount"),
        casts={"payment_id": "bigint", "customer_id": "bigint",
               "staff_id": "bigint", "rental_id": "bigint", "amount": "double"},
        timestamps=("payment_date", "last_update"),
        clamp_nonneg=("amount",),
    ),
    "rental": ConformRule(
        table="rental",
        pk="rental_id",
        required=("rental_id", "customer_id"),
        casts={"rental_id": "bigint", "inventory_id": "bigint",
               "customer_id": "bigint", "staff_id": "bigint"},
        timestamps=("rental_date", "return_date", "last_update"),
    ),
    "inventory": ConformRule(
        table="inventory",
        pk="inventory_id",
        required=("inventory_id", "film_id"),
        casts={"inventory_id": "bigint", "film_id": "bigint",
               "store_id": "bigint"},
        timestamps=("last_update",),
    ),
}


def flatten_envelope(bronze: DataFrame) -> DataFrame:
    """Pull the payload to the top level, keeping envelope metadata.

    Reference P1 (``bronze_to_silver.py:75``, ``query_datalake.py:47-48``);
    envelope ``timestamp``/``operation`` ride along for CDC ordering.
    """
    return bronze.select(
        "data.*",
        F.col("timestamp").alias("_envelope_ts"),
        F.col("operation").alias("_operation"),
    )


def _dedup_latest(df: DataFrame, pk: str) -> DataFrame:
    """Keep the newest envelope per key — deterministic P7.

    Orders by envelope timestamp desc with operation as a stable tiebreak;
    falls back to plain dropDuplicates when no envelope metadata exists.
    Streaming inputs pass through untouched — ranking windows aren't
    allowed on streams; duplicate suppression there is the sink's job
    (dropDuplicatesWithinWatermark or a foreachBatch CDC merge,
    sources/stream.py).
    """
    if df.isStreaming:
        return df
    if "_envelope_ts" not in df.columns:
        return df.dropDuplicates([pk])
    from ..sources.cdc import _op_rank

    # payload fingerprint as the last tiebreak: identical (ts, operation)
    # with different payloads must still resolve to a stable winner
    # independent of arrival/partition order (see cdc.latest_change_per_key).
    # Operation ties break on the shared CDC precedence (DELETE > UPDATE >
    # INSERT, terminal-operation-wins) — NOT lexicographic order — so the
    # conform path and the CDC merge path pick the same winner for the
    # same change batch.
    payload_fp = F.md5(
        F.to_json(F.struct(*[c for c in df.columns if not c.startswith("_")]))
    )
    w = Window.partitionBy(pk).orderBy(
        F.desc("_envelope_ts"), _op_rank("_operation").desc(), F.desc(payload_fp)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def conform(bronze: DataFrame, rule: ConformRule, flatten: bool = True) -> DataFrame:
    """Apply one table's cleaning rules; returns the silver DataFrame."""
    df = flatten_envelope(bronze) if flatten else bronze

    for col in rule.trim:
        df = df.withColumn(col, F.trim(F.col(col)))
    for col in rule.upper:
        df = df.withColumn(col, F.upper(F.trim(F.col(col))))
    for col in rule.boolish:
        # JSON transit renders flags as "1"/"true"/"True"; ANSI cast would
        # throw on the word forms (the reference's Spark 3.5 cast nulled
        # them). Normalize explicitly, then fall back to a tolerant cast.
        low = F.lower(F.trim(F.col(col)))
        df = df.withColumn(
            col,
            F.when(low.isin("true", "t", "yes"), F.lit(1))
            .when(low.isin("false", "f", "no"), F.lit(0))
            .otherwise(low.try_cast("int")),
        )
    for col, typ in rule.casts.items():
        # try_cast: malformed values become NULL (and are then dropped by
        # the `required` rule if critical) instead of failing the job —
        # the permissive behavior a 100 TB conform pass needs.
        df = df.withColumn(col, F.col(col).try_cast(typ))
    for col in rule.timestamps:
        df = df.withColumn(col, F.to_timestamp(F.col(col)))
    for col in rule.clamp_nonneg:
        df = df.withColumn(
            col, F.when(F.col(col) < 0, F.lit(0.0)).otherwise(F.col(col))
        )

    df = _dedup_latest(df, rule.pk)
    df = df.na.drop(subset=list(rule.required))

    df = df.withColumn("processed_at", F.current_timestamp()).withColumn(
        "processed_date", F.current_date()
    )
    return df.drop("_envelope_ts", "_operation")
