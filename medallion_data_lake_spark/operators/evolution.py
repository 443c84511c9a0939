"""Schema evolution: conform drifting upstream batches to a target schema.

Producers drift — a mobile release adds a field, a backend changes an
int to a long, a column disappears for a week. At the bronze→silver
boundary the engine needs a POLICY, not an error: which drifts are
absorbed silently, which are refused. This module implements the policy
Delta/Iceberg codified:

- ADD       : column missing from the batch → filled with NULL
              (nullable add is always safe).
- WIDEN     : batch type upcastable to target (int→long, float→double,
              int→double, anything→string) → cast. Lossless by
              construction.
- NARROW    : batch type would lose information (long→int,
              string→int, double→float) → REFUSED by default; callers
              opt in per-column with ``allow_narrowing`` and get
              ``try_cast`` semantics (overflow → NULL, never garbage).
- EXTRA     : column absent from the target → dropped by default
              (projection), or refused under ``strict``.

One projection, zero shuffles — evolution is pure per-row expression
work; at 100 TB the cost is the scan you were doing anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# target type -> batch types that widen INTO it losslessly
_WIDENINGS: dict[str, set[str]] = {
    "bigint": {"int", "smallint", "tinyint"},
    "int": {"smallint", "tinyint"},
    "smallint": {"tinyint"},
    "double": {"float", "int", "smallint", "tinyint", "bigint"},
    "float": {"int", "smallint", "tinyint"},
    "string": {
        "int", "smallint", "tinyint", "bigint", "float", "double",
        "boolean", "date", "timestamp", "timestamp_ntz", "decimal",
    },
    "timestamp_ntz": {"date"},
    "timestamp": {"date"},
}


class SchemaDriftError(ValueError):
    """A drift the policy refuses; message lists every offending column."""


def diff_schemas(batch: T.StructType, target: T.StructType) -> dict:
    """Classify the drift: {"add": [...], "widen": [...], "narrow": [...],
    "extra": [...], "same": [...]} by column name."""
    b = {f.name: f.dataType.simpleString() for f in batch.fields}
    t = {f.name: f.dataType.simpleString() for f in target.fields}
    out = {"add": [], "widen": [], "narrow": [], "extra": [], "same": []}
    for name, tt in t.items():
        if name not in b:
            out["add"].append(name)
        elif b[name] == tt:
            out["same"].append(name)
        elif tt == "string" and not b[name].startswith(("array", "map", "struct")) and b[name] != "binary":
            # ANY atomic type renders to string losslessly (parameterized
            # types like decimal(10,2) included — simpleString carries
            # the params, so a set lookup can't cover them) — EXCEPT
            # binary: arbitrary bytes are not valid UTF-8 and the cast
            # mangles them, so binary→string is narrowing (opt-in)
            out["widen"].append(name)
        elif b[name] in _WIDENINGS.get(tt, set()):
            out["widen"].append(name)
        else:
            out["narrow"].append(name)
    out["extra"] = [n for n in b if n not in t]
    return out


def evolve_to_schema(
    batch: DataFrame,
    target: T.StructType,
    allow_narrowing: tuple[str, ...] = (),
    strict: bool = False,
) -> DataFrame:
    """Conform ``batch`` to ``target`` under the evolution policy.

    Raises ``SchemaDriftError`` on refused drifts (narrowing without
    opt-in; extra columns under ``strict``); otherwise returns a frame
    with EXACTLY the target schema's columns, in target order.
    """
    drift = diff_schemas(batch.schema, target)
    refused_narrow = [c for c in drift["narrow"] if c not in allow_narrowing]
    problems = []
    if refused_narrow:
        by_name = {f.name: f.dataType.simpleString() for f in batch.schema.fields}
        tgt = {f.name: f.dataType.simpleString() for f in target.fields}
        problems += [
            f"narrowing {c}: batch {by_name[c]} -> target {tgt[c]} "
            f"(opt in via allow_narrowing)" for c in refused_narrow
        ]
    if strict and drift["extra"]:
        problems += [f"unexpected column {c!r} (strict mode)" for c in drift["extra"]]
    if problems:
        raise SchemaDriftError("; ".join(problems))

    batch_cols = set(batch.columns)
    cols = []
    for f in target.fields:
        if f.name not in batch_cols:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif f.name in drift["narrow"]:
            # opted-in narrowing: try_cast, so overflow yields NULL
            # instead of a wrapped/garbage value
            cols.append(
                F.col(f.name).try_cast(f.dataType).alias(f.name)
            )
        else:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    return batch.select(*cols)
