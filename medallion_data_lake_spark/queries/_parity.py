"""Cross-engine-exact aggregation and rounding helpers.

Two sources of cross-engine drift in float results, and their fixes:

1. **Double summation is order-dependent.** Spark's partial aggregates and
   DuckDB's vectorized sums accumulate in different orders, so raw
   ``SUM(double)`` differs in the last bits. Fix: cast per-row values to
   ``DECIMAL(18,6)`` *before* summation. Both engines convert a double to
   decimal via its shortest round-trip decimal representation (Spark
   ``BigDecimal.valueOf``, DuckDB the same — verified empirically), and no
   double sits exactly on a half-ulp decimal boundary (x…5 needs a
   factor-5 denominator, unrepresentable in binary), so the per-row casts
   agree bit-for-bit and the decimal sum is exact integer arithmetic —
   order-independent. Decimal128 sums stay vectorized/partial-aggregated,
   so this costs ~nothing at 100 TB and is how money should be summed
   anyway (contrast the reference's DECIMAL→DOUBLE widening, reference
   ``bronze_to_silver.py:103`` / SURVEY.md §7.4.1).

2. **ROUND(double, n) itself diverges.** Spark rounds the double's
   shortest decimal repr with HALF_UP (320141.975 → 320141.98); DuckDB
   rounds the true binary value (320141.97499999997 → 320141.97). Fix:
   round by construction from IEEE primitives —
   ``floor(x * 10^s + 0.5) / 10^s`` — which both engines evaluate
   identically given identical ``x``. (Half-up-with-binary-noise
   semantics, but *deterministically the same* everywhere, which is the
   property that matters.)

Identical inputs + identical primitive ops = identical doubles; these two
helpers make every aggregate in the query pack satisfy that invariant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"
_SQL_DEC = "DECIMAL(18,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def stable_round(col: Column | str, scale: int = 2) -> Column:
    """Cross-engine-deterministic rounding: floor(x*10^s + 0.5)/10^s."""
    m = 10 ** scale
    return F.floor(_c(col) * m + F.lit(0.5)) / m


def sql_stable_round(expr: str, scale: int = 2) -> str:
    m = 10 ** scale
    return f"FLOOR(({expr}) * {m} + 0.5) / {m}"


def dsum(col: Column | str) -> Column:
    """Exact (order-independent) sum: decimal-cast before aggregation."""
    return F.sum(_c(col).cast(DEC))


def money_sum(col: Column | str, scale: int = 2) -> Column:
    """SUM for display: exact decimal sum → double → stable round."""
    return stable_round(dsum(col).cast("double"), scale)


def money_avg(col: Column | str, scale: int = 2) -> Column:
    """AVG over non-null values via exact sum / count, stable-rounded."""
    return stable_round(dsum(col).cast("double") / F.count(_c(col)), scale)


def sql_dsum(expr: str) -> str:
    return f"SUM(CAST({expr} AS {_SQL_DEC}))"


def sql_money_sum(expr: str, scale: int = 2) -> str:
    return sql_stable_round(f"CAST({sql_dsum(expr)} AS DOUBLE)", scale)


def sql_money_avg(expr: str, scale: int = 2) -> str:
    return sql_stable_round(f"CAST({sql_dsum(expr)} AS DOUBLE) / COUNT({expr})", scale)
