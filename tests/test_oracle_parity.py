"""Differential tests: every registered query vs its DuckDB oracle.

Local mirror of the driver's correctness gate (BASELINE.md): same parquet
tables, row-count + column-name + order-insensitive value comparison.
Floats must match exactly — the queries are written so that both engines
produce bit-identical values (rounding after aggregation, deterministic
tie-breaks); any drift here would also fail the driver's value hash.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from medallion_data_lake_spark.catalog import star_path
from medallion_data_lake_spark.queries import load_all_extra
from medallion_data_lake_spark.schemas import STAR_TABLES

# load_all_extra: the cut/variant queries (extra=True) stay locally
# oracle-verified even though only the ≤50 main entries face the driver.
REGISTRY = load_all_extra()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{star_path(sf_dir, t)}'")
    return con


def _canon_cell(v):
    import numpy as np

    if v is None:
        return None
    if isinstance(v, np.ndarray):  # list columns arrive as numpy arrays
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, np.generic):  # numpy scalars -> python scalars
        return _canon_cell(v.item())
    if not isinstance(v, float) and v != v:  # pandas NaT (float NaN keeps
        return None                          # its own branch below)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v + 0.0  # normalize -0.0
    if isinstance(v, datetime.datetime):
        # DuckDB's pandas bridge widens DATE to midnight datetime64; treat
        # midnight datetimes and dates as the same value.
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if hasattr(v, "to_pydatetime"):  # pandas Timestamp
        return v.to_pydatetime().isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, (bool, int, str, bytes)):
        return v
    return str(v)


def canon_rows(df) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for tup in df.itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in tup))
    out.sort(key=repr)
    return out


def compare(spark, name: str, sf_dir: str) -> None:
    spec = REGISTRY[name]
    sdf = spec.build(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    odf = con.sql(spec.oracle).df()
    con.close()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count spark={len(sdf)} oracle={len(odf)}"

    srows, orows = canon_rows(sdf), canon_rows(odf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    compare(spark, name, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.build(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
