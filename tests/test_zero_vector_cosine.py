"""Zero-vector cosine guard (r15, closes the r14 verdict's one named
correctness edge): the gated kNN/ANN queries and their DuckDB oracles
apply the SAME zero-norm CASE guard, so an all-zero embedding scores
cosine 0.0 in both engines instead of raising ANSI DIVIDE_BY_ZERO (or
producing engine-dependent inf)."""

from __future__ import annotations

import math
import os
import random

import duckdb
import pytest

from medallion_data_lake_spark.queries import load_all_extra

REGISTRY = load_all_extra()
EMB_QUERIES = [
    "knn_bruteforce_cosine",
    "knn_filtered_cosine",
    "hard_negatives_topk",
    "ann_ivf_bucketed",
]


@pytest.fixture(scope="module")
def zero_vec_dir(spark, tmp_path_factory):
    """An embeddings fixture with an all-zero vector among the corpus
    (vec_id=7) AND an all-zero QUERY vector (vec_id=100 — on the
    QUERY_STRIDE grid), the two ways a zero norm can enter the score."""
    rnd = random.Random(42)
    rows = []
    for vid in range(120):
        if vid in (7, 100):
            vec = [0.0] * 16
        else:
            vec = [rnd.uniform(-1, 1) for _ in range(16)]
        rows.append((vid, vec, vid % 7))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = str(tmp_path_factory.mktemp("zerovec"))
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    return out


def _canon(rows):
    out = []
    for r in rows:
        canon = []
        for v in r:
            if isinstance(v, float):
                assert not math.isnan(v) and not math.isinf(v), f"non-finite {v} in {r}"
                canon.append(v + 0.0)
            else:
                canon.append(v)
        out.append(tuple(canon))
    return sorted(out)


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_zero_vector_matches_oracle(spark, zero_vec_dir, name):
    spec = REGISTRY[name]
    sdf = spec.build(spark, zero_vec_dir)
    spark_rows = _canon([tuple(r) for r in sdf.collect()])
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{os.path.join(zero_vec_dir, 'embeddings.parquet')}/*.parquet'"
    )
    duck_rows = _canon([tuple(r) for r in con.sql(spec.oracle).fetchall()])
    assert spark_rows == duck_rows
    assert len(spark_rows) > 0
