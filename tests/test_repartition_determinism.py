"""Results must be identical under different parallelism.

The oracle gate compares one Spark run against DuckDB; this guards the
complementary invariant — Spark vs ITSELF under different shuffle
partitioning (what changes between local[8] tests and a 1000-executor
cluster). Any query relying on accumulation order or partition layout
fails here.
"""

from __future__ import annotations

import pytest

from medallion_data_lake_spark.queries import load_all_extra
from tests.test_oracle_parity import canon_rows

REG = load_all_extra()  # full local surface: rotation-proof
SF = "/root/testdata/sf0.001"

# the queries most sensitive to partitioning: float aggregation, window
# ranking, LSH banding, top-k
SENSITIVE = [
    "customer_value_tiers",
    "pricing_summary",
    "top_revenue_parts",
    "lsh_candidate_pairs",
    "segment_top_customers",
    "knn_bruteforce_cosine",
]


@pytest.mark.parametrize("name", SENSITIVE)
def test_same_result_across_partitionings(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = canon_rows(REG[name].build(spark, SF).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        high = canon_rows(REG[name].build(spark, SF).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert low == high
