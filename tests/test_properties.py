"""Property-based tests (hypothesis): determinism under reordering.

SURVEY.md §7.4.4/§7.4.5 name the failure mode these guard: out-of-order
and duplicated delivery must not change results. The properties:

1. conform() dedup is invariant to input row order and partitioning;
2. CDC apply is invariant to envelope arrival order AND duplication
   (at-least-once delivery);
3. exact decimal money sums are invariant to partitioning (the
   order-independence the oracle parity layer depends on).
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from medallion_data_lake_spark.queries._parity import dsum
from medallion_data_lake_spark.schemas import BRONZE_PAYLOADS
from medallion_data_lake_spark.sources.cdc import (
    apply_changes,
    latest_change_per_key,
    parse_envelopes,
)

# a small pool of keyed envelope events with distinct timestamps per (key, ts)
_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),              # key
        st.integers(min_value=0, max_value=20),             # ts offset (hours)
        st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
        st.text(alphabet="abc", min_size=1, max_size=3),    # payload marker
    ),
    min_size=1,
    max_size=12,
)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _envelopes(spark, rows):
    msgs = [
        json.dumps(
            {
                "table": "customer",
                "operation": op,
                "timestamp": f"2024-01-01T{ts:02d}:00:00",
                "data": {"customer_id": str(k), "email": f"{marker}@x.com"},
            }
        )
        for (k, ts, op, marker) in rows
    ]
    raw = spark.createDataFrame([(m,) for m in msgs], "value string")
    ch = parse_envelopes(raw, BRONZE_PAYLOADS["customer"])
    return ch.withColumn(
        "data", F.struct(F.col("data.customer_id"), F.col("data.email"))
    )


@pytest.mark.usefixtures("spark")
class TestOrderInvariance:
    @given(rows=_events)
    @_SETTINGS
    def test_cdc_apply_order_and_duplication_invariant(self, spark, rows):
        current = spark.createDataFrame(
            [("1", "seed@x.com")], "customer_id string, email string"
        )

        def final_state(event_rows):
            ch = latest_change_per_key(_envelopes(spark, event_rows), "customer_id")
            return sorted(map(tuple, apply_changes(current, ch, "customer_id").collect()))

        forward = final_state(rows)
        reversed_dup = final_state(list(reversed(rows)) + rows)  # reorder + redeliver
        assert forward == reversed_dup

    @given(
        amounts=st.lists(
            st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=32),
            min_size=1,
            max_size=30,
        ),
        parts=st.integers(min_value=1, max_value=8),
    )
    @_SETTINGS
    def test_decimal_sum_partitioning_invariant(self, spark, amounts, parts):
        rows = [(float(round(a, 2)),) for a in amounts]
        df1 = spark.createDataFrame(rows, "amount double").repartition(1)
        dfn = spark.createDataFrame(list(reversed(rows)), "amount double").repartition(parts)
        s1 = df1.agg(dsum("amount").alias("s")).collect()[0]["s"]
        sn = dfn.agg(dsum("amount").alias("s")).collect()[0]["s"]
        assert s1 == sn  # exact equality — the property the oracle relies on


@given(_events)
@_SETTINGS
def test_derived_table_maintenance_idempotent(spark, rows):
    """Re-applying the same collapsed change batch to an already-updated
    derived table is a no-op (trigger semantics are per-row and rely on
    exactly-once firing; the batch merge must not)."""
    from medallion_data_lake_spark.sources.cdc import maintain_derived_table

    env = _envelopes(spark, rows)
    collapsed = latest_change_per_key(env, "customer_id")
    derived = spark.createDataFrame(
        [("1", "seed@x.com"), ("9", "untouched@x.com")],
        "customer_id string, email string",
    )
    cols = ("customer_id", "email")
    once = maintain_derived_table(derived, collapsed, "customer_id", cols)
    twice = maintain_derived_table(once, collapsed, "customer_id", cols)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


# ---------------------------------------------------------------------------
# 4. Expectations: split and metrics must agree on ANY data; the split
#    is a partition of the input (clean ∪ quarantine == input, disjoint).
# ---------------------------------------------------------------------------

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),                    # id
        st.one_of(st.none(), st.floats(min_value=-100, max_value=100,
                                       allow_nan=False)),          # amount
        st.one_of(st.none(), st.sampled_from(["A", "B", "C"])),    # status
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_rows)
def test_expectations_split_partitions_input(spark, rows):
    from medallion_data_lake_spark.operators.expectations import (
        in_range,
        in_set,
        not_null,
        run_expectations,
        split_by_expectations,
    )

    df = spark.createDataFrame(rows, "id long, amount double, status string")
    contract = [
        not_null("amount"),
        in_range("amount", 0.0, 50.0),
        in_set("status", ["A", "B"]),
    ]
    clean, quarantine = split_by_expectations(df, contract)
    n_clean, n_quar = clean.count(), quarantine.count()
    assert n_clean + n_quar == len(rows)
    # metrics gate agrees with the split: zero violations <=> empty quarantine
    report = run_expectations(df, contract)
    assert report["passed"] == (n_quar == 0)
    # every quarantined row names at least one failed check; clean rows,
    # re-checked, violate nothing
    assert quarantine.filter(F.size("_failed_expectations") == 0).count() == 0
    if n_clean:
        re_report = run_expectations(clean, contract)
        assert re_report["passed"] is True


# ---------------------------------------------------------------------------
# 5. Schema evolution: add/widen drift always conforms losslessly --
#    values survive the widening cast and added columns are null.
# ---------------------------------------------------------------------------

@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(st.tuples(st.integers(min_value=-(2**31) + 1, max_value=2**31 - 1),
                            st.floats(width=32, allow_nan=False,
                                      allow_infinity=False)),
                  min_size=1, max_size=10),
)
def test_evolution_widening_is_lossless(spark, vals):
    from pyspark.sql import types as T

    from medallion_data_lake_spark.operators.evolution import evolve_to_schema

    batch = spark.createDataFrame(vals, "a int, b float")
    target = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.DoubleType()),
        T.StructField("c", T.StringType()),
    ])
    out = evolve_to_schema(batch, target)
    got = [(r["a"], r["b"], r["c"]) for r in out.orderBy("a", "b").collect()]
    want = sorted((a, float(b), None) for a, b in vals)
    for (ga, gb, gc), (wa, wb, wc) in zip(got, want):
        assert ga == wa and gc is wc is None
        assert gb == pytest.approx(wb, rel=1e-6)


_merge_base = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.text(alphabet="xyz", min_size=1, max_size=2)),
    min_size=1, max_size=10,
    unique_by=lambda t: t[0],
)
_merge_src = st.lists(
    st.tuples(st.integers(min_value=0, max_value=40),
              st.text(alphabet="uvw", min_size=1, max_size=2),
              st.booleans()),
    min_size=1, max_size=8,
    unique_by=lambda t: t[0],
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(base=_merge_base, src=_merge_src)
def test_merge_into_matches_reference_semantics(spark, tmp_path_factory,
                                                base, src):
    """merge_into == the dictionary semantics of MERGE, for arbitrary
    base tables and unique-key source batches (updates, inserts,
    deletes of present AND absent keys), regardless of which files the
    range pruning decides to rewrite."""
    from medallion_data_lake_spark.operators.versioned import (
        commit,
        merge_into,
        read_table,
    )

    path = str(tmp_path_factory.mktemp("merge_prop") / "t")
    commit(
        spark.createDataFrame(base, "id long, tag string"),
        path, stats_cols=("id",),
    )
    merge_into(
        spark, path,
        spark.createDataFrame(src, "id long, tag string, dead boolean"),
        key="id", delete_col="dead",
    )

    want = dict(base)
    for k, tag, dead in src:
        if dead:
            want.pop(k, None)
        else:
            want[k] = tag
    got = {r["id"]: r["tag"] for r in read_table(spark, path).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Temperature-mixing target derivation (pure math — no Spark needed)
# ---------------------------------------------------------------------------

@given(
    totals=st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=4),
        st.integers(min_value=0, max_value=10**12),
        min_size=1, max_size=8,
    ),
    alpha=st.floats(min_value=0.0, max_value=1.0,
                    allow_nan=False, allow_infinity=False),
    budget=st.integers(min_value=0, max_value=10**12),
)
def test_temperature_targets_invariants(totals, alpha, budget):
    """For ANY totals/alpha/budget: targets sum to ≤ budget (floor
    rounding only loses), cover only non-empty sources, are non-negative,
    and preserve the size ordering of the inputs (flattening must never
    INVERT two sources)."""
    from medallion_data_lake_spark.operators.curation_pipeline import (
        temperature_targets,
    )

    targets = temperature_targets(totals, alpha, budget)
    assert set(targets) == {s for s, n in totals.items() if n > 0}
    assert all(t >= 0 for t in targets.values())
    assert sum(targets.values()) <= budget
    # floor rounding drops < 1 token per source
    if targets:
        assert sum(targets.values()) >= budget - len(targets)
    for a in targets:
        for b in targets:
            if totals[a] > totals[b]:
                assert targets[a] >= targets[b]
