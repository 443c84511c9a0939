"""hard_negatives_topk (gated brute-force query path) vs the persisted-
index operator ``mine_hard_negatives``: same negatives per query when
the probe covers every cell.

The gated query defines "positive" as SAME LABEL (the labels column is
the positive relation), so the operator path feeds the expanded
(query_id, pos_id) same-label pairs as its labeled positives. The index
is a 4-cell learned codebook probed with n_probes=4 — exhaustive, so
the only legitimate divergence would be a bug in either path.

mine_hard_negatives' depth guarantee makes the equality exact, not
approximate: it searches k + max(positives per query) deep, so even if
every positive out-ranked every negative the true top-k negatives
still sit inside the searched prefix (operators/ann.py:653).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from medallion_data_lake_spark.catalog import load_star_table
from medallion_data_lake_spark.operators.ann import (
    build_kmeans_ivf_index,
    mine_hard_negatives,
)
from medallion_data_lake_spark.queries import load_all
from medallion_data_lake_spark.queries.similarity import K_NEG, QUERY_STRIDE

SF_DIR = "/root/testdata/sf0.001"


def test_gated_query_matches_persisted_mining(spark, tmp_path):
    emb = load_star_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "hn_idx")
    build_kmeans_ivf_index(emb, path, k=4)

    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    positives = (
        queries.select(F.col("vec_id").alias("query_id"), "label")
        .join(
            emb.select(F.col("vec_id").alias("pos_id"),
                       F.col("label").alias("_pl")),
            F.col("label") == F.col("_pl"),
        )
        .select("query_id", "pos_id")  # includes (q, q): self is a positive
    )
    mined = mine_hard_negatives(
        spark, positives, path, queries, k=K_NEG, n_probes=4
    )
    got: dict[int, set[int]] = defaultdict(set)
    for r in mined.collect():
        got[r["query_id"]].add(r["neg_id"])

    want: dict[int, set[int]] = defaultdict(set)
    rows = load_all()["hard_negatives_topk"].build(spark, SF_DIR).collect()
    for r in rows:
        want[r["query_id"]].add(r["neg_id"])

    assert want and dict(got) == dict(want)
    assert all(len(v) == K_NEG for v in want.values())

    # negatives really are negatives: no mined id shares its query's label
    label_of = {r["vec_id"]: r["label"] for r in emb.collect()}
    qlabel = {r["vec_id"]: r["label"]
              for r in queries.select("vec_id", "label").collect()}
    for qid, negs in got.items():
        assert all(label_of[n] != qlabel[qid] for n in negs)


def test_caller_supplied_positive_bound_matches_measured(spark, tmp_path):
    """max_positives skips the depth-measuring aggregation job; the
    result must be identical to the measured form when the bound is
    honest (here: exact)."""
    emb = load_star_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "hn_idx2")
    build_kmeans_ivf_index(emb, path, k=4)
    queries = emb.filter(F.col("vec_id") < 3)
    positives = queries.select(
        F.col("vec_id").alias("query_id"),
        (F.col("vec_id") + 1).alias("pos_id"),
    )
    measured = mine_hard_negatives(
        spark, positives, path, queries, k=3, n_probes=4).collect()
    bounded = mine_hard_negatives(
        spark, positives, path, queries, k=3, n_probes=4,
        max_positives=1).collect()
    assert sorted(map(tuple, measured), key=lambda t: (t[0], t[3])) == \
        sorted(map(tuple, bounded), key=lambda t: (t[0], t[3]))


def test_understated_positive_bound_raises(spark, tmp_path):
    """An understated max_positives must fail LOUDLY (r11 ADVICE): the
    guarded path counts the positives observed in each query's searched
    prefix and raises when any query exceeds the declared bound —
    otherwise positives silently crowd true top-k negatives out of the
    too-shallow prefix and the exactness guarantee fails with no signal.
    """
    import pytest

    emb = load_star_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "hn_idx3")
    build_kmeans_ivf_index(emb, path, k=4)
    queries = emb.filter(F.col("vec_id") < 3)
    # three positives per query — each query's ACTUAL top-3 neighbors,
    # so they provably occupy the searched prefix; declare a bound of one
    from medallion_data_lake_spark.operators.ann import search_index

    positives = search_index(
        spark, path, queries, n_probes=4, k=3
    ).select("query_id", F.col("cand_id").alias("pos_id"))
    with pytest.raises(Exception, match="understates"):
        mine_hard_negatives(
            spark, positives, path, queries, k=3, n_probes=4,
            max_positives=1,
        ).collect()
    # the honest bound still works and returns full-k negatives
    ok = mine_hard_negatives(
        spark, positives, path, queries, k=3, n_probes=4,
        max_positives=3,
    ).collect()
    per_q = defaultdict(set)
    for r in ok:
        per_q[r["query_id"]].add(r["neg_id"])
    assert len(per_q) == 3 and all(len(v) == 3 for v in per_q.values())
    pos_of = defaultdict(set)
    for r in positives.collect():
        pos_of[r["query_id"]].add(r["pos_id"])
    assert all(not (pos_of[q] & v) for q, v in per_q.items())
