"""Product-quantization ANN (operators/ann.py pq_*).

Pins: code validity/compression, map-only encode plan, ADC recall vs
brute-force cosine on clustered data, and determinism of the seeded
codebook.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from medallion_data_lake_spark.functions import dot, l2_norm
from medallion_data_lake_spark.operators.ann import (
    ivf_pq_search,
    pq_adc_topk,
    pq_encode,
    pq_search_rerank,
    pq_train,
    sign_code,
)

DIM = 64
M, K = 8, 16


def _clustered(spark, n_clusters=6, per=40, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, DIM)) * 3
    rows = []
    i = 0
    for c in centers:
        for _ in range(per):
            rows.append((i, [float(x) for x in c + rng.standard_normal(DIM) * 0.3]))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_codes_valid_and_compact(spark):
    df = _clustered(spark)
    cb = pq_train(df, m=M, k=K, dim=DIM)
    assert len(cb) == M and len(cb[0]) == K and len(cb[0][0]) == DIM // M
    enc = pq_encode(df, cb)
    stats = enc.select(
        F.min(F.array_min("pq_code")).alias("lo"),
        F.max(F.array_max("pq_code")).alias("hi"),
        F.min(F.size("pq_code")).alias("len"),
    ).collect()[0]
    assert stats.lo >= 0 and stats.hi < K and stats.len == M
    # encode is map-only: no shuffle, no python
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_pq_encode_deterministic(spark):
    df = _clustered(spark)
    cb1 = pq_train(df, m=M, k=K, dim=DIM)
    cb2 = pq_train(df, m=M, k=K, dim=DIM)
    assert cb1 == cb2  # seeded KMeans, same input
    a = {r.vec_id: r.pq_code for r in pq_encode(df, cb1).collect()}
    b = {r.vec_id: r.pq_code for r in pq_encode(df, cb2).collect()}
    assert a == b


def _bruteforce_top5(df, queries):
    from pyspark.sql import Window

    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"),
        l2_norm(F.col("embedding")).alias("qn"),
    )
    c = df.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"),
        l2_norm(F.col("embedding")).alias("cn"),
    )
    cs = dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return {
        (r.query_id, r.cand_id)
        for r in c.join(q, F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cs.alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter("rk <= 5")
        .collect()
    }


def test_pq_adc_shortlist_finds_query_cluster(spark):
    # ADC's resolution is the codebook cell: same-cluster vectors share
    # codes, so ADC cannot rank WITHIN a cluster — what it guarantees is
    # that the shortlist comes from the right region. Assert that.
    per = 40
    df = _clustered(spark, per=per).cache()
    cb = pq_train(df, m=M, k=K, dim=DIM)
    enc = pq_encode(df, cb)
    rows = pq_adc_topk(enc, df.limit(10), cb, k_top=5).collect()
    same_cluster = sum(1 for r in rows if r.cand_id // per == r.query_id // per)
    assert same_cluster / len(rows) >= 0.9, (same_cluster, len(rows))


def test_pq_rerank_recall_vs_bruteforce(spark):
    # the production layout: ADC shortlist (codes only) -> exact cosine
    # re-rank of shortlist rows. Recall vs brute force should be high.
    df = _clustered(spark).cache()
    cb = pq_train(df, m=M, k=K, dim=DIM)
    enc = pq_encode(df, cb).select("vec_id", "pq_code")
    queries = df.limit(10)
    got = {
        (r.query_id, r.cand_id)
        for r in pq_search_rerank(
            enc, df, queries, cb, k_top=5, shortlist=60
        ).collect()
    }
    truth = _bruteforce_top5(df, queries)
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, recall


def test_ivf_pq_bucket_pruned_search(spark):
    # the composed layout: coarse sign buckets prune candidates, ADC
    # shortlists within probed cells, exact re-rank finishes. With
    # enough probes recall stays high while the candidate join is
    # bucket-equi (hash join on bucket), not all-pairs.
    df = _clustered(spark).cache()
    cb = pq_train(df, m=M, k=K, dim=DIM)
    enc = pq_encode(df, cb).withColumn(
        "bucket", sign_code(F.col("embedding"), 0, 8)
    ).select("vec_id", "bucket", "pq_code")
    queries = df.limit(10)
    got = {
        (r.query_id, r.cand_id)
        for r in ivf_pq_search(
            enc, df, queries, cb, n_bits=8, n_probes=8, k_top=5, shortlist=60
        ).collect()
    }
    truth = _bruteforce_top5(df, queries)
    recall = len(got & truth) / len(truth)
    # multi-probe coarse stage costs some recall vs scan-everything;
    # same regime as multiprobe_ann_search (0.74 @ 8 probes)
    assert recall >= 0.6, recall
    # candidate join is a hash join keyed on bucket, not a nested loop
    plan = ivf_pq_search(
        enc, df, queries, cb, n_bits=8, n_probes=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_adc_scores_candidates_from_codes_only(spark):
    df = _clustered(spark)
    cb = pq_train(df, m=M, k=K, dim=DIM)
    enc = pq_encode(df, cb).select("vec_id", "pq_code")  # vectors dropped
    out = pq_adc_topk(enc, df.limit(3), cb, k_top=4)
    assert out.count() == 12  # 3 queries × top-4 — no vector column needed
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# Persisted PQ tier (r6 verdict item 8): codes + codebook live WITH the
# bucketed layout; search reads codes, append re-encodes with the stored
# codebook — no per-call retrain.
# ---------------------------------------------------------------------------


def test_persisted_pq_search_matches_inflight(spark, tmp_path):
    """build_ivf_index(pq_m=...) + search_pq_ivf_index must return the
    SAME results as the in-flight pq_train → pq_encode → ivf_pq_search
    path (the codebook is seeded, so the two layouts are identical)."""
    from medallion_data_lake_spark.operators.ann import (
        MIN_BITS,
        build_ivf_index,
        search_pq_ivf_index,
    )

    df = _clustered(spark)
    queries = df.filter(F.col("vec_id").isin(0, 45, 123))
    path = str(tmp_path / "pqidx")
    meta = build_ivf_index(df, path, pq_m=M, pq_k=K)
    assert meta["pq"]["m"] == M and len(meta["pq"]["centroids"]) == M

    persisted = {
        (r["query_id"], r["cand_id"], r["rank"])
        for r in search_pq_ivf_index(spark, path, queries, k=5).collect()
    }

    cb = pq_train(df, m=M, k=K, dim=DIM)          # same seed default (42)
    encoded = pq_encode(
        df.withColumn("bucket", sign_code(F.col("embedding"), 0, MIN_BITS)),
        cb,
    )
    inflight = {
        (r["query_id"], r["cand_id"], r["rank"])
        for r in ivf_pq_search(encoded, df, queries, cb, k_top=5).collect()
    }
    assert persisted == inflight and len(persisted) > 0


def test_append_reencodes_with_stored_codebook(spark, tmp_path):
    """Appends must encode NEW vectors with the codebook persisted at
    build — meta unchanged, appended codes valid, appended neighbors
    findable through the persisted search."""
    import json

    from medallion_data_lake_spark.operators.ann import (
        append_to_ivf_index,
        build_ivf_index,
        search_pq_ivf_index,
    )

    df = _clustered(spark)
    base = df.filter(F.col("vec_id") < 200)
    extra = df.filter(F.col("vec_id") >= 200)
    path = str(tmp_path / "pqidx")
    meta0 = build_ivf_index(base, path, pq_m=M, pq_k=K)
    append_to_ivf_index(extra, path)
    meta1 = json.load(open(f"{path}/_ivf_meta.json"))
    assert meta1["pq"]["centroids"] == meta0["pq"]["centroids"]

    stored = spark.read.parquet(path)
    assert stored.count() == df.count()
    bad = stored.filter(
        (F.size("pq_code") != M)
        | F.exists("pq_code", lambda c: (c < 0) | (c >= K))
    ).count()
    assert bad == 0

    # an appended vector's cluster-mates (also appended) are findable
    q = df.filter(F.col("vec_id") == 210)
    got = search_pq_ivf_index(spark, path, q, k=5).collect()
    assert len(got) == 5
    same_cluster = {r["cand_id"] for r in got if 200 <= r["cand_id"] < 240}
    assert len(same_cluster) >= 3  # cluster 5 spans ids 200..239


def test_persisted_pq_search_prunes_partitions(spark, tmp_path):
    """The probe's bucket isin must reach the scan as a partition
    filter — the layout payoff (same assertion as the code-less
    index)."""
    import re

    from medallion_data_lake_spark.operators.ann import (
        build_ivf_index,
        search_pq_ivf_index,
    )

    df = _clustered(spark)
    path = str(tmp_path / "pqidx")
    build_ivf_index(df, path, pq_m=M, pq_k=K)
    out = search_pq_ivf_index(
        spark, path, df.filter(F.col("vec_id") == 7), k=3
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the isin must land as a PARTITION filter (not post-scan): a
    # non-empty PartitionFilters clause naming bucket
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None and "bucket" in m.group(1), plan[:2000]


def test_search_index_dispatches_to_pq(spark, tmp_path):
    """search_index(use_pq=True) routes through the persisted PQ tier
    (≡ search_pq_ivf_index); without the flag it stays on the
    full-vector probe; a code-less index refuses the flag loudly."""
    import pytest as _pytest

    from medallion_data_lake_spark.operators.ann import (
        build_ivf_index,
        search_index,
        search_pq_ivf_index,
    )

    df = _clustered(spark)
    q = df.filter(F.col("vec_id") == 3)
    path = str(tmp_path / "pqidx")
    build_ivf_index(df, path, pq_m=M, pq_k=K)
    via_dispatch = {
        (r["query_id"], r["cand_id"], r["rank"])
        for r in search_index(spark, path, q, k=5, use_pq=True).collect()
    }
    direct = {
        (r["query_id"], r["cand_id"], r["rank"])
        for r in search_pq_ivf_index(spark, path, q, k=5).collect()
    }
    assert via_dispatch == direct and via_dispatch

    plain = str(tmp_path / "plainidx")
    build_ivf_index(df, plain)
    assert search_index(spark, plain, q, k=5).count() == 5  # flagless ok
    with _pytest.raises(ValueError):
        search_index(spark, plain, q, k=5, use_pq=True)


# ---------------------------------------------------------------------------
# Kmeans-layout PQ tier (r12: the recall-recovery path) — wide-probe ADC
# pre-rank from stored codes + exact re-rank of a bounded shortlist.
# ---------------------------------------------------------------------------


def test_kmeans_pq_recovery_matches_exact_under_exhaustive_probes(
    spark, tmp_path
):
    """With every cell probed and a corpus-sized shortlist, the PQ
    recovery path must return EXACTLY the full-vector search's top-k:
    the ADC pre-rank can then only reorder candidates that the exact
    re-rank re-sorts, so any divergence is a bug in one path."""
    from medallion_data_lake_spark.operators.ann import (
        build_kmeans_ivf_index,
        search_index,
    )

    df = _clustered(spark)
    path = str(tmp_path / "kmpq")
    meta = build_kmeans_ivf_index(df, path, k=6, pq_m=M, pq_k=K)
    assert meta["pq"]["m"] == M and meta["kind"] == "kmeans"

    queries = df.filter(F.col("vec_id").isin(0, 77, 200))
    exact = {
        (r["query_id"], r["cand_id"], r["rank"])
        for r in search_index(
            spark, path, queries, n_probes=6, k=5
        ).collect()
    }
    recovered = {
        (r["query_id"], r["cand_id"], r["rank"])
        for r in search_index(
            spark, path, queries, n_probes=6, k=5,
            use_pq=True, shortlist=240,
        ).collect()
    }
    assert exact == recovered and len(exact) == 15


def test_kmeans_pq_recovery_recall_on_clustered(spark, tmp_path):
    """The verdict's target, pinned at fixture scale: on clustered
    vectors the recovery path reaches recall@5 >= 0.9 at <= 8 probes
    (here 4 of 6 cells) with a bounded 50-row shortlist."""
    from medallion_data_lake_spark.operators.ann import (
        build_kmeans_ivf_index,
        measure_index_recall,
        search_index,
    )
    from pyspark.sql import Window

    df = _clustered(spark)
    path = str(tmp_path / "kmpq2")
    build_kmeans_ivf_index(df, path, k=6, pq_m=M, pq_k=K)
    queries = df.filter(F.col("vec_id") % 40 == 0)  # one per cluster

    approx = search_index(
        spark, path, queries, n_probes=4, k=5, use_pq=True, shortlist=50
    ).select("query_id", "cand_id")
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        l2_norm(F.col("embedding")).alias("qn"),
    )
    cs = dot(F.col("qv"), F.col("embedding")) / (F.col("qn") * l2_norm(F.col("embedding")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    exact = (
        df.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"), cs.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "cand_id")
    )
    matched = exact.join(approx, ["query_id", "cand_id"], "left_semi").count()
    total = exact.count()
    assert total == 30 and matched / total >= 0.9


def test_kmeans_pq_refuses_codeless_layout(spark, tmp_path):
    import pytest

    from medallion_data_lake_spark.operators.ann import (
        build_kmeans_ivf_index,
        search_index,
    )

    df = _clustered(spark)
    path = str(tmp_path / "km_nopq")
    build_kmeans_ivf_index(df, path, k=6)
    with pytest.raises(ValueError, match="PQ tier"):
        search_index(spark, path, df.limit(1), use_pq=True).collect()


def test_kmeans_pq_recovery_prunes_partitions(spark, tmp_path):
    import re

    from medallion_data_lake_spark.operators.ann import (
        build_kmeans_ivf_index,
        search_index,
    )

    df = _clustered(spark)
    path = str(tmp_path / "kmpq3")
    build_kmeans_ivf_index(df, path, k=6, pq_m=M, pq_k=K)
    out = search_index(
        spark, path, df.filter(F.col("vec_id") == 7), n_probes=2, k=3,
        use_pq=True,
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None and "bucket" in m.group(1), plan[:2000]
