"""Hybrid retrieval: reciprocal-rank fusion (RRF) of keyword and
vector rankings — "docs like this example that also mention X", the
query a training-data curator runs daily for targeted domain pulls.

The engine has both rankers — BM25 over the inverted index
(operators/inverted_index.py) and cosine kNN over embeddings
(operators/ann.py, queries/similarity.py) — and RRF is the standard
score-free way to combine them (Cormack/Clarke/Buettcher, SIGIR'09):

    rrf(d) = Σ_r 1 / (k + rank_r(d))      over rankings r containing d

Rank arithmetic only — no score normalization across incomparable
scales (BM25 is unbounded, cosine is [-1, 1]), which is also what makes
the fusion exactly oracleable: integer ranks in, one fixed-shape double
expression out (queries/retrieval.py `hybrid_rrf_topk` is the gated
face; DuckDB mirrors it bit-for-bit).

Scale shape at 100 TB: each branch is already bounded — BM25 reads only
bloom-surviving posting files and top-k's via TakeOrderedAndProject;
the vector branch is a broadcast-query scan (or a partition-pruned IVF
probe). The fusion itself joins two ≤n_per_branch-row frames — metadata
scale, whatever the corpus size.

Reference anchor: the reference's search surface is ad-hoc SQL scans
(reference: sakila-data-lake/query_datalake.py:139-146); fused
keyword+vector retrieval is the modality it lacks entirely.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dot, l2_norm
from .inverted_index import bm25_search

RRF_K = 60  # the standard smoothing constant from the RRF paper


def rrf_fuse(
    rankings: dict[str, DataFrame],
    k: int = 10,
    rrf_k: int = RRF_K,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse named (id, rank) frames into one RRF top-``k``.

    ``rankings`` maps a branch name to a frame carrying ``id_col`` and
    ``rank_col`` (1-based; each id at most once per frame). An id
    absent from a branch contributes 0 from that branch — the RRF
    convention. Returns ``(doc_id, <name>_rank ..., rrf_score)``
    ordered by score desc with id tiebreak; per-branch ranks are NULL
    where the id didn't appear.

    The join chain is FULL OUTER on the id: every branch frame is
    already top-n-bounded by its producer, so the fusion is a join of
    tiny frames regardless of corpus size. The score expression is
    fixed-shape (left-to-right sum of ``coalesce(1/(k+rank), 0)``
    terms), so identical inputs give bit-identical doubles in any
    engine evaluating the same primitives — the property the gated
    oracle twin relies on."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    sides = [
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(rank_col).cast("int").alias(f"{name}_rank"),
        )
        for name, df in rankings.items()
    ]
    fused = reduce(
        lambda a, b: a.join(b, "doc_id", "full_outer"), sides
    )
    score = reduce(
        lambda acc, name: acc
        + F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col(f"{name}_rank")), F.lit(0.0)
        ),
        list(rankings),
        F.lit(0.0),
    )
    return (
        fused.withColumn("rrf_score", score)
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(k)
    )


def ranked(
    df: DataFrame, order_cols: list, id_col: str = "doc_id"
) -> DataFrame:
    """Attach a 1-based ``rank`` to an already top-n-bounded frame.
    The single-partition window is deliberate: callers bound the frame
    to n_per_branch rows FIRST (TakeOrderedAndProject), so the window
    ranks ≤n rows, never the corpus."""
    w = Window.orderBy(*order_cols, F.asc(id_col))
    return df.withColumn("rank", F.row_number().over(w))


def cosine_topn(
    embeddings: DataFrame,
    query_vec_id: int,
    n: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Vector branch: brute-force cosine top-``n`` against the stored
    vector of ``query_vec_id`` (excluded from results), ranked by
    round(cos, 6) desc with id tiebreak — the exact ordering the gated
    ``knn_bruteforce_cosine`` / ``hybrid_rrf_topk`` queries use, so the
    operator path and the oracle-checked arithmetic cannot drift.

    One scan + TakeOrderedAndProject; the 1-row query side broadcasts.
    ``allowed`` (frame whose first column is candidate ids) restricts
    candidates BEFORE the top-n — the filtered-search semantics of
    ``ann.search_index(allowed=...)``; the QUERY vector is looked up in
    the unfiltered frame, so a query outside the collection can still
    search within it. For a persisted IVF index, rank
    ``ann.search_index`` output with :func:`ranked` instead and feed it
    to :func:`rrf_fuse` — the fusion is producer-agnostic."""
    from ..queries._parity import stable_round

    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    q = (
        e.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("v").alias("qv"), F.col("nrm").alias("qnrm"))
    )
    cands = e
    if allowed is not None:
        ids = allowed.select(
            F.col(allowed.columns[0]).alias("vec_id")
        ).distinct()
        cands = cands.join(ids, "vec_id", "left_semi")
    # zero-norm guard (r15): mirrors queries/similarity._SQL_COS — a zero
    # vector scores 0.0 in both engines instead of dividing by zero
    _nprod = F.col("qnrm") * F.col("nrm")
    _cs = F.when(
        _nprod != 0, dot(F.col("qv"), F.col("v")) / _nprod
    ).otherwise(F.lit(0.0))
    scored = (
        cands.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))  # 1-row query side
        .select(
            "vec_id",
            stable_round(_cs, 6).alias("_cs"),
        )
        .orderBy(F.desc("_cs"), F.asc("vec_id"))
        .limit(n)
    )
    return ranked(scored, [F.desc("_cs")], id_col="vec_id").select(
        "vec_id", "rank"
    )


def hybrid_search(
    spark: SparkSession,
    index_root: str,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    n_per_branch: int = 20,
    rrf_k: int = RRF_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allowed: DataFrame | None = None,
    vec_index: str | None = None,
    n_probes: int = 4,
    pins: dict[str, int] | None = None,
    corpus_totals: tuple[int, int] | None = None,
) -> DataFrame:
    """Persisted-path hybrid retrieval: BM25 top-``n_per_branch`` from
    the inverted index at ``index_root`` (bloom-pruned posting reads,
    snapshot-pinned) fused with cosine top-``n_per_branch`` over
    ``embeddings`` against the stored vector of ``query_vec_id``.
    The embedding ids must share the document id space. Returns
    ``(doc_id, kw_rank, vec_rank, rrf_score)`` — the same arithmetic
    the gated ``hybrid_rrf_topk`` query computes from the raw corpus
    (tests/test_hybrid.py proves the two paths agree row-for-row).

    ``allowed`` scopes BOTH branches to a collection before their
    top-n (filtered hybrid: "docs like this example that also mention
    X, within collection Y") — each branch must filter pre-rank, or a
    collection doc out-ranked by disallowed ones would vanish from the
    fusion instead of rising into the branch's top-n.

    ``vec_index`` (path to a persisted IVF index over the same id
    space) swaps the vector branch's corpus scan for a partition-pruned
    index probe (``ann.search_index`` at ``n_probes``) — the serving
    form at corpus scale, where a per-query embedding scan is the
    bottleneck. The trade is the index's recall profile (multi-probe
    ANN is approximate; measure with ``ann.measure_index_recall``);
    ``embeddings`` is then only the query-vector lookup.

    ``pins`` / ``corpus_totals`` pass through to the keyword branch —
    the warm-session injection (operators/search_session.py)."""
    kw = ranked(
        bm25_search(spark, index_root, query_terms, k=n_per_branch,
                    allowed=allowed, pins=pins,
                    corpus_totals=corpus_totals),
        [F.desc("score")],
    ).select("doc_id", "rank")
    if vec_index is not None:
        from .ann import search_index

        qvec = embeddings.filter(
            F.col(id_col) == query_vec_id
        ).select(id_col, vec_col)
        vec = search_index(
            spark, vec_index, qvec, vec_col=vec_col, id_col=id_col,
            n_probes=n_probes, k=n_per_branch, allowed=allowed,
        ).select(F.col("cand_id").alias("vec_id"), "rank")
    else:
        vec = cosine_topn(
            embeddings, query_vec_id, n_per_branch, id_col=id_col,
            vec_col=vec_col, allowed=allowed,
        )
    return rrf_fuse(
        {"kw": kw, "vec": vec.withColumnRenamed("vec_id", "doc_id")},
        k=k,
        rrf_k=rrf_k,
    )
