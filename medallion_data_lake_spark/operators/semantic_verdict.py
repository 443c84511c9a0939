"""Materialized semantic-dedup VERDICT table — the amortization lever
the r13 SCALE.md named: under a pinned codebook the per-doc verdict
``(doc_id, cluster_id, group_id, is_kept)`` is a stable artifact, so
re-curation should pay ONE slim join instead of re-running the
assignment + pair join + connected components every run (~+16s at the
50k clone, r13 measurement).

Same maintenance contract as the persisted embedding column
(operators/embeddings.py): a versioned table, provenance sidecar
written BEFORE the first commit, incremental appends for new docs
only. The sidecar pins (codebook fingerprint = md5 of the centroid
matrix, embedder, dim, threshold, cluster_size); a call or consumer
with different parameters refuses — a verdict computed under another
codebook or threshold would silently mean something else.

APPEND-MONOTONE semantics (the deliberate deviation from re-running
batch SemDeDup, chosen because training-data releases want KEEP
decisions that never flip under appends):

- existing rows are never rewritten: once kept, kept;
- a new doc linking (cosine ≥ threshold, within its codebook cell) to
  existing docs joins the SMALLEST linked existing group as a
  non-keeper;
- new docs linking only each other form components (the bounded
  hybrid connected-components) with min-id keepers — exactly batch
  semantics;
- the only divergences from a fresh batch run: (a) a new doc that
  BRIDGES two existing groups does not merge them retroactively (both
  keepers stay — one more representative than batch would keep, never
  fewer groups than batch); (b) incremental candidate pairing uses the
  codebook's BASE cells, ignoring the population-dependent oversized-
  bucket split, so it sees a SUPERSET of batch's candidate pairs
  (links can only be found, not missed, relative to batch within a
  cell).

Scale shape: the increment assigns vectors map-side (broadcast ≤k_cap
centroids), pairs only within cells that contain a new doc (semi-join
pruned), and the component step is the same bounded hybrid the batch
path uses. Nothing scans text; the verdict table itself is 4 slim
columns.

Reference anchor: the reference re-derives every analytic per run
(sakila-data-lake/silver_to_gold.py); maintained incremental artifacts
are the capability it lacks.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VERDICT_SIDECAR = "_verdict.json"


def codebook_fingerprint(model) -> str:
    """md5 of the centroid matrix — the codebook's identity. Two fits
    with the same (data, seed, k) reproduce it; anything else differs."""
    import numpy as np

    arr = np.asarray(model.clusterCenters(), dtype=np.float64)
    return hashlib.md5(arr.tobytes()).hexdigest()


def read_verdict_sidecar(table: str) -> dict | None:
    p = os.path.join(table, VERDICT_SIDECAR)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _coverage_guard(docs, embeddings, id_col, vec_id_col):
    missing = docs.select(id_col).join(
        embeddings.select(F.col(vec_id_col).alias(id_col)),
        id_col, "left_anti",
    ).count()
    if missing > 0:
        raise ValueError(
            f"{missing} input document(s) have no embedding row — their "
            "verdicts cannot be computed and they would silently bypass "
            "semantic dedup; materialize the embedding column first"
        )


def materialize_semantic_verdict(
    spark,
    docs: DataFrame,
    embeddings: DataFrame,
    table: str,
    codebook_path: str,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    cluster_size: int = 64,
) -> dict:
    """Create or incrementally extend the verdict table for ``docs``
    (vectors from ``embeddings``, keyed ``vec_id_col``; every doc must
    be covered). First call = exact batch ``ann.semantic_dedup`` under
    the loaded codebook; later calls append verdicts for NEW ids only
    under the append-monotone semantics in the module docstring.

    Returns {"mode": "initial"|"incremental"|"noop", "n_new",
    "n_total", "version"}."""
    from .ann import (
        kmeans_codebook_bucket,
        load_semantic_codebook,
        semantic_dedup,
    )
    from .versioned import commit, latest_version, read_table

    emb = embeddings.select(
        F.col(vec_id_col).alias(id_col), F.col(vec_col).alias("_vec")
    )
    probe = emb.select(F.size("_vec").alias("d")).limit(1).first()
    dim = int(probe["d"]) if probe and probe["d"] is not None else 64
    model = load_semantic_codebook(codebook_path, expect_dim=dim)
    fp = codebook_fingerprint(model)
    sidecar = os.path.join(table, VERDICT_SIDECAR)
    params = {"codebook_fingerprint": fp, "dim": dim,
              "threshold": float(threshold),
              "cluster_size": int(cluster_size)}

    existing_version = latest_version(table)
    if existing_version is None:
        _coverage_guard(docs, embeddings, id_col, vec_id_col)
        os.makedirs(table, exist_ok=True)
        with open(sidecar, "w") as fh:  # sidecar BEFORE the first commit
            json.dump(params, fh)
        emb_docs = emb.join(docs.select(id_col), id_col, "left_semi") \
            .withColumnRenamed("_vec", vec_col)
        verdict = semantic_dedup(
            emb_docs, id_col=id_col, vec_col=vec_col,
            threshold=threshold, cluster_size=cluster_size,
            dim=dim, model=model,
            # persist each row's PRE-split codebook cell: increments
            # pair on base cells, so a stored base_cell lets them prune
            # the existing side with a semi-join on this slim column
            # instead of re-running the centroid assignment over the
            # full corpus every increment (r16, r15 verdict #4)
            keep_base_cell=True,
        )
        res = commit(verdict, table, mode="append",
                     stats_cols=(id_col,), bloom_cols=(id_col,))
        version = res["version"] if isinstance(res, dict) else res
        n = read_table(spark, table).count()
        return {"mode": "initial", "n_new": n, "n_total": n,
                "version": version}

    meta = read_verdict_sidecar(table)
    if meta is None:
        raise ValueError(
            f"verdict table at {table} has committed versions but no "
            f"{VERDICT_SIDECAR} sidecar — refusing to append into an "
            "unverifiable verdict space; re-materialize into a new table"
        )
    if meta != params:
        raise ValueError(
            f"verdict table at {table} was materialized under {meta} "
            f"but this call uses {params} — verdicts from different "
            "codebooks/thresholds must not mix; use a new table"
        )

    have = read_table(spark, table)
    new_docs = docs.select(id_col).join(
        have.select(id_col), id_col, "left_anti").distinct()
    if new_docs.isEmpty():
        return {"mode": "noop", "n_new": 0,
                "n_total": have.count(),
                "version": existing_version}
    _coverage_guard(docs, embeddings, id_col, vec_id_col)
    # the EXISTING side comes from the verdict table's own ids, not the
    # caller's docs frame — a caller materializing just the new drop
    # (docs ⊄ full corpus) must still see attachments to every existing
    # group, and that requires every existing id's vector to be present
    _coverage_guard(have.select(id_col), embeddings, id_col, vec_id_col)

    def _assign(side_ids) -> DataFrame:
        # BASE codebook cells, map-side: broadcast centroids, no shuffle
        return kmeans_codebook_bucket(
            emb.join(side_ids, id_col, "left_semi")
               .withColumnRenamed("_vec", vec_col),
            vec_col=vec_col, model=model,
        ).select(id_col, vec_col, F.col("bucket_code").alias("_cell"))

    new_side = _assign(F.broadcast(new_docs)).localCheckpoint(eager=True)
    hot_cells = new_side.select("_cell").distinct()
    if "base_cell" in have.columns:
        # O(delta) existing side (r16, r15 verdict #4): the verdict
        # table already stores each existing row's BASE codebook cell,
        # so prune existing ids to the hot cells with a semi-join on
        # that slim stored column and fetch vectors only for the
        # survivors — no centroid re-assignment over the full corpus.
        # (Rows in hot cells get their vectors via one id-keyed join;
        # everything outside a hot cell never touches the embeddings.)
        old_ids = (
            have.select(id_col, "group_id",
                        F.col("base_cell").alias("_cell"))
            .join(F.broadcast(hot_cells), "_cell", "left_semi")
        )
        old_side = emb.withColumnRenamed("_vec", vec_col).join(
            old_ids, id_col)
    else:
        # legacy table (pre-base_cell schema): full re-assignment —
        # correctness identical, cost O(corpus) per increment
        old_side = (
            _assign(have.select(id_col))
            .join(F.broadcast(hot_cells), "_cell", "left_semi")
            .join(have.select(id_col, "group_id"), id_col)
        )

    from ..functions import dot, l2_norm

    def _norms(df, idc, tag):
        return df.select(
            F.col(idc).alias(f"id_{tag}"),
            F.col(vec_col).alias(f"v_{tag}"),
            l2_norm(F.col(vec_col)).alias(f"n_{tag}"),
            F.col("_cell").alias(f"c_{tag}"),
            *([F.col("group_id").alias("g_b")] if tag == "b" and
              "group_id" in df.columns else []),
        )

    a = _norms(new_side, id_col, "a")
    # zero-norm guard (same as bucketed_near_dup_pairs): an empty-text
    # doc's zero vector is a near-dup of nothing, not a crash
    _den = F.col("n_a") * F.col("n_b")
    cos = F.when(
        _den != 0, dot(F.col("v_a"), F.col("v_b")) / _den
    ).otherwise(F.lit(0.0))

    # new-new links (a < b halves the pair space, as in the batch path)
    b_new = _norms(new_side, id_col, "b")
    nn = (
        a.join(b_new, (F.col("c_a") == F.col("c_b"))
               & (F.col("id_a") < F.col("id_b")))
        .filter(cos >= threshold)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    # new-existing attachments: edge to the existing doc's GROUP id
    b_old = _norms(old_side, id_col, "b")
    ne = (
        a.join(b_old, F.col("c_a") == F.col("c_b"))
        .filter(cos >= threshold)
        .select(F.col("id_a").alias("src"), F.col("g_b").alias("dst"))
    )
    from .dedup_graph import connected_components

    comp = connected_components(nn.unionByName(ne))
    groups = old_side.select(F.col("group_id").alias("node")).distinct()
    # per component: the smallest linked EXISTING group (if any) wins —
    # append-monotone: existing keepers never lose their group
    comp_attach = (
        comp.join(groups, "node", "left_semi")
        .groupBy("component")
        .agg(F.min("node").alias("_g_exist"))
    )
    # appended rows match the table's schema: base_cell (== the base
    # cell the increment assigned, which is also cluster_id here) only
    # when the table was materialized with it
    out_cols = [id_col, "cluster_id"]
    if "base_cell" in have.columns:
        out_cols.append("base_cell")
    out_cols += ["group_id", "is_kept"]
    new_comp = (
        new_side.select(
            id_col,
            F.col("_cell").alias("cluster_id"),
            F.col("_cell").alias("base_cell"),
        )
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .join(comp_attach, "component", "left")
        .withColumn(
            "group_id",
            F.coalesce(F.col("_g_exist"), F.col("component"),
                       F.col(id_col)),
        )
        .withColumn(
            "is_kept",
            F.col("_g_exist").isNull()
            & (F.col("group_id") == F.col(id_col)),
        )
        .select(*out_cols)
    )
    res = commit(new_comp, table, mode="append",
                 stats_cols=(id_col,), bloom_cols=(id_col,))
    version = res["version"] if isinstance(res, dict) else res
    n_new = new_side.count()
    return {"mode": "incremental", "n_new": int(n_new),
            "n_total": read_table(spark, table).count(),
            "version": version}
