"""Keyword retrieval over the ``documents`` corpus: BM25 ranking and the
terms-with-df audit — the query faces of ``operators/inverted_index.py``.

These two queries compute BM25 from the raw corpus in one plan (so they
are fully DuckDB-oracleable and self-contained on the fixture tables);
the PERSISTED index path — posting lists with per-file term blooms,
incremental atomic appends, pruned point-reads, streaming maintenance —
is the operator module, exercised in tests/test_inverted_index.py. Both
paths share the same tokenizer (queries/text.tokens), the same
``bm25_idf`` / ``bm25_term_score`` expressions, and the same
decimal-sum discipline, so the oracle-checked arithmetic here IS the
arithmetic the index serves.

Reference anchor: the reference answers keyword questions with ad-hoc
SQL scans (reference: sakila-data-lake/query_datalake.py:139-146); BM25
over posting lists is the retrieval modality a training-data pipeline
needs for contamination audits and targeted domain pulls (north-star
"text analysis", BASELINE.json).

Cross-engine float discipline (queries/_parity.py): every constant is
written as the SAME literal arithmetic in both engines (``1.2 + 1.0``,
not ``2.2``-vs-computed), idf/score terms evaluate identical primitive
ops on integer inputs, and per-term scores are decimal-cast before the
per-document sum so ranking order is exact and order-independent.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_star_table, load_star_table_spread
from ..operators.inverted_index import (
    BM25_B,
    BM25_K1,
    bm25_idf,
    bm25_term_score,
    build_postings,
    clean_tokens,
)
from . import query
from ._parity import sql_stable_round, stable_round
from .similarity import _SQL_COS, _SQL_NRM  # single source of truth for
# the cosine/norm SQL shapes shared with the gated similarity queries
from .text import _SQL_TOKS as _SQL_RAW_TOKS

# Query terms spanning the fixture's idf range: 'dup' is rare (df~25 of
# 500 at sf0.01 — the near-duplicate marker), 'vector' and 'scan' are
# mid/common (df~380-400). Distinct idf tiers make the ranking
# non-trivial: a single rare-term hit outscores several common-term hits.
_Q_TERMS = ("dup", "vector", "scan")
_TOP_K = 15

# the shared raw tokenizer (queries/text._SQL_TOKS) with empties dropped
# — mirrors operators/inverted_index.clean_tokens
_SQL_TOKS = rf"list_filter({_SQL_RAW_TOKS}, t -> t <> '')"
# derived from _Q_TERMS so the two engines can never score different sets
_SQL_TERMS = "(" + ", ".join(f"'{t}'" for t in _Q_TERMS) + ")"

# BM25 constants as LITERAL ARITHMETIC mirrored in both engines; the
# Spark side passes the same Python floats into the shared expressions.
_SQL_BM25_SCORE = """
    ln(1.0 + (c.n - f.df + 0.5) / (f.df + 0.5))
    * (t.tf * (1.2 + 1.0)
       / (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * d.dl / (c.sum_dl / c.n))))
"""


@query(
    "bm25_topk_docs",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(len({_SQL_TOKS}) AS BIGINT) AS dl FROM documents
    ),
    c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dl) AS BIGINT) AS sum_dl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term IN {_SQL_TERMS}
      GROUP BY doc_id, term
    ),
    f AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df
      FROM tf GROUP BY term
    ),
    scored AS (
      SELECT t.doc_id,
             CAST({_SQL_BM25_SCORE} AS DECIMAL(28,12)) AS s
      FROM tf t
      JOIN f USING (term)
      JOIN dl d USING (doc_id)
      CROSS JOIN c
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
           {sql_stable_round('CAST(SUM(s) AS DOUBLE)', 6)} AS score
    FROM scored
    GROUP BY doc_id
    ORDER BY SUM(s) DESC, doc_id ASC
    LIMIT {_TOP_K}
    """,
    doc="North-star keyword retrieval: Okapi BM25 top-k over the corpus "
        "for a fixed term set. Plan (r15 restructure, audited via "
        "explain-formatted): per-doc term frequencies for the FIXED "
        "query-term set are array expressions over one tokenize pass — "
        "no explode, no (term, doc) shuffle, no doclens join; corpus "
        "stats (N, Σdl, per-term df) are ONE broadcast 1-row aggregate; "
        "per-term scores are decimal-cast before the per-doc sum "
        "(exact, order-independent ranking — decimal addition is "
        "associative, so the fixed-order 3-term sum equals the oracle's "
        "row sum); top-k is TakeOrderedAndProject, never a global sort. "
        "At cluster scale this is one map pass over the corpus + a "
        "scalar broadcast — the explode/groupBy/join pipeline it "
        "replaces shuffled matched postings AND the full doclens table "
        "(plans/r15/bm25_topk_docs_{before,after}.txt: 9 exchange nodes "
        "-> 4, 4 document scans -> 2). The persisted-index variant "
        "(operators/inverted_index.py) serves the same arithmetic from "
        "bloom-pruned posting point-reads without scanning the corpus "
        "at all.",
    tags=("text", "retrieval"),
)  # first gated r10 (new operator this round)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_star_table_spread(spark, sf_dir, "documents", "doc_id")
    return (
        _bm25_doc_scores(d)
        .orderBy(F.desc("_score"), F.asc("doc_id"))
        .limit(_TOP_K)
        .select(
            "doc_id",
            "n_terms_matched",
            stable_round(F.col("_score").cast("double"), 6).alias("score"),
        )
    )


def _bm25_doc_scores(d: DataFrame) -> DataFrame:
    """(doc_id, n_terms_matched, _score decimal) for the fixed ``_Q_TERMS``.

    One tokenize pass computes dl and per-term tf as array expressions
    (``size(filter(toks, t == term))``) — the fixed, tiny term set is
    what makes the no-explode form possible; the vocabulary-wide audits
    (bm25_term_stats, corpus_vocab_topk) still explode. Corpus stats
    (n, sum_dl, df per term) come from ONE 1-row aggregate broadcast to
    the scoring pass. Arithmetic is the shared bm25_idf/bm25_term_score
    expressions on the same integers the postings pipeline produced, so
    the doubles are bit-identical to the oracle's; only-zero-tf docs are
    filtered exactly like the oracle's absent posting rows (NULL-text
    docs have NULL tf and drop out the same way).

    The token array is projected behind an alias in its own projection:
    it is multiply-referenced and non-cheap, so CollapseProject keeps
    the boundary and the tokenizer runs once per doc, not once per
    reference (same discipline as queries/multimodal.py).
    """
    toked = d.select(
        "doc_id", clean_tokens(F.col("text")).alias("_toks")
    )
    def _eq(term: str):
        # a two-arg lambda would be taken as pyspark's (element, index)
        # form — bind the term via a closure instead
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter(F.col("_toks"), _eq(t)))
        .cast("long")
        .alias(f"_tf{i}")
        for i, t in enumerate(_Q_TERMS)
    ]
    # _hit = "matches ANY query term" as ONE arrays_overlap — this is
    # the column the scoring branch filters on. The optimizer pushes
    # that filter to the scan BY SUBSTITUTION, so whatever expression
    # sits here is what every input row evaluates pre-shuffle: the
    # former OR-of-per-term-tf form re-ran the whole tokenize chain
    # once PER TERM below the exchange (r16, guide §2.3/§7.2 — watch
    # what flows into the scan filter). Pushdown itself stays: docs
    # matching no term must not cross the exchange at corpus scale.
    narrow = toked.select(
        "doc_id",
        F.size(F.col("_toks")).cast("long").alias("dl"),
        F.arrays_overlap(
            F.col("_toks"), F.array(*[F.lit(t) for t in _Q_TERMS])
        ).alias("_hit"),
        *tf_cols,
    )
    stats = narrow.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"_tf{i}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"_df{i}")
            for i in range(len(_Q_TERMS))
        ],
    )
    zero = F.lit(0).cast("decimal(28,12)")
    term_scores = [
        F.when(
            F.col(f"_tf{i}") > 0,
            bm25_term_score(
                F.col(f"_tf{i}"), F.col("dl"),
                F.col("sum_dl") / F.col("n"),
                bm25_idf(F.col("n"), F.col(f"_df{i}")), BM25_K1, BM25_B,
            ).cast("decimal(28,12)"),
        ).otherwise(zero)
        for i in range(len(_Q_TERMS))
    ]
    n_matched = reduce(
        lambda acc, i: acc
        + F.when(F.col(f"_tf{i}") > 0, 1).otherwise(0).cast("long"),
        range(1, len(_Q_TERMS)),
        F.when(F.col("_tf0") > 0, 1).otherwise(0).cast("long"),
    )
    return (
        narrow.filter(F.col("_hit"))
        .crossJoin(F.broadcast(stats))  # 1-row scalar combine
        .select(
            "doc_id",
            n_matched.alias("n_terms_matched"),
            reduce(lambda a, b: a + b, term_scores).alias("_score"),
        )
    )


@query(
    "bm25_term_stats",
    oracle=rf"""
    WITH per_doc AS (
      SELECT term, doc_id, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents)
      GROUP BY term, doc_id
    ),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(tf) AS BIGINT)  AS cf,
           {sql_stable_round('ln(1.0 + (c.n - COUNT(*) + 0.5) / (COUNT(*) + 0.5))', 6)} AS idf
    FROM per_doc CROSS JOIN c
    GROUP BY term, c.n
    ORDER BY df DESC, term ASC
    LIMIT 25
    """,
    doc="The terms-with-df audit: document frequency, collection "
        "frequency, and BM25 idf for the corpus vocabulary, top-25 by "
        "df. The registry face of operators/inverted_index.term_stats "
        "(whose persisted form folds per-batch deltas instead of "
        "re-scanning). Two-stage aggregation identical to "
        "corpus_vocab_topk; idf is pure arithmetic on the integer "
        "counts, so the audit is exactly oracle-checkable.",
    tags=("text", "retrieval"),
    # re-gated r14 (gated r10-r12, out since the r13 rotation — oldest-first sweep)
)
def bm25_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_star_table_spread(spark, sf_dir, "documents", "doc_id")
    # lazy 1-row corpus count (the oracle's CROSS JOIN c), not d.count().
    # Counted from the UNSPREAD table (r16): a count needs no per-row
    # compute, so the spread repartition only shuffled every (pruned)
    # row to then throw it away — the unspread branch counts at the scan
    # and ships 1 partial row per split (§2.4: remove the exchange).
    corpus = load_star_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    per_doc = build_postings(d)
    return (
        per_doc.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
        .crossJoin(F.broadcast(corpus))
        .select(
            "term", "df", "cf",
            stable_round(bm25_idf(F.col("n"), F.col("df")), 6).alias("idf"),
        )
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: RRF fusion of the BM25 keyword ranking and a cosine
# vector ranking (operators/hybrid.py is the persisted-index face).
# The fixture's embeddings share the documents' id space (vec_id ==
# doc_id), so the fusion key is the document id itself.
_RRF_K = 60          # standard smoothing constant (Cormack et al.)
_N_BRANCH = 20       # per-branch candidate depth
_HYBRID_K = 15
_Q_VEC_ID = 0        # "like this example": query = stored vector 0

# raw (unrounded) RRF sum: integer rank in, fixed-shape double out —
# identical primitives left-to-right in both engines, so ordering by
# the RAW value is exact (rounding to any display scale could merge
# sums whose true gap is ~1/(k+n)^4; the tiebreak must not kick in on
# engine-dependent values, so no rounding before the ORDER BY)
_SQL_RRF = f"""
    COALESCE(1.0 / ({_RRF_K} + kw.kw_rank), 0.0)
  + COALESCE(1.0 / ({_RRF_K} + vec.vec_rank), 0.0)
"""


@query(
    "hybrid_rrf_topk",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(len({_SQL_TOKS}) AS BIGINT) AS dl FROM documents
    ),
    c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dl) AS BIGINT) AS sum_dl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term IN {_SQL_TERMS}
      GROUP BY doc_id, term
    ),
    f AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df
      FROM tf GROUP BY term
    ),
    scored AS (
      SELECT t.doc_id,
             CAST({_SQL_BM25_SCORE} AS DECIMAL(28,12)) AS s
      FROM tf t
      JOIN f USING (term)
      JOIN dl d USING (doc_id)
      CROSS JOIN c
    ),
    kw AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY SUM(s) DESC, doc_id ASC)
                  AS INT) AS kw_rank
      FROM scored GROUP BY doc_id
      QUALIFY kw_rank <= {_N_BRANCH}
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {_SQL_NRM} AS nrm
          FROM embeddings),
    q AS (SELECT v, nrm FROM e WHERE vec_id = {_Q_VEC_ID}),
    vec AS (
      SELECT e.vec_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY {sql_stable_round(_SQL_COS, 6)} DESC, e.vec_id ASC)
                  AS INT) AS vec_rank
      FROM e CROSS JOIN q WHERE e.vec_id <> {_Q_VEC_ID}
      QUALIFY vec_rank <= {_N_BRANCH}
    ),
    fused AS (
      SELECT COALESCE(kw.doc_id, vec.vec_id) AS doc_id,
             kw.kw_rank, vec.vec_rank,
             {_SQL_RRF} AS s
      FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.vec_id
    )
    SELECT doc_id, kw_rank, vec_rank,
           {sql_stable_round('s', 9)} AS rrf_score
    FROM fused
    ORDER BY s DESC, doc_id ASC
    LIMIT {_HYBRID_K}
    """,
    doc="North-star hybrid retrieval (r10 verdict #1): reciprocal-rank "
        f"fusion of the BM25 keyword top-{_N_BRANCH} (terms {_Q_TERMS}) "
        f"and the cosine top-{_N_BRANCH} against stored vector "
        f"{_Q_VEC_ID} — 'docs like this example that also mention X'. "
        "Pure integer-rank arithmetic (1/(60+rank), absent branch "
        "contributes 0) so the fusion is exactly oracleable; ordering "
        "uses the RAW double sum (fixed expression shape = identical "
        "doubles both engines) with doc_id tiebreak. Plan: each branch "
        "bounds itself via TakeOrderedAndProject before the rank "
        "window touches it (never a corpus-wide window), the vector "
        "query side is a broadcast 1-row cross join, and the fusion is "
        "a full-outer join of two 20-row frames — metadata-scale at "
        "any corpus size. operators/hybrid.py serves the same "
        "arithmetic from the persisted inverted index + embeddings "
        "(tests/test_hybrid.py proves path agreement).",
    tags=("text", "retrieval", "similarity"),
)  # first gated r11 (new operator this round)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # branch ranking + fusion come from operators/hybrid.py — the SAME
    # code the persisted-path hybrid_search runs, so the gated
    # arithmetic and the operator cannot drift (r11 review finding:
    # this function originally re-implemented them line-for-line)
    from ..operators.hybrid import cosine_topn, ranked, rrf_fuse

    # --- keyword branch: the bm25_topk_docs plan, ranked not scored
    # (r15: same single-map-pass restructure — see _bm25_doc_scores)
    d = load_star_table_spread(spark, sf_dir, "documents", "doc_id")
    kw_topn = (
        _bm25_doc_scores(d)
        .select("doc_id", "_score")
        .orderBy(F.desc("_score"), F.asc("doc_id"))
        .limit(_N_BRANCH)  # TakeOrderedAndProject bounds the branch
    )
    kw = ranked(kw_topn, [F.desc("_score")]).select("doc_id", "rank")

    # --- vector branch: cosine against stored vector _Q_VEC_ID
    e = load_star_table_spread(spark, sf_dir, "embeddings", "vec_id")
    vec = cosine_topn(e, _Q_VEC_ID, _N_BRANCH)

    # --- fusion: full-outer on the shared id space, RRF sum
    fused = rrf_fuse(
        {"kw": kw, "vec": vec.withColumnRenamed("vec_id", "doc_id")},
        k=_HYBRID_K,
        rrf_k=_RRF_K,
    )
    return fused.select(
        "doc_id", "kw_rank", "vec_rank",
        stable_round("rrf_score", 9).alias("rrf_score"),
    )


# ---------------------------------------------------------------------------
# Exact-phrase retrieval (r10 verdict #2): the query face of the bigram
# posting table (operators/inverted_index.py `phrase_candidates` /
# `phrase_search`). Contamination audits ask "which documents contain
# this exact string" constantly; the phrase decomposes into adjacent
# bigrams whose posting intersection is a NECESSARY condition, and the
# exact contiguous-run residual is verified only on those candidates.
_PHRASE = ("stream", "table", "hash")  # df 3/7/11 at sf0.001/0.01/0.1
_SQL_PHRASE_CONDS = " AND ".join(
    f"a[i+{j}] = '{t}'" for j, t in enumerate(_PHRASE)
)


@query(
    "phrase_match_docs",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS a FROM documents
    ),
    pos AS (
      SELECT doc_id, i
      FROM toks, unnest(range(1, len(a) - {len(_PHRASE) - 2})) AS t(i)
      WHERE {_SQL_PHRASE_CONDS}
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM pos GROUP BY doc_id
    ORDER BY doc_id ASC
    """,
    doc="North-star exact-phrase retrieval: documents containing the "
        f"contiguous token run {' '.join(_PHRASE)!r}, with occurrence "
        "counts. The Spark side computes it THE WAY THE INDEX SERVES "
        "IT — bigram-intersection candidates first (every adjacent "
        "bigram present: a necessary condition that, persisted, is a "
        "bloom-pruned posting read instead of a corpus scan), then the "
        "exact contiguous-run residual (shared phrase_position_hits "
        "expression) on the candidates only; the oracle states the "
        "bare phrase semantics, so parity proves the two-stage form "
        "exact. operators/inverted_index.phrase_search serves the same "
        "answer from the persisted bigram table (tests/test_phrase.py "
        "proves doc-set equality and reports the pruning).",
    tags=("text", "retrieval"),
)  # first gated r11 (new operator this round)
def phrase_match_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.inverted_index import (
        bigram_tokens,
        clean_tokens,
        phrase_bigrams,
        phrase_position_hits,
    )

    phrase = list(_PHRASE)
    bgs = sorted(set(phrase_bigrams(phrase)))
    d = load_star_table_spread(spark, sf_dir, "documents", "doc_id")
    # tokenize ONCE behind a projection boundary and share the array
    # between the bigram-candidate branch and the exact residual; the
    # residual is the explode+count shape of phrase_position_hits (the
    # per-row HOF form ran 3.4s at sf0.1 — see its docstring)
    toks = d.select("doc_id", clean_tokens(F.col("text")).alias("_toks"))
    cand = (
        toks.select(
            "doc_id",
            F.explode(bigram_tokens(F.col("_toks"))).alias("bigram"),
        )
        .filter(F.col("bigram").isin(bgs))
        .groupBy("doc_id")
        .agg(F.count_distinct("bigram").alias("_nb"))
        .filter(F.col("_nb") == len(bgs))
        .select("doc_id")
    )
    # candidates only carry the residual
    return phrase_position_hits(toks.join(cand, "doc_id"), phrase).orderBy(
        F.asc("doc_id")
    )
