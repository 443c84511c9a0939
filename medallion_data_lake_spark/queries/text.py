"""Text-analysis operators over the ``documents`` table (north star).

Language-ID, quality scoring, token counting, and fingerprinting for a
training-data pipeline, all as JVM-side expressions (no Python UDFs):
higher-order functions on token arrays keep the hot path inside
whole-stage codegen, so these scale linearly with document count and
shuffle nothing (pure row-level map, SURVEY.md north-star ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_star_table_spread
from . import query
from ._parity import sql_stable_round, stable_round

# English function words used by the n-gram language heuristic. Word-level
# unigram hits are a standard cheap LID signal; the list is tiny so the
# expression stays a constant-folded codegen span.
_EN_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is")


def tokens(col: Column) -> Column:
    """Whitespace tokens; trim first so both engines see no edge empties."""
    return F.split(F.trim(col), r"\s+")


def _stopword_hits(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*_EN_STOPWORDS)))


def quality_score_expr(text_col: Column) -> Column:
    """The rule-tier document quality score (unrounded): length prior +
    stopword-density signal, ``0.5*min(n_tokens,200)/200 +
    0.5*stopword_ratio``. Shared by the oracle-checked
    :func:`doc_quality_score` query and the classifier bootstrap
    (operators/classifier.py:weak_quality_labels) so the two tiers
    cannot drift apart."""
    toks = tokens(text_col)
    n = F.size(toks)
    stop_ratio = _stopword_hits(toks) * F.lit(1.0) / n
    return F.lit(0.5) * F.least(n, F.lit(200)) / 200.0 + F.lit(0.5) * stop_ratio


# SQL fragment mirroring tokens()/_stopword_hits() for the DuckDB oracle.
_SQL_TOKS = r"string_split_regex(trim(text), '\s+')"
_SQL_STOPS = (
    f"len(list_filter({_SQL_TOKS}, t -> t IN {repr(_EN_STOPWORDS)}))"
    .replace("('", "('").replace("',)", "')")
)


@query(
    "doc_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKS}) AS BIGINT)    AS n_tokens,
           CAST(length(text) AS BIGINT)        AS char_len,
           {sql_stable_round(f'length(text) * 1.0 / len({_SQL_TOKS})', 4)} AS chars_per_token
    FROM documents
    """,
    doc="North-star token counting: whitespace tokenization via split + "
        "size, pure map-side (no shuffle).",
    tags=("text",),
    extra=True,  # r14 rotation (gated r9-r13, green): text-family twins doc_repetition_stats (re-gated r14) + doc_lang_id + doc_quality_score stay gated
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_star_table_spread(spark, sf_dir, "documents", "doc_id")
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("char_len"),
        stable_round(F.length("text") * F.lit(1.0) / F.size(toks), 4).alias("chars_per_token"),
    )


@query(
    "doc_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)
             AS n_bpe_tokens
    FROM documents
    """,
    doc="North-star BPE-ish token counting: a pre-tokenizer regex (letter "
        "runs / digit runs / single symbols) approximating BPE segment "
        "boundaries, counted JVM-side with regexp_extract_all.",
    tags=("text",),
    extra=True,  # r9 rotation (gated r2-r8, green): token counting stays
    # driver-gated via doc_token_stats (first gated r9) + corpus_quality_by_lang
)
def doc_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_star_table_spread(spark, sf_dir, "documents", "doc_id")
    return d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                F.lower("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)
            )
        ).cast("long").alias("n_bpe_tokens"),
    )


@query(
    "doc_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT)     AS char_len,
           CAST(length(text) - length(replace(replace(replace(replace(replace(replace(
                text, '.', ''), ',', ''), '!', ''), '?', ''), ';', ''), ':', ''))
                AS BIGINT) AS punct_count,
           {sql_stable_round(f'{_SQL_STOPS} * 1.0 / len({_SQL_TOKS})', 4)} AS stopword_ratio,
           {sql_stable_round(f'0.5 * least(len({_SQL_TOKS}), 200) / 200.0 + 0.5 * ({_SQL_STOPS} * 1.0 / len({_SQL_TOKS}))', 4)} AS quality_score
    FROM documents
    """,
    doc="North-star quality scoring: length prior + stopword-density signal "
        "(the length/punct/stopword-ratio family). Pure map-side; the "
        "punctuation count uses literal replaces so the Java and RE2 regex "
        "dialects can't diverge.",
    tags=("text",),
    # re-gated r12 (out since r3 — oldest-first rotation)
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_star_table_spread(spark, sf_dir, "documents", "doc_id")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    stripped = F.col("text")
    for ch in ".,!?;:":
        stripped = F.replace(stripped, F.lit(ch), F.lit(""))
    stop_ratio = _stopword_hits(toks) * F.lit(1.0) / n
    return d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("char_len"),
        (F.length("text") - F.length(stripped)).cast("long").alias("punct_count"),
        stable_round(stop_ratio, 4).alias("stopword_ratio"),
        stable_round(quality_score_expr(F.col("text")), 4).alias("quality_score"),
    )


@query(
    "doc_lang_id",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN {_SQL_STOPS} >= 3 THEN 'en' ELSE 'unknown' END AS predicted_lang,
           (CASE WHEN {_SQL_STOPS} >= 3 THEN 'en' ELSE 'unknown' END) = lang AS lid_match
    FROM documents
    """,
    doc="North-star language-ID heuristic (unigram stopword hits — the "
        "word-level analog of an n-gram LID). Deterministic, map-side; a "
        "real model would run as an Arrow-batched pandas UDF with the same "
        "shape (operators/text.py).",
    tags=("text",),
    # re-gated r12 (out since r6 — oldest-first rotation)
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_star_table_spread(spark, sf_dir, "documents", "doc_id")
    pred = F.when(_stopword_hits(tokens(F.col("text"))) >= 3, "en").otherwise("unknown")
    return d.select(
        "doc_id",
        "lang",
        pred.alias("predicted_lang"),
        (pred == F.col("lang")).alias("lid_match"),
    )


@query(
    "corpus_quality_by_lang",
    oracle=f"""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS total_tokens,
           {sql_stable_round(f'SUM(len({_SQL_TOKS})) * 1.0 / COUNT(*)', 2)} AS avg_tokens,
           {sql_stable_round(f'SUM({_SQL_STOPS}) * 1.0 / SUM(len({_SQL_TOKS}))', 4)}
             AS corpus_stopword_ratio
    FROM documents
    GROUP BY lang, source
    HAVING COUNT(*) >= 2
    """,
    doc="Corpus-level text QA rollup: per (lang, source) token volumes and "
        "stopword density — the aggregation tier over the map-side text "
        "metrics (what a training-data pipeline monitors per shard). "
        "Integer token counts sum exactly; ratios derived post-aggregation.",
    tags=("text",),
    extra=True,  # r10 rotation (gated r2-r9, green): quality-rule rollups stay
    # gated via doc_gopher_quality_flags + doc_token_stats
)
def corpus_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_star_table_spread(spark, sf_dir, "documents", "doc_id")
    toks = tokens(F.col("text"))
    per_doc = d.select(
        "lang", "source",
        F.size(toks).alias("n_tok"),
        _stopword_hits(toks).alias("n_stop"),
    )
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            stable_round(F.sum("n_tok") * F.lit(1.0) / F.count(F.lit(1)), 2).alias("avg_tokens"),
            stable_round(F.sum("n_stop") * F.lit(1.0) / F.sum("n_tok"), 4).alias("corpus_stopword_ratio"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "corpus_vocab_topk",
    oracle=rf"""
    WITH per_doc AS (
      SELECT term, doc_id, COUNT(*) AS occ
      FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents)
      GROUP BY term, doc_id
    )
    SELECT term,
           CAST(SUM(occ) AS BIGINT)  AS n_occurrences,
           CAST(COUNT(*) AS BIGINT)  AS n_docs
    FROM per_doc
    GROUP BY term
    ORDER BY n_occurrences DESC, term
    LIMIT 25
    """,
    doc="Corpus vocabulary statistics: top-k terms by occurrence with "
        "document frequency — the word-count shape every tokenizer/vocab "
        "induction pass starts from. Two-stage aggregation: doc-local term "
        "counts first (map-side partial combine absorbs the explode fan-out "
        "AND yields document frequency as a plain COUNT — no expand operator "
        "for the distinct), then the term rollup over the already-small "
        "(term, doc) table; top-k via TakeOrderedAndProject, never a global "
        "sort.",
    tags=("text",),
    # re-gated r14 (gated r9-r12, out since the r13 rotation — oldest-first sweep)
)
def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_star_table_spread(spark, sf_dir, "documents", "doc_id")
    per_doc = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    return (
        per_doc.groupBy("term")
        .agg(
            F.sum("occ").cast("long").alias("n_occurrences"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("term"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Unigram LM perplexity scoring (operators/lm.py — the CCNet/Gopher-style
# perplexity-filter shape with an honest unigram model tier)
# ---------------------------------------------------------------------------

_LM_VOCAB = 20   # below the fixture's 31 distinct terms, so OOV is exercised
_LM_ADD_K = 0.5

@query(
    "doc_unigram_logprob",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter({_SQL_TOKS}, t -> t <> '')) AS term
      FROM documents
    ),
    counts AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
    tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM counts),
    vocab AS (
      SELECT term, ln((c + {_LM_ADD_K}) / (n + {_LM_ADD_K} * (v + 1))) AS logp
      FROM counts, tot
      ORDER BY c DESC, term ASC
      LIMIT {_LM_VOCAB}
    ),
    -- LEFT JOIN from documents re-admits empty docs as one NULL
    -- pseudo-token (the Spark side's explode_outer does the same)
    all_toks AS (
      SELECT d.doc_id, t.term
      FROM documents d LEFT JOIN toks t ON d.doc_id = t.doc_id
    )
    SELECT a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           {sql_stable_round(
               f'AVG(COALESCE(vb.logp, (SELECT ln({_LM_ADD_K} / (n + {_LM_ADD_K} * (v + 1))) FROM tot)))',
               4)} AS avg_logp
    FROM all_toks a LEFT JOIN vocab vb ON a.term = vb.term
    GROUP BY a.doc_id
    """,
    doc="Per-document average token log-probability under an add-k "
        "unigram LM trained on the corpus itself (operators/lm.py — the "
        "perplexity-filter shape of CCNet/Gopher with the model honestly "
        "reduced to a unigram tier; a KenLM/neural scorer swaps into the "
        "same bounded vocab-table join). Training is one two-stage count "
        "agg; scoring is explode + LEFT broadcast-join on the top-V vocab "
        "+ one per-doc shuffle. avg_logp only (not exp'd perplexity): "
        "ln/exp differ in final ulps across engines, one transcendental "
        "fewer keeps the 4-dp round stable.",
    tags=("text", "curation"),
    # driver-gated since r4: the LM scoring tier gets its own driver row
    # (doc_quality_score rotated to extra; its expression stays gated via
    # corpus_quality_by_lang)
    extra=True,  # r10 rotation (gated r4-r9, green): vocab/count plumbing stays
    # gated via corpus_vocab_topk + bm25_term_stats (first gated r10); LM
    # scoring oracled locally
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import score_documents, train_unigram_lm

    d = load_star_table_spread(spark, sf_dir, "documents", "doc_id")
    lm = train_unigram_lm(d, vocab_size=_LM_VOCAB, add_k=_LM_ADD_K)
    return score_documents(d, lm).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        stable_round(F.col("avg_logp"), 4).alias("avg_logp"),
    )


# ---------------------------------------------------------------------------
# Gopher/MassiveText quality rules (Rae et al. 2021, "Scaling Language
# Models", table A1) — the rule battery real pretraining pipelines run
# before any model-tier filter. Word-level stats are codegen HOFs (zero
# shuffle); the repetition signal (top-bigram fraction) is the one rule
# that genuinely needs a group-count, planned as explode + ONE shuffled
# aggregation on (doc_id, bigram) — at 100 TB that is a map-side-combined
# hash agg whose key space is bounded by document length, not corpus size.
# ---------------------------------------------------------------------------

_SQL_GOPHER = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents
),
stats AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         list_sum(list_transform(t, w -> len(w))) * 1.0 / len(t) AS mwl,
         len(list_filter(t, w -> regexp_matches(w, '^[a-z]+$'))) * 1.0
             / len(t) AS fa,
         CAST(len(list_intersect(list_distinct(t),
              {list(_EN_STOPWORDS)!r})) AS INT) AS n_stopwords
  FROM toks
),
bc AS (
  SELECT doc_id, bg, COUNT(*) AS c
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i + 1])) AS bg
    FROM toks
  )
  GROUP BY doc_id, bg
),
rep AS (
  SELECT doc_id, MAX(c) * 1.0 / SUM(c) AS top_frac FROM bc GROUP BY doc_id
)
SELECT s.doc_id,
       s.n_words,
       {sql_stable_round('s.mwl', 4)} AS mean_word_len,
       {sql_stable_round('s.fa', 4)} AS frac_alpha_words,
       s.n_stopwords,
       {sql_stable_round('COALESCE(r.top_frac, 0.0)', 4)} AS top_bigram_frac,
       (s.n_words BETWEEN 50 AND 100000
        AND {sql_stable_round('s.mwl', 4)} BETWEEN 3 AND 10
        AND {sql_stable_round('s.fa', 4)} >= 0.8
        AND s.n_stopwords >= 2
        AND {sql_stable_round('COALESCE(r.top_frac, 0.0)', 4)} <= 0.2)
           AS keep
FROM stats s LEFT JOIN rep r USING (doc_id)
"""


@query(
    "doc_gopher_quality_flags",
    oracle=_SQL_GOPHER,
    doc="Gopher/MassiveText rule battery (Rae et al. 2021 A1, adapted to "
        "the fixture's vocabulary): word-count bounds [50, 100k], mean "
        "word length in [3, 10], alphabetic-word fraction >= 0.8, >= 2 "
        "distinct stopwords, and the repetition rule — fraction of "
        "bigram occurrences taken by the most common bigram <= 0.2. "
        "Word stats are zero-shuffle codegen HOFs; the repetition "
        "signal explodes bigrams into one map-side-combined (doc_id, "
        "bigram) aggregation. The keep flag is computed from the ROUNDED "
        "metrics in both engines so boundary docs cannot flip across "
        "float formatting.",
    tags=("text", "curation"),
    extra=True,  # r11 rotation (gated r7-r10, green): quality/text family
    # stays gated via doc_token_stats + doc_repetition_stats
)
def doc_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_star_table_spread(spark, sf_dir, "documents", "doc_id")
    toks = tokens(F.col("text"))
    base = d.select("doc_id", toks.alias("t"))

    n = F.size("t")
    mwl = stable_round(
        F.aggregate("t", F.lit(0), lambda acc, w: acc + F.length(w))
        * F.lit(1.0) / n,
        4,
    )
    fa = stable_round(
        F.size(F.filter("t", lambda w: w.rlike("^[a-z]+$"))) * F.lit(1.0) / n,
        4,
    )
    ns = F.size(
        F.array_intersect(
            F.array_distinct("t"),
            F.array(*[F.lit(s) for s in _EN_STOPWORDS]),
        )
    ).cast("int")
    stats = base.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        mwl.alias("mean_word_len"),
        fa.alias("frac_alpha_words"),
        ns.alias("n_stopwords"),
    )

    bigram = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at("t", i), F.element_at("t", i + 1)
        ),
    )
    rep = (
        base.select("doc_id", F.explode(bigram).alias("bg"))
        .groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg(
            stable_round(
                F.max("count") * F.lit(1.0) / F.sum("count"), 4
            ).alias("top_bigram_frac")
        )
    )

    out = stats.join(rep, "doc_id", "left").select(
        "doc_id", "n_words", "mean_word_len", "frac_alpha_words",
        "n_stopwords",
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
    )
    keep = (
        F.col("n_words").between(50, 100_000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("frac_alpha_words") >= 0.8)
        & (F.col("n_stopwords") >= 2)
        & (F.col("top_bigram_frac") <= 0.2)
    )
    return out.withColumn("keep", keep)
