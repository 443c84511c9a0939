"""Arrow-batched text kernels (the pandas-UDF tier of the text stack).

The first-tier text operators are pure JVM expressions
(queries/text.py — token counts, quality scores, stopword LID). This
module is the second tier: vectorized pandas UDFs for logic that
genuinely needs Python (a real LID model, a real BPE tokenizer). Here
they hold deterministic heuristic implementations with the exact
signatures a model swap needs — the Spark-side contract (Arrow batches,
no shuffle, column in → column out) is the deliverable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Character n-gram profiles for a tiny trigram LID. A real model (fasttext
# etc.) replaces _score_profiles; the UDF shape is identical.
_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", "ion", "ent"),
    "de": ("der", "die", "und", "sch", "ein"),
    "fr": ("les", "ent", "que", "des", "ion"),
    "es": ("que", "los", "ión", "ent", "ado"),
}


@pandas_udf(T.StringType())
def lang_id_trigram(texts: pd.Series) -> pd.Series:
    """Vectorized character-trigram language ID (Arrow-batched)."""

    def classify(t: str) -> str:
        if not t:
            return "unknown"
        low = t.lower()
        best, best_score = "unknown", 0
        for lang, grams in _PROFILES.items():
            score = sum(low.count(g) for g in grams)
            if score > best_score:
                best, best_score = lang, score
        return best

    return texts.map(classify)


@pandas_udf(T.IntegerType())
def token_count_bpe_ish(texts: pd.Series) -> pd.Series:
    """Vectorized BPE-ish token count (regex pre-tokenizer, pandas str API)."""
    return (
        texts.fillna("")
        .str.lower()
        .str.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]")
        .map(len)
        .astype("int32")
    )


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the pandas-UDF text features; map-side only, no shuffle."""
    return df.withColumn("lang_pred", lang_id_trigram(F.col(text_col))).withColumn(
        "bpe_tokens", token_count_bpe_ish(F.col(text_col))
    )


# ---------------------------------------------------------------------------
# PII redaction — JVM-tier, NOT a pandas kernel: regexp_count +
# regexp_replace are codegen expressions, so scrubbing stays inside
# whole-stage codegen (a Python regex pass over 100 TB of text would be
# the single slowest stage in the pipeline).
# ---------------------------------------------------------------------------

# Ordered: counts/replacements apply sequentially on the progressively
# redacted text, so an email's digits are never double-counted as an id.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?\d[\d\-() ]{7,}\d"),
    ("id_number", r"\b\d{9,}\b"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    replacement: str = "[REDACTED]",
) -> DataFrame:
    """Replace email / phone / long-id spans in ``text_col`` and attach
    ``n_pii_redactions`` (total spans replaced). The standard scrub
    stage before a corpus leaves curation — same posture as the
    blocklist scrub (curation_pipeline.blocklist_scrub) but span-level:
    the document survives, the span does not.

    One map pass, zero shuffle, all codegen; patterns are conservative
    classics (redact too much rather than leak). Swap PII_PATTERNS for
    a jurisdiction-specific set without touching the plan shape."""
    text = F.col(text_col)
    n = F.lit(0)
    for _, pat in PII_PATTERNS:
        n = n + F.regexp_count(text, F.lit(pat))
        text = F.regexp_replace(text, pat, replacement)
    return df.withColumn("n_pii_redactions", n.cast("int")).withColumn(
        text_col, text
    )
