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
