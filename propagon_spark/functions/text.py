"""Text analysis for training-data pipelines (SURVEY-adjacent scope).

All hot-path expressions are built-in Catalyst functions (JVM-side,
whole-stage codegen); the only Python is an Arrow-batched pandas UDF for
the rolling-hash fingerprint. No per-row Python anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Small per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Counting uses the replace-trick
# (len(s) - len(replace(s, w, ''))) / len(w) — pure SQL, portable.
_LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " de la "],
}


def token_count(text: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(t)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def _count_occurrences(text: Column, needle: str) -> Column:
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-scoring features: length, tokens, mean token length,
    punctuation ratio, stopword ratio, uppercase ratio, and a combined
    [0,1] quality score (monotone heuristics, fully SQL-expressible)."""
    t = F.col(text_col)
    low = F.lower(t)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    n_stop = sum(
        (_count_occurrences(low, w) for w in _LANG_MARKERS["en"]),
        F.lit(0).cast("long"),
    )
    out = (
        df.withColumn("n_chars_t", n_chars)
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn(
            "mean_token_len",
            F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(0.0),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0),
        )
        .withColumn(
            "upper_ratio",
            F.when(n_chars > 0, n_upper.cast("double") / n_chars).otherwise(0.0),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0),
        )
    )
    score = (
        F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(F.col("punct_ratio") * 10.0, F.lit(1.0))) * 0.2
        + (1.0 - F.least(F.col("upper_ratio") * 5.0, F.lit(1.0))) * 0.1
    )
    return out.withColumn("quality_score", score)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``lang_pred``: argmax over per-language stopword-marker hit
    counts; ``und`` when no marker fires. Deterministic tie-break by
    language code order."""
    low = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = [
        (
            sum(
                (_count_occurrences(low, w) for w in ws), F.lit(0).cast("long")
            ).alias(f"_s_{lang}"),
            lang,
        )
        for lang, ws in sorted(_LANG_MARKERS.items())
    ]
    tmp = df
    for col, lang in scores:
        tmp = tmp.withColumn(f"_s_{lang}", col)
    best = F.greatest(*[F.col(f"_s_{lang}") for _, lang in scores])
    pred = F.when(best <= 0, F.lit("und"))
    for _, lang in scores:  # first (alphabetical) language wins ties
        pred = pred.when(F.col(f"_s_{lang}") == best, F.lit(lang))
    tmp = tmp.withColumn("lang_pred", pred)
    return tmp.drop(*[f"_s_{lang}" for _, lang in scores])


def _rolling_fingerprint_udf():
    # built lazily: pandas_udf needs an active SparkSession to resolve the
    # return type, so the decorator cannot run at import time
    @pandas_udf("long")
    def rolling_fingerprint(texts: pd.Series) -> pd.Series:
        """Karp-Rabin-style rolling-hash document fingerprint: min 64-bit
        rolling hash over 8-byte windows (vectorized per Arrow batch)."""
        import numpy as np

        out = np.zeros(len(texts), dtype="int64")
        B = np.int64(1000003)
        W = 8
        for i, s in enumerate(texts):
            if s is None or len(s) < W:
                out[i] = 0
                continue
            b = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8).astype(
                np.int64
            )
            if len(b) < W:
                out[i] = 0
                continue
            with np.errstate(over="ignore"):
                h = np.zeros(len(b) - W + 1, dtype=np.int64)
                for j in range(W):  # W=8 vectorized passes, not per-row Python
                    h = h * B + b[j : len(b) - W + 1 + j]
            out[i] = h.min()
        return pd.Series(out)

    return rolling_fingerprint


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``fingerprint``: deterministic rolling-hash min-sketch of the
    document (near-identical prefixes/suffixes share fingerprints)."""
    return df.withColumn(
        "fingerprint", _rolling_fingerprint_udf()(F.col(text_col))
    )
