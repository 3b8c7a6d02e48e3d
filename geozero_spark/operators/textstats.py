"""Text analysis over document/page tables — all built-in expressions.

Language ID is a stopword-overlap heuristic (array_intersect against
small per-language seed lists); quality scoring is plain length/ratio
arithmetic; fingerprints reuse the portable rolling hash. Everything is
JVM-side and oracle-reproducible in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import sqlgen as sg
from ..functions import texthash as th

_D = sg.SPARK

# tiny seed stopword lists (public common words); enough for a
# deterministic heuristic, NOT a general langid model
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "que"],
    "es": ["el", "la", "de", "que", "los", "una", "es", "por", "con"],
    "pt": ["o", "a", "de", "que", "os", "uma", "por", "com", "não"],
}


def _arr_lit(words) -> str:
    return "array(" + ", ".join("'" + w + "'" for w in words) + ")"


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_chars, avg token length, uppercase/digit/punct ratios."""
    toks = th.tokens(text_col, _D)
    return (df
            .withColumn("n_chars", F.expr(f"length({text_col})"))
            .withColumn("n_tokens", F.expr(f"size({toks})"))
            .withColumn("avg_token_len", F.expr(
                f"CAST(length(replace({text_col}, ' ', '')) AS DOUBLE) / "
                f"greatest(size({toks}), 1)"))
            .withColumn("digit_ratio", F.expr(
                f"CAST(length(regexp_replace({text_col}, '[^0-9]', '')) "
                f"AS DOUBLE) / greatest(length({text_col}), 1)"))
            .withColumn("punct_ratio", F.expr(
                f"CAST(length(regexp_replace({text_col}, "
                f"'[^.,;:!?]', '')) AS DOUBLE) / "
                f"greatest(length({text_col}), 1)")))


def stopword_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language stopword hit counts + argmax language guess."""
    toks = f"array_distinct({th.tokens(f'lower({text_col})', _D)})"
    out = df.withColumn("_toks", F.expr(toks))
    for lang, words in STOPWORDS.items():
        out = out.withColumn(
            f"sw_{lang}",
            F.expr(f"size(array_intersect(_toks, {_arr_lit(words)}))"))
    # deterministic argmax: first language (fixed order) with max count
    order = list(STOPWORDS)
    best = "CASE "
    for lang in order:
        others = " AND ".join(
            f"sw_{lang} >= sw_{o}" for o in order if o != lang)
        best += f"WHEN {others} THEN '{lang}' "
    best += "END"
    return out.withColumn("lang_guess", F.expr(best)).drop("_toks")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0, 1] quality score from token stats — a deterministic
    stand-in for model-based quality filters in training pipelines."""
    base = token_stats(df, text_col)
    return base.withColumn(
        "quality",
        F.expr(
            "least(CAST(n_tokens AS DOUBLE) / 64.0e0, 1.0e0) * 0.5e0 + "
            "(1.0e0 - least(digit_ratio * 4.0e0, 1.0e0)) * 0.25e0 + "
            "(CASE WHEN avg_token_len >= 3.0e0 AND "
            "avg_token_len <= 9.0e0 THEN 0.25e0 ELSE 0.0e0 END)"))


def fingerprint(df: DataFrame, text_col: str = "text",
                out: str = "fingerprint") -> DataFrame:
    """Rolling polynomial hash of the full text (portable, exact)."""
    return df.withColumn(out, F.expr(th.text_hash(text_col, _D)))
