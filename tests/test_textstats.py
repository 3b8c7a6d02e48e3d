"""token_stats parity: the Arrow byte-counting pass must reproduce the
round-5 SQL-expression form EXACTLY on adversarial text — multi-byte
UTF-8 (2/3/4-byte sequences, where byte counts and char counts
diverge), nulls, empties, all-space rows, runs of spaces, and
leading/trailing-space token boundaries (the cross-row transition fix).
The sf corpora the oracle gates are mostly ASCII; this pins the cases
they cannot."""

import math

from pyspark.sql import functions as F

from geozero_spark.functions import texthash as th
from geozero_spark.operators import textstats as TS
from geozero_spark.operators.textstats import _D


ADVERSARIAL = [
    None,
    "",
    " ",
    "   ",
    "a",
    " a",
    "a ",
    "  leading and   trailing  ",
    "tabs\tand\nnewlines are not token breaks",
    "héllo wörld",                      # 2-byte sequences
    "日本語 テキスト 123",                 # 3-byte sequences + digits
    "emoji 😀😀 mixed 4-byte",           # 4-byte sequences
    "digits 0123456789 and punct .,;:!? mixed",
    "....,,,,;;;;!!!!????",
    "0 1 2 3 4 5 6 7 8 9",
    "ascii with ümläuts über äll",
    "ends.with.punct.",
    "¿punto? ¡claro!",                  # non-ASCII punct NOT counted
    "a" * 500 + " " + "b" * 300,
    " ".join(["tok"] * 64),
]


def _old_sql_form(df, text_col="text"):
    """The pre-round-6 token_stats, verbatim."""
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


def _rows(df):
    out = []
    for r in sorted(df.collect(), key=lambda r: r["doc_id"]):
        vals = []
        for c in ("n_chars", "n_tokens", "avg_token_len",
                  "digit_ratio", "punct_ratio"):
            v = r[c]
            # doubles compared bit-exactly; NaN == NaN for this diff
            if isinstance(v, float) and math.isnan(v):
                v = "nan"
            elif isinstance(v, float):
                v = v.hex()
            vals.append(v)
        out.append((r["doc_id"], tuple(vals)))
    return out


def test_token_stats_matches_sql_form_adversarial(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL)],
        "doc_id long, text string")
    got = _rows(TS.token_stats(df))
    want = _rows(_old_sql_form(df))
    assert got == want


def test_token_stats_matches_sql_form_random_unicode(spark):
    """Random mixtures drawn from an alphabet that exercises every
    UTF-8 width plus the counted ASCII classes."""
    alphabet = ("'a','Z',' ','0','7','.','!','?',',',';',':','é','ß',"
                "'中','日','😀','\\t','\\n','–'")
    df = spark.range(500).selectExpr(
        "id AS doc_id",
        f"concat_ws('', transform(sequence(1, CAST(pmod(xxhash64(id), 40)"
        f" AS INT) + 1), j -> element_at(array({alphabet}), "
        f"CAST(pmod(xxhash64(id, j), 19) AS INT) + 1))) AS text")
    got = _rows(TS.token_stats(df))
    want = _rows(_old_sql_form(df))
    assert got == want
