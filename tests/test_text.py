"""Text-analysis functions: hygiene rule flags on constructed docs.

(The numeric functions — token counts, quality, lang-ID,
fingerprint — are value-hash checked against DuckDB by the driver
gate; these tests pin the rule SEMANTICS on documents built to
trip each rule exactly.)
"""

from __future__ import annotations

from semhash_spark.functions.text import hygiene_flags


def _flags(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = df.select(hygiene_flags("text").alias("h")).first()["h"]
    return row.asDict()


def test_clean_doc_keeps(spark):
    h = _flags(spark, "the quick brown fox jumps over the lazy dog again today")
    assert h["keep"] and not any(v for k, v in h.items() if k != "keep")


def test_too_few_tokens(spark):
    h = _flags(spark, "only three words")
    assert h["too_few_tokens"] and not h["keep"]


def test_mean_word_too_long(spark):
    h = _flags(spark, " ".join(["x" * 30] * 8))
    assert h["mean_word_too_long"] and not h["keep"]


def test_symbol_heavy(spark):
    h = _flags(spark, "!@# $%^ &*( )!@ #$% ^&* ()! @#$")
    assert h["symbol_heavy"] and not h["keep"]


def test_few_distinct_tokens(spark):
    h = _flags(spark, " ".join(["spam"] * 40))
    assert h["few_distinct_tokens"] and not h["keep"]


def test_bracket_imbalance(spark):
    body = "def f(x): return [" + "(" * 15 + " truncated here somehow yes"
    h = _flags(spark, body)
    assert h["bracket_imbalance"] and not h["keep"]


def test_empty_doc_flagged(spark):
    h = _flags(spark, "")
    assert h["too_few_tokens"] and h["few_distinct_tokens"] and not h["keep"]
