"""Text-analysis column functions for training-data pipelines.

No counterpart in the reference library (it only dedups); these are
the standard corpus-hygiene operators a 100 TB pretraining pipeline
runs next to dedup. All JVM-side expressions (no python UDFs), so
they are exactly reproducible in the DuckDB oracle. Note the
split/filter/transform lambdas here are INTERPRETED higher-order
functions, not codegen (functions/vectors.py:10-14) — fine at these
row widths, but per-element hot paths belong in the Arrow kernels.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from semhash_spark.functions.hashing import tokens

# tiny per-language stopword lists for the n-gram/lexicon language-ID
# heuristic; deliberately small + deterministic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans"),
    "es": ("el", "los", "las", "es", "una", "por", "como"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"),
}

STOPWORDS_EN = LANG_MARKERS["en"] + ("it", "that", "for", "on", "with")


def token_count(col: str | Column) -> Column:
    """Whitespace token count (long)."""
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: str | Column) -> Column:
    """Rough BPE-style token estimate: alnum runs + punctuation marks.

    ``regexp_count`` over ``[A-Za-z0-9]+|[^A-Za-z0-9\\s]`` — each
    alphanumeric run and each standalone symbol counts as one token.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")).cast("long")


def punct_ratio(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    return F.when(n > 0, F.regexp_count(c, F.lit(r"[^\w\s]")).cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(col: str | Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(col: str | Column) -> Column:
    """Composite [0,1] quality heuristic.

    0.4 * length factor (saturating at 200 chars)
    + 0.3 * (1 - punct_ratio clipped at 0.5 / 0.5)
    + 0.3 * stopword factor (saturating at 0.2 stopword ratio).
    """
    c = F.col(col) if isinstance(col, str) else col
    len_f = F.least(F.length(c).cast("double") / F.lit(200.0), F.lit(1.0))
    punct_f = F.lit(1.0) - F.least(punct_ratio(c), F.lit(0.5)) / F.lit(0.5)
    stop_f = F.least(stopword_ratio(c) / F.lit(0.2), F.lit(1.0))
    return F.round(F.lit(0.4) * len_f + F.lit(0.3) * punct_f + F.lit(0.3) * stop_f, 6)


def lang_id(col: str | Column) -> Column:
    """Lexicon-hit language ID: argmax of marker-word hits, 'und' if none.

    Deterministic tie-break: language order as listed in LANG_MARKERS.
    """
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    # fold in reverse so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        marker = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(marker, t)))
        cond = hits >= best_hits
        best_lang = F.when(cond & (hits > 0), F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, hits).otherwise(best_hits)
    return best_lang


def content_fingerprint(col: str | Column) -> Column:
    """Whitespace-normalized sha256 document fingerprint (hex string).

    Exact-dup fingerprint robust to whitespace runs; the rolling-hash
    winnowing fingerprints live in operators/containment.py.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(F.trim(F.regexp_replace(c, r"\s+", " ")), 256)


# ------------------------------------------- corpus-hygiene rule flags
#
# Boolean per-document filter rules in the style of the public C4
# (Raffel et al., JMLR 2020 §2.2) and Gopher (Rae et al., 2021,
# Table A1) cleaning heuristics, re-parameterized for generic text /
# source code. Each rule is an independent JVM expression returning
# true when the document VIOLATES the rule (flag = drop candidate),
# so downstream keeps `WHERE NOT (r1 OR r2 OR ...)` — pushdown-
# friendly and exactly reproducible in SQL oracles.

def rule_too_few_tokens(col: str | Column, min_tokens: int = 5) -> Column:
    """Gopher-style minimum document length (word count)."""
    return token_count(col) < min_tokens


def rule_mean_word_too_long(col: str | Column, max_mean: float = 14.0) -> Column:
    """Gopher: mean word length outside a sane band (long side only;
    code identifiers run long, so the default is permissive)."""
    toks = tokens(col)
    n = F.size(toks)
    mean_len = F.when(
        n > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"),
            lambda acc, t: acc + F.length(t),
        ).cast("double") / n,
    ).otherwise(F.lit(0.0))
    return mean_len > max_mean


def rule_symbol_heavy(col: str | Column, max_ratio: float = 0.5) -> Column:
    """C4/Gopher: symbol-to-character ratio too high (boilerplate,
    minified/binary-ish content)."""
    return punct_ratio(col) > max_ratio


def rule_few_distinct_tokens(col: str | Column, min_distinct_ratio: float = 0.2) -> Column:
    """Gopher repetition rule: distinct/total token ratio too low
    (log spam, generated repetition)."""
    toks = tokens(col)
    n = F.size(toks)
    return F.when(
        n > 0,
        F.size(F.array_distinct(F.transform(toks, lambda t: F.lower(t))))
        .cast("double") / n < min_distinct_ratio,
    ).otherwise(F.lit(True))


def rule_bracket_imbalance(col: str | Column, max_abs: int = 10) -> Column:
    """Source-code hygiene: grossly unbalanced braces/brackets signal
    truncated files."""
    c = F.col(col) if isinstance(col, str) else col
    open_n = F.regexp_count(c, F.lit(r"[\(\[\{]"))
    close_n = F.regexp_count(c, F.lit(r"[\)\]\}]"))
    return F.abs(open_n - close_n) > max_abs


def hygiene_flags(col: str | Column) -> Column:
    """Struct of all rule flags + the combined keep verdict."""
    return F.struct(
        rule_too_few_tokens(col).alias("too_few_tokens"),
        rule_mean_word_too_long(col).alias("mean_word_too_long"),
        rule_symbol_heavy(col).alias("symbol_heavy"),
        rule_few_distinct_tokens(col).alias("few_distinct_tokens"),
        rule_bracket_imbalance(col).alias("bracket_imbalance"),
        (
            ~rule_too_few_tokens(col)
            & ~rule_mean_word_too_long(col)
            & ~rule_symbol_heavy(col)
            & ~rule_few_distinct_tokens(col)
            & ~rule_bracket_imbalance(col)
        ).alias("keep"),
    )
