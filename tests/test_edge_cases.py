"""Degenerate-input robustness at the package surface: empty corpus,
single row, all-duplicates, unicode content, NULL text. These are
the shapes a 10^12-file ingest WILL contain somewhere (empty
partition, single-file repo, vendored tree of identical files,
non-ASCII sources)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semhash_spark.config import DedupConfig
from semhash_spark.operators.dedup import self_deduplicate


@pytest.fixture(scope="module")
def cfg():
    return DedupConfig(columns=("text",), threshold=0.8, shingle_k=3,
                       num_perm=64, bands=16)


def test_empty_corpus(spark, cfg):
    df = spark.createDataFrame([], "record_id long, text string")
    res = self_deduplicate(df, cfg, mode="minhash")
    try:
        assert res.selected.count() == 0
        assert res.filtered.count() == 0
        assert res.pairs.count() == 0
        assert res.duplicate_ratio == 0.0
    finally:
        res.release()


def test_single_row(spark, cfg):
    df = spark.createDataFrame([(7, "just one lonely document here")],
                               "record_id long, text string")
    res = self_deduplicate(df, cfg, mode="minhash")
    try:
        assert [r.record_id for r in res.selected.collect()] == [7]
        assert res.filtered.count() == 0
    finally:
        res.release()


def test_all_rows_identical(spark, cfg):
    df = spark.createDataFrame(
        [(i, "the same vendored file content everywhere always") for i in range(200)],
        "record_id long, text string",
    )
    res = self_deduplicate(df, cfg, mode="minhash")
    try:
        sel = [r.record_id for r in res.selected.collect()]
        assert sel == [0]  # first-occurrence exemplar
        fil = res.filtered.collect()
        assert len(fil) == 199
        assert all(r.exemplar_id == 0 and r.exact for r in fil)
        assert res.exact_duplicate_ratio == pytest.approx(199 / 200)
    finally:
        res.release()


def test_unicode_content(spark, cfg):
    base = "café naïve résumé coöperate ☃ emoji ✨ über straße läuft schnell durch großen Wald heute"
    rows = [
        (0, base + " eins"),
        (1, base + " zwei"),
        (2, "完全 不同 的 中文 内容 在 这里 出现 了 呀"),
        (3, "каждое слово здесь совершенно другое русское предложение"),
    ]
    res = self_deduplicate(spark.createDataFrame(rows, "record_id long, text string"),
                           cfg, mode="minhash")
    try:
        sel = {r.record_id for r in res.selected.collect()}
        fil = {r.record_id: r.exemplar_id for r in res.filtered.collect()}
        # 0/1 differ by one token of nine -> near-dups at 0.8 jaccard
        assert fil.get(1) == 0 or fil.get(0) == 1
        assert 2 in sel and 3 in sel
    finally:
        res.release()


def test_null_and_empty_text_rows(spark, cfg):
    rows = [(0, "real content words appear here in this document"),
            (1, None), (2, ""), (3, None), (4, "")]
    df = spark.createDataFrame(rows, "record_id long, text string")
    res = self_deduplicate(df, cfg, mode="minhash")
    try:
        sel = {r.record_id for r in res.selected.collect()}
        fil = {r.record_id: (r.exemplar_id, r.exact) for r in res.filtered.collect()}
        # NULL renders as "" (reference missing-value default): 1/2/3/4
        # are EXACT duplicates of each other; first occurrence (1) kept
        assert 0 in sel and 1 in sel
        assert fil[2] == (1, True) and fil[3] == (1, True) and fil[4] == (1, True)
        # partition invariant: selected + filtered == input
        assert len(sel) + len(fil) == 5
    finally:
        res.release()


def test_whitespace_only_docs_do_not_pair(spark, cfg):
    rows = [(0, "   "), (1, "\t\n"), (2, "actual words live here today")]
    df = spark.createDataFrame(rows, "record_id long, text string")
    res = self_deduplicate(df, cfg, mode="minhash")
    try:
        fil = {r.record_id: r.exemplar_id for r in res.filtered.collect()}
        # "   " and "\t\n" are distinct strings -> NOT exact dups; both
        # produce empty shingle sets -> all-sentinel signatures must NOT
        # band-match each other into a fake near-dup pair (score 0)
        assert fil == {}
    finally:
        res.release()
