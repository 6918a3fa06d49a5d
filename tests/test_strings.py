"""String-record surface parity with the reference.

Reference behavior under test:
* ``prepare_records`` string path (semhash/utils.py:127-153):
  list[str] -> {"text": s} records, columns forced to ["text"],
  was_string=True; empty input / dict-without-columns errors.
* ``map_deduplication_result_to_strings`` (semhash/records.py:20-35):
  selected and filtered render back to tab-cleaned strings via
  ``dict_to_string`` (records.py:6-17).
"""

import pytest
from pyspark.sql import functions as F

from semhash_spark.api import SparkSemHash, records_from_strings
from semhash_spark.config import DedupConfig


CFG = DedupConfig(columns=("text",), threshold=0.8, shingle_k=2,
                  num_perm=64, bands=16)


def test_records_from_strings_schema_and_order(spark):
    texts = ["alpha beta", "gamma\tdelta", "alpha beta"]
    df = records_from_strings(spark, texts)
    rows = df.orderBy("record_id").collect()
    assert [r["record_id"] for r in rows] == [0, 1, 2]
    # raw storage keeps the tab; cleaning happens at render time,
    # exactly like the reference (records.py:17 cleans in
    # dict_to_string, not in prepare_records)
    assert rows[1]["text"] == "gamma\tdelta"
    assert dict(df.dtypes) == {"record_id": "bigint", "text": "string"}


def test_from_strings_errors_match_reference(spark):
    with pytest.raises(ValueError, match="records must not be empty"):
        records_from_strings(spark, [])
    with pytest.raises(ValueError, match="Columns must be specified"):
        records_from_strings(spark, [{"text": "a"}])


def test_from_strings_roundtrip_exact_dups(spark):
    # three distinct texts, two exact repeats; first occurrence wins
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "the quick brown fox jumps over the lazy dog",
        "sphinx of black quartz judge my vow",
        "pack my box with five dozen liquor jugs",
    ]
    sh = SparkSemHash.from_strings(spark, texts, cfg=CFG)
    assert sh.was_string is True
    assert tuple(sh.cfg.columns) == ("text",)
    res = sh.self_deduplicate()
    sel = {r["record"] for r in res.selected_strings().collect()}
    assert sel == {texts[0], texts[1], texts[3]}
    fil = {(r["record"], r["duplicate_of"], r["exact"])
           for r in res.filtered_strings().collect()}
    assert fil == {(texts[0], texts[0], True), (texts[1], texts[1], True)}
    # selected keeps the FIRST occurrence's ids (0, 1, 3)
    ids = sorted(r["record_id"] for r in res.selected_strings().collect())
    assert ids == [0, 1, 3]
    res.release()
    sh.release()


def test_string_render_cleans_tabs(spark):
    # reference dict_to_string replaces '\t' with ' ' (records.py:17)
    texts = ["left\tright side", "left\tright side", "other text here"]
    sh = SparkSemHash.from_strings(spark, texts, cfg=CFG)
    res = sh.self_deduplicate()
    sel = {r["record"] for r in res.selected_strings().collect()}
    assert "left right side" in sel  # tab cleaned at render time
    fil = res.filtered_strings().collect()
    assert [(r["record"], r["duplicate_of"]) for r in fil] == [
        ("left right side", "left right side")
    ]
    assert fil[0]["score"] == 1.0 and fil[0]["exact"]
    res.release()
    sh.release()


def test_filtered_strings_near_dup_scores(spark):
    # one near-duplicate pair (small edit), one unrelated text: the
    # near-dup's string view must point at its kept exemplar with a
    # sub-1.0 score and exact=False
    a = "spark structured streaming handles late data with watermarks"
    b = "spark structured streaming handles late data with watermark"
    c = "completely unrelated sentence about database join ordering"
    sh = SparkSemHash.from_strings(spark, [a, b, c],
                                   cfg=CFG.with_(threshold=0.3))
    res = sh.self_deduplicate()
    fil = res.filtered_strings().collect()
    assert [(r["record"], r["duplicate_of"]) for r in fil] == [(b, a)]
    assert fil[0]["exact"] is False and 0.3 <= fil[0]["score"] < 1.0
    sel = {r["record"] for r in res.selected_strings().collect()}
    assert sel == {a, c}
    res.release()
    sh.release()


def test_filtered_strings_view_matches_relational(spark):
    # the string view must be a pure rendering of the relational
    # filtered frame: same row count, same (id, exemplar) links
    texts = ["repeated line one", "repeated line one", "repeated line two",
             "repeated line two", "a unique closing line"]
    sh = SparkSemHash.from_strings(spark, texts, cfg=CFG)
    res = sh.self_deduplicate()
    rel = {(r["record_id"], r["exemplar_id"])
           for r in res.filtered.select("record_id", "exemplar_id").collect()}
    view = res.filtered_strings()
    got = {(r["record_id"],) for r in view.select("record_id").collect()}
    assert {t[0] for t in rel} == {t[0] for t in got}
    assert view.count() == res.filtered.count()
    # every duplicate_of string equals its exemplar's rendered text
    ex_text = {r["record_id"]: r["record"]
               for r in res.selected_strings().collect()}
    for r in view.collect():
        dup_of = ex_text[
            dict((a, b) for a, b in rel)[r["record_id"]]
        ]
        assert r["duplicate_of"] == dup_of
    res.release()
    sh.release()
