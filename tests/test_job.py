"""End-to-end incremental job surface (VERDICT r3 #6): two successive
batches through jobs/dedup_job.py --incremental, exercising
incremental_deduplicate + the bucketed corpus table together."""

from __future__ import annotations

import sys
import uuid

import pytest

sys.path.insert(0, "/root/repo")

from jobs.dedup_job import main as job_main  # noqa: E402

BATCH1 = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (1, "completely different words appear in this unrelated text"),
    (2, "completely different words appear in this unrelated texts"),  # near-dup of 1
    (3, "numbers one two three four five six seven eight nine"),
]
BATCH2 = [
    (10, "the quick brown fox jumps over the lazy dog tonight"),  # near-dup of stored 0
    (11, "a genuinely fresh document with brand new content words"),
    (12, "a genuinely fresh document with brand new content word"),  # near-dup of 11
    (13, "yet another island of content with unique vocabulary"),
]


@pytest.fixture
def corpus_table(spark):
    name = f"inc_corpus_{uuid.uuid4().hex[:8]}"
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def _run_batch(spark, tmp_path, rows, table, tag):
    inp = str(tmp_path / f"in_{tag}")
    out = str(tmp_path / f"out_{tag}")
    spark.createDataFrame(rows, "record_id long, text string").write.parquet(inp)
    return job_main(
        [
            "--input", inp, "--output", out,
            "--columns", "text", "--id-col", "record_id",
            "--mode", "jaccard_exact", "--threshold", "0.7", "--shingle-k", "3",
            "--incremental", table, "--corpus-buckets", "4",
        ],
        stop_spark=False,
    )


def test_incremental_job_two_batches(spark, tmp_path, corpus_table):
    s1 = _run_batch(spark, tmp_path, BATCH1, corpus_table, "b1")
    # first batch: self dedup seeds the corpus (2 is a near-dup of 1)
    assert (s1["n_selected"], s1["n_filtered"]) == (3, 1)
    assert spark.table(corpus_table).count() == 3

    s2 = _run_batch(spark, tmp_path, BATCH2, corpus_table, "b2")
    # second batch: 10 hits the stored corpus (cross stage), 12 hits
    # 11 within the batch (self stage); 11 and 13 are genuinely new
    assert (s2["n_selected"], s2["n_filtered"]) == (2, 2)
    stored = {r.record_id for r in spark.table(corpus_table).collect()}
    assert stored == {0, 1, 3, 11, 13}
