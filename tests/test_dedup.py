"""Flagship pipeline parity vs the oracle.

* cosine mode (hashing encoder both sides): STRICT equality of
  selected sets / ratios vs the oracle's verbatim greedy port —
  fixtures avoid >=4-chains, where greedy and min-id components are
  provably identical.
* minhash mode on the planted corpus: dup-pair recall >= 0.99
  against the metric-agnostic greedy oracle run on EXACT Jaccard at
  the same shingle config (the north-rule criterion).
* invariants: selected ∪ filtered == input exactly; content sha256
  preserved end-to-end.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from semhash_spark.config import DedupConfig
from semhash_spark.operators.dedup import deduplicate, self_deduplicate
from semhash_spark.sources.corpus import generate_corpus
from tests.oracle import OracleSemHash, greedy_self_dedup_ids, remove_exact_duplicates

SENTS = [
    "the quick brown fox jumps over the lazy dog tonight",       # 0 keep
    "the quick brown fox jumps over the lazy dog today",         # 1 dup of 0
    "the quick brown fox jumps over the lazy dog tonight",       # 2 exact dup of 0
    "completely different words appear in this unrelated text",  # 3 keep
    "completely different words appear in this unrelated text!", # 4 dup of 3
    "yet another island of content with unique vocabulary",      # 5 keep
    "numbers one two three four five six seven eight nine",      # 6 keep
    "numbers one two three four five six seven eight ten",       # 7 dup of 6
]


def _sent_df(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(SENTS)], "record_id long, text string"
    )


@pytest.fixture(scope="module")
def cfg():
    return DedupConfig(columns=("text",), threshold=0.8)


def test_self_dedup_cosine_strict_parity(spark, cfg):
    res = self_deduplicate(_sent_df(spark), cfg, mode="cosine", threshold=0.8)
    got_sel = sorted(int(r["record_id"]) for r in res.selected.collect())

    oracle = OracleSemHash([{"text": s} for s in SENTS], columns=["text"])
    ores = oracle.self_deduplicate(threshold=0.8)
    texts = [r["text"] for r in ores.selected]
    want_sel = sorted(SENTS.index(t) for t in texts)  # first occurrence ids
    assert got_sel == want_sel

    n_sel, n_fil, n_exact = res.counts()
    assert n_sel + n_fil == len(SENTS)
    assert res.duplicate_ratio == pytest.approx(ores.duplicate_ratio)
    assert res.exact_duplicate_ratio == pytest.approx(ores.exact_duplicate_ratio)


def test_cross_dedup_cosine_strict_parity(spark, cfg):
    index_df = _sent_df(spark)
    q_sents = [
        "the quick brown fox jumps over the lazy dog tonight",  # exact hit
        "the quick brown fox jumps over a lazy dog tonight",    # semantic hit
        "entirely novel query content nothing shared here",     # keep
    ]
    qdf = spark.createDataFrame(
        [(100 + i, s) for i, s in enumerate(q_sents)], "record_id long, text string"
    )
    res = deduplicate(qdf, index_df, cfg, mode="cosine", threshold=0.8)
    got_sel = sorted(int(r["record_id"]) for r in res.selected.collect())

    oracle = OracleSemHash([{"text": s} for s in SENTS], columns=["text"])
    ores = oracle.deduplicate([{"text": s} for s in q_sents], threshold=0.8)
    want_sel = sorted(100 + q_sents.index(r["text"]) for r in ores.selected)
    assert got_sel == want_sel
    # exact flags agree
    got_exact = {
        int(r["record_id"]) for r in res.filtered.where("exact").collect()
    }
    want_exact = {100 + q_sents.index(r["text"]) for r, _, e in ores.filtered if e}
    assert got_exact == want_exact


def _py_shingles(text: str, k: int = 3) -> frozenset:
    toks = text.split()
    if len(toks) < k:
        return frozenset([" ".join(toks)])
    return frozenset(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1))


def test_self_dedup_minhash_pair_recall(spark):
    """North-rule criterion: dup-pair recall >= 0.99 vs the greedy
    reference semantics at the same shingle config."""
    n = 400
    cfg = DedupConfig(columns=("content",), threshold=0.7, shingle_k=3,
                      num_perm=128, bands=32)
    corpus = generate_corpus(spark, n, seed=42).cache()
    res = self_deduplicate(corpus, cfg, mode="minhash", threshold=0.7)
    got_pairs = {
        tuple(sorted((int(r["dup_id"]), int(r["other_id"]))))
        for r in res.pairs.where(~F.col("exact")).collect()
    }

    # oracle: exact jaccard over the same shingles, greedy reference scan
    rows = sorted(
        ((int(r["record_id"]), r["content"]) for r in corpus.collect()),
        key=lambda x: x[0],
    )
    dedup, _ = remove_exact_duplicates(
        [{"record_id": i, "content": c} for i, c in rows], ["content"]
    )
    ids = [d["record_id"] for d in dedup]
    sh = [_py_shingles(d["content"]) for d in dedup]
    m = len(ids)
    sim = np.zeros((m, m))
    for i in range(m):
        sim[i, i] = 1.0
        for j in range(i + 1, m):
            inter = len(sh[i] & sh[j])
            if inter:
                s = inter / len(sh[i] | sh[j])
                sim[i, j] = sim[j, i] = s
    want_sel, want_pairs = greedy_self_dedup_ids(ids, sim, 0.7)

    assert want_pairs, "fixture must contain duplicate pairs"
    recall = len(got_pairs & want_pairs) / len(want_pairs)
    assert recall >= 0.99, f"pair recall {recall:.4f} ({len(want_pairs)} ref pairs)"

    # selected set parity (greedy == CC on the planted triangle clusters)
    got_sel = sorted(int(r["record_id"]) for r in res.selected.collect())
    assert got_sel == sorted(want_sel)


def test_invariants_partition_and_sha(spark):
    n = 300
    cfg = DedupConfig(columns=("content",), threshold=0.7)
    corpus = generate_corpus(spark, n, seed=42).withColumn(
        "content_sha", F.sha2("content", 256)
    ).cache()
    res = self_deduplicate(corpus, cfg, mode="minhash", threshold=0.7)
    sel_ids = res.selected.select("record_id")
    fil_ids = res.filtered.select("record_id")
    # disjoint and complete
    assert sel_ids.intersect(fil_ids).count() == 0
    assert sel_ids.union(fil_ids).distinct().count() == n
    # sha invariant across the pipeline output
    out = res.selected.select("record_id", "content", "content_sha").union(
        res.filtered.select("record_id", "content", "content_sha")
    )
    bad = out.where(F.sha2("content", 256) != F.col("content_sha")).count()
    assert bad == 0


def test_rethreshold_and_least_similar(spark, cfg):
    res = self_deduplicate(_sent_df(spark), cfg, mode="cosine", threshold=0.8)
    with pytest.raises(ValueError):
        res.rethreshold(0.5)
    # raising the threshold far enough returns semantic dups to selected
    res2 = res.rethreshold(0.999)
    n_sel2, n_fil2, n_exact2 = res2.counts()
    assert n_fil2 == n_exact2  # only exact dups (score 1.0) remain filtered
    assert n_sel2 + n_fil2 == len(SENTS)
    # least similar pair has the lowest score
    rows = res.get_least_similar_from_duplicates(1).collect()
    assert len(rows) == 1
    all_scores = [r["score"] for r in res.pairs.collect()]
    assert rows[0]["score"] == pytest.approx(min(all_scores))


def test_partitioning_independence(spark):
    """SURVEY §5.3: identical cluster assignment regardless of input
    partitioning (the in-pytest proxy for the local[8]/local[32]
    determinism asserted across JVMs by tools/scaling_bench.py)."""
    from semhash_spark.sources.corpus import generate_corpus

    cfg = DedupConfig(columns=("content",), threshold=0.8, shingle_k=5,
                      num_perm=64, bands=16)

    def assignment(partitions):
        corpus = generate_corpus(spark, 3000, partitions=partitions)
        res = self_deduplicate(corpus, cfg, mode="minhash")
        out = {r.record_id: r.record_id for r in res.selected.select("record_id").collect()}
        out.update({r.record_id: r.exemplar_id for r in
                    res.filtered.select("record_id", "exemplar_id").collect()})
        return out

    assert assignment(3) == assignment(17)


def test_selected_with_duplicates_include_records(spark, cfg):
    """VERDICT r2 #9: include_records=True carries the duplicates'
    payload columns inside the buckets (reference returns whole
    duplicate records, semhash/datamodels.py:111-149)."""
    res = self_deduplicate(_sent_df(spark), cfg, mode="jaccard_exact")
    try:
        # independent expectation from the filtered relation itself
        expected = {}
        for r in res.filtered.collect():
            expected.setdefault(r.exemplar_id, set()).add((r.record_id, r.text))
        view = res.selected_with_duplicates(include_records=True)
        got_rows = view.collect()
        got = {}
        for row in got_rows:
            if row.duplicates:
                got[row.record_id] = {(d.dup_id, d.text) for d in row.duplicates}
        assert got == expected
        # plain form unchanged: (dup_id, score) structs only
        plain = res.selected_with_duplicates().collect()
        for row in plain:
            if row.duplicates:
                assert set(row.duplicates[0].asDict()) == {"dup_id", "score"}
    finally:
        res.release()


def test_incremental_deduplicate(spark, cfg):
    """Daily-ingest pattern: new batch vs prior selected output, then
    within-batch collapse; both stages' filtered/pairs merge."""
    from semhash_spark.operators.dedup import incremental_deduplicate

    prior = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog today"),
         (1, "completely different words appear in this unrelated text"),
         (2, "numbers one two three four five six seven eight nine")],
        "record_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog tonight"),  # near-dup of prior 0
         (11, "a genuinely fresh document with brand new content words"),
         (12, "a genuinely fresh document with brand new content word"),  # near-dup of 11
         (13, "yet another island of content with unique vocabulary")],
        "record_id long, text string",
    )
    res = incremental_deduplicate(new, prior, cfg, mode="jaccard_exact",
                                  threshold=0.7)
    try:
        sel = sorted(r.record_id for r in res.selected.collect())
        fil = {r.record_id: (r.exemplar_id, r.exemplar_source)
               for r in res.filtered.collect()}
        assert sel == [11, 13]
        # exemplar_source disambiguates the two id spaces (ADVICE r3)
        assert fil[10] == (0, "index")   # cross stage: matched stored corpus
        assert fil[12] == (11, "batch")  # self stage: matched within batch
        assert {r.other_source for r in res.pairs.collect()} == {"index", "batch"}
        # cumulative corpus grows by exactly the genuinely-new rows
        assert res.selected.count() + len(fil) == 4
        assert "exact_key" not in [c.lower() for c in res.selected.columns]
    finally:
        res.release()
