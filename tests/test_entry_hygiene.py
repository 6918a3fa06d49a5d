"""Harness cache hygiene (VERDICT r3 #5): the __spark_entry__ query
helpers persist shared frames (doc features, signature tables, the
memoized flagship dedup result); release_caches() must drop every one
of them so a queries() sweep leaves no persisted RDDs behind."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def _persistent_ids(spark) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def test_release_caches_drops_query_persists(spark):
    import __spark_entry__ as entry

    before = _persistent_ids(spark)
    sf = "/root/testdata/sf0.001"
    # exercise the three caching helpers: _doc_feats, the sha simhash
    # pair, and the memoized self-dedup result
    entry.queries()["jaccard3_pairs"](spark, sf).count()
    entry.queries()["simhash_pairs"](spark, sf).count()
    entry.queries()["selfdedup_stats"](spark, sf).count()
    assert len(_persistent_ids(spark) - before) > 0, "helpers cached nothing"
    entry.release_caches()
    leaked = _persistent_ids(spark) - before
    assert not leaked, f"persisted RDDs leaked after release_caches: {leaked}"
