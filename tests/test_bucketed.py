"""Bucketed storage: id-equi-joins between co-bucketed tables must
plan WITHOUT an Exchange on either side (the 100 TB co-location
story; Iceberg bucket-transform analogue)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semhash_spark.sources.bucketed import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    a = spark.range(0, 5000).select(
        F.col("id").alias("record_id"), (F.col("id") % 7).alias("grp")
    )
    b = spark.range(0, 5000, 3).select(
        F.col("id").alias("record_id"), F.lit(1.0).alias("score")
    )
    for t in ("t_bucketed_a", "t_bucketed_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a killed prior session leaves an orphan table DIR that the
        # fresh metastore doesn't know about — CREATE then fails on
        # "location already exists", so clear the path too
        import os
        import shutil
        from urllib.parse import urlparse

        wh_path = urlparse(wh).path if "://" in wh else wh.removeprefix("file:")
        if wh_path:
            shutil.rmtree(os.path.join(wh_path, t), ignore_errors=True)
    write_bucketed(a, "t_bucketed_a", buckets=8)
    write_bucketed(b, "t_bucketed_b", buckets=8)
    yield "t_bucketed_a", "t_bucketed_b"
    spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS t_bucketed_b")


def _no_broadcast(spark):
    # tiny test tables would otherwise take a BroadcastHashJoin, which
    # sidesteps bucketing entirely ("Bucketed: false (disabled by
    # query planner)"); at 100 TB neither side broadcasts and the
    # bucketed SortMergeJoin is the plan under test
    import contextlib

    @contextlib.contextmanager
    def ctx():
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    return ctx()


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    with _no_broadcast(spark):
        a, b = read_bucketed(spark, ta), read_bucketed(spark, tb)
        j = a.join(b, "record_id")
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert j.count() == b.count()


def test_unbucketed_join_does_exchange(spark, bucketed_pair):
    # contrast: the same join against a plain in-memory frame shuffles
    ta, _ = bucketed_pair
    with _no_broadcast(spark):
        a = read_bucketed(spark, ta)
        c = spark.range(0, 5000, 5).select(F.col("id").alias("record_id"))
        j = a.join(c, "record_id")
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" in plan
        assert j.count() == 1000


def test_bucketed_join_values_correct(spark, bucketed_pair):
    ta, tb = bucketed_pair
    a, b = read_bucketed(spark, ta), read_bucketed(spark, tb)
    got = a.join(b, "record_id").agg(F.sum("grp")).first()[0]
    exp = sum(i % 7 for i in range(0, 5000, 3))
    assert got == exp
