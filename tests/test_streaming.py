"""Structured Streaming exact-dedup stage.

The reference is batch-only; this pins the streaming extension
(semhash_spark/streaming/dedup_stream.py): exact duplicates arriving
within the watermark are dropped, one micro-batch drained via
Trigger.AvailableNow into a memory sink.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile
import uuid

from semhash_spark.streaming.dedup_stream import exact_dedup_stream


def test_exact_dedup_stream_drops_in_window_dups(spark):
    tmp = tempfile.mkdtemp(prefix="semhash_stream_")
    try:
        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
        rows = [
            (1, "alpha", t0),
            (2, "alpha", t0 + dt.timedelta(seconds=30)),   # dup of 1, in window
            (3, "beta", t0 + dt.timedelta(seconds=40)),
            (4, "beta", t0 + dt.timedelta(seconds=50)),    # dup of 3
            (5, "gamma", t0 + dt.timedelta(seconds=60)),
        ]
        df = spark.createDataFrame(rows, "event_id long, text string, event_time timestamp")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)

        stream = (
            spark.readStream.schema("event_id long, text string, event_time timestamp")
            .parquet(tmp)
        )
        deduped = exact_dedup_stream(stream, ("text",), "event_time", "10 minutes")
        qname = "dedup_sink_" + uuid.uuid4().hex[:8]
        q = (
            deduped.writeStream.format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql(f"SELECT text FROM {qname}").collect()
        texts = sorted(r.text for r in out)
        assert texts == ["alpha", "beta", "gamma"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
