#!/usr/bin/env python
"""spark-submit entry point for the dedup pipeline.

North-rule surface: the job runs via

    zip -r semhash_spark.zip semhash_spark
    spark-submit --py-files semhash_spark.zip jobs/dedup_job.py \
        --input  /data/corpus            \
        --output /data/dedup_run1        \
        --columns content --threshold 0.8 --mode minhash \
        --checkpoint-dir /data/dedup_run1/_stages

On a cluster, --master/--num-executors etc. come from spark-submit;
locally the session factory falls back to local[$SPARK_GRAFT_CPUS].
The run writes three parquet outputs under --output (selected/,
filtered/, stats/) plus per-stage checkpoint tables and
_metrics.jsonl lineage under --checkpoint-dir; a re-run with the
same --checkpoint-dir resumes from the last complete stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="parquet/iceberg path of the corpus")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--columns", nargs="+", default=["content"])
    p.add_argument("--id-col", default=None,
                   help="existing unique long id column (default: derive)")
    p.add_argument("--natural-key", nargs="+", default=None,
                   help="columns uniquely identifying a row (e.g. repo path "
                        "commit); derives collision-checked xxhash64 ids "
                        "without any sort/shuffle")
    p.add_argument("--id-salt", default=None,
                   help="re-seed the natural-key id hash (collision recovery)")
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--mode", default="minhash",
                   choices=["minhash", "simhash", "cosine", "jaccard_exact"])
    p.add_argument("--shingle-k", type=int, default=5)
    p.add_argument("--num-perm", type=int, default=128)
    p.add_argument("--bands", type=int, default=32)
    p.add_argument("--bucket-cap", type=int, default=200)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--with-containment", action="store_true",
                   help="also run the winnowing containment stage")
    p.add_argument("--hygiene", action="store_true",
                   help="pre-filter the input with the C4/Gopher-style "
                        "hygiene rules (functions/text.py:hygiene_flags) "
                        "before dedup; dropped rows land in "
                        "<output>/hygiene_dropped")
    p.add_argument("--against", default=None,
                   help="parquet path of a reference/index corpus: runs "
                        "CROSS dedup (--input queried against it, "
                        "existential semantics) instead of self dedup")
    p.add_argument("--broadcast-query", action="store_true",
                   help="cross mode: broadcast the query band table "
                        "(small query batch vs huge index)")
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from semhash_spark.config import DedupConfig
    from semhash_spark.operators.dedup import self_deduplicate
    from semhash_spark.operators.ids import with_record_id
    from semhash_spark.plans.checkpoint import CheckpointManager

    spark = SparkSession.builder.appName("semhash_spark_dedup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    cfg = DedupConfig(
        columns=tuple(args.columns), threshold=args.threshold,
        shingle_k=args.shingle_k, num_perm=args.num_perm, bands=args.bands,
        bucket_cap=args.bucket_cap, checkpoint_dir=args.checkpoint_dir,
    )
    df = spark.read.parquet(args.input)
    if "record_id" not in df.columns:
        if args.id_col:
            df = with_record_id(df, existing=args.id_col)
        elif args.natural_key:
            df = with_record_id(df, natural_key=args.natural_key, salt=args.id_salt)
        else:
            df = with_record_id(df, order_cols=list(args.columns))

    n_hygiene_dropped = 0
    if args.hygiene:
        from semhash_spark.functions.text import hygiene_flags

        flagged = df.withColumn("_h", hygiene_flags(args.columns[0]))
        dropped = flagged.where(~F.col("_h.keep"))
        dropped.write.mode("overwrite").parquet(
            os.path.join(args.output, "hygiene_dropped"))
        n_hygiene_dropped = dropped.count()
        df = flagged.where(F.col("_h.keep")).drop("_h")

    ck = CheckpointManager(spark, args.checkpoint_dir) if args.checkpoint_dir else None
    extra = None
    if args.with_containment:
        from semhash_spark.functions.hashing import shingle_hashes
        from semhash_spark.operators.containment import containment_edges

        feats = df.select("record_id",
                          shingle_hashes(args.columns[0], args.shingle_k).alias("shingles"))
        extra = containment_edges(feats, cfg, "record_id")

    t0 = time.time()
    if args.against:
        # containment feeds extra edges into self-mode CLUSTERING and
        # the checkpoint stages are the self-pipeline's; neither is
        # wired for the existential cross path — reject loudly rather
        # than silently dropping the flags
        if args.with_containment:
            p.error("--with-containment applies to self dedup only "
                    "(cross mode has no clustering to feed edges into)")
        if args.checkpoint_dir:
            p.error("--checkpoint-dir is not supported with --against "
                    "(cross-mode checkpointing is not wired)")
        from semhash_spark.api import SparkSemHash

        idx = spark.read.parquet(args.against)
        if "record_id" not in idx.columns:
            if args.id_col:
                idx = with_record_id(idx, existing=args.id_col)
            elif args.natural_key:
                idx = with_record_id(idx, natural_key=args.natural_key,
                                     salt=args.id_salt)
            else:
                idx = with_record_id(idx, order_cols=list(args.columns))
        sh = SparkSemHash(cfg, mode=args.mode).fit(idx)
        res = sh.deduplicate(df, broadcast_query=args.broadcast_query)
    else:
        res = self_deduplicate(df, cfg, mode=args.mode, checkpointer=ck,
                               extra_edges=extra)
    res.selected.write.mode("overwrite").parquet(os.path.join(args.output, "selected"))
    res.filtered.write.mode("overwrite").parquet(os.path.join(args.output, "filtered"))
    res.stats_df().write.mode("overwrite").parquet(os.path.join(args.output, "stats"))
    n_sel, n_fil, n_exact = res.counts()
    print(json.dumps({
        "n_selected": n_sel, "n_filtered": n_fil, "n_exact": n_exact,
        "n_hygiene_dropped": n_hygiene_dropped,
        "seconds": round(time.time() - t0, 2),
        "files_per_sec": round((n_sel + n_fil) / max(time.time() - t0, 1e-9), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
