"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises an operator family from
SURVEY.md §2 through the semhash_spark engine; ``oracle_sql()``
gives the DuckDB-equivalent ANSI SQL over the same parquet views.
Connected components is SQL-expressible here via a recursive CTE
(transitive closure is tiny at sf<=0.01 thresholds), so even the
clustering queries get full value-hash checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from semhash_spark.config import DedupConfig
from semhash_spark.functions.hashing import hamming64, shingle_hashes, simhash64, simhash_bands
from semhash_spark.functions.text import (
    bpe_ish_token_count,
    content_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from semhash_spark.functions.vectors import cosine_similarity
from semhash_spark.operators.containment import containment_edges
from semhash_spark.operators.dedup import self_deduplicate
from semhash_spark.operators.exact import self_exact_dedup
from semhash_spark.operators.knn import brute_topk
from semhash_spark.operators.lsh import band_table, candidate_pairs_self, explode_band_array
from semhash_spark.operators.rank import filter_outliers, rank_by_avg_similarity
from semhash_spark.operators.verify import verify_jaccard
from semhash_spark.sources.tables import documents as _documents
from semhash_spark.sources.tables import embeddings as _embeddings
from semhash_spark.sources.tables import read_table

JACCARD_T = 0.8
COSINE_T = 0.4  # the provided embeddings are near-random; 0.9 finds nothing
DOC_CFG = DedupConfig(columns=("text",), threshold=JACCARD_T, shingle_k=3,
                      num_perm=128, bands=32)


# ----------------------------------------------------------------- entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: MinHash/LSH/CC self-dedup of sf0.001 documents."""
    docs = _documents(spark, "/root/testdata/sf0.001")
    res = self_deduplicate(docs, DOC_CFG, mode="minhash")
    return res.selected.select("doc_id", "text", "lang", "source", "n_chars")


# ---------------------------------------------------------------- helpers


def _doc_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _documents(spark, sf_dir)
        .select("record_id", shingle_hashes("text", 3).alias("shingles"))
        .persist()
    )


def _emb(spark, sf_dir):
    return _embeddings(spark, sf_dir)


# ---------------------------------------------------------------- queries


def q_exact_dedup_selected(spark, sf_dir):
    # E1/E2: first-occurrence keyed distinct over (lang, source)
    docs = _documents(spark, sf_dir)
    keyed = self_exact_dedup(docs, ("lang", "source"), "record_id")
    return (
        keyed.where(~F.col("is_exact_dup"))
        .select(F.col("doc_id").cast("long").alias("doc_id"), "lang", "source")
    )


def q_exact_dedup_pairs(spark, sf_dir):
    docs = _documents(spark, sf_dir)
    keyed = self_exact_dedup(docs, ("lang", "source"), "record_id")
    return keyed.where(F.col("is_exact_dup")).select(
        F.col("doc_id").cast("long").alias("dup_id"),
        F.col("exemplar_id").cast("long").alias("exemplar_id"),
    )


def q_events_first_per_key(spark, sf_dir):
    # E2 on the events table: first event per (user_id, event_type)
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("event_id", "user_id", "event_type")
    )


def q_jaccard3_pairs(spark, sf_dir):
    # F3/F4/J1/J4/J2: LSH candidates + exact-Jaccard verification
    docs = _documents(spark, sf_dir).select(
        "record_id", shingle_hashes("text", 3).alias("shingles")
    )
    sigs = docs.selectExpr(
        "record_id",
        "shingles",
        f"""aggregate(shingles, array_repeat(9223372036854775807L, {DOC_CFG.num_perm}),
             (acc, s) -> zip_with(acc, sequence(0, {DOC_CFG.num_perm - 1}),
                                  (m, p) -> least(m, xxhash64(s, p)))) AS sig""",
    ).persist()
    bt = band_table(sigs, "sig", DOC_CFG.bands, "record_id")
    cands = candidate_pairs_self(bt, DOC_CFG.bucket_cap, "record_id")
    verified = verify_jaccard(cands, sigs, "shingles", "record_id", JACCARD_T)
    return verified.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.round("score", 6).alias("jac"),
    )


def q_selfdedup_clusters(spark, sf_dir):
    # D2/D3: full minhash pipeline; cluster_id = min id of component
    docs = _documents(spark, sf_dir)
    res = self_deduplicate(docs, DOC_CFG, mode="minhash")
    sel = res.selected.select(
        F.col("record_id").alias("doc_id"), F.col("record_id").alias("cluster_id")
    )
    fil = res.filtered.select(
        F.col("record_id").alias("doc_id"), F.col("exemplar_id").alias("cluster_id")
    )
    return sel.unionByName(fil).select(
        F.col("doc_id").cast("long"), F.col("cluster_id").cast("long")
    )


def q_selfdedup_stats(spark, sf_dir):
    # D5: scalar stats row
    docs = _documents(spark, sf_dir)
    res = self_deduplicate(docs, DOC_CFG, mode="minhash")
    return res.stats_df().select(
        "n_selected", "n_filtered", "n_exact",
        F.round("duplicate_ratio", 6).alias("duplicate_ratio"),
    )


def q_cosine_dedup_clusters(spark, sf_dir):
    # D2 with cosine metric over precomputed embeddings (S3 path)
    emb = _emb(spark, sf_dir).withColumnRenamed("embedding", "emb")
    cfg = DedupConfig(columns=("vec_id",), threshold=COSINE_T, embedding_col="emb")
    res = self_deduplicate(
        emb.withColumn("vec_id_s", F.col("vec_id").cast("string")).withColumn(
            "emb", F.col("emb")
        ).withColumn("record_id", F.col("vec_id").cast("long")),
        cfg.with_(columns=("vec_id_s",)),
        mode="cosine",
    )
    sel = res.selected.select(
        F.col("record_id").alias("vec_id"), F.col("record_id").alias("cluster_id")
    )
    fil = res.filtered.select(
        F.col("record_id").alias("vec_id"), F.col("exemplar_id").alias("cluster_id")
    )
    return sel.unionByName(fil).select(
        F.col("vec_id").cast("long"), F.col("cluster_id").cast("long")
    )


def q_cross_dedup_cosine_selected(spark, sf_dir):
    # D1: existential anti-join split (query = vec_id % 5 == 0)
    emb = _emb(spark, sf_dir)
    q = emb.where("vec_id % 5 = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qe")
    )
    i = emb.where("vec_id % 5 != 0").select(
        F.col("vec_id").alias("index_id"), F.col("embedding").alias("_ie")
    )
    hits = (
        q.crossJoin(i)
        .withColumn("score", cosine_similarity("_qe", "_ie"))
        .where(F.col("score") >= COSINE_T)
        .select("query_id")
        .distinct()
    )
    return (
        q.join(hits, "query_id", "left_anti")
        .select(F.col("query_id").cast("long").alias("vec_id"))
    )


def q_knn_top10(spark, sf_dir):
    # J3: per-query top-k with deterministic tie-break
    emb = _emb(spark, sf_dir)
    q = emb.where("vec_id < 50")
    i = emb.where("vec_id >= 50")
    tk = brute_topk(q, i, 10, id_col="record_id", emb_col="embedding")
    return tk.select(
        F.col("query_id").cast("long"),
        F.col("index_id").cast("long"),
        F.col("rk").cast("long"),
    )


def q_rank_avg_top100(spark, sf_dir):
    # R2: self-rank by mean of top-100 similarities (self excluded)
    emb = _emb(spark, sf_dir)
    r = rank_by_avg_similarity(emb, emb, 100, exclude_self=True,
                               id_col="record_id", emb_col="embedding")
    return r.select(
        F.col("query_id").cast("long").alias("vec_id"),
        F.round("avg_score", 6).alias("avg_score"),
    )


def q_outliers_pct10(spark, sf_dir):
    # R3: bottom ceil(n*0.1) of the ranking
    emb = _emb(spark, sf_dir)
    r = rank_by_avg_similarity(emb, emb, 100, exclude_self=True,
                               id_col="record_id", emb_col="embedding")
    _, outl = filter_outliers(r, 0.1)
    return outl.select(F.col("query_id").cast("long").alias("vec_id"))


def q_token_stats(spark, sf_dir):
    docs = _documents(spark, sf_dir)
    return docs.select(
        F.col("doc_id").cast("long"),
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_bpe"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )


def q_quality_scores(spark, sf_dir):
    docs = _documents(spark, sf_dir)
    return docs.select(
        F.col("doc_id").cast("long"), quality_score("text").alias("q")
    )


def q_lang_pred(spark, sf_dir):
    docs = _documents(spark, sf_dir)
    return docs.select(
        F.col("doc_id").cast("long"), lang_id("text").alias("lang_pred")
    )


def q_fingerprint(spark, sf_dir):
    docs = _documents(spark, sf_dir)
    return docs.select(
        F.col("doc_id").cast("long"), content_fingerprint("text").alias("fp")
    )


def q_containment_pairs(spark, sf_dir):
    # J5: winnowing-anchor containment stage
    feats = _doc_feats(spark, sf_dir)
    cfg = DedupConfig(containment_threshold=0.9, anchor_mod=8)
    edges = containment_edges(feats, cfg, "record_id")
    return edges.select(
        F.col("a").cast("long"),
        F.col("b").cast("long"),
        F.round("score", 6).alias("containment"),
    )


def q_simhash_pairs(spark, sf_dir):
    # F5: simhash banding + hamming filter (no SQL oracle: xxhash64
    # has no DuckDB equivalent -> rows-only check)
    docs = _documents(spark, sf_dir).select(
        "record_id", shingle_hashes("text", 3).alias("shingles")
    )
    sims = docs.select("record_id", simhash64("shingles").alias("sim64")).persist()
    banded = sims.withColumn("shb", simhash_bands("sim64", 4))
    bt = explode_band_array(banded, "shb", "record_id")
    cands = candidate_pairs_self(bt, 1000, "record_id")
    s = sims
    out = (
        cands.join(s.select(F.col("record_id").alias("a"), F.col("sim64").alias("_sa")), "a")
        .join(s.select(F.col("record_id").alias("b"), F.col("sim64").alias("_sb")), "b")
        .withColumn("hamming", hamming64("_sa", "_sb"))
        .where(F.col("hamming") <= 3)
        .select(F.col("a").cast("long"), F.col("b").cast("long"),
                F.col("hamming").cast("long"))
    )
    return out


def q_representatives(spark, sf_dir):
    # R5/R6: MMR representative selection (driver-side numpy ->
    # deterministic but not SQL-expressible -> rows-only check)
    from semhash_spark.operators.rank import find_representative

    emb = _emb(spark, sf_dir)
    r = rank_by_avg_similarity(emb, emb, 100, exclude_self=True,
                               id_col="record_id", emb_col="embedding")
    sel_ids, _, _ = find_representative(
        r, emb, selection_size=10, diversity=0.5,
        id_col="record_id", emb_col="embedding",
    )
    return spark.createDataFrame(
        [(int(v), i + 1) for i, v in enumerate(sel_ids)], "vec_id long, pos long"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_dedup_selected": q_exact_dedup_selected,
        "exact_dedup_pairs": q_exact_dedup_pairs,
        "events_first_per_key": q_events_first_per_key,
        "jaccard3_pairs": q_jaccard3_pairs,
        "selfdedup_clusters": q_selfdedup_clusters,
        "selfdedup_stats": q_selfdedup_stats,
        "cosine_dedup_clusters": q_cosine_dedup_clusters,
        "cross_dedup_cosine_selected": q_cross_dedup_cosine_selected,
        "knn_top10": q_knn_top10,
        "rank_avg_top100": q_rank_avg_top100,
        "outliers_pct10": q_outliers_pct10,
        "token_stats": q_token_stats,
        "quality_scores": q_quality_scores,
        "lang_pred": q_lang_pred,
        "fingerprint": q_fingerprint,
        "containment_pairs": q_containment_pairs,
        "simhash_pairs": q_simhash_pairs,
        "representatives": q_representatives,
    }


# ------------------------------------------------------------ oracle SQL

_TOKS = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"
_SH3 = f"""
    CASE WHEN len({_TOKS}) < 3
         THEN [array_to_string({_TOKS}, ' ')]
         ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             FOR i IN range(1, len(w) - 1)])
    END
"""

_JACCARD_PAIRS = f"""
WITH sh AS (
  SELECT doc_id, {_SH3.replace('w[', 'toks[').replace('len(w)', 'len(toks)')} AS g
  FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
),
p AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.g, b.g))::DOUBLE
           / len(list_distinct(a.g || b.g)) AS jac
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT a, b, round(jac, 6) AS jac FROM p WHERE jac >= {JACCARD_T}
"""

_CLUSTERS_CTE = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, {_SH3.replace('w[', 'toks[').replace('len(w)', 'len(toks)')} AS g
  FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
),
p AS (
  SELECT a.doc_id AS i, b.doc_id AS j
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.g, b.g))::DOUBLE
          / len(list_distinct(a.g || b.g)) >= {JACCARD_T}
),
edges AS (SELECT i, j FROM p UNION SELECT j AS i, i AS j FROM p),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.j FROM reach r JOIN edges e ON r.dst = e.i
),
comp AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src)
"""

_EMB_CLUSTERS_CTE = f"""
WITH RECURSIVE p AS (
  SELECT a.vec_id AS i, b.vec_id AS j
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {COSINE_T}
),
edges AS (SELECT i, j FROM p UNION SELECT j AS i, i AS j FROM p),
reach(src, dst) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT r.src, e.j FROM reach r JOIN edges e ON r.dst = e.i
),
comp AS (SELECT src AS vec_id, min(dst) AS cluster_id FROM reach GROUP BY src)
"""

_RANK_SQL = f"""
WITH s AS (
  SELECT a.vec_id AS q, b.vec_id AS n,
         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS score
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
tk AS (
  SELECT q, score,
         row_number() OVER (PARTITION BY q ORDER BY score DESC, n ASC) AS rk
  FROM s
)
SELECT q AS vec_id, round(avg(score), 6) AS avg_score
FROM tk WHERE rk <= 100 GROUP BY q
"""

_RANK_RAW = _RANK_SQL.replace("round(avg(score), 6)", "avg(score)")

_QUALITY_SQL = f"""
SELECT doc_id,
  round(
    0.4 * least(length(text)::DOUBLE / 200.0, 1.0)
    + 0.3 * (1.0 - least(CASE WHEN length(text) > 0
        THEN len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE / length(text)
        ELSE 0.0 END, 0.5) / 0.5)
    + 0.3 * least(
        (CASE WHEN len({_TOKS}) > 0 THEN
          len(list_filter({_TOKS}, t -> list_contains(
             ['the','and','of','to','a','in','is','it','that','for','on','with'],
             lower(t))))::DOUBLE / len({_TOKS})
         ELSE 0.0 END) / 0.2, 1.0),
  6) AS q
FROM documents
"""

_LANG_MARKERS_SQL = {
    "en": "['the','and','of','to','a','in','is']",
    "de": "['der','die','das','und','ist','nicht','ein']",
    "fr": "['le','la','les','et','est','une','dans']",
    "es": "['el','los','las','es','una','por','como']",
    "zh": "['de5','shi4','le5','zai4','he2','you3','wo3']",
}


def _lang_pred_sql() -> str:
    hits = ",\n  ".join(
        f"len(list_filter(toks, t -> list_contains({arr}, t))) AS h_{lang}"
        for lang, arr in _LANG_MARKERS_SQL.items()
    )
    # fold in the same order as functions/text.py (reversed list,
    # cond = hits >= best, hits > 0) == first language with max hits
    order = list(_LANG_MARKERS_SQL)  # en, de, fr, es, zh
    best = "0"
    for lang in order:
        best = f"greatest({best}, h_{lang})"
    case = "CASE "
    for lang in order:
        case += f"WHEN h_{lang} > 0 AND h_{lang} = {best} THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"""
WITH t AS (
  SELECT doc_id,
         list_transform({_TOKS}, t -> lower(t)) AS toks
  FROM documents
),
h AS (SELECT doc_id, {hits} FROM t)
SELECT doc_id, {case} AS lang_pred FROM h
"""


_CONTAINMENT_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_SH3.replace('w[', 'toks[').replace('len(w)', 'len(toks)')} AS g
  FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
)
SELECT a.doc_id AS a, b.doc_id AS b,
       round(len(list_intersect(a.g, b.g))::DOUBLE
             / least(len(a.g), len(b.g)), 6) AS containment
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.g, b.g))::DOUBLE
        / least(len(a.g), len(b.g)) >= 0.9
"""


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dedup_selected": """
            SELECT doc_id, lang, source FROM (
              SELECT doc_id, lang, source,
                     row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
              FROM documents) WHERE rn = 1
        """,
        "exact_dedup_pairs": """
            SELECT doc_id AS dup_id,
                   min(doc_id) OVER (PARTITION BY lang, source) AS exemplar_id
            FROM documents
            QUALIFY doc_id <> exemplar_id
        """,
        "events_first_per_key": """
            SELECT event_id, user_id, event_type FROM (
              SELECT event_id, user_id, event_type,
                     row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY event_id) AS rn
              FROM events) WHERE rn = 1
        """,
        "jaccard3_pairs": _JACCARD_PAIRS,
        "selfdedup_clusters": _CLUSTERS_CTE
        + "SELECT doc_id, cluster_id FROM comp",
        "selfdedup_stats": _CLUSTERS_CTE
        + """
        SELECT
          count(*) FILTER (doc_id = cluster_id)::BIGINT AS n_selected,
          count(*) FILTER (doc_id <> cluster_id)::BIGINT AS n_filtered,
          0::BIGINT AS n_exact,
          round(count(*) FILTER (doc_id <> cluster_id)::DOUBLE / count(*), 6)
            AS duplicate_ratio
        FROM comp
        """,
        "cosine_dedup_clusters": _EMB_CLUSTERS_CTE
        + "SELECT vec_id, cluster_id FROM comp",
        "cross_dedup_cosine_selected": f"""
            SELECT a.vec_id FROM embeddings a
            WHERE a.vec_id % 5 = 0 AND NOT EXISTS (
              SELECT 1 FROM embeddings b
              WHERE b.vec_id % 5 <> 0
                AND list_cosine_similarity(a.embedding::DOUBLE[],
                                           b.embedding::DOUBLE[]) >= {COSINE_T})
        """,
        "knn_top10": """
            SELECT q AS query_id, n AS index_id, rk FROM (
              SELECT a.vec_id AS q, b.vec_id AS n,
                     row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(a.embedding::DOUBLE[],
                                                       b.embedding::DOUBLE[]) DESC,
                                b.vec_id ASC) AS rk
              FROM embeddings a JOIN embeddings b ON b.vec_id >= 50
              WHERE a.vec_id < 50) WHERE rk <= 10
        """,
        "rank_avg_top100": _RANK_SQL,
        "outliers_pct10": f"""
            WITH r AS ({_RANK_RAW}),
            ranked AS (
              SELECT vec_id,
                     row_number() OVER (ORDER BY avg_score ASC, vec_id DESC) AS rk
              FROM r)
            SELECT vec_id FROM ranked
            WHERE rk <= ceil((SELECT count(*) FROM r) * 0.1)
        """,
        "token_stats": f"""
            SELECT doc_id,
                   len({_TOKS})::BIGINT AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS n_bpe,
                   length(text)::BIGINT AS n_chars_calc
            FROM documents
        """,
        "quality_scores": _QUALITY_SQL,
        "lang_pred": _lang_pred_sql(),
        "fingerprint": """
            SELECT doc_id, sha256(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
            FROM documents
        """,
        "containment_pairs": _CONTAINMENT_SQL,
        # simhash_pairs, representatives: rows-only (non-SQL-expressible
        # hash family / driver-side MMR)
    }
