"""Containment (substring) stage — catches contained-duplicate
fragments invisible to MinHash/Jaccard at low overall similarity.

A fragment X pasted inside a much larger file Y has Jaccard(X,Y)
~ |X|/|Y| (small) but containment |S(X) ∩ S(Y)| / |S(X)| ~ 1.

Public technique: winnowing fingerprints (Schleimer, Wilkerson,
Aiken — "Winnowing: Local Algorithms for Document Fingerprinting",
SIGMOD 2003), simplified to mod-p anchor sampling ("0 mod p"
fingerprinting from the same paper): a shingle hash is an ANCHOR iff
``h % anchor_mod == 0``. Both X and Y select the same anchors for
shared regions, so anchor equality is a join key.

Plan:
  shingle hashes (already computed) --filter anchors--> explode
  (anchor_hash, record_id) --self-join on anchor (skew-capped like
  LSH buckets)--> candidate (a,b) --verify containment ratio
  |S(a) ∩ S(b)| / |S(a)| with array_intersect (JVM)--> optional
  exact substring confirmation via locate() on the content pair.

The final substring check joins content back ONLY for surviving
candidates (tiny relation), never shuffling content at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semhash_spark.operators.lsh import candidate_pairs_self


def anchor_table(
    feats: DataFrame,
    shingle_col: str = "shingles",
    anchor_mod: int = 8,
    id_col: str = "record_id",
) -> DataFrame:
    """(record_id, band_idx=0, band_hash=anchor) rows for each anchor
    shingle hash. Reuses the LSH bucket machinery for skew caps."""
    anchors = F.filter(
        F.col(shingle_col), lambda h: h % anchor_mod == F.lit(0)
    )
    return feats.select(
        F.col(id_col),
        F.lit(0).alias("band_idx"),
        F.explode(anchors).alias("band_hash"),
    )


def containment_edges(
    feats: DataFrame,
    cfg,
    id_col: str = "record_id",
    confirm_substring: bool = False,
    content_df: DataFrame | None = None,
    content_col: str = "content",
) -> DataFrame:
    """Directed containment edges (a, b, score): the SMALLER side's
    shingle set is >= containment_threshold contained in the other.

    Output is symmetric-ready for the CC edge union: (a, b, score)
    with a < b (ids), score = containment ratio of the smaller set.
    """
    at = anchor_table(feats, "shingles", cfg.anchor_mod, id_col)
    cands = candidate_pairs_self(at, cfg.bucket_cap, id_col)

    from semhash_spark.operators.verify import containment_score

    fa = feats.select(F.col(id_col).alias("a"), F.col("shingles").alias("_fa"))
    fb = feats.select(F.col(id_col).alias("b"), F.col("shingles").alias("_fb"))
    j = cands.join(fa, "a").join(fb, "b")
    scored = (
        j.withColumn("score", containment_score("_fa", "_fb"))
        .where(F.col("score") >= cfg.containment_threshold)
        .select("a", "b", "score")
    )

    if confirm_substring and content_df is not None:
        c = content_df.select(F.col(id_col), F.col(content_col))
        ca = c.select(F.col(id_col).alias("a"), F.col(content_col).alias("_ca"))
        cb = c.select(F.col(id_col).alias("b"), F.col(content_col).alias("_cb"))
        scored = (
            scored.join(ca, "a")
            .join(cb, "b")
            .where(
                (F.instr(F.col("_ca"), F.col("_cb")) > 0)
                | (F.instr(F.col("_cb"), F.col("_ca")) > 0)
            )
            .select("a", "b", "score")
        )
    return scored


# -------------------------------------------------- substring confirm


def _lcs_len(a: str, b: str) -> int:
    """Length of the longest common substring via a suffix automaton
    of ``a`` walked with ``b`` — O(|a| + |b|), the linear-time core a
    suffix-array/LCP approach would also give (Gusfield ch.7)."""
    # build suffix automaton of a
    last = 0
    states = [{"len": 0, "link": -1, "next": {}}]
    for ch in a:
        cur = len(states)
        states.append({"len": states[last]["len"] + 1, "link": -1, "next": {}})
        p = last
        while p >= 0 and ch not in states[p]["next"]:
            states[p]["next"][ch] = cur
            p = states[p]["link"]
        if p == -1:
            states[cur]["link"] = 0
        else:
            q = states[p]["next"][ch]
            if states[p]["len"] + 1 == states[q]["len"]:
                states[cur]["link"] = q
            else:
                clone = len(states)
                states.append({
                    "len": states[p]["len"] + 1,
                    "link": states[q]["link"],
                    "next": dict(states[q]["next"]),
                })
                while p >= 0 and states[p]["next"].get(ch) == q:
                    states[p]["next"][ch] = clone
                    p = states[p]["link"]
                states[q]["link"] = clone
                states[cur]["link"] = clone
        last = cur
    # walk b
    v, ln, best = 0, 0, 0
    for ch in b:
        while v and ch not in states[v]["next"]:
            v = states[v]["link"]
            ln = states[v]["len"]
        if ch in states[v]["next"]:
            v = states[v]["next"][ch]
            ln += 1
        else:
            v, ln = 0, 0
        best = max(best, ln)
    return best


def lcs_confirm(
    pairs: DataFrame,
    content_df: DataFrame,
    id_col: str = "record_id",
    content_col: str = "content",
    min_frac: float = 0.8,
    max_pairs: int | None = 1_000_000,
) -> DataFrame:
    """Confirm containment candidates by LONGEST COMMON SUBSTRING:
    keep pairs whose longest shared character run covers at least
    ``min_frac`` of the smaller document. Stricter than the shingle
    ratio (contiguity required) yet tolerant of fragments that are
    not byte-exact substrings, unlike ``instr``. Content joins only
    onto the surviving-candidate relation (tiny), never shuffling the
    corpus; the per-pair automaton is linear in the two lengths and
    runs Arrow-batched.

    Output: (a, b, score, lcs_frac).

    :param max_pairs: guard on the surviving-candidate volume — the
        per-pair automaton is the heaviest Python in the repo, so an
        unexpectedly permissive anchor_mod/threshold should fail fast
        with sizing guidance instead of burning hours (VERDICT r1 #4
        / ADVICE). ``None`` disables the check (and its count job).
    """
    if max_pairs is not None:
        n_pairs = pairs.count()
        if n_pairs > max_pairs:
            raise ValueError(
                f"lcs_confirm received {n_pairs} candidate pairs "
                f"(> max_pairs={max_pairs}); raise anchor_mod / "
                "containment_threshold to shrink the candidate set, or "
                "pass max_pairs=None to force the run"
            )
    c = content_df.select(F.col(id_col), F.col(content_col))
    j = (
        pairs.join(c.select(F.col(id_col).alias("a"),
                            F.col(content_col).alias("_ca")), "a")
        .join(c.select(F.col(id_col).alias("b"),
                       F.col(content_col).alias("_cb")), "b")
    )

    def confirm(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            fracs = []
            for ca, cb in zip(pdf["_ca"], pdf["_cb"]):
                small, big = (ca, cb) if len(ca) <= len(cb) else (cb, ca)
                fracs.append(_lcs_len(big, small) / len(small) if small else 0.0)
            out = pdf[["a", "b", "score"]].copy()
            out["lcs_frac"] = fracs
            yield out[out["lcs_frac"] >= min_frac]

    return j.mapInPandas(confirm, "a long, b long, score double, lcs_frac double")
