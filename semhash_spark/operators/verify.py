"""Exact verification of candidate pairs.

The reference never needs this (its ANN returns exact cosine
distances, semhash/index.py:59); in the LSH plan, candidates are
probabilistic and every surviving pair is re-scored exactly.

Two physical strategies for Jaccard (chosen by feature-table size):

* ``broadcast`` — the shingle table is flattened to ONE numpy blob
  (sorted ids, concatenated hashes, offsets) and broadcast; the pair
  stream ships only (a, b) longs through Arrow (~16 bytes/pair
  instead of two ~1 KB arrays/pair) and a mapInPandas kernel gathers
  both sides from the blob and computes intersections with a single
  row-wise padded sort per batch. Measured ~8x faster than either
  join-based form at 576k pairs / 100k records (local[32]).
* ``join`` — two hash joins rehydrate the arrays onto the pairs and
  JVM ``array_intersect`` scores them (|A∪B| derived as
  |A|+|B|-|A∩B|, both sides duplicate-free). This is the fallback
  when the feature table exceeds executor memory; AQE skew-join
  splitting handles hot hub ids from star-edged mega-buckets.

Cosine uses the vectorized pandas UDF (functions/vectors.py) on the
joined pairs — embedding arrays are small (64 floats) and the numpy
matmul dominates.

Integer-exact in both strategies: identical counts, identical
float64 division — bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from semhash_spark.functions.vectors import cosine_similarity

# feature tables up to this many rows take the broadcast-blob path
VERIFY_BROADCAST_CAP = 2_000_000
# ... but never when the estimated payload exceeds this many bytes
# (shingle arrays are unbounded, so a row cap alone can admit a
# multi-GB blob — ADVICE r1). 1 GiB mmap'd per executor is the
# practical ceiling; above it the join strategy stays distributed.
VERIFY_BROADCAST_MAX_BYTES = 1 << 30
# byte ceiling for F.broadcast join hints (per-executor JVM hash
# relation, less forgiving than an mmap'd file)
JOIN_BROADCAST_MAX_BYTES = 256 << 20
# ... and below this many bytes the blob machinery's fixed cost
# (distributed parquet write + per-executor pack, several jobs) costs
# more than it saves — tiny feature tables take the broadcast-hinted
# JOIN path instead (measured: the blob pack is a ~1-3 s fixed cost
# that dominates small-table queries while winning 8x at 100k rows)
VERIFY_BLOB_MIN_BYTES = 8 << 20


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def blob_transport_available(spark) -> bool:
    """True when ``materialize_feats`` CAN ship a feature blob to the
    executors: local master (driver tempdir + addFile share a
    filesystem) or a configured shared ``spark.semhash.blobDir``.
    AUTO strategy choices consult this so a cluster without shared
    storage falls back to the join/LSH strategies instead of dying in
    materialize_feats' availability check (the explicit strategies
    still raise with guidance — an explicit ask should not silently
    degrade)."""
    if spark.conf.get("spark.semhash.blobDir", None):
        return True
    return spark.conf.get("spark.master", "").startswith("local")


def jaccard_similarity(a: str | Column, b: str | Column) -> Column:
    """Exact Jaccard of two array<long> set columns (elements distinct
    within each array, as produced by shingle_hashes).

    |A ∪ B| is derived as |A| + |B| - |A ∩ B| (valid because each
    side is duplicate-free), skipping the array_union hash-set build
    — one interpreted set op per pair instead of two.
    """
    inter = F.size(F.array_intersect(_c(a), _c(b)))
    union = F.size(_c(a)) + F.size(_c(b)) - inter
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def containment_score(a: str | Column, b: str | Column) -> Column:
    """|A ∩ B| / min(|A|, |B|) of two array<long> set columns."""
    inter = F.size(F.array_intersect(_c(a), _c(b))).cast("double")
    small = F.least(F.size(_c(a)), F.size(_c(b))).cast("double")
    return F.when(small > 0, inter / small).otherwise(F.lit(0.0))


# worker-side mmap cache: one entry per distributed blob file; shared
# page cache across the executor's python workers, survives tasks
_BLOB_CACHE: dict = {}

# driver-created temp blob dirs, removed at interpreter exit
_TEMP_BLOBS: list[str] = []


def _cleanup_temp_blobs() -> None:
    import os
    import shutil
    import tempfile

    for p in _TEMP_BLOBS:
        shutil.rmtree(p, ignore_errors=True)
        packed = os.path.join(
            tempfile.gettempdir(), "semhash_packed", os.path.basename(p)
        )
        shutil.rmtree(packed, ignore_errors=True)


import atexit  # noqa: E402

atexit.register(_cleanup_temp_blobs)


# ------------------------------------------- executor-side feature blob
#
# The round-1 broadcast paths packed the feature table on the DRIVER
# (toPandas -> numpy -> addFile'd .npy): gigabytes through one
# process and a serial stage (Amdahl) right before an otherwise-
# parallel kernel. (sc.broadcast is even worse: a ~100 MB
# incompressible numpy pickle re-streams PER TASK, ~10 s/task
# measured at local[32].) materialize_feats instead WRITES THE TABLE
# AS PARQUET (distributed write, no driver hop) and ships the
# directory via SparkFiles; the first python worker per executor
# packs the table into mmap'd numpy (pack-once, see
# _pack_once_per_executor) and every other worker shares the pack.
# On a multi-node cluster pass ``blob_dir`` on shared storage (NFS /
# fuse-mounted object store) and the addFile hop is skipped entirely.


def materialize_feats(
    feats: DataFrame,
    id_col: str,
    payload_col: str,
    name_prefix: str,
    blob_dir: str | None = None,
    write_fn=None,
) -> dict:
    """Write (id, payload) as parquet reachable by every executor;
    returns a ref dict for ``load_feats`` inside the UDF closure.

    Blob transport by deployment mode:

    * ``blob_dir`` given — parquet written there directly; must be
      shared storage (NFS / fuse-mounted object store) on a real
      cluster. Also settable session-wide via
      ``spark.semhash.blobDir`` (spark conf), so jobs need no code
      change between local and cluster runs.
    * ``blob_dir`` absent + local master — driver tempdir + addFile
      (executors share the driver's filesystem in local mode).
    * ``blob_dir`` absent + NON-local master — raise: the tempdir
      default would surface as a confusing executor
      ``FileNotFoundError`` mid-stage (addFile ships FILES, but the
      pack protocol needs a shared scratch root). Failing at plan
      time with the fix in the message is the cluster-correct
      default (VERDICT r2 #5).
    """
    import os
    import tempfile
    import uuid

    spark = feats.sparkSession
    if blob_dir is None:
        conf_dir = spark.conf.get("spark.semhash.blobDir", None)
        if conf_dir:
            blob_dir = conf_dir
        else:
            master = spark.conf.get("spark.master", "")
            if not master.startswith("local"):
                raise RuntimeError(
                    f"materialize_feats: master {master!r} is not local and no "
                    "shared blob_dir was given; the tempdir+addFile default only "
                    "works when executors share the driver's filesystem. Pass "
                    "blob_dir= on shared storage (NFS / object-store mount) or "
                    "set spark.semhash.blobDir in the session conf."
                )
    tag = f"{name_prefix}_{uuid.uuid4().hex[:12]}"
    shipped = blob_dir is None
    base = tempfile.gettempdir() if blob_dir is None else blob_dir
    path = os.path.join(base, tag)
    # scratch blob, read back immediately by the workers: hash/float
    # payloads are high-entropy so codecs only burn CPU (measured:
    # uncompressed 0.5-0.6 s vs snappy 0.75-2.4 s for the 51 MB
    # 100k x 128-float blob, ~same bytes on disk). ``write_fn``
    # overrides the projection/layout (the cross-dedup band blob
    # writes range-sorted multi-column parts).
    if write_fn is not None:
        write_fn(feats, path)
    else:
        feats.select(id_col, payload_col).write.option(
            "compression", "uncompressed"
        ).parquet(path)
    if shipped:
        feats.sparkSession.sparkContext.addFile(path, recursive=True)
        _TEMP_BLOBS.append(path)
    return {
        "tag": tag,
        "path": None if shipped else path,
        "id_col": id_col,
        "payload_col": payload_col,
    }


def _blob_files(ref: dict) -> list[str]:
    import glob
    import os

    if ref["path"] is not None:
        root = ref["path"]
    else:
        from pyspark import SparkFiles

        root = SparkFiles.get(ref["tag"])
    files = sorted(glob.glob(os.path.join(root, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet parts under {root}")
    return files


def _read_id_payload(ref: dict):
    """(ids int64, flat values np, per-row lens int64) from the blob.

    Uses ``flatten()`` + ``value_lengths()`` (slice- and null-safe,
    unlike raw ``.values``/``.offsets``); NULL payload rows read as
    length 0.
    """
    return _read_id_payload_files(
        _blob_files(ref), ref["id_col"], ref["payload_col"]
    )


def _read_id_payload_files(files: list[str], id_col: str, payload_col: str):
    """(ids, flat values, lens, null_rows) of a parquet file list."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(files, columns=[id_col, payload_col])
    ids = tbl.column(id_col).to_numpy().astype(np.int64, copy=False)
    payload = tbl.column(payload_col).combine_chunks()
    values = payload.flatten().to_numpy(zero_copy_only=False)
    lens = payload.value_lengths().to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens.astype(np.float64), nan=0.0).astype(np.int64)
    null_rows = (
        payload.is_null().to_numpy(zero_copy_only=False)
        if payload.null_count
        else None
    )
    return ids, values, lens, null_rows


# a pack lock whose owner is alive but whose mtime is older than this
# is treated as stale and reclaimed (well above the 8-20 s measured
# pack cost; below the 600 s waiter deadline so reclaim fires first)
_LOCK_STALE_SECS = 300.0


def _acquire_pack_lock(lock: str, done: str) -> bool:
    """O_CREAT|O_EXCL lock with STALE-OWNER RECLAIM (ADVICE r2: a
    python worker SIGKILLed mid-build left its shard permanently
    unbuilt and every peer polled 600 s into TimeoutError).

    The lock file records the owner pid; a worker that finds the lock
    held checks whether the owner still exists (python workers
    sharing a tmp dir share a host/kernel, so ``os.kill(pid, 0)`` is
    authoritative) and reclaims when the owner died uncleanly or the
    lock outlived ``_LOCK_STALE_SECS``. Reclaim is unlink + O_EXCL
    retry, so concurrent reclaimers still arbitrate through O_EXCL.
    Returns True iff THIS worker now holds the lock; False when the
    pack is done or genuinely held by a live owner."""
    import os
    import time as _time

    while True:
        if os.path.exists(done):
            return False
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            return True
        except FileExistsError:
            pass
        try:
            with open(lock) as fh:
                owner = int(fh.read().strip() or "-1")
            age = _time.time() - os.path.getmtime(lock)
        except (OSError, ValueError):
            continue  # lock vanished/unreadable mid-check: retry acquire
        alive = True
        if owner > 0:
            try:
                os.kill(owner, 0)
            except ProcessLookupError:
                alive = False
            except PermissionError:
                pass  # pid exists under another uid: treat as alive
        if alive and age <= _LOCK_STALE_SECS:
            return False  # genuinely held by a live builder
        try:
            os.unlink(lock)  # stale: reclaim, then re-arbitrate
        except FileNotFoundError:
            pass


def _release_pack_lock(lock: str) -> None:
    """Unlink ``lock`` only if THIS process still owns it: after a
    stale-owner reclaim the original (slow but alive) builder must
    not delete the reclaimer's lock on its own failure path — that
    would admit a third concurrent builder."""
    import os

    try:
        with open(lock) as fh:
            owner = int(fh.read().strip() or "-1")
    except (OSError, ValueError):
        return
    if owner == os.getpid():
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass


def _pack_once_per_executor(ref: dict, kind: str, builder):
    """Executor-level pack cache: the FIRST python worker to need the
    blob packs it and writes .npy files next to the fetched parquet
    (atomic rename + done marker); every other worker — and every
    later task — mmaps the shared files. Without this, each of N
    concurrent workers would decode+pack the parquet independently
    (measured 6x slowdown of the verify stage at local[32]); with it
    the pack cost is paid once per executor and the OS page cache is
    shared, matching round 1's driver-shipped .npy behavior minus
    its serial driver pack.

    ``builder`` returns an ordered dict of numpy arrays to persist.
    """
    import os
    import time as _time

    key = (kind, ref["tag"])
    if key in _BLOB_CACHE:
        return _BLOB_CACHE[key]
    # scratch dir OUTSIDE the SparkFiles-managed tree: executors
    # re-validate fetched dirs against their source on later
    # addFile calls, and foreign files inside them fail that check
    # ("exists and does not match contents")
    import tempfile

    root = os.path.join(
        tempfile.gettempdir(), "semhash_packed", ref["tag"]
    )
    os.makedirs(root, exist_ok=True)
    base = os.path.join(root, f"_packed_{kind}")
    done = base + ".done"
    lock = base + ".lock"

    def _mmap():
        names = sorted(
            f for f in os.listdir(root)
            if f.startswith(f"_packed_{kind}__") and f.endswith(".npy")
        )
        return tuple(
            np.load(os.path.join(root, f), mmap_mode="r") for f in names
        )

    # win-or-wait loop: a waiter re-attempts acquisition each poll so
    # a stale lock (dead owner) is taken over instead of timing out.
    # tmp names are pid-unique: even if two workers ever build the
    # same pack concurrently (post-reclaim race), each writes complete
    # files and the atomic renames commute.
    pid = os.getpid()
    deadline = _time.time() + 600
    while not os.path.exists(done):
        if _acquire_pack_lock(lock, done):
            try:
                arrays = builder()
                for i, arr in enumerate(arrays):
                    path = os.path.join(root, f"_packed_{kind}__{i:02d}.npy")
                    np.save(f"{path}.tmp{pid}.npy", np.ascontiguousarray(arr))
                    os.rename(f"{path}.tmp{pid}.npy", path)
                with open(f"{done}.tmp{pid}", "w") as fh:
                    fh.write("ok")
                os.rename(f"{done}.tmp{pid}", done)
            except BaseException:
                _release_pack_lock(lock)  # let another worker retry
                raise
            break
        if _time.time() > deadline:
            raise TimeoutError(f"pack of {base} never completed")
        _time.sleep(0.05)
    _BLOB_CACHE[key] = _mmap()
    return _BLOB_CACHE[key]


def _read_part_id_payload(path: str, id_col: str, payload_col: str):
    """(ids, flat values, lens) of ONE parquet part file."""
    import pyarrow.parquet as pq

    tbl = pq.read_table([path], columns=[id_col, payload_col])
    ids = tbl.column(id_col).to_numpy().astype(np.int64, copy=False)
    payload = tbl.column(payload_col).combine_chunks()
    values = payload.flatten().to_numpy(zero_copy_only=False)
    lens = payload.value_lengths().to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens.astype(np.float64), nan=0.0).astype(np.int64)
    return ids, values, lens


def _pack_sharded(ref: dict, kind: str, part_builder, finalize_builder):
    """Shard-PARALLEL executor pack: every python worker that needs
    the blob claims unpacked parquet parts (one lock file per part),
    decodes and saves its shards CONCURRENTLY with the other
    workers, then one worker finalizes the small global index
    arrays. Decode is the pack's dominant cost (measured 8-20 s for
    a 535 MB shingle blob — disk + Arrow assembly) and it is O(blob)
    while everything downstream is O(pairs): packing it serially on
    one worker per executor was the largest fixed cost in the
    N->4N scaling profile. With W workers the wall cost drops to
    ~decode/W + finalize (finalize touches only the id arrays).

    ``part_builder(path) -> [arrays]`` packs one parquet part;
    ``finalize_builder(shard_arrays) -> [arrays]`` builds the global
    index from the per-shard packs. Returns (final_arrays,
    shard_arrays) — all mmap'd, shared across the executor's
    workers via the OS page cache."""
    import os
    import time as _time

    key = (kind, ref["tag"])
    if key in _BLOB_CACHE:
        return _BLOB_CACHE[key]
    import tempfile

    parts = _blob_files(ref)
    root = os.path.join(tempfile.gettempdir(), "semhash_packed", ref["tag"])
    os.makedirs(root, exist_ok=True)

    def _save(base: str, arrays) -> None:
        pid = os.getpid()  # pid-unique tmps: post-reclaim double builds commute
        for i, arr in enumerate(arrays):
            path = f"{base}__{i:02d}.npy"
            np.save(f"{path}.tmp{pid}.npy", np.ascontiguousarray(arr))
            os.rename(f"{path}.tmp{pid}.npy", path)
        with open(f"{base}.done.tmp{pid}", "w") as fh:
            fh.write("ok")
        os.rename(f"{base}.done.tmp{pid}", base + ".done")

    def _mmap_group(base: str):
        d, prefix = os.path.split(base)
        names = sorted(
            f for f in os.listdir(d)
            if f.startswith(prefix + "__") and f.endswith(".npy")
        )
        return tuple(np.load(os.path.join(d, f), mmap_mode="r") for f in names)

    def _claim_build(base: str, builder, *args) -> bool:
        """Try to win ``base`` (stale-owner locks are reclaimed, see
        _acquire_pack_lock); returns True if this worker built it."""
        if not _acquire_pack_lock(base + ".lock", base + ".done"):
            return False
        try:
            _save(base, builder(*args))
        except BaseException:
            _release_pack_lock(base + ".lock")  # let another worker retry
            raise
        return True

    def _build_or_await(base: str, what: str, builder, *args) -> None:
        """Wait for ``base`` — re-attempting acquisition each poll, so
        a builder killed uncleanly (its lock goes stale) is TAKEN OVER
        by a waiter instead of every peer timing out (ADVICE r2)."""
        deadline = _time.time() + 600
        while not os.path.exists(base + ".done"):
            if _claim_build(base, builder, *args):
                return
            if _time.time() > deadline:
                raise TimeoutError(f"{what} pack of {base} never completed")
            _time.sleep(0.05)

    shard_base = [os.path.join(root, f"_shard_{kind}_{k:04d}") for k in range(len(parts))]
    for k, part in enumerate(parts):
        _claim_build(shard_base[k], part_builder, part)
    for k in range(len(parts)):
        _build_or_await(shard_base[k], "shard", part_builder, parts[k])

    final_base = os.path.join(root, f"_final_{kind}")
    if not os.path.exists(final_base + ".done"):
        _build_or_await(
            final_base,
            "finalize",
            lambda: finalize_builder([_mmap_group(b) for b in shard_base]),
        )
    result = (_mmap_group(final_base), [_mmap_group(b) for b in shard_base])
    _BLOB_CACHE[key] = result
    return result


def load_feats_segments(ref: dict):
    """Worker-side pack of an (id, array<long>) parquet blob —
    shard-parallel across the executor's python workers
    (``_pack_sharded``), mmap'd by every worker. NULL shingle rows
    pack as empty sets.

    Returns ``(ids_sorted, perm, row_shard, row_off, row_len,
    flats)``: flat values stay in PARQUET PART ORDER (one mmap'd
    array per part — re-gathering into id order was 9 s of the
    original 13.8 s single-worker pack); a record's row index is
    ``row = perm[searchsorted(ids_sorted, id)]`` and its values live
    at ``flats[row_shard[row]][row_off[row] : row_off[row] +
    row_len[row]]``."""

    id_col, payload_col = ref["id_col"], ref["payload_col"]

    def part_builder(path):
        ids, values, lens = _read_part_id_payload(path, id_col, payload_col)
        return [ids, lens, values.astype(np.int64, copy=False)]

    def finalize_builder(shards):
        ids_all = np.concatenate([s[0] for s in shards]) if shards else np.empty(0, np.int64)
        lens_all = np.concatenate([s[1] for s in shards]) if shards else np.empty(0, np.int64)
        row_shard = np.concatenate(
            [np.full(len(s[0]), k, dtype=np.int64) for k, s in enumerate(shards)]
        ) if shards else np.empty(0, np.int64)
        row_off = np.concatenate(
            [np.concatenate([[0], np.cumsum(s[1][:-1])]) if len(s[1]) else np.empty(0, np.int64)
             for s in shards]
        ).astype(np.int64) if shards else np.empty(0, np.int64)
        order = np.argsort(ids_all, kind="stable")
        return [ids_all[order], order.astype(np.int64), row_shard, row_off, lens_all]

    (ids_sorted, perm, row_shard, row_off, row_len), shard_groups = _pack_sharded(
        ref, "seg", part_builder, finalize_builder
    )
    flats = [g[2] for g in shard_groups]
    return ids_sorted, perm, row_shard, row_off, row_len, flats


def load_feats_matrix(ref: dict):
    """Worker-side: (ids, float64 matrix, norms) pack of an
    (id, array<float>) parquet blob — packed once per executor,
    mmap'd by every worker. Rows stay in PARQUET ORDER (ids aligned
    with matrix rows — consumers only need alignment, and the
    id-order re-gather was the pack's dominant cost; see
    load_feats_segments). NULL embedding rows are dropped
    (NULL-cosine never pairs); raises on ragged rows."""

    def build():
        ids, values, lens, null_rows = _read_id_payload(ref)
        if null_rows is not None:
            keep = ~null_rows
            ids, lens = ids[keep], lens[keep]
            # values from flatten() already exclude null slots
        if len(ids) == 0:
            return (ids, np.zeros((0, 0)), np.zeros(0))
        dim = int(lens[0])
        if not (lens == dim).all():
            bad = int(np.argmax(lens != dim))
            raise ValueError(
                f"ragged embeddings: row id={ids[bad]} has dim {lens[bad]}, "
                f"expected {dim}"
            )
        mat = values.astype(np.float64, copy=False).reshape(-1, dim)
        return (ids, mat, np.linalg.norm(mat, axis=1))

    return _pack_once_per_executor(ref, "mat", build)


def load_feats_matrix_normalized(ref: dict):
    """Worker-side: (ids, row-normalized float64 matrix, nonzero-norm
    mask) — cached once per executor like ``load_feats_matrix``.
    Zero-norm rows stay all-zero (their cosine with anything is 0
    after normalization, which the threshold kernels exploit: any
    thr > 0 excludes them with no explicit mask pass). Normalizing
    ONCE here turns the per-chunk ``num/den`` arithmetic of the fused
    kernels into a single gemm — the |chunk| x |index| ``den``
    multiply and divide passes were 2 extra 64 MB temporaries per
    chunk, and >32 MB allocations always come from mmap (glibc clamps
    MMAP_THRESHOLD at 32 MB), so each was a fresh page-fault storm on
    this host (measured 16x on the gemm itself; see
    ``_chunked_threshold``)."""

    def build():
        ids, mat, nrm = load_feats_matrix(ref)
        nz = nrm > 0
        matn = np.divide(mat, nrm[:, None], out=np.zeros_like(mat),
                         where=nrm[:, None] > 0)
        return (ids, matn, nz)

    return _pack_once_per_executor(ref, "matn", build)


def load_feats_matrix_normalized_T(ref: dict):
    """float64 TRANSPOSED (dim x n, C-contiguous) normalized matrix,
    cached per executor — the exact-top-k gemm B operand (same 3.6x
    layout win as the f32 variant; top-k selection must stay float64
    because the ORDER near the k-th boundary is the result)."""

    def build():
        ids, matn, nz = load_feats_matrix_normalized(ref)
        return (ids, matn.T, nz)

    return _pack_once_per_executor(ref, "matnt", build)


# fused-scan block geometry: the f32 index matrix is packed as
# (n_blocks, dim, _BLK_W) column blocks so each sgemm B operand is a
# ~2 MB C-contiguous tile that stays cache-resident across the row
# chunks of a batch, and the score/mask buffers are (row_step x
# _BLK_W) reused tiles instead of (rows x n) full-width strips. The
# round-5 full-width kernel streamed the whole 50 MB B matrix + wrote
# 3 full-width bool/score passes per 41-row chunk — measured 13-15 s
# per worker under 32-way concurrency at 100k x 100k; the tiled form
# measures ~3.5-5 s for the same partition (tools/ microbench, round
# 6), identical output.
_BLK_W = 4096
_SCAN_ROW_STEP = 512


def _build_blocks(matn: np.ndarray) -> np.ndarray:
    """(n_blocks, dim, _BLK_W) float32 zero-padded column blocks of a
    row-major (n, dim) float64 normalized matrix — the fused scan's
    gemm B operand tiles. Values match the previous
    ``matn.T.astype(float32)`` operand exactly; padding columns are
    all-zero (they can only pass a thr <= 0 scan and are dropped by
    the kernel's explicit width mask)."""
    n, dim = matn.shape
    nb = max(1, (n + _BLK_W - 1) // _BLK_W)
    blk = np.zeros((nb, dim, _BLK_W), dtype=np.float32)
    mT = matn.T.astype(np.float32)
    for b in range(nb):
        w = min(_BLK_W, n - b * _BLK_W)
        if w > 0:
            blk[b, :, :w] = mT[:, b * _BLK_W : b * _BLK_W + w]
    return blk


class _ShardRows:
    """Lazy row provider for the fused kernels' f64 rescore: fancy
    indexing (``rows[c]`` with an int array) reconstructs normalized
    float64 rows on demand from the mmap'd f32 shard packs instead of
    a materialized (n, dim) f64 matrix. Reconstruction is the exact
    arithmetic the round-5 finalize ran over the full matrix —
    f32 -> f64 upcast (lossless), divide by the precomputed f64 row
    norm, zero-norm rows stay all-zero — applied to just the gathered
    rows, so values are bit-identical while the pack neither computes
    nor writes the 2x-blob-size f64 matrix (at 100k x 128 that was a
    100 MB compute + 100 MB disk write per call; at the 2M-row fused
    cap it would be 2 GB)."""

    def __init__(self, flats, starts, nrm):
        self._flats = flats      # list of (n_k, dim) f32 mmaps, non-empty
        self._starts = starts    # int64 start row of each shard
        self._nrm = nrm          # (n,) f64 row norms, global order

    def __getitem__(self, idx):
        idx = np.asarray(idx, dtype=np.int64)
        dim = self._flats[0].shape[1] if self._flats else 0
        out = np.empty((len(idx), dim), dtype=np.float64)
        if len(idx):
            sh = np.searchsorted(self._starts, idx, side="right") - 1
            for k in np.unique(sh):
                m = sh == k
                out[m] = self._flats[k][idx[m] - self._starts[k]]
        # divide IN PLACE (one buffer, not a second zeros allocation —
        # gathers run inside the rescore hot loop): rows with nr <= 0
        # are all-zero raw vectors, zeroed explicitly to mirror the
        # whole-matrix np.divide(..., where=) semantics bit-for-bit
        nr = self._nrm[idx][:, None]
        pos = nr > 0
        np.divide(out, nr, out=out, where=pos)
        if not pos.all():
            out[~pos.ravel()] = 0.0
        return out


def load_feats_matrix_blocked(ref: dict):
    """(ids, normalized-f64 row provider, nonzero mask, f32 block
    tiles) of an (id, array<float>) parquet blob — the fused-scan
    pack.

    Sharded-PARALLEL decode (``_pack_sharded``): every python worker
    claims parquet parts and decodes them concurrently (the round-5
    whole-blob ``_pack_once_per_executor`` serialized the ~3 s decode
    on one worker while 31 polled); one worker then finalizes the
    small global arrays (ids, row norms, nz, f32 block tiles) —
    streaming each shard through the normalize + tile fill, so the
    full (n, dim) float64 matrix is never materialized or written
    (it was the dominant finalize compute + disk cost; the rescore
    only ever gathers a few rows per chunk, now served by
    ``_ShardRows`` from the shard mmaps with identical values). Rows
    stay in parquet part order (ids aligned with matrix rows); NULL
    embedding rows are dropped (NULL-cosine never pairs); raises on
    ragged rows. Row values are bit-identical to
    ``load_feats_matrix_normalized`` (same astype/norm/divide
    arithmetic, row-wise so the part split cannot change it)."""

    id_col, payload_col = ref["id_col"], ref["payload_col"]

    def part_builder(path):
        ids, values, lens, null_rows = _read_id_payload_files(
            [path], id_col, payload_col
        )
        if null_rows is not None:
            keep = ~null_rows
            ids, lens = ids[keep], lens[keep]
        if len(ids) == 0:
            return [ids, np.zeros((0, 0), dtype=np.float32)]
        dim = int(lens[0])
        if not (lens == dim).all():
            bad = int(np.argmax(lens != dim))
            raise ValueError(
                f"ragged embeddings: row id={ids[bad]} has dim {lens[bad]}, "
                f"expected {dim}"
            )
        vals = values.astype(np.float32, copy=False).reshape(-1, dim)
        return [ids, vals]

    def finalize_builder(shards):
        shards = [s for s in shards if len(s[0])]
        if not shards:
            return [
                np.empty(0, np.int64),
                np.zeros(0),
                np.zeros(0, dtype=bool),
                np.zeros((0, 0, 0), dtype=np.float32),
            ]
        dims = {s[1].shape[1] for s in shards}
        if len(dims) != 1:
            raise ValueError(f"ragged embeddings across parts: dims {sorted(dims)}")
        dim = dims.pop()
        ids = np.concatenate([s[0] for s in shards])
        n = len(ids)
        nb = max(1, (n + _BLK_W - 1) // _BLK_W)
        blocks = np.zeros((nb, dim, _BLK_W), dtype=np.float32)
        nrm = np.empty(n, dtype=np.float64)
        r0 = 0
        for s in shards:
            a = s[1].astype(np.float64)
            nr = np.linalg.norm(a, axis=1)
            an = np.divide(a, nr[:, None], out=np.zeros_like(a),
                           where=nr[:, None] > 0)
            nrm[r0 : r0 + len(nr)] = nr
            # fill this shard's global column range of the tiles —
            # values identical to _build_blocks over the full matrix
            anT = an.T.astype(np.float32)
            c0 = r0
            while c0 < r0 + len(nr):
                b = c0 // _BLK_W
                w = min((b + 1) * _BLK_W, r0 + len(nr)) - c0
                blocks[b][:, c0 - b * _BLK_W : c0 - b * _BLK_W + w] = (
                    anT[:, c0 - r0 : c0 - r0 + w]
                )
                c0 += w
            r0 += len(nr)
        return [ids, nrm, nrm > 0, blocks]

    (ids, nrm, nz, blocks), shard_groups = _pack_sharded(
        ref, "blk", part_builder, finalize_builder
    )
    flats = [g[1] for g in shard_groups if len(g[0])]
    starts = np.concatenate(
        ([0], np.cumsum([f.shape[0] for f in flats])[:-1])
    ).astype(np.int64) if flats else np.zeros(1, dtype=np.int64)
    return ids, _ShardRows(flats, starts, np.asarray(nrm)), nz, blocks


def load_feats_rows(ref: dict):
    """(ids_sorted, perm, row provider, row norms) for ID-KEYED
    gathers of normalized f64 embedding rows — the IVF id-only plan's
    executor-side feature source (guide §8: the salt shuffle carries
    ids, the payload moves once via the blob).

    Unlike ``load_feats_matrix_blocked`` this pack keeps the shards
    in their SOURCE dtype (f32 stays f32, f64 stays f64) so gathered
    rows upcast to exactly the values the Arrow path shipped — scores
    are bit-identical whichever transport carried the embedding. A
    record with id ``x`` lives at row ``perm[searchsorted(ids_sorted,
    x)]``; ``rows[row_idx_array]`` returns normalized f64 rows and
    ``nrm[row]`` its norm (<= 0 marks zero-norm/NULL semantics). NULL
    embedding rows are dropped from the pack (absent ids)."""

    id_col, payload_col = ref["id_col"], ref["payload_col"]

    def part_builder(path):
        ids, values, lens, null_rows = _read_id_payload_files(
            [path], id_col, payload_col
        )
        if null_rows is not None:
            keep = ~null_rows
            ids, lens = ids[keep], lens[keep]
        if len(ids) == 0:
            return [ids, np.zeros((0, 0), dtype=np.float32)]
        dim = int(lens[0])
        if not (lens == dim).all():
            bad = int(np.argmax(lens != dim))
            raise ValueError(
                f"ragged embeddings: row id={ids[bad]} has dim {lens[bad]}, "
                f"expected {dim}"
            )
        return [ids, values.reshape(-1, dim)]

    def finalize_builder(shards):
        shards = [s for s in shards if len(s[0])]
        if not shards:
            return [np.empty(0, np.int64), np.empty(0, np.int64), np.zeros(0)]
        dims = {s[1].shape[1] for s in shards}
        if len(dims) != 1:
            raise ValueError(f"ragged embeddings across parts: dims {sorted(dims)}")
        ids = np.concatenate([s[0] for s in shards])
        nrm = np.concatenate(
            [np.linalg.norm(s[1].astype(np.float64), axis=1) for s in shards]
        )
        order = np.argsort(ids, kind="stable")
        return [ids[order], order.astype(np.int64), nrm]

    (ids_sorted, perm, nrm), shard_groups = _pack_sharded(
        ref, "rows", part_builder, finalize_builder
    )
    flats = [g[1] for g in shard_groups if len(g[0])]
    starts = np.concatenate(
        ([0], np.cumsum([f.shape[0] for f in flats])[:-1])
    ).astype(np.int64) if flats else np.zeros(1, dtype=np.int64)
    nrm = np.asarray(nrm)
    return np.asarray(ids_sorted), np.asarray(perm), _ShardRows(flats, starts, nrm), nrm


def _feat_bytes(feats: DataFrame, payload_col: str) -> tuple[int, int]:
    """(row_count, estimated payload bytes) of an (id, array) table —
    one aggregate job; 8 bytes per element + 16/row overhead."""
    row = feats.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.coalesce(F.size(payload_col), F.lit(0))), F.lit(0)).alias(
            "vals"
        ),
    ).first()
    n = int(row["n"])
    return n, int(row["vals"]) * 8 + n * 16


def _lookup_positions(ids_sorted: np.ndarray, wanted: np.ndarray, side: str):
    """searchsorted + MEMBERSHIP CHECK: raises instead of silently
    scoring a neighboring record's features when a pair id is absent
    from the feature table (ADVICE r1)."""
    pos = np.searchsorted(ids_sorted, wanted)
    np.clip(pos, 0, max(len(ids_sorted) - 1, 0), out=pos)
    if len(ids_sorted) == 0 or not (ids_sorted[pos] == wanted).all():
        missing = (
            wanted[ids_sorted[pos] != wanted][:5]
            if len(ids_sorted)
            else wanted[:5]
        )
        raise KeyError(
            f"pair column '{side}' contains ids absent from the feature "
            f"table (sample: {missing.tolist()}); every pair id must "
            "exist in feats for the broadcast strategy"
        )
    return pos


# padded-matrix budget for _pair_intersections: 8M int64 cells =
# 64 MB scratch per python worker (32 workers -> 2 GB total, bounded
# regardless of how skewed the pair widths are)
_PAIR_CELLS_BUDGET = 1 << 23


def _gather_rows(seg, rows: np.ndarray, l: np.ndarray) -> np.ndarray:
    """Concatenated payload values of ``rows`` (in row order) from the
    sharded pack; ``l`` = lens of those rows. One fancy-indexed load
    per REFERENCED shard (parquet parts are range-ish, scoring
    batches touch few)."""
    flats, row_shard, row_off, _ = seg
    total = int(l.sum())
    out = np.empty(total, dtype=np.int64)
    if total == 0:
        return out
    dest0 = np.zeros(len(rows), dtype=np.int64)
    np.cumsum(l[:-1], out=dest0[1:])
    sh = row_shard[rows]
    for s in np.unique(sh):
        sel = sh == s
        rsel, lsel = rows[sel], l[sel]
        src = np.repeat(row_off[rsel], lsel) + _ramp(lsel)
        dst = np.repeat(dest0[sel], lsel) + _ramp(lsel)
        out[dst] = flats[s][src]
    return out


def _pair_intersections_block(
    seg,
    pos_a: np.ndarray,
    pos_b: np.ndarray,
    la: np.ndarray,
    lb: np.ndarray,
) -> np.ndarray:
    """|A ∩ B| for one block of pairs via row-wise padded sort."""
    n = len(pos_a)
    tot = la + lb
    wmax = int(tot.max()) if n else 0
    if wmax == 0:
        return np.zeros(n, dtype=np.int64)
    m = np.full((n, wmax), np.iinfo(np.int64).max, dtype=np.int64)
    # for each pair: a's values then b's values into one padded row
    rows_a = np.repeat(np.arange(n), la)
    cols_a = _ramp(la)
    m[rows_a, cols_a] = _gather_rows(seg, pos_a, la)
    rows_b = np.repeat(np.arange(n), lb)
    cols_b = _ramp(lb) + np.repeat(la, lb)
    m[rows_b, cols_b] = _gather_rows(seg, pos_b, lb)
    m.sort(axis=1)
    eq = m[:, 1:] == m[:, :-1]
    valid = np.arange(1, wmax)[None, :] < tot[:, None]
    return (eq & valid).sum(axis=1)


def _pair_intersections(
    seg, pos_a: np.ndarray, pos_b: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """|A ∩ B| per pair; ``seg`` = (flats, row_shard, row_off, lens)
    from the sharded pack, positions are original global rows.

    Row-wise padded sort: each pair's concatenated values fill one
    row of an (n x wmax) INT64_MAX-padded matrix; ``sort(axis=1)`` is
    one C call, and with duplicate-free sides the intersection is the
    count of adjacent-equal positions inside the row's real length
    (pads excluded by position, so a value colliding with the pad
    stays correct). Pairs are processed in width-sorted blocks under
    ``_PAIR_CELLS_BUDGET`` cells so ONE outlier-wide pair can no
    longer inflate the whole batch's padded matrix (ADVICE r1).
    Returns (inter, len_a, len_b).
    """
    lens = seg[3]
    n = len(pos_a)
    la = np.asarray(lens[pos_a])
    lb = np.asarray(lens[pos_b])
    tot = la + lb
    inter = np.zeros(n, dtype=np.int64)
    if n == 0 or int(tot.max()) == 0:
        return inter, la, lb
    if n * int(tot.max()) <= _PAIR_CELLS_BUDGET:
        inter = _pair_intersections_block(seg, pos_a, pos_b, la, lb)
        return inter, la, lb
    order = np.argsort(tot, kind="stable")
    start = 0
    while start < n:
        width = int(tot[order[start]])
        rows = max(1, _PAIR_CELLS_BUDGET // max(width, 1))
        # widths ascend, so the block max is its LAST row's width;
        # re-derive rows against that to honor the budget
        end = min(start + rows, n)
        width_end = int(tot[order[end - 1]])
        if width_end > width:
            rows = max(1, _PAIR_CELLS_BUDGET // width_end)
            end = min(start + rows, n)
        blk = order[start:end]
        inter[blk] = _pair_intersections_block(
            seg, pos_a[blk], pos_b[blk], la[blk], lb[blk]
        )
        start = end
    return inter, la, lb


def _ramp(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]-1, 0..lens[1]-1, ...] — per-segment position index."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    offs = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(offs, lens)


def _verify_set_broadcast(
    pairs: DataFrame,
    feats: DataFrame,
    feat_col: str,
    id_col: str,
    threshold: float | None,
    left: str,
    right: str,
    metric: str = "jaccard",
) -> DataFrame:
    """Broadcast-blob set scoring shared by Jaccard AND containment
    (VERDICT r3 #4): same sharded pack, id lookup and padded-sort
    intersection kernel; only the final ratio — and the exact-safe
    size prune, which is sound for Jaccard only (containment of the
    smaller side can be 1.0 at any size skew) — differ per metric."""
    # blob only the features PAIRS ACTUALLY REFERENCE: candidate ids
    # are typically a small fraction of the corpus (bucketed LSH
    # pairs concentrate on collision-prone rows), and pack time is
    # the verify stage's serial component — a semi-join prune on the
    # id projection shrinks it proportionally
    pair_ids = (
        pairs.select(F.col(left).alias("_pid"))
        .union(pairs.select(F.col(right).alias("_pid")))
        .distinct()
    )
    # no broadcast hint: AQE broadcasts the id set when it is small
    # and falls back to an ids-only shuffle when it is not
    needed = feats.join(pair_ids, feats[id_col] == F.col("_pid"), "left_semi")
    ref = materialize_feats(needed, id_col, feat_col, "verify")
    thr = threshold
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown set metric {metric!r}")
    is_jaccard = metric == "jaccard"

    def score(batches):
        ids, perm, row_shard, row_off, row_len, flats = load_feats_segments(ref)
        seg = (flats, row_shard, row_off, row_len)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = pdf[left].to_numpy(dtype=np.int64)
            b = pdf[right].to_numpy(dtype=np.int64)
            pos_a = perm[_lookup_positions(ids, a, left)]
            pos_b = perm[_lookup_positions(ids, b, right)]
            if thr is not None and is_jaccard:
                # exact-safe size prune: J >= t  =>  min >= t * max
                # (|A∩B| <= min, |A∪B| >= max); kills e.g. the
                # boilerplate-vs-full-file band collisions before any
                # gather work. NOT valid for containment: the smaller
                # side can be fully contained at any size skew.
                la0 = np.asarray(row_len[pos_a])
                lb0 = np.asarray(row_len[pos_b])
                keep = np.minimum(la0, lb0) >= thr * np.maximum(la0, lb0)
                if not keep.all():
                    a, b = a[keep], b[keep]
                    pos_a, pos_b = pos_a[keep], pos_b[keep]
                if len(a) == 0:
                    continue
            inter, la, lb = _pair_intersections(seg, pos_a, pos_b)
            if is_jaccard:
                denom = la + lb - inter
            else:
                denom = np.minimum(la, lb)
            s = np.divide(
                inter.astype(np.float64), denom, out=np.zeros(len(a)), where=denom > 0
            )
            out = pd.DataFrame({left: a, right: b, "score": s})
            if thr is not None:
                out = out[out["score"] >= thr]
            if len(out):
                yield out

    return pairs.select(left, right).mapInPandas(
        score, f"{left} long, {right} long, score double"
    )


def verify_jaccard(
    pairs: DataFrame,
    feats: DataFrame,
    feat_col: str = "shingles",
    id_col: str = "record_id",
    threshold: float | None = None,
    left: str = "a",
    right: str = "b",
    strategy: str = "auto",
) -> DataFrame:
    """Score pairs with exact Jaccard similarity of shingle sets.

    ``auto`` takes the broadcast-blob path when the feature table is
    small enough to ship to every executor; the join path otherwise.
    Fit decisions are BYTE-based (rows x measured array sizes), not
    row-count based — shingle arrays are unbounded so a row cap
    alone can admit a multi-GB payload (ADVICE r1). The broadcast
    path requires every pair id to exist in ``feats`` (validated
    worker-side) and returns only (left, right, score) columns. The
    join path broadcast-hints the feature side when it fits (skips
    shuffling the shingle arrays; the pair stream stays partitioned
    in place).
    """
    n_rows, est_bytes = _feat_bytes(feats, feat_col)
    feats_fit = n_rows <= VERIFY_BROADCAST_CAP and est_bytes <= VERIFY_BROADCAST_MAX_BYTES
    if strategy == "auto":
        extra = set(pairs.columns) - {left, right}
        strategy = (
            "broadcast"
            if not extra
            and feats_fit
            and est_bytes >= VERIFY_BLOB_MIN_BYTES
            and blob_transport_available(feats.sparkSession)
            else "join"
        )
    if strategy == "broadcast":
        return _verify_set_broadcast(
            pairs, feats, feat_col, id_col, threshold, left, right, "jaccard"
        )
    fa = feats.select(F.col(id_col).alias(left), F.col(feat_col).alias("_fa"))
    fb = feats.select(F.col(id_col).alias(right), F.col(feat_col).alias("_fb"))
    if est_bytes <= JOIN_BROADCAST_MAX_BYTES:
        fa, fb = F.broadcast(fa), F.broadcast(fb)
    j = pairs.join(fa, left).join(fb, right)
    scored = j.withColumn("score", jaccard_similarity("_fa", "_fb")).drop("_fa", "_fb")
    if threshold is not None:
        scored = scored.where(F.col("score") >= threshold)
    return scored


def verify_containment(
    pairs: DataFrame,
    feats: DataFrame,
    feat_col: str = "shingles",
    id_col: str = "record_id",
    threshold: float | None = None,
    left: str = "a",
    right: str = "b",
    strategy: str = "auto",
) -> DataFrame:
    """Score pairs with the containment ratio |A∩B| / min(|A|,|B|).

    Same strategy surface as ``verify_jaccard`` (VERDICT r3 #4: the
    containment stage used to join full shingle arrays onto its
    candidates; the auto broadcast-blob path ships ids only through
    the pair stream and reads the shingle payload from the mmap'd
    executor blob). Returns (left, right, score).
    """
    n_rows, est_bytes = _feat_bytes(feats, feat_col)
    feats_fit = n_rows <= VERIFY_BROADCAST_CAP and est_bytes <= VERIFY_BROADCAST_MAX_BYTES
    if strategy == "auto":
        extra = set(pairs.columns) - {left, right}
        strategy = (
            "broadcast"
            if not extra
            and feats_fit
            and est_bytes >= VERIFY_BLOB_MIN_BYTES
            and blob_transport_available(feats.sparkSession)
            else "join"
        )
    if strategy == "broadcast":
        return _verify_set_broadcast(
            pairs, feats, feat_col, id_col, threshold, left, right, "containment"
        )
    fa = feats.select(F.col(id_col).alias(left), F.col(feat_col).alias("_fa"))
    fb = feats.select(F.col(id_col).alias(right), F.col(feat_col).alias("_fb"))
    if est_bytes <= JOIN_BROADCAST_MAX_BYTES:
        fa, fb = F.broadcast(fa), F.broadcast(fb)
    j = pairs.join(fa, left).join(fb, right)
    scored = j.withColumn("score", containment_score("_fa", "_fb")).drop("_fa", "_fb")
    if threshold is not None:
        scored = scored.where(F.col("score") >= threshold)
    return scored.select(left, right, "score")


_F32_MARGIN = 1e-5


# max survivors rescored per float64 einsum slice: bounds the two
# (hits x dim) fancy-index copies at ~67 MB each at 128 dims
_RESCORE_HITS = 1 << 16


def _chunked_threshold(q_ids, qm, qz, ids_i, matn, blocks, nz_i, thr, max_k,
                       self_mode, row_step=_SCAN_ROW_STEP):
    """Tiled threshold gemm for the fused kernels, over
    PRE-NORMALIZED rows on both sides (``load_feats_matrix_blocked``;
    callers normalize the query batch in place). ``blocks`` is the
    (n_blocks, dim, _BLK_W) f32 tile pack (``_build_blocks``).

    Round-5 history (kept because the same pathologies shape this
    form): the one-shot kernel materialized the FULL |batch| x
    |index| f64 similarity matrix per worker (page-fault/TLB storm,
    bench_r5_try2); the row-chunked full-width kernel fixed that but
    still streamed the whole 50 MB B operand per 41-row chunk and
    wrote 3 full-width bool/score passes per chunk — measured 13-15 s
    per worker at 100k x 100k under 32-way concurrency, nearly all
    memory-bus time. Round 6 re-tiled it: per row chunk (~512 rows),
    each ~2 MB B tile is one sgemm into a reused (row_step x _BLK_W)
    score tile that stays cache-resident through its threshold mask
    and nonzero — the full-width score matrix never exists, B traffic
    drops ~12x, and the same partition measures 3.5-5 s (identical
    output; tools/ microbench, round 6).

    Self-mode column skip: when ``ids_i`` is strictly ascending
    (parquet part order from the range-partitioned feature write —
    verified per batch, not assumed), every column with id <= the
    chunk's min query id is provably masked by ``q_id < id_i``, so
    whole tiles below that bound are skipped — on average half the
    scan. The residual per-pair ``q_id < id_i`` filter runs on the
    HITS only (a few per thousand cells), replacing the round-5
    full-width comparison matrix.

    Zero-norm rows are all-zero after normalization, so they score
    exactly 0.0 and any thr > 0 excludes them for free; thr <= 0
    masks them explicitly (NULL-cosine semantics). Yields
    (global_row_idx, col_idx, scores) per chunk; per-row max_k
    capping is chunk-local because the cap is per ROW and every chunk
    holds whole rows.

    The scan itself runs in float32 (half the bandwidth, 2x sgemm)
    against ``thr - _F32_MARGIN``; every surviving pair is re-scored
    in float64, so the EMITTED edge set and scores are exactly the
    float64 ones. The margin (1e-5) dominates the float32 dot's worst
    error (~sqrt(dim) * 2^-24 ~ 1e-6 for unit rows), so no true pair
    is lost. Before the f64 rescore, oversized rows (> max_k f32
    hits) are pre-filtered to the candidates that can still reach the
    f64 top-max_k: any hit whose f32 score is more than 2*margin
    below the row's max_k-th largest f32 score is beaten by >= max_k
    candidates in f64 with strict inequality (|s32 - s64| < margin on
    both sides), so it can neither make the cap nor tie at its
    boundary — dropping it is exact. This cuts the mega-clique
    rescore from O(clique^2) gathers to O(clique * max_k).
    """
    n_idx = len(ids_i)
    if n_idx == 0 or len(q_ids) == 0:
        return
    n_blocks = blocks.shape[0]
    qm32 = qm.astype(np.float32)
    ids_sorted = self_mode and (n_idx == 1 or bool((np.diff(ids_i) > 0).all()))
    thr32 = np.float32(thr - _F32_MARGIN)
    band32 = np.float32(2 * _F32_MARGIN)
    # reused score/mask tiles (fresh big outputs pay the first-touch
    # fault storm — see round-5 notes above)
    obuf = np.empty(row_step * _BLK_W, dtype=np.float32)
    mbuf = np.empty(row_step * _BLK_W, dtype=bool)
    for lo in range(0, len(q_ids), row_step):
        hi = min(lo + row_step, len(q_ids))
        rows = hi - lo
        b0 = 0
        if ids_sorted:
            j0 = int(np.searchsorted(ids_i, int(q_ids[lo:hi].min()), side="right"))
            b0 = j0 // _BLK_W
        q32c = qm32[lo:hi]
        hr: list = []
        hc: list = []
        hs: list = []
        for b in range(b0, n_blocks):
            w = min(_BLK_W, n_idx - b * _BLK_W)
            out = obuf[: rows * _BLK_W].reshape(rows, _BLK_W)
            np.dot(q32c, blocks[b], out=out)
            mask = mbuf[: rows * _BLK_W].reshape(rows, _BLK_W)
            np.greater_equal(out, thr32, out=mask)
            if w < _BLK_W:
                mask[:, w:] = False  # zero-padded tail columns
            if thr <= 0:
                # normalized zero-norm rows score 0.0, which a
                # non-positive threshold would wrongly admit
                mask[:, :w] &= nz_i[b * _BLK_W : b * _BLK_W + w][None, :]
                mask[qz[lo:hi]] = False
            rl, cl = np.nonzero(mask)
            if len(rl) == 0:
                continue
            cg = cl + b * _BLK_W
            if self_mode:
                keep = q_ids[lo + rl] < ids_i[cg]
                if not keep.all():
                    rl, cl, cg = rl[keep], cl[keep], cg[keep]
                    if len(rl) == 0:
                        continue
            hr.append(rl)
            hc.append(cg)
            hs.append(out[rl, cl])
        if not hr:
            continue
        r = np.concatenate(hr)
        c = np.concatenate(hc)
        s32 = np.concatenate(hs)
        if len(hr) > 1:
            # restore global row-major hit order across tiles (the
            # cap slices rows out of a grouped-ascending r)
            order = np.lexsort((c, r))
            r, c, s32 = r[order], c[order], s32[order]
        if max_k is not None:
            counts = np.bincount(r, minlength=rows)
            if (counts > max_k).any():
                keep = np.ones(len(r), dtype=bool)
                starts = np.concatenate(([0], np.cumsum(counts)))
                for ri in np.flatnonzero(counts > max_k):
                    sl = slice(starts[ri], starts[ri + 1])
                    srow = s32[sl]
                    kth = np.partition(srow, len(srow) - max_k)[len(srow) - max_k]
                    keep[sl] = srow >= kth - band32
                if not keep.all():
                    r, c = r[keep], c[keep]
        # exact float64 rescore of the scan's survivors only — in
        # bounded slices: a mega-clique chunk (planted boilerplate,
        # every pair >= thr) surfaces many survivors at once, and a
        # one-shot fancy-index rescore materializes TWO (hits x dim)
        # float64 copies: ~8 GB/worker at 4M hits x 128 dims, which is
        # what globally OOM'd the 1M IVF flagship (14 workers at
        # 7.6 GB RSS each, flagship_r5_1m_ivf2.log). Slicing keeps the
        # peak at ~2 x slice x dim x 8 bytes (~134 MB) with identical
        # survivors, scores, and cap order.
        if len(r) <= _RESCORE_HITS:
            s = np.einsum("ij,ij->i", qm[lo + r], matn[c])
            keep = s >= thr
            r, c, s = r[keep], c[keep], s[keep]
        else:
            parts = []
            for slo in range(0, len(r), _RESCORE_HITS):
                rs = r[slo:slo + _RESCORE_HITS]
                cs = c[slo:slo + _RESCORE_HITS]
                ss = np.einsum("ij,ij->i", qm[lo + rs], matn[cs])
                keep = ss >= thr
                parts.append((rs[keep], cs[keep], ss[keep]))
            r = np.concatenate([p[0] for p in parts])
            c = np.concatenate([p[1] for p in parts])
            s = np.concatenate([p[2] for p in parts])
        if max_k is not None and len(r):
            r, c, s = _cap_rows_sparse(r, c, s, ids_i, max_k)
        if len(r):
            yield r + lo, c, s


def _cap_rows_sparse(r, c, s, ids_i, max_k):
    """Per-row top-``max_k`` neighbor cap (reference ``max_k=100``,
    semhash/index.py:59) on sparse (row, col, score) triplets
    (r non-decreasing — np.nonzero row-major order): oversized rows
    keep the ``max_k`` highest-score neighbors, ties broken by
    ascending neighbor id. Only oversized rows pay the python loop —
    these are exactly the mega-cluster members whose uncapped edge
    emission is quadratic (a 8k-member boilerplate cluster emits 32M
    edges uncapped; 0.8M capped). For a COMPLETE >=θ sub-cluster the
    capped a<b graph stays connected (every non-max member keeps >=1
    upward edge), so min-id connected components are unchanged; only
    dense-but-incomplete clusters wider than max_k can differ — the
    same truncation the reference's ANN cap applies (SURVEY §2.4 J2).
    """
    counts = np.bincount(r)
    if (counts <= max_k).all():
        return r, c, s
    keep = np.ones(len(r), dtype=bool)
    starts = np.concatenate(([0], np.cumsum(counts)))
    for ri in np.flatnonzero(counts > max_k):
        sl = slice(starts[ri], starts[ri + 1])
        order = np.lexsort((ids_i[c[sl]], -s[sl]))
        kmask = np.zeros(int(counts[ri]), dtype=bool)
        kmask[order[:max_k]] = True
        keep[sl] = kmask
    return r[keep], c[keep], s[keep]


# below this row count the IVF payload-blob plan's fixed cost (blob
# write job + executor pack) exceeds what the id-only shuffle saves;
# above it the shuffle carries ids instead of n_probe + n_salt copies
# of every embedding (guide §8)
_IVF_BLOB_MIN_ROWS = 100_000


def cosine_threshold_edges_ivf(
    feats: DataFrame,
    threshold: float,
    id_col: str = "record_id",
    emb_col: str = "embedding",
    n_cells: int | None = None,
    n_probe: int = 2,
    cell_cap: int = 20000,
    max_k: int | None = None,
    seed: int = 42,
    n_rows: int | None = None,
    group_cap: int = 50_000,
    payload_blob: bool | None = None,
) -> DataFrame:
    """All self pairs (a < b, score >= threshold) via coarse IVF
    cells + per-cell fused gemm — the at-scale cosine plan for MID
    thresholds, where SRP banding's per-band collision rate on
    sub-threshold pairs explodes (measured round 5: θ=0.75 on the
    code corpus, SRP at 2048 bits/128 bands emits 4.1% of ALL pairs
    as candidates — 2e10 pair materializations at 1M rows — while
    IVF bounds total scan work at ~n^2 * n_probe / n_cells gemm
    FLOPs with NO pair materialization at all).

    Plan shape (Spark-idiomatic, scales by adding executors):
      1. driver k-means over a bounded deterministic sample
         (``train_centroids`` — ordered-id sample, fixed seed)
      2. every row gets its ``n_probe`` nearest cells (vectorized
         pandas UDF, home cell first), posexplode → (row, cell)
      3. every cell's home pack is pre-capped to its ``cell_cap``
         lowest-id rows (window), the probe stream is salted so no
         applyInPandas group holds more than ~``group_cap`` probe
         rows, and the small capped pack replicates to each salt —
         correlated embeddings make mega-cells (measured round 5:
         unsalted groups OOM'd the box at 1M rows), and
         applyInPandas materializes a whole group per worker, so
         group size must be bounded BY CONSTRUCTION, not by hope
      4. groupBy(cell, salt).applyInPandas: each subgroup runs the
         SAME chunked f32-scan/f64-rescore kernel as the fused path,
         probe rows x the cell's capped home pack
      5. least/greatest normalize + distinct (a pair can surface in
         at most 2 cells; its score is bit-identical in both, so
         ``distinct`` dedups exactly — salting adds no new pair
         sources: each probe instance lands in exactly one salt and
         sees the identical pack every salt sees)

    Coverage: pair (x, y) is scanned iff home(y) ∈ probes(x) or
    home(x) ∈ probes(y) — standard IVF dedup coverage; recall vs the
    complete edge set is asserted in tests/test_recall.py. Skew: an
    oversized cell (common-boilerplate mega-cluster) scans only its
    ``cell_cap`` lowest-id home rows — every probe row still reaches
    the cell's min-id members, so >=θ cliques stay connected for
    min-id CC (the star-cap argument, lsh.py:127), and ``max_k``
    bounds per-row edge emission exactly like the fused path.

    ``payload_blob`` (round 6, guide §8): when blob transport is
    available and the input is large (auto at >=
    ``_IVF_BLOB_MIN_ROWS``), the salt shuffle ships ONLY
    (id, cell, salt, home) — the embedding payload moves exactly once
    into an executor-side blob (``materialize_feats``) and each group
    GATHERS its rows from the mmap'd shard pack
    (``load_feats_rows``). Round 5 shipped every embedding through
    the groupBy shuffle ``n_probe`` times for probes plus once per
    salt for the replicated home packs, then paid the Arrow list
    conversion per group — the dominant residual worker RSS at the 1M
    flagship. Gathered rows upcast to the exact values the Arrow path
    ships (dtype-preserving shards), so the emitted edges and scores
    are bit-identical either way (parity pinned in
    tests/test_review_r6.py).
    """
    from semhash_spark.operators.knn import ivf_probe_cells, train_centroids

    if n_rows is None:
        n_rows = feats.count()
    if payload_blob is None:
        payload_blob = (
            n_rows >= _IVF_BLOB_MIN_ROWS
            and blob_transport_available(feats.sparkSession)
        )
    ref = (
        materialize_feats(feats.select(id_col, emb_col), id_col, emb_col, "ivfrows")
        if payload_blob
        else None
    )
    if n_cells is None:
        # home size ~2k/cell keeps per-cell gemm ~0.5 GFLOP; the cap
        # keeps driver k-means training bounded (train_cap rows)
        n_cells = max(8, min(2048, int(n_rows) // 2048))
    cents = train_centroids(
        feats, n_cells, emb_col, train_cap=max(10_000, 4 * n_cells),
        seed=seed, id_col=id_col,
    )
    thr = float(threshold)
    cap = int(cell_cap)
    mk = max_k

    shuffle_cols = [id_col] if payload_blob else [id_col, emb_col]
    ex = (
        feats.select(id_col, emb_col)
        .withColumn("_cells", ivf_probe_cells(emb_col, cents, n_probe))
        .select(
            *shuffle_cols,
            F.posexplode("_cells").alias("_pos", "_cell"),
        )
    )

    # Bound every applyInPandas group by construction. Cell population
    # under correlated embeddings is skewed (boilerplate mega-cells):
    # an unbounded groupBy(cell) group is materialized WHOLE in one
    # python worker (plus the JVM's group buffer), which is exactly
    # what OOM'd the 1M-row round-5 run. Salting: probes split into
    # ceil(cell_rows / group_cap) subgroups; the cell's home pack —
    # already capped to its cell_cap lowest ids, so <= ~20 MB —
    # replicates to every salt. Costs one extra pass of the probe-cell
    # UDF for the per-cell counts (vectorized gemm, seconds at 1M; at
    # real scale persist `ex` instead).
    cnt = ex.groupBy("_cell").agg(F.count(F.lit(1)).alias("_cnt"))
    cnt = cnt.withColumn(
        "_salts",
        F.greatest(
            F.lit(1), F.ceil(F.col("_cnt") / F.lit(float(group_cap)))
        ).cast("int"),
    ).select("_cell", "_salts")
    ex = ex.join(F.broadcast(cnt), "_cell")

    home_w = Window.partitionBy("_cell").orderBy(id_col)
    pack = (
        ex.filter(F.col("_pos") == 0)
        .withColumn("_rn", F.row_number().over(home_w))
        .filter(F.col("_rn") <= cap)
        .withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.col("_salts") - 1))
        )
        .withColumn("_home", F.lit(True))
        .select(*shuffle_cols, "_cell", "_salt", "_home")
    )
    probes = (
        ex.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col(id_col)), F.col("_salts")).cast("int"),
        )
        .withColumn("_home", F.lit(False))
        .select(*shuffle_cols, "_cell", "_salt", "_home")
    )
    grouped = pack.unionByName(probes)

    _empty = {
        "a": np.array([], dtype=np.int64),
        "b": np.array([], dtype=np.int64),
        "score": np.array([], dtype=np.float64),
    }

    def _trim_arenas():
        # return the group's freed buffers to the OS between groups:
        # MALLOC_TRIM_THRESHOLD_ is pinned high (session.py) to stop
        # per-allocation mmap churn INSIDE the kernels, which makes
        # each worker retain its high-water (~0.5 GB after a mega-cell
        # group x 32 workers was most of the measured 21 GB worker
        # RSS at the 1M flagship). One malloc_trim per GROUP is
        # coarse enough to keep the anti-churn benefit.
        try:
            import ctypes

            ctypes.CDLL("libc.so.6").malloc_trim(0)
        except Exception:
            pass

    def scan(pdf):
        try:
            return _scan_inner(pdf)
        finally:
            _trim_arenas()

    def _scan_inner(pdf):
        if len(pdf) < 2:
            return pd.DataFrame(_empty)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        if ref is not None:
            # id-only group: gather normalized rows from the blob pack
            ids_sorted, perm, rowsrc, nrm_rows = load_feats_rows(ref)
            p = np.searchsorted(ids_sorted, ids)
            p = np.clip(p, 0, max(len(ids_sorted) - 1, 0))
            ok = (
                (ids_sorted[p] == ids)
                if len(ids_sorted)
                else np.zeros(len(ids), bool)
            )
            if not ok.all():  # NULL-embedding ids are absent from the pack
                pdf = pdf[ok]
                ids = ids[ok]
                p = p[ok]
                if len(pdf) < 2:
                    return pd.DataFrame(_empty)
            rows = perm[p]
            xm = rowsrc[rows]
            xzero = nrm_rows[rows] <= 0
        else:
            x = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
            )
            xn = np.linalg.norm(x, axis=1, keepdims=True)
            xm = np.divide(x, xn, out=x, where=xn > 0)  # zero rows stay 0
            xzero = xn.ravel() <= 0
        home = pdf["_home"].to_numpy(dtype=bool)
        h_idx = np.flatnonzero(home)
        # probe side = the non-pack rows only: every pack row's own
        # pos==0 probe instance arrives separately (_home=False), so
        # scanning the replicated pack copies as probes would just
        # redo identical pairs once per salt
        p_idx = np.flatnonzero(~home)
        if len(h_idx) == 0 or len(p_idx) == 0:
            return pd.DataFrame(_empty)
        if len(h_idx) > cap:
            order = np.argsort(ids[h_idx], kind="stable")
            h_idx = h_idx[order[:cap]]
        hm = xm[h_idx]
        h_ids = ids[h_idx]
        h_blk = _build_blocks(hm)
        nz_h = np.linalg.norm(hm, axis=1) > 0
        p_ids = ids[p_idx]
        pm = xm[p_idx]
        p_zero = xzero[p_idx]
        outs = []
        for r, c, s in _chunked_threshold(
            p_ids, pm, p_zero, h_ids, hm, h_blk, nz_h, thr, mk,
            self_mode=False,
        ):
            a = p_ids[r]
            b = h_ids[c]
            ne = a != b
            if ne.any():
                a, b, s = a[ne], b[ne], s[ne]
                lo = np.minimum(a, b)
                hi = np.maximum(a, b)
                outs.append(pd.DataFrame({"a": lo, "b": hi, "score": s}))
        if not outs:
            return pd.DataFrame(_empty)
        return pd.concat(outs, ignore_index=True)

    edges = grouped.groupBy("_cell", "_salt").applyInPandas(
        scan, "a long, b long, score double"
    )
    return edges.distinct()


# below this many rows the fused self-scan keeps the input's own
# partitioning; at or above it the query side is range-split into
# 4x-parallelism tasks so the scheduler can interleave the long
# low-id tasks (which scan nearly the full index width under the
# sorted-id tile skip) with the short high-id ones — without the
# split, the per-task wall eats back most of the skip's halving
# (measured: max worker 5.2 s vs median 3.4 s at 100k x 100k)
_SCAN_SPLIT_MIN_ROWS = 50_000


def cosine_threshold_edges(
    feats: DataFrame,
    threshold: float,
    id_col: str = "record_id",
    emb_col: str = "embedding",
    max_k: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """All pairs (a < b, score) with cosine >= threshold — fused
    candidate generation + verification via broadcast matmul.
    ``max_k`` caps each row's emitted neighbors (reference
    query_threshold cap; see ``_cap_rows_sparse``).

    The embedding table is materialized as parquet executor-side
    (``materialize_feats`` — a distributed write, NO driver
    collect/re-ship) and each python worker packs + caches the
    float64 matrix once; each partition of rows computes one
    |batch| x |index| float64 matmul and emits only the passing
    pairs — no |n|^2 pair materialization, no Arrow shipping of
    arrays per pair. The right plan whenever the matrix fits
    executor memory (64-dim floats: 2M rows ~ 1 GB); above that, use
    LSH candidates + verify_cosine. Zero-norm rows never pair
    (NULL-cosine semantics).
    """
    ref = materialize_feats(feats, id_col, emb_col, "cosedges")
    thr = float(threshold)

    def edges(batches):
        ids_i, matn, nz_i, blocks = load_feats_matrix_blocked(ref)
        for pdf_b in batches:
            if len(pdf_b) == 0:
                continue
            nn = pdf_b[emb_col].notna()
            if not nn.all():  # NULL embeddings never pair
                pdf_b = pdf_b[nn]
                if len(pdf_b) == 0:
                    continue
            a_ids = pdf_b[id_col].to_numpy(dtype=np.int64)
            q = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf_b[emb_col]])
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qm = np.divide(q, qn, out=q, where=qn > 0)  # zero rows stay 0
            for r_g, c, sc in _chunked_threshold(
                a_ids, qm, qn.ravel() <= 0, ids_i, matn, blocks, nz_i, thr,
                max_k, self_mode=True,
            ):
                yield pd.DataFrame(
                    {"a": a_ids[r_g], "b": ids_i[c], "score": sc}
                )

    q = feats.select(id_col, emb_col)
    if n_rows is not None and n_rows >= _SCAN_SPLIT_MIN_ROWS:
        spark = feats.sparkSession
        n_split = 4 * max(spark.sparkContext.defaultParallelism, 8)
        # range split preserves per-task id contiguity, so the tile
        # skip stays fully effective inside each finer task
        q = q.repartitionByRange(n_split, F.col(id_col))
    return q.mapInPandas(edges, "a long, b long, score double")


def cosine_cross_threshold_edges(
    query_feats: DataFrame,
    index_feats: DataFrame,
    threshold: float,
    id_col: str = "record_id",
    emb_col: str = "embedding",
    ref: dict | None = None,
    max_k: int | None = None,
) -> DataFrame:
    """All cross pairs (query_id, index_id, score >= threshold) —
    fused candidate generation + verification for the CROSS shape.
    ``max_k`` caps each query row's emitted matches (reference
    query_threshold cap; cross dedup is existential, so selected/
    filtered are unchanged — only the pairs detail truncates).

    The INDEX embeddings are materialized as an executor-side blob
    (distributed parquet write, mmap'd float64 matrix per worker) and
    the QUERY side streams through ``mapInPandas``: each Arrow batch
    computes one |batch| x |index| matmul and emits only the passing
    pairs. This is exactly the reference benchmark shape (a 4.3k-row
    test split scored against a 1.8M-row fitted index,
    benchmarks/README.md:43-61): the index pays one blob build per
    fit, every query batch pays only its own matmul — no shuffle of
    the index, no |Q| x |I| pair materialization, no cartesian in the
    plan. Right whenever the index matrix fits executor memory
    (VERIFY_BROADCAST_CAP rows / _MAX_BYTES); above that, hyperplane
    LSH candidates + verify_cosine (operators/dedup.py:deduplicate).
    Zero-norm / NULL rows on either side never pair (NULL-cosine
    semantics, matching ``cosine_similarity``).

    ``ref``: a prebuilt ``materialize_feats`` blob ref for the index
    side — the fitted api memoizes one per fit so REPEATED query
    batches (the reference's dedup-only benchmark split) skip the
    blob write entirely and pay only their own matmul.
    """
    if ref is None:
        ref = materialize_feats(index_feats, id_col, emb_col, "crossedges")
    thr = float(threshold)

    def edges(batches):
        ids_i, matn, nz_i, blocks = load_feats_matrix_blocked(ref)
        for pdf_b in batches:
            if len(pdf_b) == 0 or len(ids_i) == 0:
                continue
            nn = pdf_b[emb_col].notna()
            if not nn.all():
                pdf_b = pdf_b[nn]
                if len(pdf_b) == 0:
                    continue
            q_ids = pdf_b[id_col].to_numpy(dtype=np.int64)
            q = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf_b[emb_col]])
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qm = np.divide(q, qn, out=q, where=qn > 0)
            for r_g, c, sc in _chunked_threshold(
                q_ids, qm, qn.ravel() <= 0, ids_i, matn, blocks, nz_i, thr,
                max_k, self_mode=False,
            ):
                yield pd.DataFrame(
                    {"query_id": q_ids[r_g], "index_id": ids_i[c], "score": sc}
                )

    return query_feats.select(id_col, emb_col).mapInPandas(
        edges, "query_id long, index_id long, score double"
    )


def verify_cosine(
    pairs: DataFrame,
    feats: DataFrame,
    feat_col: str = "embedding",
    id_col: str = "record_id",
    threshold: float | None = None,
    left: str = "a",
    right: str = "b",
    strategy: str = "auto",
) -> DataFrame:
    """Score pairs with exact cosine similarity of embeddings.

    ``auto``: when blob transport is available and the feature table
    fits the executor byte cap, candidate ids ship 16 bytes/pair
    through Arrow and score against the mmap'd float64 matrix — one
    vectorized gather + einsum per batch. The join form rehydrates
    two 128-float arrays per pair and evaluates the cosine as
    INTERPRETED JVM higher-order lambdas, which is ~2 orders slower
    at millions of candidates (round-5: 4M hyperplane candidates at
    30k rows took 276 s join-form; the same shape scores in seconds
    via the blob — the identical strategy split verify_jaccard has
    had since round 2). ``join`` forces the fallback (no blob dir on
    a cluster master, or oversized feature tables).
    """
    spark = pairs.sparkSession
    if strategy != "join" and blob_transport_available(spark):
        _, nbytes = _feat_bytes(feats, feat_col)
        if strategy == "blob" or nbytes <= VERIFY_BROADCAST_MAX_BYTES:
            return _verify_cosine_blob(
                pairs, feats, feat_col, id_col, threshold, left, right
            )
    fa = feats.select(F.col(id_col).alias(left), F.col(feat_col).alias("_fa"))
    fb = feats.select(F.col(id_col).alias(right), F.col(feat_col).alias("_fb"))
    j = pairs.join(fa, left).join(fb, right)
    scored = j.withColumn("score", cosine_similarity("_fa", "_fb")).drop("_fa", "_fb")
    if threshold is not None:
        scored = scored.where(F.col("score") >= threshold)
    return scored


def _verify_cosine_blob(
    pairs: DataFrame,
    feats: DataFrame,
    feat_col: str,
    id_col: str,
    threshold: float | None,
    left: str,
    right: str,
) -> DataFrame:
    """Blob-transport exact-cosine scoring (see verify_cosine).

    Pairs whose ids are absent from ``feats`` drop (the join form's
    inner-join semantics); zero-norm sides never pass a threshold
    and score NaN without one (NULL-cosine semantics)."""
    ref = materialize_feats(feats, id_col, feat_col, "cosverify")
    thr = None if threshold is None else float(threshold)

    def score(batches):
        ids_i, mat, nrm = load_feats_matrix(ref)
        order = np.argsort(ids_i, kind="stable")
        sorted_ids = ids_i[order]

        def locate(x):
            p = np.searchsorted(sorted_ids, x)
            p = np.clip(p, 0, max(len(sorted_ids) - 1, 0))
            ok = (sorted_ids[p] == x) if len(sorted_ids) else np.zeros(len(x), bool)
            return order[p], ok

        for pdf in batches:
            if len(pdf) == 0 or len(ids_i) == 0:
                continue
            a = pdf[left].to_numpy(np.int64)
            b = pdf[right].to_numpy(np.int64)
            ia, oka = locate(a)
            ib, okb = locate(b)
            ok = oka & okb
            if not ok.all():
                a, b, ia, ib = a[ok], b[ok], ia[ok], ib[ok]
            if len(a) == 0:
                continue
            num = np.einsum("ij,ij->i", mat[ia], mat[ib])
            den = nrm[ia] * nrm[ib]
            if thr is None:
                with np.errstate(divide="ignore", invalid="ignore"):
                    s = np.where(den > 0, num / den, np.nan)
                yield pd.DataFrame({left: a, right: b, "score": s})
            else:
                m = (den > 0) & (num >= thr * den)
                if m.any():
                    yield pd.DataFrame(
                        {left: a[m], right: b[m], "score": num[m] / den[m]}
                    )

    return pairs.select(left, right).mapInPandas(
        score, f"{left} long, {right} long, score double"
    )
