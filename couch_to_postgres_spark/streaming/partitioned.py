"""Partitioned mirror with selective rewrite — the pure-parquet analog of
a table-format MERGE, and the layout that makes per-batch cost O(touched
data) instead of O(mirror). Since round 2 this is the DEFAULT sink of
``pipeline.follow`` and the Daemon (the flat MVCC sink remains for tiny
mirrors via ``sink="flat"``).

Layout: the mirror is parquet partitioned by ``bucket = crc32(id) % N``.
A change batch touches only the buckets its keys hash to, so the merge

1. computes the touched bucket set from the batch (tiny),
2. reads ONLY those partitions (``bucket IN (…)`` prunes at the
   directory level — the scan never lists untouched buckets),
3. merges with ``apply_changes`` (same broadcast-anti-join core),
4. atomically swaps ONLY the touched ``bucket=…`` directories.

Untouched partitions are not read, not rewritten, not even stat'd. With N
sized so a bucket ≈ one executor's comfortable working set, per-batch work
is |batch|/|mirror|-proportional — the property a 100 TB mirror requires.
(On Delta/Iceberg the same ``apply_changes`` output feeds MERGE and the
table format does the file-level surgery; this module is the no-extra-
dependency equivalent.)

``num_buckets`` is part of the LAYOUT, not a per-call knob: the bucket
function must be identical across every merge or lookups silently miss.
It is therefore persisted in ``_mirror_meta.json`` at layout time and
resolved from there on every subsequent merge/compaction; callers only
choose it (or let :func:`auto_num_buckets` size it) at initial load.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import threading
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from couch_to_postgres_spark.operators.cdc import apply_changes
from couch_to_postgres_spark.operators.mirror import MIRROR_SCHEMA

DEFAULT_BUCKETS = 64
META_FILE = "_mirror_meta.json"
#: auto-sizing target: rows per bucket (≈100 MB at ~1 KB/doc — a bucket
#: one executor rewrites comfortably; at 100 TB the same formula lands on
#: the 64k-bucket / ~1.5 GB-bucket regime via the upper clamp)
TARGET_ROWS_PER_BUCKET = 100_000

# In-process serialization of merge vs compaction per mirror path: the
# daemon's watchdog compacts on its own thread while foreachBatch merges
# on the stream thread, and both swap bucket directories. A real
# multi-driver deployment serializes maintenance through its table format
# or job scheduler; in one process a lock per path is sufficient.
_PATH_LOCKS: dict[str, threading.Lock] = {}
_PATH_LOCKS_GUARD = threading.Lock()


def _path_lock(path: str) -> threading.Lock:
    key = os.path.abspath(path)
    with _PATH_LOCKS_GUARD:
        return _PATH_LOCKS.setdefault(key, threading.Lock())


def bucket_of(id_col: Column, num_buckets: int = DEFAULT_BUCKETS) -> Column:
    return F.pmod(F.crc32(id_col.cast("binary")), F.lit(num_buckets)).cast("int")


def auto_num_buckets(n_rows: int) -> int:
    """Size the bucket count from the mirror's (initial-load) row count:
    next power of two of rows/TARGET, clamped to [16, 65536]. Powers of
    two keep future split/merge rebucketing cheap (bucket b of 2N is
    b or b+N of N)."""
    if n_rows <= 0:
        return 16
    raw = max(1, round(n_rows / TARGET_ROWS_PER_BUCKET))
    return int(min(65536, max(16, 2 ** math.ceil(math.log2(raw)))))


def write_meta(path: str, num_buckets: int) -> None:
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump({"num_buckets": num_buckets}, f)


def read_meta(path: str) -> int | None:
    """The layout's persisted bucket count, or None for a missing/legacy
    mirror (legacy = written before meta existed: infer from dirs)."""
    meta = os.path.join(path, META_FILE)
    if os.path.exists(meta):
        with open(meta) as f:
            return int(json.load(f)["num_buckets"])
    if os.path.exists(path):
        buckets = [d for d in os.listdir(path) if d.startswith("bucket=")]
        if buckets:
            # pre-meta legacy layout: infer N as max bucket dir + 1 (the
            # initial full load materializes essentially every bucket, so
            # the max dir is N-1; post-inference merges persist the meta
            # via write_partitioned_mirror on the next full rewrite)
            return max(int(d.split("=", 1)[1]) for d in buckets) + 1
    return None


def resolve_num_buckets(path: str, requested: int | None) -> int | None:
    """The ONE bucket count for a mirror: the persisted layout value wins;
    a conflicting explicit request is an error (a different bucket fn
    would corrupt the layout); None for a not-yet-existing mirror."""
    actual = read_meta(path)
    if actual is not None:
        if requested is not None and requested != actual:
            raise ValueError(
                f"mirror at {path} is laid out with num_buckets={actual}; "
                f"got {requested}. Rebucketing requires a full "
                f"write_partitioned_mirror rewrite."
            )
        return actual
    return requested


def write_partitioned_mirror(
    mirror: DataFrame, path: str, num_buckets: int = DEFAULT_BUCKETS
) -> None:
    """Initial load / full rewrite: lay the mirror out by key-hash bucket
    and persist the bucket count in the layout meta."""
    (
        mirror.withColumn("bucket", bucket_of(F.col("id"), num_buckets))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    write_meta(path, num_buckets)


def read_partitioned_mirror(spark: SparkSession, path: str) -> DataFrame:
    if os.path.exists(path):
        return spark.read.parquet(path).drop("bucket")
    return spark.createDataFrame([], MIRROR_SCHEMA)


def _update_count_views(
    spark: SparkSession,
    path: str,
    count_views: dict[str, Column],
    pre: DataFrame,
    post: DataFrame,
    touched_ids: DataFrame,
    full_pre: DataFrame,
) -> None:
    """Advance live count views by the batch's O(touched) delta.

    ``pre``/``post`` are the TOUCHED-BUCKET slices of the mirror (the
    delta join is a semi-join on touched ids, which only live in touched
    buckets — untouched rows net zero by construction, so pruned inputs
    give the identical delta at a fraction of the scan). ``full_pre`` is
    the WHOLE pre-merge mirror, used only to bootstrap a view that
    doesn't exist yet (it must be the pre state, not post: the delta is
    applied on top, so bootstrapping from post would double-count the
    batch). Crash window: a crash between the bucket swap and the view
    swap leaves the view one batch behind; replay nets zero and does NOT
    repair it — the repair is a view-dir delete + bootstrap, same
    contract as the flat sink (pipeline._update_count_view)."""
    from couch_to_postgres_spark.operators.views import (
        apply_count_delta,
        count_view_delta,
    )

    for name, key in count_views.items():
        vdir = os.path.join(path, "_views", name)
        if os.path.exists(vdir):
            view = spark.read.parquet(vdir)
        else:
            # bootstrap from the PRE state of the whole mirror (one full
            # GROUP BY, once per view lifetime — afterwards deltas only)
            view = full_pre.groupBy(key.alias("key")).agg(
                F.count(F.lit(1)).alias("cnt")
            )
        new = apply_count_delta(view, count_view_delta(pre, post, touched_ids, key))
        tmp = vdir + ".tmp"
        new.write.mode("overwrite").parquet(tmp)
        old = vdir + ".old"
        if os.path.exists(vdir):
            os.rename(vdir, old)
        os.rename(tmp, vdir)
        shutil.rmtree(old, ignore_errors=True)


def upsert_partitioned_mirror(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    num_buckets: int | None = None,
    type_filter: str | None = None,
    map_hook: Callable[[Column], Column] | None = None,
    count_views: dict[str, Column] | None = None,
) -> list[int]:
    """Merge a change batch, rewriting only the touched buckets.
    Returns the touched bucket ids.

    ``num_buckets`` applies only when the mirror doesn't exist yet
    (bootstrap); afterwards the persisted layout value is authoritative
    and a conflicting value raises. ``None`` at bootstrap auto-sizes from
    the batch row count (the initial backfill IS the mirror size)."""
    with _path_lock(path):
        return _upsert_locked(
            spark, path, batch, num_buckets, type_filter, map_hook, count_views
        )


def _upsert_locked(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    num_buckets: int | None,
    type_filter: str | None,
    map_hook: Callable[[Column], Column] | None,
    count_views: dict[str, Column] | None,
) -> list[int]:
    num_buckets = resolve_num_buckets(path, num_buckets)
    batch = batch.persist()
    try:
        if num_buckets is None:
            num_buckets = auto_num_buckets(batch.count())
        touched = sorted(
            r["bucket"]
            for r in batch.select(
                bucket_of(F.col("id"), num_buckets).alias("bucket")
            )
            .distinct()
            .collect()
        )
        if not touched:
            return []
        bootstrap = read_meta(path) is None
        if bootstrap:
            merged = apply_changes(
                spark.createDataFrame([], MIRROR_SCHEMA),
                batch,
                type_filter=type_filter,
                map_hook=map_hook,
            )
            write_partitioned_mirror(merged, path, num_buckets)
            if count_views:
                empty = spark.createDataFrame([], MIRROR_SCHEMA)
                _update_count_views(
                    spark,
                    path,
                    count_views,
                    pre=empty,
                    post=read_partitioned_mirror(spark, path),
                    touched_ids=batch.select("id").distinct(),
                    full_pre=empty,
                )
            return touched
        # partition-pruned read: only touched bucket directories are scanned
        current = (
            spark.read.parquet(path)
            .filter(F.col("bucket").isin(touched))
            .drop("bucket")
        )
        merged = apply_changes(
            current, batch, type_filter=type_filter, map_hook=map_hook
        ).withColumn("bucket", bucket_of(F.col("id"), num_buckets))
        staging = path + ".staging"
        shutil.rmtree(staging, ignore_errors=True)
        merged.repartition("bucket").write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(staging)
        if count_views:
            # delta BEFORE the swap: `current` plans over the pre-swap
            # bucket dirs, which the swap below destroys; full_pre is the
            # pre-swap whole mirror (only scanned if a view bootstraps)
            _update_count_views(
                spark,
                path,
                count_views,
                pre=current,
                post=spark.read.parquet(staging).drop("bucket"),
                touched_ids=batch.select("id").distinct(),
                full_pre=read_partitioned_mirror(spark, path),
            )
        # swap only the touched bucket directories
        for b in touched:
            src = os.path.join(staging, f"bucket={b}")
            dst = os.path.join(path, f"bucket={b}")
            old = dst + ".old"
            if os.path.exists(dst):
                os.rename(dst, old)
            if os.path.exists(src):
                os.rename(src, dst)
            else:  # bucket emptied by deletions
                os.makedirs(dst, exist_ok=True)
            shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)
        return touched
    finally:
        batch.unpersist()


def bucket_file_counts(path: str) -> dict[int, int]:
    """Parquet file count per bucket directory (the small-file metric)."""
    out: dict[int, int] = {}
    if not os.path.exists(path):
        return out
    for entry in os.listdir(path):
        if entry.startswith("bucket="):
            b = int(entry.split("=", 1)[1])
            d = os.path.join(path, entry)
            out[b] = sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
    return out


def compact_mirror(
    spark: SparkSession,
    path: str,
    max_files_per_bucket: int = 4,
    target_files: int = 1,
) -> list[int]:
    """Maintenance: rewrite buckets whose file count exceeds the
    threshold into ``target_files`` files each (atomic per-bucket swap).
    Run periodically/off-peak — micro-batch merges append small files to
    touched buckets, and scan cost degrades with file count long before
    it degrades with data size. The daemon's watchdog calls this every
    supervision pass (cheap when nothing exceeds the threshold — one
    listdir). Serialized against concurrent merges via the per-path
    lock. Returns the compacted bucket ids."""
    with _path_lock(path):
        todo = [
            b
            for b, n in bucket_file_counts(path).items()
            if n > max_files_per_bucket
        ]
        for b in sorted(todo):
            src = os.path.join(path, f"bucket={b}")
            tmp = src + ".compact"
            spark.read.parquet(src).coalesce(target_files).write.mode(
                "overwrite"
            ).parquet(tmp)
            old = src + ".old"
            os.rename(src, old)
            os.rename(tmp, src)
            shutil.rmtree(old, ignore_errors=True)
        return sorted(todo)


def follow_partitioned(
    spark: SparkSession,
    changes_path: str,
    mirror_path: str,
    checkpoint_path: str,
    num_buckets: int | None = None,
    type_filter: str | None = None,
    map_hook: Callable[[Column], Column] | None = None,
    max_files_per_trigger: int | None = None,
    trigger: dict | None = None,
    query_name: str | None = None,
):
    """Back-compat alias: ``pipeline.follow`` now defaults to this sink."""
    from couch_to_postgres_spark.streaming.pipeline import follow

    return follow(
        spark,
        changes_path,
        mirror_path,
        checkpoint_path,
        type_filter=type_filter,
        map_hook=map_hook,
        max_files_per_trigger=max_files_per_trigger,
        trigger=trigger,
        query_name=query_name,
        sink="partitioned",
        num_buckets=num_buckets,
    )
