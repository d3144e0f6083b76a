"""Partitioned mirror with selective rewrite — the pure-parquet analog of
a table-format MERGE, and the layout that makes per-batch cost O(touched
data) instead of O(mirror).

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
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from couch_to_postgres_spark.operators.cdc import apply_changes
from couch_to_postgres_spark.operators.mirror import MIRROR_SCHEMA

DEFAULT_BUCKETS = 64


def bucket_of(id_col: Column, num_buckets: int = DEFAULT_BUCKETS) -> Column:
    return F.pmod(F.crc32(id_col.cast("binary")), F.lit(num_buckets)).cast("int")


def write_partitioned_mirror(
    mirror: DataFrame, path: str, num_buckets: int = DEFAULT_BUCKETS
) -> None:
    """Initial load / full rewrite: lay the mirror out by key-hash bucket."""
    (
        mirror.withColumn("bucket", bucket_of(F.col("id"), num_buckets))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def read_partitioned_mirror(spark: SparkSession, path: str) -> DataFrame:
    if os.path.exists(path):
        return spark.read.parquet(path).drop("bucket")
    return spark.createDataFrame([], MIRROR_SCHEMA)


def upsert_partitioned_mirror(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    num_buckets: int = DEFAULT_BUCKETS,
    type_filter: str | None = None,
    map_hook: Callable[[Column], Column] | None = None,
) -> list[int]:
    """Merge a change batch, rewriting only the touched buckets.
    Returns the touched bucket ids."""
    batch = batch.persist()
    try:
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
        if not os.path.exists(path):
            merged = apply_changes(
                spark.createDataFrame([], MIRROR_SCHEMA),
                batch,
                type_filter=type_filter,
                map_hook=map_hook,
            )
            write_partitioned_mirror(merged, path, num_buckets)
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
    it degrades with data size. Returns the compacted bucket ids."""
    todo = [
        b for b, n in bucket_file_counts(path).items() if n > max_files_per_bucket
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
    num_buckets: int = DEFAULT_BUCKETS,
    type_filter: str | None = None,
    map_hook: Callable[[Column], Column] | None = None,
    max_files_per_trigger: int | None = None,
    trigger: dict | None = None,
    query_name: str | None = None,
):
    """`pipeline.follow` with the partitioned mirror sink."""
    from couch_to_postgres_spark.sources.changes import read_change_stream

    stream = read_change_stream(spark, changes_path, max_files_per_trigger)

    def _merge(batch: DataFrame, epoch_id: int) -> None:
        upsert_partitioned_mirror(
            batch.sparkSession,
            mirror_path,
            batch,
            num_buckets=num_buckets,
            type_filter=type_filter,
            map_hook=map_hook,
        )

    writer = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if query_name:
        writer = writer.queryName(query_name)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
