"""Streaming incremental dedup: batches are accepted against an append-only
corpus + signature index; exact/near duplicates of previously-accepted docs
are dropped; replays are no-ops (at-least-once safety)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from couch_to_postgres_spark.streaming.dedup_stream import (
    dedup_batch,
    dedup_stream,
    read_accepted,
)

def _doc(seed: str) -> str:
    # ~30 distinct words, all derived from the seed so two different seeds
    # share NO vocabulary (genuinely dissimilar documents)
    return " ".join(f"{seed}{i}" for i in range(30))


def _near(text: str) -> str:
    w = text.split(" ")
    w[len(w) // 2] = "MUTATED"
    return " ".join(w)


@pytest.fixture()
def paths(tmp_path):
    return str(tmp_path / "index"), str(tmp_path / "corpus")


def test_incremental_batches_and_replay(spark, paths):
    index, corpus = paths
    b1 = spark.createDataFrame(
        [(1, _doc("first")), (2, _doc("second"))], "doc_id long, text string"
    )
    s1 = dedup_batch(spark, index, corpus, b1, jaccard_threshold=0.6, num_bands=4)
    assert (s1.arrived, s1.accepted) == (2, 2)

    b2 = spark.createDataFrame(
        [
            (10, _doc("first")),          # exact dup of accepted doc 1
            (11, _near(_doc("second"))),  # near dup of accepted doc 2
            (12, _doc("fresh")),
        ],
        "doc_id long, text string",
    )
    s2 = dedup_batch(spark, index, corpus, b2, jaccard_threshold=0.6, num_bands=4)
    assert s2.arrived == 3
    assert s2.dropped_exact_vs_corpus == 1
    assert s2.dropped_near_vs_corpus == 1
    assert s2.accepted == 1
    got = {r["doc_id"] for r in read_accepted(spark, corpus).collect()}
    assert got == {1, 2, 12}

    # at-least-once replay: the whole batch is an exact dup of itself
    s3 = dedup_batch(spark, index, corpus, b2, jaccard_threshold=0.6, num_bands=4)
    assert s3.accepted == 0
    assert read_accepted(spark, corpus).count() == 3


def test_within_batch_dups_counted(spark, paths):
    index, corpus = paths
    b = spark.createDataFrame(
        [(1, _doc("a")), (2, _doc("a")), (3, _near(_doc("a")))],
        "doc_id long, text string",
    )
    s = dedup_batch(spark, index, corpus, b, jaccard_threshold=0.6, num_bands=4)
    assert s.dropped_within_batch == 2  # one exact + one near, min id kept
    assert s.accepted == 1
    assert {r["doc_id"] for r in read_accepted(spark, corpus).collect()} == {1}


def test_dedup_stream_end_to_end(spark, paths, tmp_path):
    index, corpus = paths
    feed = tmp_path / "feed"
    feed.mkdir()
    b1 = spark.createDataFrame([(1, _doc("one"))], "doc_id long, text string")
    b2 = spark.createDataFrame(
        [(2, _doc("one")), (3, _doc("three"))],
        "doc_id long, text string",
    )
    b1.coalesce(1).write.parquet(str(feed / "f1"))
    b2.coalesce(1).write.parquet(str(feed / "f2"))
    # the file source orders by modification time — make it deterministic
    now = time.time()
    for i, d in enumerate(("f1", "f2")):
        for f in (feed / d).iterdir():
            os.utime(f, (now + i, now + i))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed / "*"))
    )
    q = dedup_stream(
        spark,
        stream,
        index,
        corpus,
        str(tmp_path / "ckpt"),
        jaccard_threshold=0.6,
        num_bands=4,
    )
    q.awaitTermination(300)
    got = {r["doc_id"] for r in read_accepted(spark, corpus).collect()}
    assert got == {1, 3}  # 2 dropped as cross-batch exact dup of 1


def test_empty_batch_then_real_batch(spark, paths):
    """An empty micro-batch must not poison the append-only state for
    subsequent batches (empty parquet appends carry their schema)."""
    index, corpus = paths
    empty = spark.createDataFrame([], "doc_id long, text string")
    s0 = dedup_batch(spark, index, corpus, empty)
    assert (s0.arrived, s0.accepted) == (0, 0)
    b = spark.createDataFrame([(1, _doc("solo"))], "doc_id long, text string")
    s1 = dedup_batch(spark, index, corpus, b, jaccard_threshold=0.6, num_bands=4)
    assert s1.accepted == 1
    assert read_accepted(spark, corpus).count() == 1


def test_drop_duplicates_within_watermark_stream_equals_batch(spark, tmp_path):
    import datetime as dt

    from couch_to_postgres_spark.streaming.dedup_stream import (
        dedup_stream_within_watermark,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, "a"),
        (1, t0 + dt.timedelta(seconds=30), "a-retry"),   # dup within horizon
        (2, t0 + dt.timedelta(minutes=1), "b"),
        (2, t0 + dt.timedelta(minutes=2), "b-retry"),    # dup within horizon
        (3, t0 + dt.timedelta(minutes=3), "c"),
    ]
    schema = "doc_id long, ts timestamp, text string"
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    batch = dedup_stream_within_watermark(spark.read.parquet(src))
    got_batch = sorted(r["doc_id"] for r in batch.select("doc_id").collect())
    assert got_batch == [1, 2, 3]

    stream = dedup_stream_within_watermark(
        spark.readStream.schema(schema).parquet(src)
    )
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_stream = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert got_stream == got_batch
