"""Event-time operators: windowed counts (stream ≡ batch), gap
sessionization (stateful stream ≡ batch oracle)."""

import pytest
from pyspark.sql import functions as F

from couch_to_postgres_spark.session import load_table
from couch_to_postgres_spark.streaming.stateful import sessionize_stream
from couch_to_postgres_spark.streaming.windows import (
    sessionize_batch,
    windowed_type_counts,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").cache()


@pytest.fixture(scope="module")
def events_stream_dir(spark, events, tmp_path_factory):
    """3 seq-ordered files with increasing mtimes → 3 micro-batches in
    event order under maxFilesPerTrigger=1 (the file source orders by
    modification time; same-mtime files would arrive in arbitrary order,
    which an ordered feed must not do)."""
    import json as _json
    import os

    d = tmp_path_factory.mktemp("evstream") / "events"
    os.makedirs(d, exist_ok=True)
    rows = [r.asDict() for r in events.orderBy("event_id").collect()]
    n = len(rows)
    for i in range(3):
        chunk = rows[i * n // 3 : (i + 1) * n // 3]
        path = d / f"batch-{i}.json"
        with open(path, "w") as f:
            for r in chunk:
                f.write(_json.dumps(r) + "\n")
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    return str(d)


def read_events_stream(spark, events, path):
    return (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .json(path)
    )


def test_windowed_counts_stream_equals_batch(spark, events, events_stream_dir):
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_type_counts(events, "6 hours").collect()
    }
    stream = read_events_stream(spark, events, events_stream_dir)
    q = (
        windowed_type_counts(stream, "6 hours", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == batch


def test_sessionize_batch_properties(spark, events):
    sess = sessionize_batch(events, gap_minutes=60).cache()
    # every event lands in exactly one session
    assert sess.agg(F.sum("n_events")).first()[0] == events.count()
    # sessions are disjoint, ordered per user
    row = sess.filter(F.col("session_end_us") < F.col("session_start_us")).count()
    assert row == 0


def test_stateful_sessionize_equals_batch(spark, events, events_stream_dir):
    expected = {
        (r["user_id"], r["session_no"]): (
            r["n_events"], r["session_start_us"], r["session_end_us"],
        )
        for r in sessionize_batch(events, gap_minutes=60).collect()
    }
    stream = read_events_stream(spark, events, events_stream_dir)
    q = (
        sessionize_stream(stream, gap_minutes=60)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode: keep the final (max-n) row per (user, session)
    got_rows = spark.sql(
        """
        SELECT user_id, session_no, max_by(n_events, n_events) AS n_events,
               max_by(session_start_us, n_events) AS session_start_us,
               max_by(session_end_us, n_events) AS session_end_us
        FROM sessions GROUP BY user_id, session_no
        """
    ).collect()
    got = {
        (r["user_id"], r["session_no"]): (
            r["n_events"], r["session_start_us"], r["session_end_us"],
        )
        for r in got_rows
    }
    assert got == expected
