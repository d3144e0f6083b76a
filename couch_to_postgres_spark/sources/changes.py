"""Change-feed sources (SURVEY.md §2A A1/A2).

The canonical row shape is ``(seq long, id string, deleted boolean,
doc string)`` — the CouchDB `_changes` event collapsed to its latest rev
(reference lib/index.js:183-196). Two sources produce it:

* a **file-based change log** (JSON-lines files): the test/replay source.
  ``read_change_stream`` is a Structured Streaming file source, so offset
  tracking, resume, and rate limiting (``maxFilesPerTrigger``, the A2
  backpressure analog) are built-in.
* the **CouchDB HTTP source** (:mod:`couch_to_postgres_spark.sources.couchdb`)
  which polls `_changes` into the same shape.

``changes_from_events`` derives a deterministic feed from the driver's
``events`` table (FIXTURES.md §2) for tests and benchmarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from couch_to_postgres_spark.operators.mirror import CHANGES_SCHEMA


def changes_from_events(
    spark: SparkSession, sf_dir: str, delete_type: str = "delete"
) -> DataFrame:
    """events → change feed: seq=event_id, doc identity=user_id,
    deleted=(event_type=delete_type), ``_rev = "<n>-<hash>"`` where n
    increments per successive change to the same id (CouchDB rev chain).
    The driver's events table has types signup/click/error/view/purchase;
    tests pass e.g. ``delete_type='error'`` to exercise deletions."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("event_id")
    rev_n = F.row_number().over(w)
    rev = F.concat(
        rev_n.cast("string"),
        F.lit("-"),
        F.md5(F.concat_ws("|", "user_id", "event_id")),
    )
    deleted = F.col("event_type") == delete_type
    doc = F.to_json(
        F.struct(
            F.col("user_id").cast("string").alias("_id"),
            rev.alias("_rev"),
            F.col("event_type").alias("type"),
            F.col("value"),
            F.col("props"),
        )
    )
    return ev.select(
        F.col("event_id").alias("seq"),
        F.col("user_id").cast("string").alias("id"),
        deleted.alias("deleted"),
        F.when(deleted, F.lit(None).cast("string")).otherwise(doc).alias("doc"),
    )


def write_change_log(changes: DataFrame, path: str, num_files: int = 4) -> None:
    """Persist a change batch as a JSON-lines change log (ordered by seq
    within each file) for the streaming file source to consume."""
    changes.repartitionByRange(num_files, "seq").write.mode("append").json(path)


def read_change_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    with_corrupt_column: bool = False,
) -> DataFrame:
    """Structured Streaming source over a change-log directory.

    ``max_files_per_trigger`` is the admission-control knob — the Spark
    analog of the reference's width-1 queue + pause/resume backpressure
    (lib/index.js:40-43,256-265): it bounds in-flight work per micro-batch.

    ``with_corrupt_column=True`` adds a ``_corrupt_record`` column
    (PERMISSIVE mode): records that fail JSON parsing arrive as one row
    with the raw line in that column and NULL data fields, instead of
    poisoning the feed — the reference's only recourse is a watchdog
    restart that would crash-loop on a persistent bad record
    (daemon-README.md failure transcripts); here the pipeline quarantines
    them (see ``follow(quarantine_path=…)``) and keeps draining.
    """
    schema = CHANGES_SCHEMA
    if with_corrupt_column:
        schema = CHANGES_SCHEMA + ", _corrupt_record string"
    reader = spark.readStream.schema(schema)
    if with_corrupt_column:
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)
