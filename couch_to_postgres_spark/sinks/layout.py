"""Time-partitioned storage layout for event-shaped tables.

The reference stores every doc in one flat table and full-scans it
(README.md:206-242). At 100 TB the layout IS the index: hive-style
``event_date=…`` partitions let every time-bounded query prune to the
touched days at PLANNING time (``PartitionFilters`` in the scan — zero
I/O for other days), and in-partition sorting by a secondary key gives
parquet row-group min/max stats a chance to skip pages on that key too
(stats pruning happens at the reader, it does not show in the plan).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from couch_to_postgres_spark.session import event_timestamp


def write_time_partitioned(
    events: DataFrame,
    path: str,
    ts_col: str = "ts",
    sort_col: str | None = "user_id",
    mode: str = "overwrite",
) -> None:
    """Write events hive-partitioned by event date (derived from the
    timestamp-like ``ts_col``), optionally sorted inside each partition so
    row-group stats on ``sort_col`` are tight. One shuffle-free pass:
    ``partitionBy`` splits files per in-flight task; for a strict
    one-file-per-day layout repartition on the date first (more write
    parallelism ≠ better here — file count per day is the knob that
    matters for the reader)."""
    ev = events.withColumn(
        "event_date", F.to_date(event_timestamp(events, ts_col))
    )
    if sort_col is not None:
        ev = ev.sortWithinPartitions("event_date", sort_col)
    ev.write.partitionBy("event_date").mode(mode).parquet(path)


def read_time_range(
    spark: SparkSession,
    path: str,
    start: dt.date | str,
    end: dt.date | str,
) -> DataFrame:
    """Scan only the partitions inside ``[start, end)`` — the date filter
    lands in the scan's ``PartitionFilters`` (pinned in test_plans), so
    days outside the range are never listed, opened, or read."""
    df = spark.read.parquet(path)
    return df.filter(
        (F.col("event_date") >= F.lit(start)) & (F.col("event_date") < F.lit(end))
    )
