"""SparkSession factory tuned for this engine.

Local test runs use ``local[$SPARK_GRAFT_CPUS]``; the same configs are the
ones we would ship for a 1000-executor cluster run (AQE on, skew-join on,
partition coalescing on) — only the master URL and memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """Driver-heap default sized from the host's physical RAM (~1/4,
    clamped to [2g, 24g]) so the single local-mode JVM neither starves
    at 32 threads on a big box nor over-asks on a small one; the
    ``SPARK_GRAFT_DRIVER_MEM`` env var overrides in either direction."""
    try:
        total_gib = (
            os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        ) / (1024**3)
    except (ValueError, OSError, AttributeError):
        return "8g"
    return f"{max(2, min(24, int(total_gib // 4)))}g"


def get_spark(
    app_name: str = "couch-to-postgres-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Scale notes (100 TB design):

    * AQE is on so runtime stats re-plan shuffles: partition coalescing
      collapses the tail of small post-shuffle partitions, and the skew-join
      splitter handles hot keys (e.g. one giant CouchDB feed) without manual
      salting in the common case.
    * ``spark.sql.shuffle.partitions`` defaults to the core count locally;
      on a real cluster AQE's coalescing makes a high initial value cheap,
      so we set 2×cores there via ``extra_conf``.
    * Arrow is enabled so every Pandas-UDF crossing is vectorized.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)
    # Make the package importable in Spark's PYTHON WORKERS even when the
    # driver script runs from another directory: workers inherit the
    # JVM's env, not the driver's sys.path mutations, and a pickled
    # pandas-UDF / data-source reader needs the module importable there.
    # Best-effort (a pre-existing JVM keeps its env); a cluster deploy
    # ships the package via pip/--py-files instead.
    _pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _pp = os.environ.get("PYTHONPATH", "")
    if _pkg_parent not in _pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _pkg_parent + (os.pathsep + _pp if _pp else "")
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # local mode runs driver + all 32 executor threads in ONE JVM:
        # 8g was undersized for that thread count (constant GCLocker
        # stalls in the logs; a 6M-doc ingest OOMed building the 10x
        # scaling corpus) while the bench box has 128 GiB. Size from the
        # HOST's RAM rather than hardcoding the bench box's 24g (ADVICE
        # r09: a fixed 24g heap fails JVM startup / swaps on small
        # dev/CI machines): ~1/4 of physical memory, clamped to [2g,
        # 24g], leaves room for the OS page cache the parquet reads
        # lean on; SPARK_GRAFT_DRIVER_MEM overrides either way. On a
        # real cluster this is per-executor sizing instead.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # driver-generated parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos timestamp type — read as long (ns since epoch) and convert
        # on demand (see nanos_to_timestamp)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Load one driver-generated parquet table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def nanos_to_timestamp(col):
    """Convert a nanosAsLong-read TIMESTAMP(NANOS) column to a Spark
    timestamp (microsecond precision). Integer `div`, not `/1000`: ns
    values ≈ 1.7e18 exceed double's 2^53 exact range, so float division
    would be off by ±1 µs."""
    from pyspark.sql import functions as F

    us = F.floor(col.cast("decimal(38,0)") / 1000).cast("long")
    return F.timestamp_micros(us)


_TS_TYPES = ("timestamp", "timestamp_ntz", "date")


def ts_micros(df, ts_col: str = "ts"):
    """Epoch-microseconds Column for a timestamp-like column, whatever
    physical type the parquet writer chose for it:

    * ``timestamp`` / ``timestamp_ntz`` (µs precision) → ``unix_micros``
      (NTZ is cast through TIMESTAMP under the session's UTC zone, so the
      wall-clock value IS the epoch value);
    * ``bigint`` → ns since epoch (TIMESTAMP(NANOS) parquet read under
      ``spark.sql.legacy.parquet.nanosAsLong``) → integer ``div 1000``
      (float division would be off by ±1 µs above 2^53).

    Every engine query goes through this (or :func:`event_timestamp`)
    instead of touching ``ts`` arithmetic directly, so driver-side schema
    drift between rounds cannot silently skew results.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(ts_col)
    if dtype in _TS_TYPES:
        return F.unix_micros(F.col(ts_col).cast("timestamp"))
    return F.expr(f"`{ts_col}` div 1000")


def event_timestamp(df, ts_col: str = "ts"):
    """Proper TIMESTAMP Column (µs, UTC session zone) from a
    timestamp-like column; same type-adaptivity as :func:`ts_micros`."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(ts_col)
    if dtype in _TS_TYPES:
        return F.col(ts_col).cast("timestamp")
    return nanos_to_timestamp(F.col(ts_col))
