"""Driver-fast I/O for the 1-row control-plane tables an index keeps.

Tiny meta tables (the search index's ``base/meta`` stats row, the
shingle-width marker) are read before ANY indexed query can plan and
rewritten by every maintenance pass. Routing a 1-row table through a
Spark job costs a full job launch per touch (~0.3 s on a quiet box,
multi-second under load — measured r10: the incremental fold spent
~6 s of its ~11 s wall in the 1-row meta read/write jobs alone) for
bytes that fit in a cache line.

When the path is on the LOCAL filesystem — the only filesystem this
repo's rename-based swap machinery (``_retire`` + ``os.rename``)
operates on anyway — read/write the parquet directly on the driver
with pyarrow (~1 ms). Any other scheme (hdfs://, s3a://, …) falls back
to the Spark read/write, preserving ``_read_or_empty``'s documented
HDFS/S3 behavior. The formats are interchangeable both ways: pyarrow
writes a plain part file into the same directory layout Spark
produces, and pyarrow's dataset reader skips Spark's ``_SUCCESS``
markers (underscore-prefixed files are ignored by default).

Scale note (100 TB design): this is a DRIVER-side fast path for
driver-bounded state — one row per index, never per-doc data. The
data-plane components (postings, doclen, dfs) stay Spark jobs.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession
from pyspark.sql.utils import AnalysisException

_SPARK_TO_ARROW = {
    "int": pa.int32(),
    "long": pa.int64(),
    "bigint": pa.int64(),
    "double": pa.float64(),
    "float": pa.float32(),
    "string": pa.string(),
    "boolean": pa.bool_(),
}


def _local(path: str) -> str | None:
    """The driver-local form of ``path``, or None when it names a
    non-local filesystem (→ caller takes the Spark route)."""
    if "://" in path:
        return path[len("file://"):] if path.startswith("file://") else None
    return path


def _fields(schema: str) -> list[tuple[str, str]]:
    """Parse a FLAT primitive DDL ('a int, b long, …') — all this
    module handles; nested/array metas stay on the Spark path."""
    out = []
    for part in schema.split(","):
        name, typ = part.strip().rsplit(" ", 1)
        out.append((name.strip(), typ.strip().lower()))
    return out


_META_PART = "part-00000-meta.parquet"


def read_meta_rows(spark: SparkSession, path: str) -> list[dict]:
    """All rows of a tiny meta table as plain dicts; ``[]`` when the
    table doesn't exist yet. Local paths never launch a Spark job.
    Reads are schema-free (parquet self-describes) — only writes need
    the DDL. Handles any column types pyarrow does, including the IVF
    centroid arrays. When the canonical ``write_meta_rows`` part file
    is present it is read ALONE — ``write_meta_rows`` always writes the
    complete row set into it, so a stale foreign part (a pre-fast-path
    Spark ``coalesce(1)`` write awaiting its one-time-upgrade unlink)
    can never surface as a phantom extra row mid-transition
    (ADVICE r11: the dataset read returned TWO rows in the
    replace→unlink window and rows[0] was nondeterministic)."""
    local = _local(path)
    if local is not None:
        canonical = os.path.join(local, _META_PART)
        try:
            if os.path.isfile(canonical):
                return pq.read_table(canonical).to_pylist()
            return pq.read_table(local).to_pylist()
        except FileNotFoundError:
            return []
        except Exception:
            # odd layout (half-written dir, schema drift) — let Spark's
            # reader be the arbiter rather than guessing here
            pass
    try:
        return [r.asDict() for r in spark.read.parquet(path).collect()]
    except AnalysisException:
        return []


def write_meta_rows(
    spark: SparkSession, path: str, rows: list[tuple], schema: str
) -> None:
    """Overwrite a tiny meta table. Local paths: the single canonical
    part file is replaced ATOMICALLY inside the existing directory
    (dot-prefixed temp → ``os.replace``), so the directory never
    disappears — a lock-free reader racing the swap sees the old row or
    the new row, never ``[]`` (an r10 staged-dir rename had a
    rmtree→rename window in which e.g. ``query_postings`` silently
    skipped the whole compacted base — ADVICE r10). Stale foreign part
    files (a dir a Spark ``coalesce(1)`` write laid down before this
    fast path existed) are unlinked after the replace; in that
    one-time-transition window ``read_meta_rows`` prefers the canonical
    part, so the stale sibling is invisible to this module's readers
    (ADVICE r11 — the prior dataset read could surface BOTH rows
    between the replace and the unlink). Non-local: the original
    coalesce(1) Spark write."""
    local = _local(path)
    if local is None:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        return
    fields = _fields(schema)
    arrow_schema = pa.schema([(n, _SPARK_TO_ARROW[t]) for n, t in fields])
    cols = list(zip(*rows)) if rows else [[] for _ in fields]
    table = pa.table(
        {n: list(c) for (n, _), c in zip(fields, cols)}, schema=arrow_schema
    )
    os.makedirs(local, exist_ok=True)
    tmp = os.path.join(local, f".meta-{uuid.uuid4().hex[:8]}.tmp")
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(local, _META_PART))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    for f in os.listdir(local):
        if not f.startswith((".", "_")) and f != _META_PART:
            try:
                os.unlink(os.path.join(local, f))
            except OSError:
                pass  # a concurrent GC got it first — already gone
