"""The mirror table — relational projection of one CouchDB database.

Reference shape: ``CREATE TABLE t (id text PRIMARY KEY, doc jsonb)``
(reference README.md:285-290, auto-DDL at bin/daemon.js:245-247). Here the
mirror is a DataFrame with schema ``(id string, doc string)`` where ``doc``
is a JSON text column (closest portable analog of jsonb-as-blob; typed
access is on-read via the functions layer, matching the reference's
``->>`` + CAST idiom).

Physical layout at scale: the mirror persists as parquet partitioned/
bucketed by ``id`` hash so the CDC merge (operators.cdc) joins co-located
and point lookups prune. The reference measured unindexed full scans
(README.md:242), so scan-based execution is apples-to-apples.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MIRROR_SCHEMA = "id string, doc string"
#: change-feed row shape (reference lib/index.js change events {seq,id,deleted,doc})
CHANGES_SCHEMA = "seq long, id string, deleted boolean, doc string"


def sanitize_table_name(couch_db_name: str) -> str:
    """CouchDB db name → SQL table name: '-' → '_'
    (reference lib/index.js:32, bin/daemon.js:115)."""
    return re.sub(r"-", "_", couch_db_name)


def to_mirror(df: DataFrame, id_col: str, doc_cols: list[str] | None = None) -> DataFrame:
    """Wrap any relational DataFrame as a mirror ``(id, doc)`` table.

    ``doc`` is built with ``to_json(struct(...))`` — all JVM-side; this is
    the test-fixture analog of a replicated CouchDB database (FIXTURES.md §1).
    """
    cols = doc_cols or df.columns
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        F.to_json(F.struct(*cols)).alias("doc"),
    )


def docs_mirror(spark: SparkSession, sf_dir: str, with_rev: bool = False) -> DataFrame:
    """The ``documents`` table wrapped as a couch mirror.

    ``with_rev=True`` adds a deterministic ``_rev = "1-" + md5(text)`` field
    inside the doc (CouchDB rev shape '<n>-<hash>', reference README.md:51),
    for CDC tests that need rev-compare semantics.
    """
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if with_rev:
        df = df.withColumn("_rev", F.concat(F.lit("1-"), F.md5(F.col("text"))))
        cols = ["doc_id", "_rev", "text", "lang", "source", "n_chars"]
    else:
        cols = ["doc_id", "text", "lang", "source", "n_chars"]
    return df.select(
        F.col("doc_id").cast("string").alias("id"),
        F.to_json(F.struct(*cols)).alias("doc"),
    )


def events_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``events`` table as a mirror keyed by event_id."""
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return to_mirror(df, "event_id")


def count_reconciliation(source_count: int, mirror: DataFrame, threshold: int = 10) -> dict:
    """A19: the nagios doc-count reconciliation
    (reference nagios-check_couch_postgres_count:14,22-47) as a library
    assertion: replica cardinality must equal source cardinality ± threshold.
    """
    mirror_count = mirror.count()
    diff = abs(source_count - mirror_count)
    return {
        "source_count": source_count,
        "mirror_count": mirror_count,
        "diff": diff,
        "ok": diff <= threshold,
    }
