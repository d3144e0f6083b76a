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

from pyspark.sql import Column, DataFrame, SparkSession
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


def content_diff(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "id",
    fingerprint: Column | None = None,
    doc_col: str = "doc",
    include_same: bool = False,
) -> DataFrame:
    """Content-level reconciliation between two snapshots (e.g. a Couch
    snapshot and its mirror): one row per id with ``status`` in
    ``only_left | only_right | differs`` (plus ``same`` when
    ``include_same``). Deepens A19's count reconciliation
    (reference nagios-check_couch_postgres_count:22-47 compares only
    cardinalities) to per-document content, the check a user runs when
    counts match but corruption is suspected.

    ``fingerprint`` is any deterministic Column over each side's row.
    The default is ``md5(doc_col)`` with a NULL doc mapped to the
    sentinel ``"<null>"`` (not a hex string, so it can never collide
    with a real md5, and it is distinct from ``md5('')``): a bare
    ``md5(doc)`` is NULL for a NULL doc, which would misclassify a row
    present on BOTH sides as only_left/only_right — and a NULL left doc
    would then make the repair → apply → re-diff loop never converge to
    ``same``. Ids are assumed unique per side (the mirror contract; a
    duplicated id fans out through the join). The fingerprint projects
    MAP-SIDE, so
    the full-outer join shuffles only ``(id, 32-byte fp)`` — never the
    documents; on a unique id key the shuffle is skew-free, and a
    mirror bucketed by id joins co-located. 100 TB cost: one scan per
    side + one id-width shuffle.
    """
    fp = (
        fingerprint
        if fingerprint is not None
        else F.coalesce(F.md5(F.col(doc_col)), F.lit("<null>"))
    )
    l = left.select(F.col(id_col).alias("id"), fp.alias("fp_left"))
    r = right.select(F.col(id_col).alias("id"), fp.alias("fp_right"))
    j = l.join(r, on="id", how="full_outer")
    status = (
        F.when(F.col("fp_right").isNull(), F.lit("only_left"))
        .when(F.col("fp_left").isNull(), F.lit("only_right"))
        .when(F.col("fp_left") != F.col("fp_right"), F.lit("differs"))
        .otherwise(F.lit("same"))
    )
    out = j.select("id", status.alias("status"))
    if not include_same:
        out = out.filter(F.col("status") != "same")
    return out


def diff_report(diff: DataFrame) -> DataFrame:
    """Roll a :func:`content_diff` up to ``(status, n)`` — the
    monitoring surface (zero non-``same`` rows = replica healthy)."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


def repair_plan(
    diff: DataFrame, left: DataFrame, id_col: str = "id", doc_col: str = "doc"
) -> DataFrame:
    """Turn a diff into the change batch that makes right ≡ left when
    applied with :func:`~couch_to_postgres_spark.operators.cdc.apply_changes`:
    ``only_left``/``differs`` become upserts carrying left's doc,
    ``only_right`` becomes a deletion. One change per id, so the
    constant ``seq`` satisfies the per-key-latest contract
    (CHANGES_SCHEMA). The upsert docs join back to ``left`` by id —
    only the repair set (small when the replica is mostly healthy)
    fetches documents.
    """
    ups = (
        diff.filter(F.col("status").isin("only_left", "differs"))
        .select("id")
        .join(
            left.select(F.col(id_col).alias("id"), F.col(doc_col).alias("doc")),
            on="id",
        )
        .select(
            F.lit(1).cast("long").alias("seq"),
            "id",
            F.lit(False).alias("deleted"),
            "doc",
        )
    )
    dels = diff.filter(F.col("status") == "only_right").select(
        F.lit(1).cast("long").alias("seq"),
        "id",
        F.lit(True).alias("deleted"),
        F.lit(None).cast("string").alias("doc"),
    )
    return ups.unionByName(dels)


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
