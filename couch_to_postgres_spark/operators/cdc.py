"""Batch CDC apply — the merge core (SURVEY.md §2A A3–A7, build-plan Stage 3).

Given the current mirror and a batch of change events
``(seq, id, deleted, doc)``, produce the next mirror with the reference's
exact semantics:

* per-key last-write-wins by feed order ``seq`` (the reference's width-1
  queue gives per-feed total order, lib/index.js:40-43);
* deletion events remove the row (destroy(), lib/index.js:154-181);
* upserts INSERT-or-UPDATE by key (update(), lib/index.js:96-151); the
  rev-compare NOOP (lib/index.js:110,125-128) makes replays idempotent —
  in batch form, applying the same batch twice is a fixpoint;
* an optional doc-type filter drops configured types before apply
  (lib/index.js:131);
* an optional map hook rewrites each doc before load (opts.map,
  lib/index.js:34,188-190).

Scale design (100 TB): the mirror is the big side; a change micro-batch is
small. We therefore never shuffle the mirror: the batch's key set is
broadcast for a left-anti join (untouched rows stream through map-side),
and the new versions are unioned on. The plan is
``Scan(mirror) → BroadcastHashJoin(LeftAnti) → Union`` — zero exchanges on
the mirror. For backfill-sized batches (≥ broadcast threshold) pass
``broadcast_changes=False`` to fall back to a shuffled sort-merge join,
which AQE will skew-split if one key is hot.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from couch_to_postgres_spark.functions.json import json_get


def latest_changes(changes: DataFrame) -> DataFrame:
    """Collapse a change batch to the last event per key (by ``seq``).

    Matches CouchDB semantics: the `_changes` feed collapses each doc to its
    latest revision, so within one batch only the final event matters.
    """
    w = Window.partitionBy("id").orderBy(F.desc("seq"))
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def filtered_latest(
    changes: DataFrame, type_filter: str | None = None
) -> DataFrame:
    """Per-key latest change with the reference's type-filter drop
    applied: filtered-type upserts are dropped before apply (reference
    lib/index.js:131 skips INSERT/UPDATE for the configured type);
    deletions still propagate. Shared by the mirror merge and any
    sibling state the pipeline keeps in step with it (e.g. the live
    search index) so the two cannot drift on filter semantics."""
    latest = latest_changes(changes)
    if type_filter is not None:
        latest = latest.filter(
            F.col("deleted") | (json_get("doc", "type") != F.lit(type_filter))
            | json_get("doc", "type").isNull()
        )
    return latest


def apply_changes(
    mirror: DataFrame,
    changes: DataFrame,
    type_filter: str | None = None,
    map_hook: Callable[[Column], Column] | None = None,
    broadcast_changes: bool = True,
) -> DataFrame:
    """Merge one change batch into the mirror; returns the next mirror.

    Pure function over DataFrames — the streaming pipeline calls this from
    ``foreachBatch``; batch tests call it directly (idempotence: applying a
    batch twice ≡ once, because replacement is by key).
    """
    latest = filtered_latest(changes, type_filter)
    upserts = latest.filter(~F.col("deleted")).select("id", "doc")
    if map_hook is not None:
        upserts = upserts.withColumn("doc", map_hook(F.col("doc")))
    touched = latest.select("id")
    if broadcast_changes:
        touched = F.broadcast(touched)
    untouched = mirror.join(touched, on="id", how="left_anti")
    return untouched.unionByName(upserts)


def change_stats(mirror: DataFrame, changes: DataFrame) -> DataFrame:
    """Classify each change against the current mirror, mirroring the
    reference's per-change log lines (insert lib/index.js:133, update :114,
    NOOP :125-128, delete :164). One row per action with a count.

    The NOOP class is the idempotence witness: replaying a batch against the
    mirror it produced must classify every upsert as NOOP (same ``_rev``).
    """
    latest = latest_changes(changes)
    m = mirror.select(
        F.col("id"), json_get("doc", "_rev").alias("m_rev")
    )
    j = latest.join(m, on="id", how="left")
    action = (
        F.when(F.col("deleted") & F.col("m_rev").isNotNull(), F.lit("delete"))
        .when(F.col("deleted"), F.lit("delete_missing"))
        .when(F.col("m_rev").isNull(), F.lit("insert"))
        .when(json_get("doc", "_rev") == F.col("m_rev"), F.lit("noop"))
        .otherwise(F.lit("update"))
    )
    return j.select(action.alias("action")).groupBy("action").count()
