"""CDC merge-core semantics (SURVEY.md §2A A3–A7, build-plan Stage 3):
idempotence, replay-NOOP classification, delete propagation, type filter,
map hook, per-key last-write-wins."""

import pytest
from pyspark.sql import functions as F

from couch_to_postgres_spark.functions.json import json_get
from couch_to_postgres_spark.operators.cdc import apply_changes, change_stats, latest_changes
from couch_to_postgres_spark.operators.mirror import CHANGES_SCHEMA, MIRROR_SCHEMA


def mk_mirror(spark, rows):
    return spark.createDataFrame(rows, MIRROR_SCHEMA)


def mk_changes(spark, rows):
    return spark.createDataFrame(rows, CHANGES_SCHEMA)


@pytest.fixture
def mirror(spark):
    return mk_mirror(
        spark,
        [
            ("a", '{"_id":"a","_rev":"1-aa","v":1}'),
            ("b", '{"_id":"b","_rev":"1-bb","v":2}'),
            ("c", '{"_id":"c","_rev":"2-cc","v":3}'),
        ],
    )


def as_map(df):
    return {r["id"]: r["doc"] for r in df.collect()}


def test_insert_update_delete(spark, mirror):
    changes = mk_changes(
        spark,
        [
            (1, "b", False, '{"_id":"b","_rev":"2-b2","v":20}'),  # update
            (2, "c", True, None),  # delete
            (3, "d", False, '{"_id":"d","_rev":"1-dd","v":4}'),  # insert
        ],
    )
    out = as_map(apply_changes(mirror, changes))
    assert set(out) == {"a", "b", "d"}
    assert '"2-b2"' in out["b"] and '"v":4' in out["d"]


def test_idempotent_replay(spark, mirror):
    """Applying the same batch twice ≡ once (rev-compare NOOP semantics,
    reference lib/index.js:110,125-128)."""
    changes = mk_changes(
        spark,
        [
            (1, "a", False, '{"_id":"a","_rev":"2-a2","v":10}'),
            (2, "c", True, None),
        ],
    )
    once = apply_changes(mirror, changes)
    twice = apply_changes(once, changes)
    assert as_map(once) == as_map(twice)


def test_replay_classified_noop(spark, mirror):
    changes = mk_changes(
        spark, [(1, "a", False, '{"_id":"a","_rev":"2-a2","v":10}')]
    )
    after = apply_changes(mirror, changes)
    stats = {r["action"]: r["count"] for r in change_stats(after, changes).collect()}
    assert stats == {"noop": 1}


def test_last_write_wins_within_batch(spark, mirror):
    """Per-key feed order: highest seq wins (queue-width-1 total order,
    reference lib/index.js:40-43)."""
    changes = mk_changes(
        spark,
        [
            (1, "a", False, '{"_id":"a","_rev":"2-a2","v":10}'),
            (2, "a", False, '{"_id":"a","_rev":"3-a3","v":11}'),
            (3, "z", False, '{"_id":"z","_rev":"1-z1","v":0}'),
            (4, "z", True, None),
        ],
    )
    out = as_map(apply_changes(mirror, changes))
    assert '"3-a3"' in out["a"]
    assert "z" not in out


def test_type_filter(spark, mirror):
    """Configured doc type is dropped before apply (lib/index.js:131)."""
    changes = mk_changes(
        spark,
        [
            (1, "x", False, '{"_id":"x","_rev":"1-x","type":"Harms::Skip","v":1}'),
            (2, "y", False, '{"_id":"y","_rev":"1-y","type":"Keep","v":2}'),
        ],
    )
    out = as_map(apply_changes(mirror, changes, type_filter="Harms::Skip"))
    assert "y" in out and "x" not in out


def test_map_hook(spark, mirror):
    """opts.map doc-rewrite hook (lib/index.js:34,188-190)."""
    from couch_to_postgres_spark.functions.json import json_object_set_key

    changes = mk_changes(
        spark, [(1, "m", False, '{"_id":"m","_rev":"1-m","v":1}')]
    )
    out = apply_changes(
        mirror,
        changes,
        map_hook=lambda doc: json_object_set_key(doc, "tagged", F.lit("yes")),
    )
    row = {r["id"]: r["doc"] for r in out.collect()}["m"]
    assert '"tagged":"yes"' in row


def test_latest_changes_dedup(spark):
    changes = mk_changes(
        spark,
        [(i, "k", False, f'{{"_rev":"{i}-r"}}') for i in range(1, 6)],
    )
    latest = latest_changes(changes).collect()
    assert len(latest) == 1 and latest[0]["seq"] == 5


def test_merge_plan_has_no_mirror_shuffle(spark, mirror):
    """Scale invariant: with broadcast_changes=True the mirror side must
    join via BroadcastHashJoin (no Exchange over the mirror scan)."""
    changes = mk_changes(spark, [(1, "a", True, None)])
    plan = apply_changes(mirror, changes)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
