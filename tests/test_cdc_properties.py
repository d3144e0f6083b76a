"""Model-based property tests for the CDC merge core: arbitrary change
sequences applied through ``apply_changes`` must match a trivial
dict-model of CouchDB semantics (last-rev-wins per key, deletes remove,
replay converges). Hypothesis drives the sequences; the Spark path and the
model are compared exactly.
"""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from couch_to_postgres_spark.operators.cdc import apply_changes
from couch_to_postgres_spark.operators.mirror import CHANGES_SCHEMA, MIRROR_SCHEMA

KEYS = ["a", "b", "c", "d", "e"]

change_st = st.tuples(
    st.sampled_from(KEYS),  # id
    st.booleans(),  # deleted
    st.integers(min_value=1, max_value=9),  # rev number
)
batch_st = st.lists(change_st, min_size=0, max_size=12)


def model_apply(state: dict, batch: list) -> dict:
    """The reference semantics in 5 lines: per-key latest (by seq = list
    position), delete removes, upsert replaces."""
    latest = {}
    for seq, (key, deleted, rev) in enumerate(batch):
        latest[key] = (seq, deleted, rev)
    out = dict(state)
    for key, (_seq, deleted, rev) in latest.items():
        if deleted:
            out.pop(key, None)
        else:
            out[key] = f"{rev}-h"
    return out


def to_changes_rows(batch: list) -> list[tuple]:
    rows = []
    for seq, (key, deleted, rev) in enumerate(batch):
        doc = (
            None
            if deleted
            else json.dumps({"_id": key, "_rev": f"{rev}-h", "v": rev})
        )
        rows.append((seq, key, deleted, doc))
    return rows


def spark_state(df) -> dict:
    return {
        r["id"]: json.loads(r["doc"])["_rev"] for r in df.collect()
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(batch1=batch_st, batch2=batch_st)
def test_merge_matches_model(spark, batch1, batch2):
    mirror = spark.createDataFrame([], MIRROR_SCHEMA)
    m1 = apply_changes(mirror, spark.createDataFrame(to_changes_rows(batch1), CHANGES_SCHEMA))
    expected1 = model_apply({}, batch1)
    got1 = spark_state(m1)
    assert got1 == expected1

    if batch2:
        m2 = apply_changes(
            m1, spark.createDataFrame(to_changes_rows(batch2), CHANGES_SCHEMA)
        )
        assert spark_state(m2) == model_apply(expected1, batch2)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(batch=batch_st)
def test_replay_is_fixpoint(spark, batch):
    """apply(apply(m, B), B) == apply(m, B) for every batch B."""
    if not batch:
        return
    mirror = spark.createDataFrame([], MIRROR_SCHEMA)
    changes = spark.createDataFrame(to_changes_rows(batch), CHANGES_SCHEMA)
    once = apply_changes(mirror, changes)
    twice = apply_changes(once, changes)
    assert spark_state(once) == spark_state(twice)
