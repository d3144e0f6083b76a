"""Content-level reconciliation: diff two mirrors, generate a repair
plan, apply it through the CDC merge, verify convergence
(`operators/mirror.py` content_diff/diff_report/repair_plan).

Deepens reference A19 (nagios-check_couch_postgres_count:22-47, counts
only) to per-document content.
"""

import pytest
from pyspark.sql import functions as F

from couch_to_postgres_spark.operators import mirror as M
from couch_to_postgres_spark.operators.cdc import apply_changes


@pytest.fixture(scope="module")
def pair(spark):
    left = spark.createDataFrame(
        [("1", "{'a':1}"), ("2", "{'a':2}"), ("3", "{'a':3}")],
        M.MIRROR_SCHEMA,
    )
    # right: missing id 1, id 2 corrupted, extra id 9
    right = spark.createDataFrame(
        [("2", "{'a':99}"), ("3", "{'a':3}"), ("9", "{'a':9}")],
        M.MIRROR_SCHEMA,
    )
    return left, right


def test_diff_statuses(pair):
    left, right = pair
    d = {r["id"]: r["status"] for r in M.content_diff(left, right).collect()}
    assert d == {"1": "only_left", "2": "differs", "9": "only_right"}
    # include_same surfaces the healthy row too
    full = {
        r["id"]: r["status"]
        for r in M.content_diff(left, right, include_same=True).collect()
    }
    assert full["3"] == "same" and len(full) == 4


def test_diff_custom_fingerprint_ignores_noise(pair, spark):
    # fingerprint on a projected field: doc-formatting noise invisible
    left = spark.createDataFrame([("1", '{"v": 5}')], M.MIRROR_SCHEMA)
    right = spark.createDataFrame([("1", '{"v":5}')], M.MIRROR_SCHEMA)
    fp = F.md5(F.get_json_object("doc", "$.v"))
    assert M.content_diff(left, right, fingerprint=fp).count() == 0
    assert M.content_diff(left, right).count() == 1  # raw-doc fp differs


def test_repair_plan_and_convergence(pair):
    left, right = pair
    plan = M.repair_plan(M.content_diff(left, right), left)
    rows = {r["id"]: r for r in plan.collect()}
    assert rows["1"]["deleted"] is False and rows["1"]["doc"] == "{'a':1}"
    assert rows["2"]["deleted"] is False and rows["2"]["doc"] == "{'a':2}"
    assert rows["9"]["deleted"] is True and rows["9"]["doc"] is None
    repaired = apply_changes(right, plan)
    # post-repair: byte-identical mirrors, empty diff, all-same report
    assert M.content_diff(left, repaired).count() == 0
    rep = M.diff_report(
        M.content_diff(left, repaired, include_same=True)
    ).collect()
    assert [(r["status"], r["n"]) for r in rep] == [("same", 3)]


def test_diff_shuffles_fingerprints_not_docs(spark, pair):
    # the doc column must be pruned before the exchange: the join reads
    # only (id, fp) — assert the shuffle-side plan never carries 'doc'
    left, right = pair
    plan = (
        M.content_diff(left, right)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for ex in re.findall(r"Exchange [^\n]*", plan):
        assert "doc#" not in ex


def test_empty_right_everything_only_left(spark, pair):
    left, _ = pair
    empty = spark.createDataFrame([], M.MIRROR_SCHEMA)
    d = M.content_diff(left, empty)
    assert {r["status"] for r in d.collect()} == {"only_left"}
    # repair plan rebuilds from scratch; convergence still holds
    repaired = apply_changes(empty, M.repair_plan(d, left))
    assert M.content_diff(left, repaired).count() == 0


def test_null_docs_fingerprint_null_safe(spark):
    # a row with a NULL doc on BOTH sides is 'same' (not only_left +
    # only_right), and NULL is distinct from the empty string
    left = spark.createDataFrame(
        [("1", None), ("2", ""), ("3", None)], M.MIRROR_SCHEMA
    )
    right = spark.createDataFrame(
        [("1", None), ("2", None), ("3", "x")], M.MIRROR_SCHEMA
    )
    d = {
        r["id"]: r["status"]
        for r in M.content_diff(left, right, include_same=True).collect()
    }
    assert d == {"1": "same", "2": "differs", "3": "differs"}


def test_repair_converges_with_null_left_doc(spark):
    # a NULL left doc must not wedge the repair loop: after one
    # repair_plan -> apply_changes round, re-diff is empty
    left = spark.createDataFrame(
        [("1", None), ("2", "{'a':2}")], M.MIRROR_SCHEMA
    )
    right = spark.createDataFrame([("2", "{'a':9}")], M.MIRROR_SCHEMA)
    plan = M.repair_plan(M.content_diff(left, right), left)
    repaired = apply_changes(right, plan)
    assert M.content_diff(left, repaired).count() == 0
