"""Bucketed-layout and skew-salting scale utilities."""

import pytest
from pyspark.sql import functions as F

from couch_to_postgres_spark.functions.json import json_get
from couch_to_postgres_spark.operators.mirror import CHANGES_SCHEMA, docs_mirror
from couch_to_postgres_spark.operators.skew import (
    bucketed_mirror,
    salted_count,
    save_mirror_bucketed,
)
from couch_to_postgres_spark.plans.inspect import executed_plan


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    save_mirror_bucketed(docs_mirror(spark, sf_dir), "bucketed_docs", num_buckets=8)
    yield bucketed_mirror(spark, "bucketed_docs")
    spark.sql("DROP TABLE IF EXISTS bucketed_docs")


def test_bucketed_join_skips_mirror_exchange(spark, bucketed):
    """Backfill path: sort-merge join against the bucketed mirror needs no
    exchange on the mirror side (the other side shuffles into the bucket
    partitioning)."""
    # force the sort-merge path (what a mirror-sized backfill batch gets)
    big_batch = bucketed.select("id", F.lit(False).alias("deleted")).hint("merge")
    joined = bucketed.join(big_batch.select("id"), "id")
    plan = executed_plan(joined)
    assert "SortMergeJoin" in plan
    # bucketed scans on both sides (same table) → no shuffle exchange at all
    assert "Exchange hashpartitioning" not in plan, plan


def test_bucketed_vs_plain_same_result(spark, bucketed, sf_dir):
    plain = docs_mirror(spark, sf_dir)
    a = {r["id"] for r in bucketed.select("id").collect()}
    b = {r["id"] for r in plain.select("id").collect()}
    assert a == b


def test_salted_count_matches_plain(spark, sf_dir):
    m = docs_mirror(spark, sf_dir)
    lang = json_get("doc", "lang")
    plain = {
        r["lang"]: r["value"]
        for r in m.groupBy(lang.alias("lang")).agg(F.count(F.lit(1)).alias("value")).collect()
    }
    salted = {
        r["lang"]: r["value"] for r in salted_count(m, lang, "lang", n_salts=8).collect()
    }
    assert salted == plain


def test_salted_count_deterministic(spark, sf_dir):
    m = docs_mirror(spark, sf_dir)
    lang = json_get("doc", "lang")
    a = sorted(map(tuple, salted_count(m, lang, "lang").collect()))
    b = sorted(map(tuple, salted_count(m, lang, "lang").collect()))
    assert a == b
