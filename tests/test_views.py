"""Materialized view-as-table: refresh, registration, equivalence with
the fresh GROUP BY path (the reference's own oracle, README.md:206-213)."""

from pyspark.sql import functions as F

from couch_to_postgres_spark.operators.mirror import docs_mirror
from couch_to_postgres_spark.operators.query import group_count
from couch_to_postgres_spark.operators.views import MaterializedView


def test_materialized_view_matches_fresh(spark, sf_dir, tmp_path):
    mirror = docs_mirror(spark, sf_dir)
    view = MaterializedView(
        spark,
        "by_lang",
        str(tmp_path / "by_lang.parquet"),
        build=lambda: group_count(mirror, "lang"),
    )
    view.refresh()
    fresh = {(r["lang"], r["value"]) for r in group_count(mirror, "lang").collect()}
    stored = {(r["lang"], r["value"]) for r in view.read().collect()}
    via_sql = {
        (r["lang"], r["value"])
        for r in spark.sql("SELECT * FROM by_lang").collect()
    }
    assert fresh == stored == via_sql


def test_refresh_swaps_atomically(spark, sf_dir, tmp_path):
    import os

    mirror = docs_mirror(spark, sf_dir)
    view = MaterializedView(
        spark, "v2", str(tmp_path / "v2.parquet"),
        build=lambda: group_count(mirror, "source"),
    )
    view.refresh()
    view.refresh()  # second refresh over existing state
    assert not os.path.exists(view.path + ".tmp")
    assert not os.path.exists(view.path + ".old")
    assert view.read().count() > 0


def test_incremental_count_view_matches_fresh_and_replays(spark, sf_dir):
    from __spark_entry__ import _derived_changes
    from couch_to_postgres_spark.functions.json import json_get
    from couch_to_postgres_spark.operators.cdc import apply_changes
    from couch_to_postgres_spark.operators.mirror import docs_mirror
    from couch_to_postgres_spark.operators.views import (
        apply_count_delta,
        count_view_delta,
    )

    mirror = docs_mirror(spark, sf_dir, with_rev=True)
    changes = _derived_changes(spark, sf_dir)
    post = apply_changes(mirror, changes)
    key = json_get("doc", "lang")
    view = mirror.groupBy(key.alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    touched = changes.select("id").distinct()

    inc = apply_count_delta(view, count_view_delta(mirror, post, touched, key))
    fresh = post.groupBy(key.alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, fresh.collect()))

    # replayed batch after the merge landed: every key nets zero
    assert count_view_delta(post, post, touched, key).count() == 0


def test_incremental_sum_view_handles_updates(spark, sf_dir):
    from __spark_entry__ import _derived_changes
    from couch_to_postgres_spark.functions.json import json_get
    from couch_to_postgres_spark.operators.cdc import apply_changes
    from couch_to_postgres_spark.operators.views import (
        agg_view_delta,
        apply_agg_delta,
    )

    mirror = docs_mirror(spark, sf_dir, with_rev=True)
    changes = _derived_changes(spark, sf_dir)
    post = apply_changes(mirror, changes)
    key = json_get("doc", "lang")
    value = json_get("doc", "n_chars").cast("long")
    view = mirror.groupBy(key.alias("key")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(value).alias("total")
    )
    touched = changes.select("id").distinct()
    inc = apply_agg_delta(view, agg_view_delta(mirror, post, touched, key, value))
    fresh = post.groupBy(key.alias("key")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(value).alias("total")
    )
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, fresh.collect()))
    # replay after the merge landed nets zero deltas
    assert agg_view_delta(post, post, touched, key, value).count() == 0


def test_apply_count_delta_merges_null_keys(spark):
    """Docs missing the keyed field group under NULL; the view merge must
    treat NULL as one key, not leave view/delta NULL rows unmerged."""
    from couch_to_postgres_spark.operators.views import apply_count_delta

    view = spark.createDataFrame([(None, 5), ("a", 2)], "key string, cnt long")
    delta = spark.createDataFrame(
        [(None, 3), ("b", 1), ("a", -2)], "key string, delta long"
    )
    got = {r["key"]: r["cnt"] for r in apply_count_delta(view, delta).collect()}
    assert got == {None: 8, "b": 1}  # 'a' reached zero and disappeared
