"""Materialized view-as-table: refresh, registration, equivalence with
the fresh GROUP BY path (the reference's own oracle, README.md:206-213)."""

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
