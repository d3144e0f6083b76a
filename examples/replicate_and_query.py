"""Worked example: the full user journey of the reference, Spark-first.

1. a change feed lands in a log directory (here derived from `events`),
2. a streaming query replicates it into a queryable mirror,
3. the README's SQL-over-JSON recipes run against the mirror,
4. a filtered subset is written back over HTTP (dry-run printer here).

Run: python examples/replicate_and_query.py [sf_dir]
"""

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from couch_to_postgres_spark.functions.json import json_get
from couch_to_postgres_spark.session import get_spark
from couch_to_postgres_spark.sources.changes import changes_from_events, write_change_log
from couch_to_postgres_spark.sql import register_catalog
from couch_to_postgres_spark.streaming.pipeline import follow, read_mirror


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example")
    work = tempfile.mkdtemp(prefix="example_")

    # 1. a change log (in production: sources.bridge drains a real CouchDB)
    changes = changes_from_events(spark, sf_dir)
    write_change_log(changes, f"{work}/log")

    # 2. replicate: change log → checkpointed streaming merge → mirror
    q = follow(spark, f"{work}/log", f"{work}/mirror", f"{work}/ckpt")
    q.awaitTermination()
    mirror = read_mirror(spark, f"{work}/mirror")
    print(f"mirror: {mirror.count()} docs")

    # 3. query it — DataFrame style and SQL style
    top_types = (
        mirror.groupBy(json_get("doc", "type").alias("type"))
        .count()
        .orderBy(F.desc("count"))
    )
    top_types.show(5, truncate=False)

    register_catalog(spark, sf_dir, mirrors={"mirror": mirror})
    spark.sql(
        """
        SELECT get_json_object(doc, '$.type') AS type,
               round(avg(CAST(get_json_object(doc, '$.value') AS DOUBLE)), 2)
                   AS avg_value
        FROM mirror GROUP BY 1 ORDER BY avg_value DESC
        """
    ).show(5, truncate=False)

    # 4. filtered re-replication target set (README.md:648-664); swap the
    #    printer for sinks.writeback.filtered_rereplication(couch_url, …)
    subset = mirror.filter(json_get("doc", "type") == "purchase")
    print(f"would re-replicate {subset.count()} purchase docs")
    spark.stop()


if __name__ == "__main__":
    main()
