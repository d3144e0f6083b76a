"""View-as-table (SURVEY.md §1.1 #6, §4 view-materialization trade-off).

A CouchDB map/reduce view is, relationally, a materialized aggregate of
the mirror (the reference proves the equivalence itself, README.md:206-213,
and documents the trade-off: ~1 s from a prebuilt view vs ~4 s recomputed,
README.md:204-215). Here a view is any DataFrame builder over the mirror;
materialization is a parquet write + temp-view registration, refreshed on
demand (the couch view-build analog, minus the 20-minute build).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class MaterializedView:
    """A named, refreshable materialized aggregate.

    ``build`` is the view definition (mirror → rowset); ``refresh()``
    recomputes and atomically swaps the parquet; readers always see a
    complete snapshot. Register-then-query matches the couch pattern of
    hitting a prebuilt view; calling ``build`` directly is the fresh
    GROUP BY path — the same trade-off the reference documents.
    """

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        path: str,
        build: Callable[[], DataFrame],
    ):
        self.spark = spark
        self.name = name
        self.path = path
        self.build = build

    def refresh(self) -> None:
        tmp = self.path + ".tmp"
        self.build().write.mode("overwrite").parquet(tmp)
        old = self.path + ".old"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        import shutil

        shutil.rmtree(old, ignore_errors=True)
        self.register()

    def register(self) -> None:
        self.read().createOrReplaceTempView(self.name)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)
