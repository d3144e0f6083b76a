"""Capture `.explain("formatted")` for declared __spark_entry__ queries.

Usage: python tools/dump_plans.py [--no-local-checkpoint] [--no-unpersist] <out_dir> <suffix> [sf_dir] [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each requested query (all
queries when none named). The driver cannot run Spark, so these files
are the committed evidence for every plan claim in OPTIMIZATION_*.md.

--no-local-checkpoint: make localCheckpoint a no-op so eagerly-
materialized results keep their full lazy plan (otherwise they explain
as a bare `Scan ExistingRDD`).

Driver-side fusion paths (hybrid RRF) materialize each leg and fuse on
the driver, so even their lazy "plan" is a createDataFrame stub; for
those, the legs' pre-collect plans are captured via
extensions.hybrid._PLAN_CAPTURE and appended to the same output file
(r14, VERDICT r13 #7).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from couch_to_postgres_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return qe.explainString(mode.fromString("formatted"))


def main() -> int:
    flags = {"--no-local-checkpoint", "--no-unpersist"}
    args = [a for a in sys.argv[1:] if a not in flags]
    if "--no-unpersist" in sys.argv:
        # operators that persist a shared intermediate (e.g.
        # bm25_topk_batch's one-scan (id, dl, hits) frame) unpersist it
        # before returning, so the returned LAZY plan is algebraically
        # identical to the unpersisted program and the cache-sharing
        # claim is invisible to a plain dump. No-op unpersist keeps the
        # InMemoryRelation nodes in the captured plan so the evidence
        # shows which subtrees consume the shared cache.
        from pyspark.sql import DataFrame

        DataFrame.unpersist = lambda self, blocking=False: self
        try:
            from pyspark.sql.classic.dataframe import (
                DataFrame as ClassicDataFrame,
            )

            ClassicDataFrame.unpersist = lambda self, blocking=False: self
        except ImportError:
            pass
    if "--no-local-checkpoint" in sys.argv:
        # several query paths eagerly localCheckpoint their (tiny)
        # result so upstream caches release immediately — correct for
        # execution, but it truncates the captured plan to a bare
        # `Scan ExistingRDD`. For plan evidence, make localCheckpoint
        # a no-op so the full lazy plan survives to explain().
        from pyspark.sql import DataFrame

        DataFrame.localCheckpoint = lambda self, eager=True: self
        try:
            # Spark 4: pyspark.sql.DataFrame is the abstract base; the
            # concrete class defines its own localCheckpoint
            from pyspark.sql.classic.dataframe import (
                DataFrame as ClassicDataFrame,
            )

            ClassicDataFrame.localCheckpoint = (
                lambda self, eager=True: self
            )
        except ImportError:
            pass
    if len(args) < 2:
        print(__doc__)
        return 2
    out_dir = args[0]
    suffix = args[1]
    sf_dir = args[2] if len(args) > 2 else "/root/testdata/sf0.01"
    only = set(args[3:])
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(cpus="8", shuffle_partitions=8)
    failures = []
    from couch_to_postgres_spark.extensions import hybrid as hybridmod

    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        hybridmod._PLAN_CAPTURE = {}
        try:
            df = fn(spark, sf_dir)
            text = explain_formatted(df)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            continue
        finally:
            legs, hybridmod._PLAN_CAPTURE = hybridmod._PLAN_CAPTURE, None
        for leg, leg_text in sorted(legs.items()):
            text += (
                f"\n\n== Pre-collect leg plan: {leg} =="
                f" (driver-side fusion materializes each leg;"
                f" the result plan above is a local-relation stub)\n"
                + leg_text
            )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"OK   {name} -> {path}")
    spark.stop()
    if failures:
        print(f"{len(failures)} failures: {failures}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
