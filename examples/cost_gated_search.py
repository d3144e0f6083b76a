"""Worked example: the round-13 cost-gated BM25 read, end to end.

The compacted search index stores an impact layer (per-posting idf-free
BM25 bounds sorted for parquet block skipping, per-term exact top-G
impact arrays, 16-bin impact histograms). A from-index query can then
take the MaxScore/block-max early-terminated path — exact top-k from
provably-sufficient posting blocks — but ONLY when a measurement-
calibrated cost gate says pruning pays:

1. per-query screen: estimated phase-B + rescore rows must undercut
   the full path's pair count,
2. global floor: net pair savings must cover the pruned plan's fixed
   driver actions and duplicate scans,
3. absolute candidate cap: the candidate structures must stay in the
   broadcast/map-side regime.

This example builds a small index, inspects the gate's decision on a
common-term query (refused — nothing provably skippable at this size;
the result still comes back exact from the full path), then forces the
pruned plan to show its diagnostics: per-term cuts, candidate count,
and the impact predicate pushed into the parquet scan.

Run: python examples/cost_gated_search.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from couch_to_postgres_spark.session import get_spark, load_table  # noqa: E402
from couch_to_postgres_spark.streaming.search_stream import (  # noqa: E402
    compact_index,
    search_index_batch,
)
from couch_to_postgres_spark.streaming.search_stream import (  # noqa: E402
    bm25_topk_from_index,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="cost-gated-search-example")
    docs = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="gate_example_")
    try:
        # ---- build + compact: the compaction writes the impact layer
        raw = os.path.join(work, "raw")
        idx = os.path.join(work, "idx")
        search_index_batch(
            spark,
            raw,
            docs.select(
                F.col("doc_id").cast("long").alias("seq"),
                "doc_id",
                F.lit(False).alias("deleted"),
                "text",
            ),
        )
        compact_index(spark, raw, idx, token_buckets=8)

        # ---- a broad query: the gate inspects the stored histograms
        # and (at this corpus size) refuses — the exact full path runs
        qtab = spark.createDataFrame(
            [(1, "the"), (1, "of")], "query_id int, term string"
        )
        diag: dict = {}
        auto = bm25_topk_from_index(spark, idx, qtab, k=5, diag=diag)
        auto_rows = [
            (r["query_id"], r["doc_id"], r["score"]) for r in auto.collect()
        ]
        print(f"auto path pruned engaged: {diag['pruned']}")
        for qid, g in sorted(diag.get("gate", {}).get("queries", {}).items()):
            print(
                f"  query {qid}: full_pairs={g['full_rows']} "
                f"est_pruned={g['phase_b_est'] + g['rescore_est']} "
                f"screen_engaged={g['engaged']}"
            )

        # ---- force the pruned plan: identical answers, plus the
        # early-termination diagnostics (an operator's A/B escape hatch
        # — the planner itself always defers to the gate)
        fdiag: dict = {}
        forced = bm25_topk_from_index(
            spark, idx, qtab, k=5, diag=fdiag, pruned="force"
        )
        forced_rows = [
            (r["query_id"], r["doc_id"], r["score"]) for r in forced.collect()
        ]
        assert sorted(auto_rows) == sorted(forced_rows), "paths diverged!"
        if fdiag["pruned"]:
            print(f"forced pruned plan: cuts={fdiag['cuts']}")
            print(f"  candidates scanned: {fdiag['candidates']}")
            pushed = "GreaterThanOrEqual(impact0" in fdiag["phase_b_plan"]
            print(f"  impact cut pushed into parquet scan: {pushed}")
        print("auto and forced plans agree bit-for-bit on the top-k")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
