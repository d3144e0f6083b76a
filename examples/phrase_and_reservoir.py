"""Worked example: the round-7 additions end to end over `documents`.

1. exact phrase search — position-exact matching, and the two-stage
   "index candidates, then verify positions" composition with BM25,
2. NEAR/k proximity search with min occurrence distance,
3. a blocklist sweep: many phrases in ONE corpus scan,
4. corpus-fraction selection: DSIR-style top-k through the
   threshold-refinement cut (the plan whose driver state does not grow
   with k),
5. a streaming per-group uniform reservoir maintained across
   micro-batches — and the proof that batch boundaries don't matter.

Run: python examples/phrase_and_reservoir.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from couch_to_postgres_spark.extensions.phrase import (  # noqa: E402
    phrase_hits,
    phrase_match_batch,
    proximity_hits,
)
from couch_to_postgres_spark.extensions.sampling import (  # noqa: E402
    cap_per_group,
    select_topk_by_key,
)
from couch_to_postgres_spark.extensions.search import bm25_topk  # noqa: E402
from couch_to_postgres_spark.extensions.sketch import (  # noqa: E402
    reservoir_stream,
)
from couch_to_postgres_spark.session import get_spark, load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="phrase_and_reservoir")
    docs = load_table(spark, SF_DIR, "documents")

    # 1. exact phrase search: one shuffle-free scan
    hits = phrase_hits(docs, "table hash")
    print("docs containing the exact phrase 'table hash':", hits.count())
    hits.orderBy("first_pos").show(3, truncate=False)

    # ... composed with BM25: rank candidates cheaply, verify positions
    # only on the candidate set (how phrase search stays index-assisted
    # at corpus scale)
    cands = bm25_topk(docs, ["table", "hash"], k=50).select("doc_id")
    verified = phrase_hits(docs.join(cands, "doc_id"), "table hash")
    print("BM25 candidates position-verified:", verified.count())

    # 2. proximity: both terms within 3 words, min pairwise distance
    near = proximity_hits(docs, "spark", "window", max_dist=3)
    near.orderBy("min_dist", "doc_id").show(3)

    # 3. blocklist sweep: many phrases, ONE pass over the corpus
    swept = phrase_match_batch(
        docs, ["table hash", "merge group", "customer join"]
    )
    swept.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_hits").alias("hits")
    ).show()

    # 4. corpus-fraction selection: top 40% by a score column through
    # the threshold-refinement cut — same rows as ORDER BY score DESC
    # LIMIT k, but the driver holds a quantile sketch, not k rows
    scored = docs.select(
        "doc_id", (F.col("n_chars").cast("double")).alias("score")
    )
    k = int(scored.count() * 0.4)
    top = select_topk_by_key(scored, "score", k, id_col="doc_id")
    print(f"threshold-refinement top-{k}:", top.count())

    # 5. streaming reservoir: k-per-source uniform sample maintained
    # across micro-batches; equals the batch cap_per_group over the
    # union because membership is a deterministic function of ids
    state = tempfile.mkdtemp(prefix="reservoir_state_")
    try:
        for parity in (0, 1):
            batch = docs.filter(F.col("doc_id") % 2 == parity).select(
                "doc_id", "source", "text"
            )
            res = reservoir_stream(spark, state, batch, "source", k=5)
        maintained = {
            (r["doc_id"], r["source"]) for r in res.collect()
        }
        oneshot = {
            (r["doc_id"], r["source"])
            for r in cap_per_group(
                docs.select("doc_id", "source", "text"),
                "source", k=5, salt="res1",
            ).collect()
        }
        assert maintained == oneshot, "reservoir must be batch-independent"
        print("reservoir == batch cap_per_group over the union:",
              len(maintained), "rows")
    finally:
        shutil.rmtree(state, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
