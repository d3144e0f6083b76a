"""Worked example: the round-8 additions end to end over `documents`.

1. index-assisted exact phrase search — build the LSM search index,
   compact it (which records the vocab-sized df table), then answer a
   phrase query by probing ONLY the rare terms' token buckets and
   verifying positions on the candidate docs,
2. the tied-key selection guard — exact global top-k on a coarse,
   heavily tied score through the tier split (no corpus-sized window),
3. a CDC-churn reservoir: payload updates and stale replays resolve by
   sequence number, never an arbitrary duplicate pick,
4. operator health: the daemon-style state probe reporting version,
   rows, and last-commit batch for a versioned state path.

Run: python examples/indexed_search_operations.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from couch_to_postgres_spark.extensions.phrase import (  # noqa: E402
    phrase_candidate_ids,
    phrase_hits,
    phrase_hits_indexed,
)
from couch_to_postgres_spark.extensions.sampling import (  # noqa: E402
    select_topk_by_key,
)
from couch_to_postgres_spark.extensions.sketch import (  # noqa: E402
    reservoir_stream,
    sketch_state_status,
)
from couch_to_postgres_spark.session import get_spark, load_table  # noqa: E402
from couch_to_postgres_spark.streaming.search_stream import (  # noqa: E402
    compact_index,
    search_index_batch,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="indexed-search-example")
    docs = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="idx_example_")

    # ---- 1. index-assisted phrase search ------------------------------
    raw_idx = os.path.join(work, "raw_idx")
    idx = os.path.join(work, "idx")
    search_index_batch(
        spark,
        raw_idx,
        docs.select(
            F.col("doc_id").cast("long").alias("seq"),
            "doc_id",
            F.lit(False).alias("deleted"),
            "text",
        ),
        id_col="doc_id",
    )
    compact_index(spark, raw_idx, idx, token_buckets=16)

    phrase = "table hash"
    full = phrase_hits(docs, phrase)
    fast = phrase_hits_indexed(spark, idx, docs, phrase)
    n_cand = phrase_candidate_ids(spark, idx, phrase).count()
    n_full, n_fast = full.count(), fast.count()
    print(
        f"phrase {phrase!r}: full scan {n_full} docs; indexed path probed "
        f"{n_cand} candidates and verified the same {n_fast} hits"
    )
    assert n_full == n_fast

    # ---- 2. exact top-k on a heavily tied key -------------------------
    scored = docs.select(
        "doc_id",
        (F.col("n_chars") - F.col("n_chars") % 1000).alias("coarse_score"),
    )
    diag: dict = {}
    top = select_topk_by_key(
        scored, "coarse_score", 100, id_col="doc_id", max_band_rows=50,
        _diag=diag,
    )
    print(
        f"tied-key top-100 selected {top.count()} rows via "
        f"tie-split path {diag.get('tie_split', {}).get('path')!r} "
        f"(band was {diag.get('band_rows')} rows — corpus-sized ties, "
        "no global window ran over them)"
    )

    # ---- 3. a CDC-churn reservoir -------------------------------------
    state = os.path.join(work, "reservoir_state")
    b1 = docs.select("doc_id", "source", "text").withColumn(
        "seq", F.lit(1).cast("long")
    )
    b2 = (
        docs.select("doc_id", "source", "text")
        .filter(F.col("doc_id") % 2 == 0)
        .withColumn("text", F.concat(F.lit("[rev2] "), F.col("text")))
        .withColumn("seq", F.lit(2).cast("long"))
    )
    reservoir_stream(spark, state, b1, "source", k=5, seq_col="seq",
                     batch_id=0)
    reservoir_stream(spark, state, b2, "source", k=5, seq_col="seq",
                     batch_id=1)
    # a stale replay of batch 1 cannot clobber the rev2 payloads
    res = reservoir_stream(spark, state, b1, "source", k=5, seq_col="seq",
                           batch_id=2)
    n_rev2 = res.filter(F.col("text").startswith("[rev2]")).count()
    print(
        f"reservoir holds {res.count()} rows; {n_rev2} carry the rev2 "
        "payload after a stale replay (max-seq wins, deterministically)"
    )

    # ---- 4. state health for the control plane ------------------------
    health = sketch_state_status(spark, state)
    print(
        f"state health: version={health['version']} rows={health['rows']} "
        f"last_batch={health['batch_id']} "
        f"retained_versions={health['versions_retained']}"
    )

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
