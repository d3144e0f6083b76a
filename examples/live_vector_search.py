"""Worked example: the LIVE VECTOR index — ANN search over a corpus
mirror that keeps changing, with the full quantizer lifecycle.

1. bootstrap: pre-init batches BUFFER until enough upserts accumulate to
   train the quantizer at full configured width (a 2-doc trickle batch
   must not freeze a 2-cell quantizer),
2. ingest CDC churn at O(changed docs): an UPDATE whose new vector lands
   in a DIFFERENT cell (the case id-only tombstones cannot express),
   a delete, a replay that absorbs,
3. live top-k answered from the index — probed cell dirs opened by
   name, liveness merged from skinny (id, seq) frames,
4. watchdog-style maintenance: the churn-proportional fold
   (`compact_vector_index_incremental`) rewrites only the affected
   cell dirs and restores the read-mostly fast path,
5. drift monitoring on `/_balance`'s computation
   (`vector_index_balance` — skinny frames, embeddings never move),
6. the off-peak rebuild: retrain the quantizer on the live corpus and
   re-assign — the ONE sanctioned (assigner, n_cells) change; results
   are observationally equivalent to building on the new quantizer
   from scratch.

Run: python examples/live_vector_search.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from couch_to_postgres_spark.session import get_spark, load_table  # noqa: E402
from couch_to_postgres_spark.streaming.vector_stream import (  # noqa: E402
    append_pending,
    compact_vector_index_incremental,
    flush_pending,
    rebuild_vector_quantizer,
    vector_index_balance,
    vector_index_batch,
    vector_index_status,
    vector_topk_live,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def changes(emb, pred, seq_base, deleted=False):
    src = emb.filter(pred)
    return src.select(
        (F.lit(seq_base) + F.col("vec_id")).alias("seq"),
        "vec_id",
        F.lit(deleted).alias("deleted"),
        F.lit(None).cast("array<double>").alias("embedding")
        if deleted
        else F.col("embedding").cast("array<double>").alias("embedding"),
    )


def main() -> None:
    spark = get_spark(app_name="live-vector-search")
    emb = load_table(spark, SF_DIR, "embeddings")
    work = tempfile.mkdtemp(prefix="live_vec_")
    idx = os.path.join(work, "vectors")

    # 1 — buffered bootstrap: a 3-vector trickle batch alone cannot
    # train the configured 8 cells, so it buffers; the next batch
    # crosses the threshold and the flush trains at full width
    n = append_pending(spark, idx, changes(emb, F.col("vec_id") < 3, 0))
    print(f"buffered upserts (no quantizer yet): {n}")
    append_pending(
        spark, idx, changes(emb, (F.col("vec_id") >= 3) & (F.col("vec_id") < 60), 0)
    )
    flush_pending(spark, idx, n_cells=8)
    st = vector_index_status(spark, idx)
    print(f"bootstrapped: {st['live_vectors']} live, "
          f"{st['n_cells']} cells, degraded={st['quantizer_degraded']}")

    # 2 — churn: ids 0-4 take the embeddings of ids 10-14 (cells MOVE),
    # ids 20-24 delete, and the update batch replays (absorbed)
    upd = (
        emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 15))
        .select(
            (F.lit(1000) + F.col("vec_id")).alias("seq"),
            (F.col("vec_id") - 10).alias("vec_id"),
            F.lit(False).alias("deleted"),
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
    )
    vector_index_batch(spark, idx, upd)
    vector_index_batch(spark, idx, upd)  # replay — absorbed
    vector_index_batch(
        spark, idx,
        changes(emb, (F.col("vec_id") >= 20) & (F.col("vec_id") < 25),
                2000, deleted=True),
    )

    # 3 — live ANN top-k (base absent pre-compaction: tail + tombstones
    # merge by seq-wins liveness)
    queries = emb.filter(F.col("vec_id") >= 55).limit(3).select(
        "vec_id", "embedding"
    )
    hits = vector_topk_live(spark, idx, queries, k=3, nprobe=4)
    print("live top-3 per query:")
    for r in sorted(hits.collect()):
        print("  ", tuple(r))

    # 4 — churn-proportional maintenance (what the daemon watchdog runs
    # on compaction debt): only affected cell dirs rewrite
    fold = compact_vector_index_incremental(spark, idx)
    print(f"fold: mode={fold['mode']} n_live={fold['n_live']}")
    fold2 = compact_vector_index_incremental(spark, idx)
    print(f"second fold is a {fold2['mode']} (nothing to do)")

    # 5 — drift monitoring: per-cell live placement on skinny frames
    bal = vector_index_balance(spark, idx)
    print(f"balance: {bal['populated_cells']}/{bal['n_cells']} cells "
          f"populated, skew={bal['skew']}")

    # 6 — off-peak rebuild: retrain on the live corpus at a wider
    # width. Exhaustive probing (nprobe = every cell) is
    # quantizer-independent, so the exhaustive answer before and after
    # the rebuild must match exactly
    exhaustive_before = sorted(
        map(tuple, vector_topk_live(
            spark, idx, queries, k=3, nprobe=8
        ).collect())
    )
    done = rebuild_vector_quantizer(spark, idx, n_cells=12)
    print(f"rebuild: {done['prev_cells']} -> {done['n_cells']} cells "
          f"over {done['n_live']} live vectors")
    exhaustive_after = sorted(
        map(tuple, vector_topk_live(
            spark, idx, queries, k=3, nprobe=12
        ).collect())
    )
    assert exhaustive_before == exhaustive_after, (
        "exhaustive probing is quantizer-independent"
    )
    print("post-rebuild exhaustive top-3 matches pre-rebuild — OK")

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
